#!/bin/bash
# Round-5e: measure the deep diagonal families for real.  r5c/r5d's
# 3d9pt_cross fu5_d4 / fu6 attempts all died at plan time inside
# device_check: the deep-fusion gold (cfg.replace(step=1)) requires a
# streaming partition the pure-diagonal step-1 operator cannot have.
# Fixed by analyze(require_partition=False) for the XLA gold
# (test_deep_gold_tolerates_unpartitionable_step1); the stale error
# entries are purged so the ledger re-measures them.  Also give the
# same families a shot on the other diagonal stencil (2d5pt_cross
# already swept clean at fu5 — the filter resumes instantly if so).

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu5_d4_tm*trap*' --budget 2400 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu6_tm*trap*' --budget 1800 --pairs 6

cp benchmarks/tuned.json /tmp/tuned_before_r5e.json
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 3d9pt_cross --top 5 --reps 3

if python - <<'PYEOF'
import json, sys
a = json.load(open('/tmp/tuned_before_r5e.json'))
b = json.load(open('benchmarks/tuned.json'))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
PYEOF
then
  run python -u tuning/regen_baseline.py 3
else
  echo "winner configs unchanged; skipping regen"
fi
echo "=== r5e schedule complete ==="
