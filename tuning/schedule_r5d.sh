#!/bin/bash
# Round-5d: re-measure the 3d9pt_cross configs whose r5c ledger entries
# were stale plan-time errors recorded under mid-edit code (the
# distance-fallback "No data to reuse at distance 4" entries do NOT
# reproduce at HEAD — analyze() and the full kernel build succeed), then
# re-run finalists + regen if any winner moved.  Run AFTER
# schedule_r5c.sh finishes (same ledger file).

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu5_d4_tm*trap*' --budget 1800 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu6_tm*trap*' --budget 1200 --pairs 6

cp benchmarks/tuned.json /tmp/tuned_before_r5d.json
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 3d9pt_cross --top 5 --reps 3

if python - <<'PYEOF'
import json, sys
a = json.load(open('/tmp/tuned_before_r5d.json'))
b = json.load(open('benchmarks/tuned.json'))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
PYEOF
then
  run python -u tuning/regen_baseline.py 3
else
  echo "winner configs unchanged; skipping regen"
fi
echo "=== r5d schedule complete ==="
