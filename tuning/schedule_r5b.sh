#!/bin/bash
# Round-5b: ledger the new 3D j-frame-restore axis (jfix=kernel) on the
# winner families, re-legitimize 3D winners, regen tables if moved.
# exp_jfix measured: 3d7pt_star -8.4% (0.880 vs 0.960), 3d9pt_cross
# +13% (0.955 vs 0.843) — sweep the families so tuned.json decides.

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d7pt_star.stc \
    --out-dir tuning --filter 'stream_fu[234]_tm*trap_jfk' --budget 1500 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu[24]_tm*trap_jfk' --budget 900 --pairs 6

cp benchmarks/tuned.json /tmp/tuned_before_r5b.json
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 3d7pt_star,3d9pt_cross --top 5 --reps 3

if python - <<'PYEOF'
import json, sys
a = json.load(open('/tmp/tuned_before_r5b.json'))
b = json.load(open('benchmarks/tuned.json'))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
PYEOF
then
  run python -u tuning/regen_baseline.py 3
else
  echo "winner configs unchanged; skipping regen"
fi
