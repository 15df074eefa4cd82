#!/bin/bash
# Round-5g: the deep-step regions on the LIGHT stencils are virgin
# space.  2d5pt_cross (fu4 winner, 2.38 vs SoL) and 2d5pt_star (fu4_vf
# winner, 1.63) have ZERO plain fu5/fu6/fu8 measurements — their
# fusion-depth curve was still descending at 4, unlike 2d9pt_star whose
# heavier levels stopped at 2, and HBM/step keeps falling as 1/step.
# Roll mode only (both winners are roll; slice measured worse across
# rounds); even steps first (no distance-fallback label noise), odd
# step 5 after.  Also close the 2d9pt_box fu6 hole (fu5 lost by only
# 4%).  Then finalists + regen as usual.

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u -m drstencil_tpu.tune.tuner benchmarks/2d5pt_cross.stc \
    --out-dir tuning --filter 'stream_fu6_tm*trap*roll' --budget 1200
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d5pt_cross.stc \
    --out-dir tuning --filter 'stream_fu8_tm*trap*roll' --budget 1200
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d5pt_star.stc \
    --out-dir tuning --filter 'stream_fu6_tm*trap*roll' --budget 1200
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d5pt_star.stc \
    --out-dir tuning --filter 'stream_fu8_tm*trap*roll' --budget 1200
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d5pt_cross.stc \
    --out-dir tuning --filter 'stream_fu5_*trap*roll' --budget 900
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d5pt_star.stc \
    --out-dir tuning --filter 'stream_fu5_*trap*roll' --budget 900
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_box.stc \
    --out-dir tuning --filter 'stream_fu6_tm*trap*roll' --budget 900

cp benchmarks/tuned.json /tmp/tuned_before_r5g.json
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 2d5pt_cross,2d5pt_star,2d9pt_box --top 5 --reps 3

if python - <<'PYEOF'
import json, sys
a = json.load(open('/tmp/tuned_before_r5g.json'))
b = json.load(open('benchmarks/tuned.json'))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
PYEOF
then
  run python -u tuning/regen_baseline.py 3
else
  echo "winner configs unchanged; skipping regen"
fi
echo "=== r5g schedule complete ==="
