#!/bin/bash
# Round-5c: sweep the space regions unlocked by the widened tuner space
# (commit b1f5933): distance-fallback odd steps (3d9pt_cross fu3_d2),
# step 5 (deep trapezoid), and the 124MB VMEM budget that admits the
# fp32 trap configs at the winners' next-door tile sizes (fu4_tm6160 on
# both 3D stencils — their bf16 twins already measured and won their
# ledger families).  Then re-legitimize winners (finalists re-measure)
# and regen the published tables if any winner moved.

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

# --- 3D: the big holes (compiles are minutes each; budgets generous) ---
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu4_tm6160*trap*' --budget 1200 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu3_d2_tm*trap*' --budget 2400 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu5_d4_tm*trap*' --budget 1200 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d7pt_star.stc \
    --out-dir tuning --filter 'stream_fu3_tm6160*trap*' --budget 1800 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d7pt_star.stc \
    --out-dir tuning --filter 'stream_fu4_tm*trap*' --budget 1200 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d7pt_star.stc \
    --out-dir tuning --filter 'stream_fu5_tm*trap*' --budget 1200 --pairs 6

# --- 2D: fu5 probes at each winner's tile family (cheap compiles) ---
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d25pt_box.stc \
    --out-dir tuning --filter 'stream_fu5_tm*ch16_trap_roll' --budget 1200
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu5_tm*trap_slice' --budget 1200
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_box.stc \
    --out-dir tuning --filter 'stream_fu5_tm128*trap_roll' --budget 600
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d5pt_cross.stc \
    --out-dir tuning --filter 'stream_fu5_tm256*trap_roll' --budget 600

# --- re-legitimize + publish ---
cp benchmarks/tuned.json /tmp/tuned_before_r5c.json
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 3d7pt_star,3d9pt_cross,2d25pt_box,2d9pt_cross,2d9pt_box,2d5pt_cross \
    --top 5 --reps 3

if python - <<'PYEOF'
import json, sys
a = json.load(open('/tmp/tuned_before_r5c.json'))
b = json.load(open('benchmarks/tuned.json'))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
PYEOF
then
  run python -u tuning/regen_baseline.py 3
else
  echo "winner configs unchanged; skipping regen"
fi
echo "=== r5c schedule complete ==="
