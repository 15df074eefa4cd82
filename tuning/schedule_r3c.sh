#!/bin/bash
# Round-3c sweep schedule.
#
# Motivated by the round-3 cross ablation (tuning/exp_25pt.py at
# fu3_tm160_slice: oneload pass floor 0.32 ms/step vs base 0.72, and
# per-LAUNCH cost is what dominates the floor), so deeper fusion should
# amortize it: the fu4/fu6 slice families are 66/68 untried (round-3b's
# budget cut that sweep at 9/111).  Also the first hardware pass over
# the 3D value-fused trapezoid (18+12 vf candidates, zero tried; vfuse
# won 2d9pt_star by 4-6% and 3D levels are heavier, so the removed
# scratch round-trip is worth more there).
#
# Run from the repo root:  bash tuning/schedule_r3c.sh
# Ledgers resume; safe to re-run.  DO NOT kill mid-compile (see
# .claude/skills/verify/SKILL.md).

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

# 1) 2d9pt_cross: the untried fu4 slice family (plain + chunked)
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu4_tm*slice' \
    --budget 1800 --pairs 8

# 2) 2d9pt_cross: the untried fu6 (deep fori_loop) slice family
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu6_tm*slice' \
    --budget 1200 --pairs 8

# 3) 3D value-fused trapezoid, first hardware pass (winner
#    neighborhoods first via the filter: fu3/fu4 match the current
#    fp32 winners fu3_tm4624 / fu4_tm4104)
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d7pt_star.stc \
    --out-dir tuning --filter 'stream_fu[34]_tm*vf*' \
    --budget 1200 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d7pt_star.stc \
    --out-dir tuning --filter 'stream_fu2_tm*vf*' \
    --budget 600 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu4_tm*vf*' \
    --budget 900 --pairs 6
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu2_tm*vf*' \
    --budget 600 --pairs 6

# 4) honest winner selection for the touched stencils
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 2d9pt_cross,3d7pt_star,3d9pt_cross --top 5 --reps 3

# 5) published table from driver-protocol medians
run python -u tuning/regen_baseline.py 3
