#!/bin/bash
# Round-3 sweep schedule: vfuse neighborhoods for the two sub-1.0
# stencils, then finalist re-measurement and baseline regeneration.
#
# Run from the repo root:  bash tuning/schedule_r3.sh
# Ledgers resume; safe to re-run.  DO NOT kill mid-compile (see
# .claude/skills/verify/SKILL.md — orphaned Mosaic compiles wedge the
# relay for tens of minutes).

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

# 1) 2d9pt_star: value-fused trapezoid neighborhood (fu2/fu3, sane tms)
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_star.stc \
    --out-dir tuning --filter 'stream_fu[23]_tm[1-9][0-9][0-9]*vf_roll' \
    --budget 1800 --pairs 8

# 2) 2d9pt_cross: vfuse + the fu3 neighborhood (VERDICT r2 #8)
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu[234]_tm[1-9][0-9]*vf_roll' \
    --budget 1800 --pairs 8
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu3_tm*slice' \
    --budget 900 --pairs 8

# 3) finalists: honest median-of-reps winner selection for the touched
#    stencils (writes tuned.json)
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 2d9pt_star,2d9pt_cross --top 5 --reps 3

# 4) published table from driver-protocol medians
run python -u tuning/regen_baseline.py 3
