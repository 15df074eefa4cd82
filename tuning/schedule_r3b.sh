#!/bin/bash
# Round-3b sweep schedule: finish the vfuse neighborhoods the budget cut
# (star got 17/55, cross 30/90), first on-device pass over the bf16
# slab (exercises the round-3 tight bf16 gate, CHECK_TOL 1e-2), and the
# remaining slice-mode chunks for 2d9pt_cross.
#
# Run from the repo root:  bash tuning/schedule_r3b.sh
# Ledgers resume; safe to re-run.  DO NOT kill mid-compile (see
# .claude/skills/verify/SKILL.md).

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

# 1) 2d9pt_star: finish the vf neighborhood (tm96 fu2 untried; fu3/fu4
#    small-tm untried)
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_star.stc \
    --out-dir tuning --filter 'stream_fu[234]_tm*vf_roll' \
    --budget 1500 --pairs 8

# 2) bf16 slab, star + cross: the tuner's tight bf16 device gate has
#    never run on real hardware; objective_ms scores these against the
#    2x bf16 roofline so a win must be honest
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_star.stc \
    --out-dir tuning --filter '*bfloat16' --budget 1200 --pairs 8
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_cross.stc \
    --out-dir tuning --filter '*bfloat16' --budget 1200 --pairs 8

# 3) 2d9pt_cross: finish vf_roll + the fu2/fu4 slice-chunk neighborhood
#    (fu3_tm128_ch8_trap_slice is the current winner at 0.699)
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu[234]_tm*vf_roll' \
    --budget 900 --pairs 8
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu[245]_tm*slice' \
    --budget 900 --pairs 8

# 4) honest winner selection for the touched stencils
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 2d9pt_star,2d9pt_cross --top 5 --reps 3

# 5) published table from driver-protocol medians
run python -u tuning/regen_baseline.py 3
