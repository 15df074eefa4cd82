#!/bin/bash
# Round-4 tuning schedule: legitimize every winner, republish.
#
# VERDICT.md r3 items #2/#3: the 2d9pt_cross tuned entry is a raw sweep
# argmin (winner's curse path), and the r3c finalists+regen steps never
# ran.  The 3D value-fused sweeps are DONE (18 ok datapoints across
# 3d7pt_star/3d9pt_cross, all worse than the non-vf winners, plus 3
# fu4-vf compile timeouts on 3d9pt_cross — vfuse on 3D is refuted by
# measurement), so this schedule goes straight to selection+publication:
#
#   1. finalists (median-of-reps re-measurement of the ledger top-5)
#      for the three stencils whose ledgers grew since their last
#      finalist pass,
#   2. regen BASELINE.md from 3 full driver-protocol bench runs.
#
# Run from the repo root:  bash tuning/schedule_r4.sh
# Ledgers/tuned.json resume; safe to re-run.  DO NOT kill mid-compile
# (see .claude/skills/verify/SKILL.md).

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 2d9pt_cross,3d7pt_star,3d9pt_cross --top 5 --reps 3

run python -u tuning/regen_baseline.py 3
