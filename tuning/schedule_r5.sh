#!/bin/bash
# Round-5: post-chain measurements.
#  - exp_pipeline: the live --prefetch (window-fetch pipeline depth)
#    ablation on a 3D winner + the deep-2D winner (VERDICT r4 missing #2:
#    the subsumption claim was argued, never measured for 3D).
#
# Run AFTER schedule_r4e.sh completes (one relay client at a time):
#   bash tuning/schedule_r5.sh

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u tuning/exp_pipeline.py 3d7pt_star 2d25pt_box
