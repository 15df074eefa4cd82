#!/bin/bash
# Round-4e: device-trace coverage for the remaining winner families.
#
# Round 4 proved jax.profiler traces work on the relay
# (tuning/trace_star/, 2d9pt_star) and trace_summary turns them into
# per-kernel CSV rows (the ncu-counters parity artifact).  Extend the
# evidence from one stencil to one per kernel family:
#   - 3d7pt_star   (3D trapezoid with j-frame fixup)
#   - 2d25pt_box   (deep fori_loop trapezoid, fu6)
#   - 2d9pt_cross  (slice lane-mode)
# then append all captures to tuning/deviceMetrics.csv.
#
# Run AFTER schedule_r4d.sh completes (one relay client at a time):
#   bash tuning/schedule_r4e.sh

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u tuning/capture_trace.py 3d7pt_star trace_3d7
run python -u tuning/capture_trace.py 2d25pt_box trace_box25
run python -u tuning/capture_trace.py 2d9pt_cross trace_cross9

for d in trace_star trace_3d7 trace_box25 trace_cross9; do
  [ -d "tuning/$d" ] && \
    run python -u -m drstencil_tpu.utils.trace_summary "tuning/$d" \
        tuning/deviceMetrics.csv
done
