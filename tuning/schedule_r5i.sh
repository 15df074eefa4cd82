#!/bin/bash
# Round-5i: real device traces for the extension-stencil winners
# (post-r5h), appending per-kernel rows to tuning/deviceMetrics.csv —
# extends the ncu-counter-parity artifact (reference
# benchmarks/*/getGpuMetrics.py) to the beyond-reference suite.
# Run AFTER schedule_r5h.sh has published tuned.json winners.

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

for s in 3d27pt_box 3d13pt_star 2d13pt_star; do
  run python tuning/capture_trace.py "$s" "trace_$s"
  run python -m drstencil_tpu.utils.trace_summary "tuning/trace_$s" \
      tuning/deviceMetrics.csv
done
echo "=== r5i schedule complete ==="
