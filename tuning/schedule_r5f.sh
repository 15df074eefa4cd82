#!/bin/bash
# Round-5f: close out the round's measurement loose ends.
#
# 1. 2d9pt_box tie-break: the r5c finalists pass flipped the winner
#    fu4_tm128 -> fu5_tm128 on a 0.08% in-process margin (0.3538 vs
#    0.3541 median-of-3) whose regen then published 0.3661 — a
#    noise-driven flip.  Re-run finalists at 5 reps to break the tie
#    with more data; regen if the winner moves back.
# 2. 3d9pt_cross device trace: the one kernel family with no captured
#    xplane timeline (deviceMetrics.csv covers star/cross9/box25/
#    3d7pt±jfk).  Capture the tuned winner and append per-kernel rows.
#
# Run AFTER schedule_r5e.sh completes (one relay client at a time).

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

cp benchmarks/tuned.json /tmp/tuned_before_r5f.json
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 2d9pt_box --top 5 --reps 5

if python - <<'PYEOF'
import json, sys
a = json.load(open('/tmp/tuned_before_r5f.json'))
b = json.load(open('benchmarks/tuned.json'))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
PYEOF
then
  run python -u tuning/regen_baseline.py 3
else
  echo "winner configs unchanged; skipping regen"
fi

run python -u tuning/capture_trace.py 3d9pt_cross trace_3d9
[ -d tuning/trace_3d9 ] && \
  run python -u -m drstencil_tpu.utils.trace_summary tuning/trace_3d9 \
      tuning/deviceMetrics.csv
echo "=== r5f schedule complete ==="
