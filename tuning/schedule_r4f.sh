#!/bin/bash
# Round-4f: hybrid fusion granularity (--block) hardware sweep.
#
# The block-fused trapezoid (commit "Hybrid fusion granularity") halves
# per-level machinery/scratch at +0-10% VPU ops on the light tables —
# exactly the measured floors that bound 2d9pt_star (machinery 0.14 of
# 0.45) and 2d9pt_cross (launch-bound).  Sweep the b2/b3 families at
# each winner's tm neighborhood first (focused filters), then a broad
# shuffled remainder; finalists + conditional regen at the end.
#
# Run AFTER schedule_r4c.sh completes (one relay client at a time):
#   bash tuning/schedule_r4f.sh

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

tune() { # stencil, filter, budget
  run python -u -m drstencil_tpu.tune.tuner "benchmarks/$1.stc" \
      --out-dir tuning --filter "$2" --budget "$3" --pairs 6
}

# focused: winner-tm neighborhoods (winner tm / labels per tuned.json)
tune 2d9pt_star  'stream_fu[468]_tm12[8]*trap_b[23]*' 900
tune 2d9pt_cross 'stream_fu[468]_tm12[8]*trap_b[23]*' 900
tune 2d5pt_star  'stream_fu[468]_tm256*trap_b[23]*'   700
tune 2d5pt_cross 'stream_fu[468]_tm256*trap_b[23]*'   700
tune 2d9pt_box   'stream_fu[468]_tm12[8]*trap_b[23]*' 700
tune 2d25pt_box  'stream_fu[468]_tm320*trap_b[23]*'   700
tune 3d7pt_star  'stream_fu*_trap_b[23]*'             700
tune 3d9pt_cross 'stream_fu*_trap_b[23]*'             700

# broad shuffled remainder on the two stencils below 1.0 SoL
tune 2d9pt_star  'stream_fu*trap_b[23]*' 900
tune 2d25pt_box  'stream_fu*trap_b[23]*' 900

cp benchmarks/tuned.json /tmp/tuned_before_r4f.json
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning --top 5 --reps 3

if python - <<'EOF'
import json, sys
a = json.load(open('/tmp/tuned_before_r4f.json'))
b = json.load(open('benchmarks/tuned.json'))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
EOF
then
  run python -u tuning/regen_baseline.py 3
else
  echo "winner configs unchanged; skipping regen"
fi
