#!/bin/bash
# Round-4c: value-fused trapezoid on the round-1-era stencils.
#
# vfuse (round 3's 2d9pt_star win: chained levels carry chunk-local
# VALUES instead of a VMEM scratch round-trip) postdates the last
# sweeps of 2d5pt_star / 2d5pt_cross / 2d9pt_box — zero vf datapoints
# exist for them.  Sweep the vf families at the winners' fusion depths
# (star fu3 + fu4, cross fu4, box fu3 + fu4; ~18 configs each, tuner
# budget-capped), then re-select winners; regen BASELINE.md only if a
# winner CONFIG moved.
#
# Run AFTER schedule_r4b.sh completes (one relay client at a time):
#   bash tuning/schedule_r4c.sh

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u -m drstencil_tpu.tune.tuner benchmarks/2d5pt_star.stc \
    --out-dir tuning --filter 'stream_fu[34]_tm*vf_roll' --budget 1200 --pairs 6

run python -u -m drstencil_tpu.tune.tuner benchmarks/2d5pt_cross.stc \
    --out-dir tuning --filter 'stream_fu4_tm*vf_roll' --budget 900 --pairs 6

run python -u -m drstencil_tpu.tune.tuner benchmarks/2d9pt_box.stc \
    --out-dir tuning --filter 'stream_fu[34]_tm*vf_roll' --budget 1200 --pairs 6

cp benchmarks/tuned.json /tmp/tuned_before_r4c.json
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 2d5pt_star,2d5pt_cross,2d9pt_box --top 5 --reps 3

# regen only if a winner CONFIG moved (medians drift run to run; a
# re-measured same-config median is not a new winner)
if python - <<'EOF'
import json, sys
a = json.load(open('/tmp/tuned_before_r4c.json'))
b = json.load(open('benchmarks/tuned.json'))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
EOF
then
  run python -u tuning/regen_baseline.py 3
else
  echo "winner configs unchanged; skipping regen"
fi
