#!/bin/bash
# Round-4b: 3D fusion-depth depth pass (VERDICT.md r3 weak #2 — 3D
# tuning is a fraction of 2D's).  Families never measured on hardware:
# fu3 on 3d9pt_cross, fu6 (deep fori_loop trapezoid) on both 3D
# stencils.  Then re-select winners; regen BASELINE.md only if a winner
# moved (the r4 schedule already republished).
#
# Run AFTER schedule_r4.sh completes (one relay client at a time):
#   bash tuning/schedule_r4b.sh

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu3_tm*' --budget 900 --pairs 6

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d7pt_star.stc \
    --out-dir tuning --filter 'stream_fu6_tm*' --budget 900 --pairs 6

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu6_tm*' --budget 900 --pairs 6

cp benchmarks/tuned.json /tmp/tuned_before_r4b.json
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 3d7pt_star,3d9pt_cross --top 5 --reps 3

# regen only if a winner CONFIG moved (medians drift run to run; a
# re-measured same-config median is not a new winner)
if python - <<'EOF'
import json, sys
a = json.load(open('/tmp/tuned_before_r4b.json'))
b = json.load(open('benchmarks/tuned.json'))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
EOF
then
  run python -u tuning/regen_baseline.py 3
else
  echo "winner configs unchanged; skipping regen"
fi
