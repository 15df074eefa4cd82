#!/bin/bash
# Round-4d: 3D depth pass (VERDICT r3 weak #2 — 3D ledgers are a
# fraction of 2D's).  Findings that shaped this schedule:
#
# - fu3/fu5/fu7 do NOT exist for 3d9pt_cross (diagonal-only stencil:
#   odd-step partitions have empty forward_k — same structural absence
#   as 2d5pt_cross's fu3), so r4b's fu3 sweep matched zero configs.
# - fp32 fu6 trapezoid does not fit the VMEM budget at any 3D tm (the
#   non-vf level scratch pushes it over); only the bf16 slab fits.
#   r4b measured it: 3d7pt_star 1.394 ms/step (refuted vs 0.958);
#   3d9pt_cross errored at analysis ("No data to reuse", ledger).
#
# What IS untried: the coefficient-fused (non-trapezoid) fu2/fu3
# families, value-fused trapezoid at tm != 6160, bf16 slabs, and the
# XLA-variant baselines.  Sweep everything remaining, budget-capped and
# shuffled, then finalists; regen only if a winner config moved.
#
# Run AFTER schedule_r4c.sh completes (one relay client at a time):
#   bash tuning/schedule_r4d.sh

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d7pt_star.stc \
    --out-dir tuning --budget 1500 --pairs 6

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --budget 1200 --pairs 6

cp benchmarks/tuned.json /tmp/tuned_before_r4d.json
run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 3d7pt_star,3d9pt_cross --top 5 --reps 3

if python - <<'EOF'
import json, sys
a = json.load(open('/tmp/tuned_before_r4d.json'))
b = json.load(open('benchmarks/tuned.json'))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
EOF
then
  run python -u tuning/regen_baseline.py 3
else
  echo "winner configs unchanged; skipping regen"
fi
