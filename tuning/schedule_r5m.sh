#!/bin/bash
# Round-5m: targeted follow-up to r5l.  The r5l finalists shortlist for
# 3d27pt_box comes from the archived (pre-transpose) ledger, where
# stream_fu2_tm8208_trap_jfk reads 1.5406 — rank ~13, off the top-6 —
# yet duration.log records the same config at 1.1867 ms/step in an
# earlier sweep era.  The big-tm jfk family is exactly the class the
# slab transpose speeds up, so re-measure it live (the fresh post-r5l
# ledger has no tm8208 entries; the tuner fills them at the current
# kernel generation), then let finalists re-pick from a deeper top-8
# and regenerate the extension table if the winner moved.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

snap=$(mktemp)
cp benchmarks/tuned.json "$snap"

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d27pt_box.stc \
    --out-dir tuning --filter 'stream_fu*tm8208*trap*' \
    --isolate --budget 2400 --config-timeout 600

run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 3d27pt_box --top 8 --reps 3

python - "$snap" <<'EOF'
import json, sys
a = json.load(open(sys.argv[1]))
b = json.load(open("benchmarks/tuned.json"))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
EOF
if [ $? -eq 0 ]; then
  run python -u tuning/regen_extension.py 3
else
  echo "=== winner configs unchanged; extension table regen skipped ==="
fi
echo "=== r5m schedule complete ==="
