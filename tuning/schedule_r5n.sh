#!/bin/bash
# Round-5n: last targeted top-up after r5m.  During the r5l finalists
# re-measurement, 3d9pt_cross's stream_fu4_tm6160_trap died on a
# transient remote-compile HTTP 500 (tpu_compile_helper rc=1) and was
# never retried; its archived pre-transpose time (0.8522 ms/step, with
# the ~0.36 ms/application phantom-relayout penalty the slab transpose
# removed) brackets the current winner (0.7686).  Re-measure that one
# family live, let finalists re-pick, and regenerate the headline
# tables only if the winner moved.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

snap=$(mktemp)
cp benchmarks/tuned.json "$snap"

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d9pt_cross.stc \
    --out-dir tuning --filter 'stream_fu4_tm6160*trap*' \
    --isolate --budget 1500 --config-timeout 600

run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 3d9pt_cross --top 6 --reps 3

python - "$snap" <<'EOF'
import json, sys
a = json.load(open(sys.argv[1]))
b = json.load(open("benchmarks/tuned.json"))
sys.exit(0 if any(a.get(k, {}).get("config") != b[k]["config"] for k in b) else 1)
EOF
if [ $? -eq 0 ]; then
  run python -u tuning/regen_baseline.py 3
else
  echo "=== winner configs unchanged; baseline regen skipped ==="
fi
echo "=== r5n schedule complete ==="
