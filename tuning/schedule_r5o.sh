#!/bin/bash
# Round-5o: 3d13pt_star big-tile fu1 family, post-transpose.  The
# winner is UNFUSED (fu1_tm6160_jfk, 2.03 ms/step, 0.65 SoL) and pays a
# 2*hrow/tm = 33% strip-halo refetch at tm6160 (hrow = 1010 rows for
# the radius-2 star).  tm8208 (80-89 MiB modeled) and tm12312 (112-121
# MiB) cut that to 25%/16% and are in the space but have never been
# measured at the current kernel generation — the archived big-tm rows
# carried the pre-transpose 0.36 ms/application phantom penalty, which
# is worst exactly at fu1 (1 plain step per application).  r5m caveat
# applies: tm12312 sits near the VMEM budget where timings go bimodal
# across processes, so the finalists fresh-process median is the only
# number that counts.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

snap=$(mktemp)
cp benchmarks/tuned.json "$snap"

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d13pt_star.stc \
    --out-dir tuning --filter 'stream_fu1_tm[18]2*' \
    --isolate --budget 2400 --config-timeout 600

run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 3d13pt_star --top 6 --reps 3

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
echo "=== r5o schedule complete ==="
