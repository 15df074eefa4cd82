#!/bin/bash
# Round-5l: re-measure the 3D stencils on the transposed-face-slab
# kernel generation (commit "Transpose the 3D lane-frame slab").  The
# change removes a ~0.36 ms/application phantom relayout+re-read from
# every 3D config, so all four 3D ledgers are stale (CLAUDE.md: ledger
# timings are only comparable within one kernel generation) — archive
# them and let finalists shortlist from the archive and re-measure
# medians live.  --top 6 (not the usual 4): the savings scale with
# 1/(2*step), so shallow-fusion and jfk-vs-outer rankings may shift
# (3d9pt_cross's jfk variant lost by 13% pre-fix; the gap class this
# change removes is the same order).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

era=tuning/archive-r5-tallface
mkdir -p "$era"
for s in 3d7pt_star 3d9pt_cross 3d13pt_star 3d27pt_box; do
  [ -f "tuning/$s.ledger.json" ] && mv "tuning/$s.ledger.json" "$era/"
done

run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 3d7pt_star,3d9pt_cross,3d13pt_star,3d27pt_box \
    --top 6 --reps 3

run python -u tuning/regen_baseline.py 3
run python -u tuning/regen_extension.py 3

# fresh device traces at the new winners (per-kernel rows appended to
# deviceMetrics.csv under *_r5l labels; pre-fix rows stay as the
# documented before state)
for s in 3d7pt_star 3d9pt_cross 3d13pt_star 3d27pt_box; do
  run python tuning/capture_trace.py "$s" "trace_${s}_r5l"
  run python -m drstencil_tpu.utils.trace_summary "tuning/trace_${s}_r5l" \
      tuning/deviceMetrics.csv
done
echo "=== r5l schedule complete ==="
