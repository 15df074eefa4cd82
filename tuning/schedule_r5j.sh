#!/bin/bash
# Round-5j: top-up the extension-stencil sweep where r5h's budget ran
# thin.  r5h findings (ledgers): 2d13pt_star's fu3/fu4 phases burned
# their budgets on tm>=448 Mosaic compile timeouts (420 s each — the
# radius-3 star's fused halo at deep fusion explodes lowering), so the
# small-tm regions are nearly virgin; the fu2 slice/non-vf families were
# never in r5h's filters at all.  3d27pt_box has ~19 untried configs
# (fu[56] trap + non-trap tails); 3d13pt_star ~6.  Ledger resume makes
# the overlap free; finalists re-measure top-K (winner's-curse control)
# and the EXT-RESULTS table regenerates.  Run BEFORE schedule_r5i.sh so
# the device traces capture the final winners.

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

# Full fu2 trap family (96 configs: roll+slice, vf, ch splits; 19 done).
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d13pt_star.stc \
    --out-dir tuning --filter 'stream_fu2_tm*trap*' --budget 1800
# Small-tm fu3 (tm64/96/128/160 — the region the 420 s timeouts starved).
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d13pt_star.stc \
    --out-dir tuning --filter 'stream_fu3_tm[169]*trap*' --budget 1200
# Whole-space leftovers (resume skips everything already in the ledger).
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d27pt_box.stc \
    --out-dir tuning --filter 'stream_*' --budget 1200
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d13pt_star.stc \
    --out-dir tuning --filter 'stream_*' --budget 600

run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 2d13pt_star,3d13pt_star,3d27pt_box --top 4 --reps 3

run python -u tuning/regen_extension.py 3
echo "=== r5j schedule complete ==="
