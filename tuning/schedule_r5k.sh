#!/bin/bash
# Round-5k: the 2d13pt_star space is 849/867 virgin (r5h burned its
# budget on tm>=448 Mosaic compile sinks before the r5h gate existed;
# r5j's top-up only reached the fu2 trap family).  The stencil sits at
# 0.52 SoL — the worst in the tree — and the entire deep fori-loop
# path (fu5/fu6/fu8, compile-constant at any tm since it avoids the
# unrolled-trapezoid sink) has never been measured on it.  Priors cut
# both ways: 2d9pt_star (light levels) loses at fu3+, 2d25pt_box
# (heavy taps) wins at fu6 — 2d13pt_star is radius-3 with 13 taps,
# closer to the heavy case.  Also finishes the 20 3d27pt_box
# stragglers (fu4/fu5/fu6 tails).  Ledger resume makes overlap free;
# finalists re-measure top-K; EXT-RESULTS regenerates only if a winner
# moves.  Run AFTER schedule_r5i.sh (traces capture pre-r5k winners;
# re-capture manually if a winner moves).

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

# Deep fori-loop trapezoid family (never tried; compile-safe at any tm).
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d13pt_star.stc \
    --out-dir tuning --filter 'stream_fu[568]_tm*trap*' --budget 2400
# Shallow-unrolled fu3/fu4 at small tm (the r5h-starved region; tm>=448
# is gated out of the space since r5h so the bare glob is safe).
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d13pt_star.stc \
    --out-dir tuning --filter 'stream_fu[34]_tm*trap*' --budget 1800
# 3d27pt_box whole-space leftovers (20 configs, fu4+ tails).
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d27pt_box.stc \
    --out-dir tuning --filter 'stream_*' --budget 900

run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 2d13pt_star,3d27pt_box --top 4 --reps 3

run python -u tuning/regen_extension.py 3
echo "=== r5k schedule complete ==="
