#!/bin/bash
# Round-5h: tune the EXTENSION stencils (beyond the upstream 8-fixture
# suite — commit 74aa772): 2d13pt_star (radius-3 star), 3d13pt_star
# (radius-2 3D star), 3d27pt_box (dense 27pt box).  Filters target the
# stream families only (the xla_fuN baselines at fu>=2 coefficient-fuse
# into multi-hundred-tap operators — HBM-OOM territory at full grids).
# 2D starts at the trap+roll families the 8-fixture winners all came
# from; 3D sweeps its whole (small) stream space.  Finalists re-measure
# top-K (winner's-curse control), then the extension table regenerates
# between EXT-RESULTS markers — the headline table is untouched.

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -vE "^\[2m|WARNING"
}

run python -u -m drstencil_tpu.tune.tuner benchmarks/3d13pt_star.stc \
    --out-dir tuning --filter 'stream_*' --budget 2400
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d27pt_box.stc \
    --out-dir tuning --filter 'stream_fu1_*' --budget 900
run python -u -m drstencil_tpu.tune.tuner benchmarks/3d27pt_box.stc \
    --out-dir tuning --filter 'stream_fu[23]_*trap*' --budget 2400
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d13pt_star.stc \
    --out-dir tuning --filter 'stream_fu2_tm*trap*roll' --budget 1500
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d13pt_star.stc \
    --out-dir tuning --filter 'stream_fu3_tm*trap*roll' --budget 1500
run python -u -m drstencil_tpu.tune.tuner benchmarks/2d13pt_star.stc \
    --out-dir tuning --filter 'stream_fu4_tm*trap*roll' --budget 1500

run python -u -m drstencil_tpu.tune.finalists --out-dir tuning \
    --stencils 2d13pt_star,3d13pt_star,3d27pt_box --top 4 --reps 3

run python -u tuning/regen_extension.py 3
echo "=== r5h schedule complete ==="
