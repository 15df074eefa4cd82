"""Plan-algebra snapshots for the 8 benchmark stencils.

plan_taps' decisions (row grouping + shared-only pre-sum splitting,
mirrored-column groups, affine chains) are perf-load-bearing and
mirrored bit-for-bit by the native emitter: an accidental change shifts
both correctness-neutral op order AND measured throughput (e.g. the
single-consumer pre-sum split is worth ~10% on 2d9pt_star).  Lock the
base-operator plan shape per stencil.
"""

import pytest

from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops.stream import plan_taps

from conftest import BENCH_DIR

# (row groups, col-group shift lists, chain sources)
EXPECTED = {
    "2d5pt_star":  ([[-1], [0], [1]], [[-1, 1], [0]], [None, None]),
    "2d5pt_cross": ([[-1], [0], [1]], [[-1, 1], [0]], [None, None]),
    "2d9pt_star":  ([[-2], [-1], [0], [1], [2]],
                    [[-2, 2], [-1, 1], [0]], [None, None, None]),
    "2d9pt_cross": ([[-2], [-1], [0], [1], [2]],
                    [[-2, 2], [-1, 1], [0]], [None, None, None]),
    "2d9pt_box":   ([[-1, 1], [0]], [[-1, 1], [0]], [None, None]),
    # shared pre-sums kept (3 consumers each); i1 chains on i0, i2 on i1
    "2d25pt_box":  ([[-2, 2], [-1, 1], [0]],
                    [[-2, 2], [-1, 1], [0]], [None, 0, 1]),
    "3d7pt_star":  ([[-512], [-1], [0], [1], [512]],
                    [[-1, 1], [0]], [None, None]),
    "3d9pt_cross": ([[-513], [-511], [0], [511], [513]],
                    [[-1, 1], [0]], [None, None]),
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_base_plan_snapshot(name):
    spec = load_stc(f"{BENCH_DIR}/{name}.stc")
    mid = spec.dims[1] if len(spec.dims) == 3 else 1
    tl = []
    for off, c in sorted(spec.taps.items()):
        d = off[0] * mid + off[1] if len(off) == 3 else off[0]
        tl.append((d, off[-1], c))
    tl.sort()
    rg, cg, chains = plan_taps(tl)
    exp_rows, exp_cols, exp_chain = EXPECTED[name]
    assert rg == exp_rows
    assert [sl for _, sl in cg] == exp_cols
    assert [(c[0] if c else None) for c in chains] == exp_chain


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_mirrored_shifts_share_one_inner(name):
    """The symmetric/antisymmetric-decomposition dividend, structurally.

    For a symmetric coefficient table, decomposing mirrored lane shifts
    into (u(s)+u(-s), u(s)-u(-s)) halves the combination multiplies
    because the antisymmetric inner vanishes.  plan_taps realizes the
    identical halving directly: +s and -s land in ONE column group
    (their coefficient columns coincide) and share a single inner
    combination, differing only in the final lane shift — so the
    explicit decomposition cannot remove any further multiplies on
    these tables.  Pin that invariant for every benchmark: each
    nonzero shift's mirror sits in the same group."""
    spec = load_stc(f"{BENCH_DIR}/{name}.stc")
    mid = spec.dims[1] if len(spec.dims) == 3 else 1
    tl = []
    for off, c in sorted(spec.taps.items()):
        d = off[0] * mid + off[1] if len(off) == 3 else off[0]
        tl.append((d, off[-1], c))
    tl.sort()
    _, cg, _ = plan_taps(tl)
    for _, shifts in cg:
        for s in shifts:
            if s:
                assert -s in shifts, (
                    f"{name}: shift {s} not mirrored in its group {shifts}"
                )
