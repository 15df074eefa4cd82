"""Convolution-factorization pass (ir/factor.py) + factored kernel mode.

The factored form W = V1*V2 + R(center column) must be exact to fp64
noise (the kernel check gate then validates the fp32 execution), reject
unsuitable tables, and the kernel built from it must match the golden
like every other variant.
"""

import numpy as np
import pytest

from drstencil_tpu.ir.factor import _conv2, factor_radius2, factor_tap_lists
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram

from conftest import small_spec

FACTORABLE = ["2d25pt_box", "2d9pt_star", "2d9pt_cross"]


def table_of(spec):
    W = np.zeros((5, 5))
    for (d, s), c in spec.taps.items():
        W[d + 2, s + 2] = c
    return W


@pytest.mark.parametrize("name", FACTORABLE)
def test_factorization_exact(name):
    spec = small_spec(name)
    f = factor_radius2(spec.taps)
    assert f is not None
    V1, V2, rcol = f
    D = table_of(spec) - _conv2(V1, V2)
    D[:, 2] -= rcol
    assert np.max(np.abs(D)) < 1e-12
    # residual confined to the center column by construction
    # conditioning: intermediates must stay near the table's own scale
    amp = max(np.max(np.abs(rcol)), np.max(np.abs(V1)) * np.max(np.abs(V2)))
    assert amp <= 30.0 * np.max(np.abs(table_of(spec)))


def test_factorization_deterministic():
    spec = small_spec("2d25pt_box")
    a = factor_radius2(spec.taps)
    b = factor_radius2(spec.taps)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_factorization_rejects():
    # radius-1 table: not a radius-2 factorization target
    assert factor_tap_lists({(0, 0): 1.0, (0, 1): 0.5, (1, 0): 0.5}) is None
    # 3D taps
    assert factor_tap_lists({(0, 0, 0): 1.0, (0, 0, 2): 0.5}) is None
    # lane-asymmetric radius-2 table
    taps = {(0, 0): 1.0, (0, 2): 0.5, (0, -2): 0.25, (2, 0): 0.1}
    assert factor_tap_lists(taps) is None


@pytest.mark.parametrize("name", FACTORABLE)
@pytest.mark.parametrize("step", [1, 2])
def test_factored_kernel_matches_golden(name, step):
    spec = small_spec(name)
    cfg = KernelConfig(variant="stream", step=step, tm=16, factor=True,
                       interpret=True)
    prog = StencilProgram(spec, cfg)
    max_err, rms = prog.check(seed=0, pairs=1)
    growth = max(1.0, sum(spec.taps.values())) ** (2 * step)
    assert max_err < 5e-3 * growth, f"max_err={max_err}"
    assert rms < 1e-3 * growth


def test_factored_kernel_step3_and_slice():
    spec = small_spec("2d25pt_box", dims=(64, 256))
    for mode in ("roll", "slice"):
        cfg = KernelConfig(variant="stream", step=3, tm=24, factor=True,
                           lane_mode=mode, interpret=True)
        max_err, _ = StencilProgram(spec, cfg).check(seed=1, pairs=1)
        growth = max(1.0, sum(spec.taps.values())) ** 6
        assert max_err < 5e-3 * growth, f"{mode}: {max_err}"


def test_factored_kernel_rejects():
    with pytest.raises(ValueError, match="factor"):
        StencilProgram(
            small_spec("2d5pt_star"),
            KernelConfig(variant="stream", tm=16, factor=True,
                         interpret=True),
        )
    with pytest.raises(ValueError, match="2D-only"):
        StencilProgram(
            small_spec("3d7pt_star"),
            KernelConfig(variant="stream", tm=80, factor=True,
                         interpret=True),
        )
