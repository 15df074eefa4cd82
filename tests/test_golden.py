"""Tests for the NumPy golden model itself (self-consistency checks)."""

import numpy as np
import pytest

from drstencil_tpu.ir.golden import (
    apply_interior,
    check_error,
    num_launch_pairs,
    random_state,
    run_golden,
)
from drstencil_tpu.ir.passes import fuse, order_of

from conftest import small_spec


def test_num_launch_pairs():
    assert num_launch_pairs(4, 1) == 2
    assert num_launch_pairs(4, 2) == 1
    assert num_launch_pairs(4, 3) == 1  # ceil semantics of the C loop
    assert num_launch_pairs(10, 2) == 3


def test_apply_interior_identity():
    spec = small_spec("2d5pt_star", dims=(16, 16))
    a, b = random_state(spec, seed=1)
    out = apply_interior(a, b, {(0, 0): 1.0}, halo=1)
    np.testing.assert_array_equal(out[1:-1, 1:-1], a[1:-1, 1:-1])
    np.testing.assert_array_equal(out[0, :], b[0, :])
    np.testing.assert_array_equal(out[:, -1], b[:, -1])


def test_apply_interior_shift():
    spec = small_spec("2d5pt_star", dims=(8, 8))
    a, b = random_state(spec, seed=2)
    out = apply_interior(a, b, {(1, 0): 1.0}, halo=1)
    np.testing.assert_array_equal(out[1:-1, 1:-1], a[2:, 1:-1])


def test_one_fused_launch_equals_two_plain_applications_interior():
    """Applying the fused (step=2) operator once must equal applying the
    stencil twice, on cells far enough from the boundary (>= 2*order)."""
    spec = small_spec("2d5pt_star", dims=(20, 20))
    a, _ = random_state(spec, seed=3)
    r = 1
    fused2 = fuse(spec.taps, 2)

    # two plain applications on an unbounded (padded) domain
    once = apply_interior(a, a.copy(), spec.taps, halo=r)
    twice = apply_interior(once, once.copy(), spec.taps, halo=r)
    fused_once = apply_interior(a, a.copy(), fused2, halo=2 * r)

    # deep interior (2 cells in) is boundary-effect-free
    np.testing.assert_allclose(
        twice[2:-2, 2:-2], fused_once[2:-2, 2:-2], rtol=1e-12
    )


def test_run_golden_shapes(any_spec):
    res = run_golden(any_spec, step=2, pairs=1)
    assert res["a"].shape == any_spec.dims
    assert res["b"].shape == any_spec.dims
    assert int(res["halo"]) == order_of(fuse(any_spec.taps, 2))


def test_check_error():
    a = np.ones((8, 8))
    b = np.ones((8, 8))
    b[4, 4] = 2.0
    max_err, rms = check_error(a, b, halo=1)
    assert max_err == pytest.approx(1.0)
    assert rms == pytest.approx(np.sqrt(1.0 / 36))
    # error on the boundary is ignored
    b2 = np.ones((8, 8))
    b2[0, 0] = 99.0
    max_err, rms = check_error(a, b2, halo=1)
    assert max_err == 0.0


def test_golden_boundary_semantics():
    """Ping-pong boundary: buffer a keeps its random boundary forever,
    buffer b keeps zeros — matching the reference's zero-initialized out
    buffer whose boundary is never written (codegen.hpp:556, 637-660)."""
    spec = small_spec("2d5pt_star", dims=(12, 12))
    res = run_golden(spec, step=1, pairs=2)
    a0, b0 = random_state(spec, seed=0)
    np.testing.assert_array_equal(res["a"][0, :], a0[0, :])
    np.testing.assert_array_equal(res["b"][0, :], np.zeros(12))
