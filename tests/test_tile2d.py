"""Pin the plain-tile strategy experiment's kernel mechanics.

`tuning/exp_tile2d.py` is the measured incarnation of the reference's
second 2D kernel strategy (codegen_2d.hpp:456-561, `--streaming` off) —
refuted on hardware (BASELINE.md "Plain-tile strategy verdict"), but
the window construction it demonstrates (escape (d) in PARITY.md's
divergence note: one-tile-block state padding + a +1-block output
offset map) is load-bearing documentation.  This test keeps the
experiment runnable and its arithmetic correct in interpret mode.
"""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drstencil_tpu.ir import golden

from conftest import small_spec


@pytest.fixture(scope="module")
def exp_tile2d():
    sys.path.insert(0, ".")
    return importlib.import_module("tuning.exp_tile2d")


@pytest.mark.parametrize("name,step,tm", [
    ("2d5pt_star", 2, 32),   # h=2 < 8: exercises the hr row-margin round-up
    ("2d9pt_box", 2, 32),    # radius-1 box: all 9 column-shift groups
    ("2d25pt_box", 2, 32),   # h=4, 81 fused taps
])
def test_tile_kernel_matches_golden(exp_tile2d, name, step, tm):
    spec = small_spec(name)
    pair, pad, unpad, an = exp_tile2d.build_tile_program(
        spec, step=step, tm=tm, interpret=True
    )
    h = an.halo
    a0, b0 = golden.random_state(spec, 0, dtype=np.float64)
    a = pad(jnp.asarray(a0.astype(np.float32)))
    b = pad(jnp.asarray(b0.astype(np.float32)))
    a, b = jax.jit(pair)(a, b)

    ga, gb = a0.copy(), b0.copy()
    gb = golden.apply_interior(ga, gb, an.fused, h)
    ga = golden.apply_interior(gb, ga, an.fused, h)

    # boundary divergence creeps h rows/cols per application from the
    # unwritten pads + interior-update band: compare inset 3h
    ins = 3 * h
    got = np.asarray(unpad(a))[ins:-ins, ins:-ins]
    want = ga[ins:-ins, ins:-ins]
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1.0)
    assert err < 1e-5, f"tile kernel diverges from golden: {err}"


def test_tile_window_is_inbounds_and_aligned(exp_tile2d):
    """The escape-(d) geometry: every window start is 8-aligned and
    in-bounds thanks to the one-tile pad (the Mosaic acceptance
    conditions the PARITY.md note documents)."""
    spec = small_spec("2d5pt_star")
    _, pad, unpad, an = exp_tile2d.build_tile_program(
        spec, step=2, tm=32, interpret=True
    )
    R, C = spec.dims
    tm, h = 32, an.halo
    hr = -(-h // 8) * 8
    padded_rows = R + 2 * tm
    for i in range(R // tm):
        start = (i * (tm // 8) + (tm - hr) // 8) * 8
        assert start % 8 == 0
        assert start >= 0
        assert start + tm + 2 * hr <= padded_rows
    # pad/unpad round-trip preserves the data block
    x = jnp.arange(R * C, dtype=jnp.float32).reshape(R, C)
    assert np.array_equal(np.asarray(unpad(pad(x))), np.asarray(x))
