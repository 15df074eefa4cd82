"""Test harness config.

Tests run on CPU with 8 virtual devices so that kernel tests (Pallas
interpret mode) and multi-chip sharding tests (shard_map over a Mesh) run
without TPU hardware.  The same suites re-run unchanged on a real chip
(see tests/README.md).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

BENCH_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "benchmarks")

ALL_STENCILS = [
    "2d5pt_star",
    "2d5pt_cross",
    "2d9pt_star",
    "2d9pt_cross",
    "2d9pt_box",
    "2d25pt_box",
    "3d7pt_star",
    "3d9pt_cross",
]


@pytest.fixture(scope="session")
def bench_dir():
    return os.path.abspath(BENCH_DIR)


def small_spec(name: str, dims=None):
    """Load a benchmark stencil but shrink the grid for fast tests."""
    from drstencil_tpu.ir.spec import load_stc, StencilSpec

    spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
    if dims is None:
        dims = (24, 24, 256)[-spec.ndim :] if spec.ndim == 3 else (64, 256)
    return StencilSpec(
        name=spec.name, dims=dims, iterations=spec.iterations, taps=spec.taps
    )


@pytest.fixture(params=ALL_STENCILS)
def any_spec(request):
    return small_spec(request.param)


def rng(seed=0):
    return np.random.default_rng(seed)
