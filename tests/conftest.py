"""Test harness config.

Tests run on CPU with 8 virtual devices so that kernel tests (Pallas
interpret mode) and multi-chip sharding tests (shard_map over a Mesh) run
without TPU hardware.  The same suites re-run unchanged on a real chip
(see tests/README.md).
"""

import os

# The CPU client is created lazily on first use, so setting XLA_FLAGS here
# (before any test touches jax.devices('cpu')) yields 8 virtual CPU devices
# for sharding tests even when a TPU backend was pre-registered by the
# environment (sitecustomize imports jax at interpreter start, so a plain
# JAX_PLATFORMS=cpu in this file would be too late).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Tests compare against the fp64 golden model; without x64 JAX silently
# demotes float64 inputs to float32.  Production kernels pin their dtype
# explicitly (KernelConfig.dtype), so this only affects test code.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(autouse=True)
def _default_to_cpu():
    """Run every test on CPU by default (fast, no TPU required); tests that
    want the real accelerator opt in via the tpu_device fixture."""
    with jax.default_device(jax.devices("cpu")[0]):
        yield


@pytest.fixture(scope="session")
def tpu_device():
    devs = [d for d in jax.devices() if d.platform != "cpu"]
    if not devs:
        pytest.skip("no accelerator available")
    return devs[0]

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
