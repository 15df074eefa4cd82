"""CI coverage for the driver contract (__graft_entry__.py).

The driver calls ``entry()`` (single-chip compile check) and
``dryrun_multichip(n)`` (multi-chip sharding validation on a virtual CPU
mesh).  Round 1 and 2 both shipped a red ``MULTICHIP_r*.json`` because
nothing in CI invoked these exact functions; these tests close that gap.

Environment note: the test process itself typically has a TPU-ish
default backend (the relay sitecustomize) *and* 8 virtual CPU devices
(conftest XLA_FLAGS) — the same shape as the driver environment — so
calling ``dryrun_multichip`` here exercises the same dispatch the driver
hits (scrubbed pure-CPU subprocess when the default backend is not CPU,
in-process otherwise).
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)

import __graft_entry__ as ge  # noqa: E402


def test_no_private_attribute_access():
    """The driver contract must ride only public APIs (VERDICT r2 #4)."""
    with open(os.path.join(REPO, "__graft_entry__.py")) as f:
        src = f.read()
    assert "_pair_core" not in src
    assert "._pair" not in src


def test_pair_fn_is_public_and_runs():
    from drstencil_tpu.ir.spec import StencilSpec, load_stc
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram

    spec = load_stc(os.path.join(REPO, "benchmarks", "2d5pt_star.stc"))
    spec = StencilSpec(spec.name, (32, 256), spec.iterations, spec.taps)
    prog = StencilProgram(
        spec, KernelConfig(variant="stream", step=1, tm=16, interpret=True)
    )
    fn = prog.pair_fn()
    state = prog.init_state(0)
    a, b = jax.jit(fn)(
        state["a"], state["b"], state["slabs_a"], state["slabs_b"]
    )
    assert a.shape == state["a"].shape


def test_dryrun_in_process_on_cpu_devices(cpu_devices):
    """The in-process branch, pinned to the virtual CPU mesh."""
    if len(cpu_devices) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    ge._dryrun_on_devices(8, list(cpu_devices)[:8])


@pytest.mark.slow
def test_dryrun_multichip_driver_contract():
    """The exact function the driver calls, in this process's (driver-like)
    environment.  Must succeed whatever the default backend is."""
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_main_in_scrubbed_subprocess():
    """python __graft_entry__.py end-to-end (entry + jit + dryrun) in the
    scrubbed pure-CPU environment — the subprocess leg of the contract."""
    env = ge._scrubbed_cpu_env(8)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        env=env, capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    assert "entry: ok" in proc.stdout
    assert "dryrun_multichip: ok" in proc.stdout


@pytest.mark.slow
def test_dryrun_survives_broken_default_backend():
    """Simulate the driver-host failure mode that made MULTICHIP_r01/r02
    red: a default backend whose initialization RAISES (there, a libtpu
    version mismatch).  JAX_PLATFORMS=bogus makes every in-process
    backend query raise, so dryrun_multichip must reach the scrubbed
    pure-CPU subprocess fallback and still succeed."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "bogus_broken_tpu"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8); "
         "print('dryrun_multichip: ok')"],
        env=env, capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    assert "dryrun_multichip: ok" in proc.stdout


def test_scrubbed_env_detaches_every_tpu_hook():
    env = ge._scrubbed_cpu_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["PALLAS_AXON_POOL_IPS"] == ""
    assert "axon" not in env.get("PYTHONPATH", "").lower()
    for k in env:
        assert not k.startswith(("TPU_", "PJRT_", "LIBTPU", "AXON_"))
        assert not (k.startswith("PALLAS_AXON_")
                    and k != "PALLAS_AXON_POOL_IPS")
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
