"""Multi-chip domain decomposition tests on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drstencil_tpu.ir import golden
from drstencil_tpu.ir.passes import analyze
from drstencil_tpu.parallel import halo

from conftest import small_spec


@pytest.fixture(scope="module")
def cpu_mesh():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need >= 4 virtual CPU devices")
    return halo.make_mesh(4, devices=devs)


@pytest.mark.parametrize("name", ["2d5pt_star", "2d9pt_box", "3d7pt_star"])
def test_sharded_matches_golden(name, cpu_mesh):
    spec = small_spec(name)
    an = analyze(spec, step=1)
    pair, sharding = halo.sharded_pair(an, cpu_mesh)

    a0, b0 = golden.random_state(spec, seed=0, dtype=np.float64)
    a = jax.device_put(jnp.asarray(a0), sharding)
    b = jax.device_put(jnp.asarray(b0), sharding)
    for _ in range(2):
        a, b = pair(a, b)

    want = golden.run_golden(spec, step=1, pairs=2)["a"]
    me, rms = golden.check_error(np.asarray(a), want, an.halo)
    assert me < 1e-9, f"max_err={me}"


def test_sharded_step2(cpu_mesh):
    spec = small_spec("2d9pt_star")
    an = analyze(spec, step=2)
    pair, sharding = halo.sharded_pair(an, cpu_mesh)
    a0, b0 = golden.random_state(spec, seed=1, dtype=np.float64)
    a = jax.device_put(jnp.asarray(a0), sharding)
    b = jax.device_put(jnp.asarray(b0), sharding)
    a, b = pair(a, b)
    want = golden.run_golden(spec, step=2, seed=1, pairs=1)["a"]
    me, _ = golden.check_error(np.asarray(a), want, an.halo)
    assert me < 1e-9


def test_eight_device_mesh():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual CPU devices")
    mesh = halo.make_mesh(8, devices=devs)
    spec = small_spec("2d5pt_star", dims=(64, 256))
    an = analyze(spec, step=1)
    pair, sharding = halo.sharded_pair(an, mesh)
    a0, b0 = golden.random_state(spec, seed=0, dtype=np.float64)
    a = jax.device_put(jnp.asarray(a0), sharding)
    b = jax.device_put(jnp.asarray(b0), sharding)
    a, b = pair(a, b)
    want = golden.run_golden(spec, step=1, pairs=1)["a"]
    me, _ = golden.check_error(np.asarray(a), want, an.halo)
    assert me < 1e-9


def test_indivisible_axis_raises(cpu_mesh):
    spec = small_spec("2d5pt_star", dims=(66, 256))
    an = analyze(spec, step=1)
    with pytest.raises(ValueError, match="not divisible"):
        halo.make_sharded_apply(an, cpu_mesh)


def test_2d_mesh_decomposition():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 virtual CPU devices")
    mesh = halo.make_mesh_2d((2, 2), devices=devs)
    spec = small_spec("2d9pt_box")
    an = analyze(spec, step=1)
    f, sharding = halo.make_sharded_apply_2d(an, mesh)
    a0, b0 = golden.random_state(spec, seed=4, dtype=np.float64)
    a = jax.device_put(jnp.asarray(a0), sharding)
    b = jax.device_put(jnp.asarray(b0), sharding)
    b = jax.jit(f)(a, b)
    want = golden.apply_interior(a0, b0, an.fused, an.halo)
    me, _ = golden.check_error(np.asarray(b), want, an.halo)
    assert me < 1e-9


def test_2d_mesh_3d_grid():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual CPU devices")
    mesh = halo.make_mesh_2d((4, 2), devices=devs)
    spec = small_spec("3d7pt_star", dims=(16, 16, 128))
    an = analyze(spec, step=1)
    f, sharding = halo.make_sharded_apply_2d(an, mesh)
    a0, b0 = golden.random_state(spec, seed=5, dtype=np.float64)
    a = jax.device_put(jnp.asarray(a0), sharding)
    b = jax.device_put(jnp.asarray(b0), sharding)
    b = jax.jit(f)(a, b)
    want = golden.apply_interior(a0, b0, an.fused, an.halo)
    me, _ = golden.check_error(np.asarray(b), want, an.halo)
    assert me < 1e-9
