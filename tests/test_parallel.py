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


# ---- streaming Pallas kernel under shard_map (parallel/stream_shard) ----

from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.parallel import stream_shard


@pytest.mark.parametrize("name,cfg", [
    ("2d5pt_star", KernelConfig(variant="stream", step=1, tm=16,
                                interpret=True)),
    ("2d9pt_box", KernelConfig(variant="stream", step=2, tm=16,
                               trapezoid=True, interpret=True)),
    ("2d25pt_box", KernelConfig(variant="stream", step=2, tm=16, ch=8,
                                trapezoid=True, lane_mode="roll",
                                interpret=True)),
    ("3d7pt_star", KernelConfig(variant="stream", step=1, tm=56,
                                interpret=True)),
    # extension stencils: widest 2D halo (radius 3) and the dense 27pt
    # box (9 row-groups x 3 lane shifts) through the same shard path
    ("2d13pt_star", KernelConfig(variant="stream", step=2, tm=24,
                                 trapezoid=True, lane_mode="roll",
                                 interpret=True)),
    ("3d27pt_box", KernelConfig(variant="stream", step=1, tm=56,
                                interpret=True)),
])
def test_sharded_stream_matches_golden(name, cfg, cpu_mesh):
    """The production Pallas kernel composed with ppermute halo exchange
    must reproduce the fp64 golden model on the global problem — the
    multi-chip path inherits the single-chip kernel (VERDICT round-1 #5)."""
    dims = (16, 16, 256) if name.startswith("3d") else (64, 256)
    spec = small_spec(name, dims=dims)
    n = 4
    pair, g, sharding = stream_shard.sharded_stream_pair(spec, cfg, cpu_mesh)

    a0, b0 = golden.random_state(spec, seed=0, dtype=np.float64)
    a0f, b0f = a0.astype(np.float32), b0.astype(np.float32)
    sa = stream_shard.shard_state(a0f, g, n)
    sb = stream_shard.shard_state(b0f, g, n)
    a = jax.device_put(jnp.asarray(sa[0]), sharding)
    b = jax.device_put(jnp.asarray(sb[0]), sharding)
    slabs_a = tuple(jax.device_put(jnp.asarray(s), sharding) for s in sa[1:])
    slabs_b = tuple(jax.device_put(jnp.asarray(s), sharding) for s in sb[1:])

    pairs = 2
    for _ in range(pairs):
        a, b = pair(a, b, slabs_a, slabs_b)
    got = stream_shard.unshard_state(np.asarray(a), g, n)

    an = analyze(spec, step=cfg.step)
    ga, gb = a0f.astype(np.float64), b0f.astype(np.float64)
    for _ in range(pairs):
        gb = golden.apply_interior(ga, gb, an.fused, an.halo)
        ga = golden.apply_interior(gb, ga, an.fused, an.halo)
    me, rms = golden.check_error(got, ga, an.halo)
    # relative: unnormalized operators grow values every step
    scale = max(1.0, float(np.max(np.abs(ga))))
    assert me / scale < 3e-6, f"max_err={me} (scale {scale:.3g})"


def test_sharded_stream_matches_single_chip(cpu_mesh):
    """Bit-compatibility: the sharded kernel's interior must match the
    single-chip kernel's output to fp32 roundoff on the same state."""
    from drstencil_tpu.ops.runner import StencilProgram

    spec = small_spec("2d9pt_star", dims=(64, 256))
    cfg = KernelConfig(variant="stream", step=2, tm=16, trapezoid=True,
                       interpret=True)
    prog = StencilProgram(spec, cfg)
    state = prog.init_state(3)
    state = prog.run_pairs(state, 1)
    single = prog.final_a(state)

    n = 4
    pair, g, sharding = stream_shard.sharded_stream_pair(spec, cfg, cpu_mesh)
    a0, b0 = golden.random_state(spec, seed=3, dtype=np.float64)
    sa = stream_shard.shard_state(a0.astype(np.float32), g, n)
    sb = stream_shard.shard_state(b0.astype(np.float32), g, n)
    a = jax.device_put(jnp.asarray(sa[0]), sharding)
    b = jax.device_put(jnp.asarray(sb[0]), sharding)
    slabs_a = tuple(jax.device_put(jnp.asarray(s), sharding) for s in sa[1:])
    slabs_b = tuple(jax.device_put(jnp.asarray(s), sharding) for s in sb[1:])
    a, b = pair(a, b, slabs_a, slabs_b)
    got = stream_shard.unshard_state(np.asarray(a), g, n)

    an = analyze(spec, step=2)
    h = an.halo
    inner = (slice(h, -h), slice(h, -h))
    diff = np.max(np.abs(got[inner] - single[inner]))
    scale = max(1.0, np.max(np.abs(single[inner])))
    assert diff / scale < 1e-6, f"rel diff {diff / scale}"


def test_sharded_stream_3d_trapezoid(cpu_mesh):
    """3D + trapezoid under shard_map: j-frame fixup, straddle carry, and
    level scratch all compose with the halo exchange."""
    spec = small_spec("3d7pt_star", dims=(16, 16, 256))
    cfg = KernelConfig(variant="stream", step=2, tm=72, trapezoid=True,
                       interpret=True)
    n = 4
    pair, g, sharding = stream_shard.sharded_stream_pair(spec, cfg, cpu_mesh)

    a0, b0 = golden.random_state(spec, seed=4, dtype=np.float64)
    a0f, b0f = a0.astype(np.float32), b0.astype(np.float32)
    sa = stream_shard.shard_state(a0f, g, n)
    sb = stream_shard.shard_state(b0f, g, n)
    a = jax.device_put(jnp.asarray(sa[0]), sharding)
    b = jax.device_put(jnp.asarray(sb[0]), sharding)
    slabs_a = tuple(jax.device_put(jnp.asarray(s), sharding) for s in sa[1:])
    slabs_b = tuple(jax.device_put(jnp.asarray(s), sharding) for s in sb[1:])
    a, b = pair(a, b, slabs_a, slabs_b)
    got = stream_shard.unshard_state(np.asarray(a), g, n)

    an = analyze(spec, step=2)
    ga, gb = a0f.astype(np.float64), b0f.astype(np.float64)
    gb = golden.apply_interior(ga, gb, an.fused, an.halo)
    ga = golden.apply_interior(gb, ga, an.fused, an.halo)
    me, _ = golden.check_error(got, ga, an.halo)
    scale = max(1.0, float(np.max(np.abs(ga))))
    assert me / scale < 3e-6, f"max_err={me} (scale {scale:.3g})"


def _ppermute_bytes(jaxpr) -> tuple[int, int]:
    """Recursively sum (n_ppermutes, operand bytes) over a closed jaxpr —
    the actual inter-chip traffic the compiled step would put on ICI."""
    count, total = 0, 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "ppermute":
            count += 1
            total += sum(int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
                         for v in eqn.invars if hasattr(v.aval, "shape"))
        for p in eqn.params.values():
            for sub in jax.core.jaxprs_in_params({None: p}):
                c, t = _ppermute_bytes(sub)
                count, total = count + c, total + t
    return count, total


def test_halo_traffic_accounting(cpu_mesh):
    """The ICI model's byte accounting (halo_traffic_model) must equal the
    traffic in the traced program: exactly two ppermutes per apply, each
    moving hrow*wb*4 bytes — the published weak-scaling numbers
    (parallel/model.py, BASELINE.md) divide THESE bytes by ICI bandwidth."""
    spec = small_spec("2d9pt_star", dims=(64, 256))
    cfg = KernelConfig(variant="stream", step=2, tm=16, trapezoid=True,
                       interpret=True)
    n = 4
    apply_fn, g, sharding = stream_shard.build_sharded_stream(
        spec, cfg, cpu_mesh)
    model = stream_shard.halo_traffic_model(g, cfg.step)

    import jax.numpy as jnp
    a = jnp.zeros((n * g.rows_padded, g.wb), jnp.float32)
    fr = g.frame_rows
    face = jnp.zeros((n * 2 * fr, g.wb), jnp.float32)
    jaxpr = jax.make_jaxpr(apply_fn)(a, a, face)
    count, total = _ppermute_bytes(jaxpr.jaxpr)
    assert count == 2, f"expected 2 ppermutes per apply, traced {count}"
    # jaxpr shapes are per-shard inside shard_map: bytes == model's
    assert total == model["bytes_per_apply"], (total, model)
    assert model["bytes_per_permute"] == g.hrow * g.wb * 4


def test_weak_scaling_model_rows():
    """parallel/model.py builds a model row for every tuned winner; the
    published table (BASELINE.md) is a snapshot of these rows.  Traffic
    accounting must hold (dtype-aware) for every row; the published
    efficiency claim (> 0.9, halo < 100 us/step) is pinned for the 8
    upstream fixtures — extension-stencil winners (added to tuned.json
    by tuning/schedule_r5h.sh) only need the structural invariants."""
    import bench
    from drstencil_tpu.parallel.model import winner_rows

    rows = winner_rows(8)
    assert {m["name"] for m in rows} >= set(bench.ALL)
    for m in rows:
        assert m["bytes_per_apply"] == 2 * m["hrow"] * m["wb"] * m["itemsize"]
        assert 0.0 < m["weak_scaling_efficiency"] < 1.0
        if m["name"] in bench.ALL:
            assert 0.9 < m["weak_scaling_efficiency"], m
            assert m["halo_ms_per_step"] < 0.1, m  # < 100 us/step
