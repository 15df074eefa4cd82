"""The streaming Pallas kernel under shard_map — weak-scaling halo
overhead is sub-1% per the traffic model below (`halo_traffic_model`).

The single-chip flagship kernel (ops/stream.py) composed with spatial
domain decomposition (parallel/halo.py): the grid's leading axis is
sharded over a 1-D mesh axis, each device holds its slab in the kernel's
padded tall layout, and every application

1. exchanges ``hrow`` padded rows with mesh neighbours via
   ``jax.lax.ppermute`` (the collective rides the ICI ring) directly into
   the layout's pad rows — the tall layout makes 2D and 3D identical
   here (a 3D halo of h planes + h rows IS hrow tall-rows);
2. runs the UNMODIFIED streaming kernel per shard with in-kernel row-frame
   freezing disabled (``build_stream_kernel(..., row_frame=False)``) —
   interior shards compute their edge rows from the received halo;
3. restores the global Dirichlet row frame on the two edge shards only,
   via branch-free slab selects on the mesh index.

The reference is strictly single-GPU (SURVEY.md §2: CUDA_VISIBLE_DEVICES=1
pins one device, compile_run.sh:5); this is the TPU-native multi-chip
extension with the production kernel, not the XLA fallback of halo.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from drstencil_tpu.ir.passes import Analysis, analyze
from drstencil_tpu.ir.spec import StencilSpec
from drstencil_tpu.ops import stream as stream_mod
from drstencil_tpu.ops.config import KernelConfig


def local_analysis(spec: StencilSpec, cfg: KernelConfig,
                   n_shards: int) -> Analysis:
    """Analysis of the shard-local problem (leading axis divided)."""
    dims = spec.dims
    if dims[0] % n_shards:
        raise ValueError(
            f"leading axis {dims[0]} not divisible by {n_shards} shards"
        )
    local_dims = (dims[0] // n_shards,) + dims[1:]
    local = StencilSpec(spec.name, local_dims, spec.iterations, spec.taps)
    an = analyze(local, step=cfg.step, distance=cfg.distance,
                 merge_forward=cfg.merge_forward)
    return an


def build_sharded_stream(spec: StencilSpec, cfg: KernelConfig, mesh: Mesh,
                         axis_name: str = "x"):
    """Build (apply, geometry, sharding) for the sharded streaming kernel.

    ``apply(a, b, face_b, jframe_b) -> b'`` operates on globally-sharded
    stacked padded buffers of shape (n_shards * rows_padded_local, wb):
    shard k holds the padded tall buffer of its slab of the leading axis.
    ``face_b`` (and ``jframe_b`` for 3D) are b's frozen frame slabs,
    sharded the same way.  The returned b' has the fused operator applied
    to the global interior and b's global frame preserved — identical
    semantics to the single-chip kernel (and to halo.make_sharded_apply).
    """
    n_shards = mesh.shape[axis_name]
    an = local_analysis(spec, cfg, n_shards)
    f, g = stream_mod.build_stream_kernel(an, cfg, row_frame=False)
    hrow, h, fr = g.hrow, g.halo, g.frame_rows
    if g.rows < hrow:
        raise ValueError(f"local slab {g.rows} rows < row halo {hrow}")
    is3d = len(g.dims) == 3

    def local_apply(a, b, face_b, *jframe_b):
        # a, b: (rows_padded, wb) local padded tall buffers
        idx = jax.lax.axis_index(axis_name)
        n = n_shards
        # halo exchange into the pad rows: my rows [pr-hrow, pr) receive
        # the previous shard's top real rows; rows [pr+rows, pr+rows+hrow)
        # the next shard's bottom real rows.  Edge shards receive zeros
        # (matching the single-chip zero padding).
        bot = a[g.pr : g.pr + hrow]
        top = a[g.pr + g.rows - hrow : g.pr + g.rows]
        from_prev = jax.lax.ppermute(
            top, axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        from_next = jax.lax.ppermute(
            bot, axis_name, [(i + 1, i) for i in range(n - 1)]
        )
        a = jax.lax.dynamic_update_slice(a, from_prev, (g.pr - hrow, 0))
        a = jax.lax.dynamic_update_slice(a, from_next, (g.pr + g.rows, 0))

        slabs = (face_b,) + tuple(jframe_b)
        out = f(a, slabs)

        # global Dirichlet row frame on the edge shards only (branch-free
        # tiny-slab selects; b's current values ARE the frozen frame)
        lo_sel = jnp.where(idx == 0, b[g.pr : g.pr + fr],
                           out[g.pr : g.pr + fr])
        hi_sel = jnp.where(idx == n - 1,
                           b[g.pr + g.rows - fr : g.pr + g.rows],
                           out[g.pr + g.rows - fr : g.pr + g.rows])
        out = jax.lax.dynamic_update_slice(out, lo_sel, (g.pr, 0))
        out = jax.lax.dynamic_update_slice(
            out, hi_sel, (g.pr + g.rows - fr, 0)
        )
        return out

    spec_rows = P(axis_name, None)
    # check_rep/vma off: pallas_call's out_shape carries no cross-shard
    # variance annotation, tripping the shard_map replication checker
    apply_fn = shard_map(
        local_apply, mesh=mesh,
        in_specs=(spec_rows,) * (3 + (1 if is3d else 0)),
        out_specs=spec_rows, check_vma=False,
    )
    return apply_fn, g, NamedSharding(mesh, spec_rows)


def shard_state(x: np.ndarray, g, n_shards: int):
    """Split a real global array into stacked per-shard padded buffers +
    frame slabs: returns (stacked_padded, stacked_face[, stacked_jframe])
    as numpy arrays of shape (n_shards * per_shard, ...)."""
    dims = (n_shards * g.dims[0],) + tuple(g.dims[1:])
    x = np.asarray(x).reshape(dims)
    blocks = np.split(x, n_shards, axis=0)
    padded, faces, jframes = [], [], []
    for blk in blocks:
        padded.append(stream_mod.pad_state(blk, g))
        slabs = stream_mod.make_slabs(blk, g)
        faces.append(slabs[2])
        if len(slabs) == 4:
            jframes.append(slabs[3])
    out = [np.concatenate(padded), np.concatenate(faces)]
    if jframes:
        out.append(np.concatenate(jframes))
    return tuple(out)


def unshard_state(stacked, g, n_shards: int) -> np.ndarray:
    """Inverse of shard_state's padded buffer: real global array."""
    stacked = np.asarray(stacked)
    blocks = np.split(stacked, n_shards, axis=0)
    real = [stream_mod.unpad_state(b, g) for b in blocks]
    return np.concatenate(real, axis=0)


# TPU v5e ICI: one-way bandwidth per link ≈ 4.5e10 B/s and ~1 us per-hop
# dispatch latency (public scaling-book figures for v5e; a 1-D sharding
# uses one ring link per neighbor, both directions concurrently usable).
ICI_BW_BYTES_PER_S = 4.5e10
ICI_HOP_LATENCY_S = 1.0e-6


def halo_traffic_model(g, step: int, ms_per_step_single: float | None = None,
                       itemsize: int = 4, ici_bw: float = ICI_BW_BYTES_PER_S,
                       latency_s: float = ICI_HOP_LATENCY_S) -> dict:
    """ICI cost model of the halo exchange in :func:`build_sharded_stream`.

    Exactly what the jaxpr does (asserted byte-for-byte by
    ``tests/test_parallel.py::test_halo_traffic_accounting``): per fused
    apply (= ``step`` plain timesteps), each shard sends its top real
    ``hrow`` tall-rows forward and its bottom ``hrow`` backward — two
    ``ppermute`` collectives of ``hrow * wb * itemsize`` bytes each over
    one ICI hop.  The tall layout makes this the entire inter-chip
    traffic for both 2D and 3D (a 3D halo of h planes + h row-slabs IS
    ``hrow`` tall-rows); there are no other collectives in the step.

    Returns the per-apply byte/time accounting plus, when the measured
    single-chip ``ms_per_step_single`` is given, the predicted
    weak-scaling efficiency  t_comp / (t_comp + t_halo)  — each chip
    keeps the full single-chip problem, so per-step compute time is
    unchanged and the only addition is the (unoverlapped, worst-case
    serial) exchange.
    """
    bytes_per_permute = g.hrow * g.wb * itemsize
    bytes_per_apply = 2 * bytes_per_permute       # fwd + bwd halves
    t_halo_s = 2 * (bytes_per_permute / ici_bw + latency_s)
    out = {
        "hrow": g.hrow, "wb": g.wb, "step": step,
        "bytes_per_permute": bytes_per_permute,
        "bytes_per_apply": bytes_per_apply,
        "halo_ms_per_apply": t_halo_s * 1e3,
        "halo_ms_per_step": t_halo_s * 1e3 / step,
    }
    if ms_per_step_single is not None:
        out["ms_per_step_single"] = ms_per_step_single
        out["weak_scaling_efficiency"] = ms_per_step_single / (
            ms_per_step_single + out["halo_ms_per_step"])
    return out


def sharded_stream_pair(spec: StencilSpec, cfg: KernelConfig, mesh: Mesh,
                        axis_name: str = "x"):
    """jitted ping-pong pair (a, b, slabs_a, slabs_b) -> (a', b') on the
    sharded padded state — the multi-chip analogue of
    runner.StencilProgram._pair."""
    apply_fn, g, sharding = build_sharded_stream(spec, cfg, mesh, axis_name)

    @partial(jax.jit, donate_argnums=(0, 1))
    def pair(a, b, slabs_a, slabs_b):
        b = apply_fn(a, b, *slabs_b)
        a = apply_fn(b, a, *slabs_a)
        return a, b

    return pair, g, sharding
