"""Spatial domain decomposition across a TPU mesh with halo exchange.

The reference is strictly single-GPU (SURVEY.md §2: CUDA_VISIBLE_DEVICES=1,
no NCCL/MPI anywhere); this module is the TPU-native multi-chip extension:
the grid's streaming axis is sharded over a 1-D ``jax.sharding.Mesh`` axis,
each device owns a contiguous slab, and every application exchanges
``halo``-row slabs with its mesh neighbours over ICI via
``jax.lax.ppermute`` inside ``shard_map`` — the collective rides the ICI
ring; no host involvement.

Semantics identical to the single-chip path: one launch applies the fused
operator to the *global* interior; the global boundary frame is frozen.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from drstencil_tpu.ir.passes import Analysis


def _exchange_rows(x, h: int, axis_name: str):
    """Send my top h rows up / bottom h rows down the mesh ring; returns
    (from_below, from_above) with zeros at the global edges."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # from_below: my lower neighbour's last h rows (perm i -> i+1)
    up_perm = [(i, i + 1) for i in range(n - 1)]
    dn_perm = [(i + 1, i) for i in range(n - 1)]
    from_below = jax.lax.ppermute(x[-h:], axis_name, up_perm)
    from_above = jax.lax.ppermute(x[:h], axis_name, dn_perm)
    # shards at the global edges receive zeros from ppermute already
    # (un-permuted participants get zeros by XLA semantics)
    return from_below, from_above


def make_sharded_apply(an: Analysis, mesh: Mesh, axis_name: str = "x"):
    """Build f(src, dst) -> dst' operating on globally-sharded arrays.

    Both arrays are sharded along axis 0 over ``axis_name``; the fused
    operator is applied to the global interior; dst's global boundary
    frame is preserved.  The halo exchange moves 2·h rows per device pair
    per application.
    """
    taps = sorted(an.fused.items())
    h = an.halo
    dims = an.spec.dims
    nd = len(dims)
    n_shards = mesh.shape[axis_name]
    if dims[0] % n_shards != 0:
        raise ValueError(
            f"streaming axis {dims[0]} not divisible by mesh axis {n_shards}"
        )
    local_rows = dims[0] // n_shards
    if local_rows < h:
        raise ValueError(f"local slab {local_rows} rows < halo {h}")

    def local_apply(src, dst):
        # src, dst: (local_rows, *dims[1:])
        below, above = _exchange_rows(src, h, axis_name)
        ext = jnp.concatenate([below, src, above], axis=0)
        # stencil everywhere on the local slab (rows offset +h in ext)
        acc = None
        inner = (local_rows,) + tuple(d - 2 * h for d in dims[1:])
        for off, coe in taps:
            start = (h + off[0],) + tuple(h + off[a] for a in range(1, nd))
            sl = jax.lax.slice(
                ext, start, tuple(s + i for s, i in zip(start, inner))
            )
            term = jnp.asarray(coe, src.dtype) * sl
            acc = term if acc is None else acc + term
        # acc covers local rows [0, local_rows), inner cols
        new = jax.lax.dynamic_update_slice(
            dst, acc, (0,) + (h,) * (nd - 1)
        )
        # freeze the global top/bottom frame on the edge shards
        idx = jax.lax.axis_index(axis_name)
        row = jax.lax.broadcasted_iota(jnp.int32, new.shape, 0)
        grow = row + idx * local_rows
        frame = (grow < h) | (grow >= dims[0] - h)
        return jnp.where(frame, dst, new)

    spec = P(axis_name, *([None] * (nd - 1)))
    f = shard_map(
        local_apply, mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )
    return f, NamedSharding(mesh, spec)


def make_mesh(n_devices: int, devices: Sequence | None = None,
              axis_name: str = "x") -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()[:n_devices]
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis_name,))


def make_mesh_2d(shape: tuple, devices: Sequence | None = None,
                 axis_names=("x", "y")) -> Mesh:
    n = shape[0] * shape[1]
    devs = list(devices) if devices is not None else jax.devices()[:n]
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]).reshape(shape), tuple(axis_names))


def make_sharded_apply_2d(an: Analysis, mesh: Mesh,
                          axis_names=("x", "y")):
    """2-axis spatial decomposition: axis 0 over mesh axis 0, axis 1 over
    mesh axis 1, with halo exchanges along both (two ppermute phases per
    application, each riding its ICI ring)."""
    taps = sorted(an.fused.items())
    h = an.halo
    dims = an.spec.dims
    nd = len(dims)
    ax, ay = axis_names
    nx, ny = mesh.shape[ax], mesh.shape[ay]
    if dims[0] % nx or dims[1] % ny:
        raise ValueError(
            f"grid {dims[:2]} not divisible by mesh {nx}x{ny}"
        )
    lx, ly = dims[0] // nx, dims[1] // ny
    if lx < h or ly < h:
        raise ValueError("local slab smaller than the halo")

    def local_apply(src, dst):
        below, above = _exchange_rows(src, h, ax)
        ext = jnp.concatenate([below, src, above], axis=0)
        # exchange along axis 1: swap into axis-0 position for the helper
        s1 = jnp.moveaxis(ext, 1, 0)
        left, right = _exchange_rows(s1, h, ay)
        ext = jnp.moveaxis(
            jnp.concatenate([left, s1, right], axis=0), 0, 1
        )
        acc = None
        inner = (lx, ly) + tuple(d - 2 * h for d in dims[2:])
        for off, coe in taps:
            start = (h + off[0], h + off[1]) + tuple(
                h + off[a] for a in range(2, nd)
            )
            sl = jax.lax.slice(
                ext, start, tuple(s + i for s, i in zip(start, inner))
            )
            term = jnp.asarray(coe, src.dtype) * sl
            acc = term if acc is None else acc + term
        new = jax.lax.dynamic_update_slice(
            dst, acc, (0, 0) + (h,) * (nd - 2)
        )
        ix = jax.lax.axis_index(ax)
        iy = jax.lax.axis_index(ay)
        row = jax.lax.broadcasted_iota(jnp.int32, new.shape, 0) + ix * lx
        col = jax.lax.broadcasted_iota(jnp.int32, new.shape, 1) + iy * ly
        frame = (
            (row < h) | (row >= dims[0] - h)
            | (col < h) | (col >= dims[1] - h)
        )
        return jnp.where(frame, dst, new)

    spec = P(ax, ay, *([None] * (nd - 2)))
    f = shard_map(
        local_apply, mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )
    return f, NamedSharding(mesh, spec)


def sharded_pair(an: Analysis, mesh: Mesh, axis_name: str = "x"):
    """jitted (a, b) -> (a', b') ping-pong pair on the sharded state."""
    f, sharding = make_sharded_apply(an, mesh, axis_name)

    @partial(jax.jit, donate_argnums=(0, 1))
    def pair(a, b):
        b = f(a, b)
        a = f(b, a)
        return a, b

    return pair, sharding
