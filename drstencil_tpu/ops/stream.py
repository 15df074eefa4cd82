"""The streaming Pallas stencil kernel — the framework's flagship.

TPU-native redesign of the reference's streaming CUDA kernel
(codegen.hpp:143-544 / codegen_2d.hpp:149-454).  Mapping:

- the reference streams one axis per thread block, holding a revolving
  window of ``Range`` planes in shared memory; here the Pallas grid walks
  the streaming axis (axis 0) in ``tm``-row strips, and each grid step's
  VMEM window is the strip plus ``2·hr`` halo rows fetched via an
  overlapping *Element* input BlockSpec (affine in-bounds index map —
  that is what this Mosaic supports);
- the reference's forward/backward atomicAdd accumulation (needed because
  a CUDA block cannot write neighbours' planes) becomes a *straddle
  carry*: each grid step computes the rows of the NEXT strip that straddle
  the window boundary and parks them in VMEM scratch, which persists
  across the sequential TPU grid — exactly one writer per output row, no
  atomics;
- the reference never writes the boundary frame (fixed Dirichlet cells);
  here the frozen frame values are composited in-kernel from tiny slab
  inputs, so no extra XLA pass touches the big buffers;
- thread coarsening (block/cyclic merge) is tile-shape selection; the
  reference's ``--prefetch`` double-buffering is automatic in the Pallas
  pipeline.

State buffers are stored *padded* along axis 0 (``hr`` zero rows below the
real rows, and enough above to keep every window in-bounds), which keeps
all index maps affine.  3D grids (L, M, N) use the same kernel with plane
shape (M, N): z is the streamed axis, j/i shifts are in-plane rolls whose
wrap-around only corrupts frame cells that the slab composite overwrites.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drstencil_tpu.ir.passes import Analysis
from drstencil_tpu.ops.config import KernelConfig


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass(frozen=True)
class StreamGeometry:
    """Padded-buffer geometry for the streaming kernel."""

    dims: Tuple[int, ...]   # real dims, axis 0 = streaming
    halo: int               # fused order H
    hr: int                 # halo rounded up so strips stay 8-aligned
    tm: int                 # rows per strip
    n_strips: int
    rows_padded: int

    @property
    def plane(self) -> Tuple[int, ...]:
        return self.dims[1:]

    @property
    def rows(self) -> int:
        return self.dims[0]

    @property
    def window(self) -> int:
        """VMEM window rows per grid step (strip + halo above/below) — the
        analogue of the reference's shm ``Range`` (codegen.hpp:89)."""
        return self.tm + 2 * self.hr


def make_geometry(an: Analysis, cfg: KernelConfig) -> StreamGeometry:
    dims = an.spec.dims
    h = an.halo
    hr = _round_up(max(h, 1), 4)
    tm = cfg.tm or default_tm(dims)
    if tm % 8 != 0:
        raise ValueError(f"tm must be a multiple of 8, got {tm}")
    if tm <= hr:
        raise ValueError(f"tm={tm} must exceed aligned halo hr={hr}")
    n = -(-(hr + dims[0]) // tm)
    rows_padded = n * tm + 2 * hr
    return StreamGeometry(
        dims=dims, halo=h, hr=hr, tm=tm, n_strips=n, rows_padded=rows_padded
    )


def default_tm(dims: Tuple[int, ...]) -> int:
    """Strip height keeping the VMEM working set around 16–32 MB."""
    plane_elems = int(np.prod(dims[1:])) if len(dims) > 1 else 1
    budget = 24 * 1024 * 1024 // 4  # fp32 elements for window + out
    tm = budget // (2 * max(plane_elems, 1))
    tm = max(8, min(512, (tm // 8) * 8))
    return tm


def pad_state(x: np.ndarray, g: StreamGeometry) -> np.ndarray:
    """Embed a real-shaped array into the padded streaming layout."""
    out = np.zeros((g.rows_padded, *g.plane), dtype=x.dtype)
    out[g.hr : g.hr + g.rows] = x
    return out


def unpad_state(x, g: StreamGeometry):
    return x[g.hr : g.hr + g.rows]


def make_slabs(x: np.ndarray, g: StreamGeometry):
    """Frozen boundary-frame slabs for one ping-pong buffer.

    The frame of a buffer never changes during the run (the reference's
    kernels never write cells within ``halo`` of any face), so the slabs
    are computed once from the initial state:

    - ``lo`` / ``hi``: the first/last H real rows, full plane;
    - per in-plane axis a: a (rows_padded, ..., 2H, ...) slab holding the
      low H and high H faces along that axis.
    """
    h = g.halo
    xp = pad_state(x, g)
    slabs = [np.ascontiguousarray(x[:h]), np.ascontiguousarray(x[-h:])]
    for a in range(len(g.plane)):
        lo = np.take(xp, np.arange(0, h), axis=1 + a)
        hi = np.take(xp, np.arange(g.plane[a] - h, g.plane[a]), axis=1 + a)
        slabs.append(np.concatenate([lo, hi], axis=1 + a))
    return tuple(slabs)


def build_stream_kernel(an: Analysis, cfg: KernelConfig):
    """Build f(padded_src, *dst_slabs) -> padded_dst applying the fused
    operator to the interior with dst's frozen frame composited in.

    Returns (f, geometry).  ``f`` is pure and jittable; dst is a fresh
    buffer (pair it with jit donation for in-place ping-pong).
    """
    g = make_geometry(an, cfg)
    h, hr, tm = g.halo, g.hr, g.tm
    nd_plane = len(g.plane)
    dtype = jnp.dtype(cfg.dtype)

    # Group fused taps by in-plane shift so each distinct shift rolls the
    # window once; the streaming-axis offset becomes a row slice.
    groups: dict[Tuple[int, ...], list] = {}
    for off, coe in sorted(an.fused.items()):
        groups.setdefault(off[1:], []).append((off[0], coe))

    # Static row-frame placement: which strip holds the low/high H real
    # rows, and at which in-strip offset (padded row = real row + hr).
    lo_strip, lo_off = divmod(hr, tm)
    hi_start = hr + g.rows - h
    hi_strip, hi_off = divmod(hi_start, tm)
    hi_splits = []  # (strip, local_start, slab_start, length)
    if hi_off + h <= tm:
        hi_splits.append((hi_strip, hi_off, 0, h))
    else:
        first = tm - hi_off
        hi_splits.append((hi_strip, hi_off, 0, first))
        hi_splits.append((hi_strip + 1, 0, first, h - first))

    def kernel(a_ref, lo_ref, hi_ref, *rest):
        face_refs = rest[:nd_plane]
        o_ref = rest[nd_plane]
        carry = rest[nd_plane + 1]
        i = pl.program_id(0)

        w = a_ref[...].astype(jnp.float32)

        # out rows [h, tm + h) of this strip, all taps (sorted group order —
        # keeps fp32 summation order identical to the native emitter's)
        ext = None
        for shift, rows in sorted(groups.items()):
            ws = w
            for a, s in enumerate(shift):
                if s:
                    ws = jnp.roll(ws, -s, axis=1 + a)
            for d, coe in rows:
                term = jnp.asarray(coe, jnp.float32) * ws[h + d : h + d + tm]
                ext = term if ext is None else ext + term
        ext = ext.astype(dtype)

        # straddle carry: rows [0, h) come from the previous strip's work
        o_ref[0:h] = carry[...]
        o_ref[h:tm] = ext[0 : tm - h]
        carry[...] = ext[tm - h : tm]

        # frozen frame composite — in-plane faces every strip
        for a in range(nd_plane):
            f_ref = face_refs[a]
            idx_lo = tuple(
                [slice(None)]
                + [slice(0, h) if b == a else slice(None) for b in range(nd_plane)]
            )
            idx_hi_src = tuple(
                [slice(None)]
                + [slice(h, 2 * h) if b == a else slice(None) for b in range(nd_plane)]
            )
            idx_hi_dst = tuple(
                [slice(None)]
                + [
                    slice(g.plane[b] - h, g.plane[b]) if b == a else slice(None)
                    for b in range(nd_plane)
                ]
            )
            o_ref[idx_lo] = f_ref[idx_lo]
            o_ref[idx_hi_dst] = f_ref[idx_hi_src]

        # streaming-axis frame rows (static strip/offset, per-strip gate)
        @pl.when(i == lo_strip)
        def _():
            o_ref[lo_off : lo_off + h] = lo_ref[...]

        for strip, loc, src, ln in hi_splits:

            @pl.when(i == strip)
            def _(strip=strip, loc=loc, src=src, ln=ln):
                o_ref[loc : loc + ln] = hi_ref[src : src + ln]

    window_shape = (pl.Element(g.window), *(pl.Element(p) for p in g.plane))

    def win_map(i):
        return (i * tm,) + (0,) * nd_plane

    def tile_map(i):
        return (i,) + (0,) * nd_plane

    def const_map(i):
        return (0,) * (1 + nd_plane)

    in_specs = [
        pl.BlockSpec(window_shape, win_map, memory_space=pltpu.VMEM),
        # lo/hi row slabs: grid-invariant constant blocks.  (A shapeless
        # full-array spec hangs this Mosaic build for 3D operands; an
        # explicit block with a constant index map compiles fine and the
        # pipeline hoists the fetch.)
        pl.BlockSpec((h, *g.plane), const_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, *g.plane), const_map, memory_space=pltpu.VMEM),
    ]
    for a in range(nd_plane):
        fdims = tuple(2 * h if b == a else g.plane[b] for b in range(nd_plane))
        in_specs.append(
            pl.BlockSpec((tm, *fdims), tile_map, memory_space=pltpu.VMEM)
        )

    out_spec = pl.BlockSpec((tm, *g.plane), tile_map, memory_space=pltpu.VMEM)

    vmem_bytes = 4 * (
        2 * g.window * int(np.prod(g.plane)) + 2 * tm * int(np.prod(g.plane))
    ) + 4 * 4 * h * int(np.prod(g.plane))

    call = pl.pallas_call(
        kernel,
        grid=(g.n_strips,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((g.rows_padded, *g.plane), dtype),
        scratch_shapes=[pltpu.VMEM((h, *g.plane), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(128 * 1024 * 1024, max(vmem_bytes * 2, 1 << 20)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * len(an.fused) * int(np.prod(g.dims)),
            bytes_accessed=2 * 4 * int(np.prod(g.dims)),
            transcendentals=0,
        ),
        interpret=cfg.interpret,
    )

    def f(src_padded, dst_slabs):
        lo, hi, *faces = dst_slabs
        return call(src_padded, lo, hi, *faces)

    return f, g
