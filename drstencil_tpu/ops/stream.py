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
  inputs, so no extra pass touches the big buffers;
- thread coarsening (block/cyclic merge) is tile-shape selection; the
  reference's ``--prefetch`` double-buffering is automatic in the Pallas
  pipeline.

State buffers are stored *padded* along axis 0 (``hr`` zero rows below the
real rows, and enough above to keep every window in-bounds), which keeps
all index maps affine, and **flattened to 2D**: a 3D grid (L, M, N) is
held as (L, M·N) so z is the streamed axis and j/i shifts become lane
shifts by ``dj·N + di``.  The kernel then only ever manipulates 2D refs
(this Mosaic compiles 3D sub-block writes pathologically slowly).  In the
flat layout the j-frame is lane-contiguous and composited in-kernel; the
strided i-frame is restored outside via two dynamic_update_slices on a
free (L', M·N) → (L'·M, N) reshape view — ~2H/N extra traffic.

Rows are additionally **lane-padded** by ``pc`` junk lanes per side
(a whole multiple of N in 3D, keeping the reshape trick) so that every
tap's lane shift is a *static in-bounds slice* of the VMEM window rather
than a roll — shifts that are multiples of N (the dj·N part) land
128-aligned and are free views; jnp.roll with plane-sized amounts both
compiled pathologically (>10 min) and materializes copies.  Padding lanes
are never written and only feed frame outputs that the composite
overwrites.
"""

from __future__ import annotations

from dataclasses import dataclass
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
    """Padded flat-buffer geometry for the streaming kernel."""

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
    def width(self) -> int:
        """Flattened *real* lane width: N (2D) or M·N (3D)."""
        return int(np.prod(self.plane))

    @property
    def pc(self) -> int:
        """Junk lane padding per side: covers the largest tap lane shift,
        128-aligned; a multiple of N in 3D so the (rows, wb) buffer still
        reshapes to (rows·M', N) for the i-frame fixup."""
        if len(self.plane) == 1:
            return _round_up(self.halo, 128)
        return (self.halo + 1) * self.plane[-1]

    @property
    def wb(self) -> int:
        """Stored lane width: pc + width + pc."""
        return self.width + 2 * self.pc

    @property
    def rows(self) -> int:
        return self.dims[0]

    @property
    def window(self) -> int:
        """VMEM window rows per grid step (strip + halo above/below) — the
        analogue of the reference's shm ``Range`` (codegen.hpp:89)."""
        return self.tm + 2 * self.hr

    @property
    def face_width(self) -> int:
        """Lane width of the in-plane frame composited in-kernel: h lanes
        (2D) or h·N lanes (the 3D j-frame, lane-contiguous when flat)."""
        return self.halo * (self.plane[-1] if len(self.plane) == 2 else 1)


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
    """Strip height keeping the VMEM working set around 24 MB."""
    plane_elems = int(np.prod(dims[1:])) if len(dims) > 1 else 1
    budget = 24 * 1024 * 1024 // 4  # fp32 elements for window + out
    tm = budget // (2 * max(plane_elems, 1))
    tm = max(8, min(512, (tm // 8) * 8))
    return tm


def pad_state(x: np.ndarray, g: StreamGeometry) -> np.ndarray:
    """Embed a real-shaped array into the padded flat streaming layout."""
    out = np.zeros((g.rows_padded, g.wb), dtype=x.dtype)
    out[g.hr : g.hr + g.rows, g.pc : g.pc + g.width] = np.asarray(x).reshape(
        g.rows, g.width
    )
    return out


def unpad_state(x, g: StreamGeometry):
    return x[g.hr : g.hr + g.rows, g.pc : g.pc + g.width].reshape(g.dims)


def make_slabs(x: np.ndarray, g: StreamGeometry):
    """Frozen boundary-frame slabs for one ping-pong buffer.

    A buffer's frame never changes during the run (the reference's kernels
    never write cells within ``halo`` of any face), so the slabs are
    computed once from the initial state:

    - ``lo`` / ``hi``: the first/last H real rows, flattened plane;
    - ``face``: the in-plane lane-contiguous frame (columns in 2D, the
      j-frame in 3D), low face then high face, padded-row indexed;
    - 3D only, ``iframe``: the per-(row, j) i-frame as a (rows·M', 2H)
      table for the post-kernel fixup (M' includes the lane-pad
      pseudo-rows so the reshape view lines up).
    """
    h = g.halo
    xf = np.asarray(x).reshape(g.rows, g.width)
    xp = pad_state(xf, g)
    lo = np.ascontiguousarray(xf[:h])
    hi = np.ascontiguousarray(xf[-h:])
    fw = g.face_width
    real = xp[:, g.pc : g.pc + g.width]
    face = np.concatenate([real[:, :fw], real[:, g.width - fw :]], axis=1)
    if len(g.plane) == 1:
        return (lo, hi, face)
    n = g.plane[-1]
    v = xp.reshape(-1, n)
    iframe = np.concatenate([v[:, :h], v[:, n - h :]], axis=1)
    return (lo, hi, face, iframe)


def build_stream_kernel(an: Analysis, cfg: KernelConfig):
    """Build f(padded_src, dst_slabs) -> padded_dst applying the fused
    operator to the interior with dst's frozen frame composited in.

    Returns (f, geometry).  ``f`` is pure and jittable; dst is a fresh
    buffer (pair it with jit donation for in-place ping-pong).
    """
    g = make_geometry(an, cfg)
    h, hr, tm = g.halo, g.hr, g.tm
    W, pc, wb = g.width, g.pc, g.wb
    fw = g.face_width
    dtype = jnp.dtype(cfg.dtype)
    lane_n = g.plane[-1]

    # Each tap is a (row offset, flattened lane shift, coeff) triple; lane
    # shifts become static slices of the lane-padded window.  Sorted order
    # keeps fp32 summation identical to the native emitter's.
    taps = []
    for off, coe in sorted(an.fused.items()):
        s = off[1] if len(off) == 2 else off[1] * lane_n + off[2]
        taps.append((off[0], s, coe))
    taps.sort(key=lambda t: (t[1], t[0]))

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

    def kernel(a_ref, lo_ref, hi_ref, face_ref, o_ref, carry):
        i = pl.program_id(0)
        w = a_ref[...].astype(jnp.float32)

        # out rows [h, tm + h) of this strip: every tap is a static
        # (row, lane) slice of the window — lane starts pc+s are aligned
        # free views for the dj·N shifts, small relayouts for di
        ext = None
        for d, s, coe in taps:
            term = (
                jnp.asarray(coe, jnp.float32)
                * w[h + d : h + d + tm, pc + s : pc + s + W]
            )
            ext = term if ext is None else ext + term
        ext = ext.astype(dtype)

        # straddle carry: rows [0, h) come from the previous strip's work
        o_ref[0:h, pc : pc + W] = carry[...]
        o_ref[h:tm, pc : pc + W] = ext[0 : tm - h]
        carry[...] = ext[tm - h : tm]

        # frozen in-plane frame (columns / 3D j-frame), every strip
        o_ref[:, pc : pc + fw] = face_ref[:, 0:fw]
        o_ref[:, pc + W - fw : pc + W] = face_ref[:, fw : 2 * fw]

        # streaming-axis frame rows (static strip/offset, per-strip gate)
        @pl.when(i == lo_strip)
        def _():
            o_ref[lo_off : lo_off + h, pc : pc + W] = lo_ref[...]

        for strip, loc, src, ln in hi_splits:

            @pl.when(i == strip)
            def _(strip=strip, loc=loc, src=src, ln=ln):
                o_ref[loc : loc + ln, pc : pc + W] = hi_ref[src : src + ln]

    def win_map(i):
        return (i * tm, 0)

    def tile_map(i):
        return (i, 0)

    def const_map(i):
        return (0, 0)

    in_specs = [
        pl.BlockSpec(
            (pl.Element(g.window), pl.Element(wb)), win_map,
            memory_space=pltpu.VMEM,
        ),
        # lo/hi row slabs: grid-invariant constant blocks.  (A shapeless
        # full-array spec hangs this Mosaic build; an explicit block with
        # a constant index map compiles fine.)
        pl.BlockSpec((h, W), const_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, W), const_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, 2 * fw), tile_map, memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((tm, wb), tile_map, memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(g.n_strips,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((g.rows_padded, wb), dtype),
        scratch_shapes=[pltpu.VMEM((h, W), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * len(an.fused) * int(np.prod(g.dims)),
            bytes_accessed=2 * 4 * int(np.prod(g.dims)),
            transcendentals=0,
        ),
        interpret=cfg.interpret,
    )

    if len(g.plane) == 1:

        def f(src_padded, dst_slabs):
            lo, hi, face = dst_slabs
            return call(src_padded, lo, hi, face)

    else:
        n = g.plane[-1]
        rows_total = g.rows_padded * g.wb // n

        def f(src_padded, dst_slabs):
            lo, hi, face, iframe = dst_slabs
            out = call(src_padded, lo, hi, face)
            # strided i-frame fixup on a contiguity-preserving reshape
            # view: touches 2h/n of the buffer, in place under donation
            v = out.reshape(rows_total, n)
            v = jax.lax.dynamic_update_slice(v, iframe[:, :h], (0, 0))
            v = jax.lax.dynamic_update_slice(v, iframe[:, h:], (0, n - h))
            return v.reshape(g.rows_padded, g.wb)

    return f, g
