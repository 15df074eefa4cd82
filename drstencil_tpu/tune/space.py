"""Autotuner search space + validity filtering.

The analogue of the reference tuner's config enumeration and FilterParams
(tuning.py:13-47, 124-139), with the GPU resource model replaced by a VMEM
budget model:

- ``step``/``dist`` constraints are the reference's: (step-1)*order <=
  dist <= step*order (tuning.py:24-25) — enforced implicitly by running
  the partition and catching "No data to reuse";
- shared-memory-per-block budget (tuning.py:16-21) becomes a VMEM bytes
  estimate: double-buffered window + out tile + slabs must fit;
- thread-budget / halo-coverage checks become tile-shape validity
  (tm multiple of 8, tm > aligned halo).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from drstencil_tpu.ir.passes import AnalysisError, analyze
from drstencil_tpu.ir.spec import StencilSpec
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops import stream as stream_mod

# The kernel runs under vmem_limit_bytes=128MB; the estimate below is
# conservative (3x frame slabs where one is headroom, both pipeline
# buffers counted full), so admit configs up to 124MB and let the
# tuner's per-config gate skip-and-log the genuinely-infeasible tail
# (Mosaic rejects VMEM overflow at lowering).  The 100MB round-2
# budget hid the fp32 trap winners' next-door tile sizes on the 3D
# stencils (est 120.3MB for fu4_tm6160) while their bf16 twins
# measured and won their families.
VMEM_BUDGET_BYTES = 124 * 1024 * 1024


@dataclass(frozen=True)
class Candidate:
    cfg: KernelConfig
    vmem_bytes: int
    window: int


def vmem_estimate(spec: StencilSpec, cfg: KernelConfig) -> Optional[Candidate]:
    """VMEM bytes for the streaming kernel, or None if the config is
    invalid for this stencil (the FilterParams role)."""
    try:
        an = analyze(spec, step=cfg.step, distance=cfg.distance,
                     merge_forward=cfg.merge_forward)
    except AnalysisError:
        return None
    try:
        g = stream_mod.make_geometry(an, cfg)
    except ValueError:
        return None
    item = np.dtype(cfg.dtype).itemsize
    bytes_ = item * (
        2 * g.window * g.wb           # double-buffered input window
        + 2 * g.tm * g.wb             # double-buffered out tile
        + 3 * g.frame_rows * g.wb     # lo/hi slabs + headroom
        + g.hrow * g.lanes            # straddle carry
    )
    if cfg.jfix == "kernel":
        bytes_ += item * (g.rows_padded // g.mid) * 8 * g.wb  # jf const slab
    # level/factor scratch buffers are always fp32 in the kernel
    # (accumulation dtype), hence the literal 4 rather than `item`
    if cfg.factor:
        bytes_ += 4 * g.window * g.wb * min(2 * cfg.step - 1, 3)
    elif cfg.trapezoid and cfg.step > 1 and not cfg.vfuse:
        lv = stream_mod.n_levels(an, cfg)
        bytes_ += 4 * g.window * g.wb * min(lv - 1, 2)  # level scratch
    if bytes_ > VMEM_BUDGET_BYTES:
        return None
    return Candidate(cfg=cfg, vmem_bytes=int(bytes_), window=g.window)


def default_space(spec: StencilSpec) -> Iterator[Candidate]:
    """Enumerate valid candidates for one stencil (streaming variants with
    step/dist/tile sweeps, plus the XLA variant per step as a baseline)."""
    from drstencil_tpu.ir.passes import (default_distance, fuse, order_of,
                                         partition)

    is3d = spec.ndim == 3
    # trapezoid keeps per-step FLOPs flat while traffic/step falls as
    # 1/step, so deep fusion keeps winning until compute- or VMEM-bound
    steps = (1, 2, 3, 4, 5, 6, 8)
    seen = set()
    base_order = order_of(spec.taps)
    for step in steps:
        # Distance: auto (0) when the default partition works.  The
        # generated kernel is distance-invariant (the haloed tile lives
        # whole in VMEM; distance only shapes the partition metadata),
        # but analyze() keeps the reference's hard "No data to reuse"
        # error — which at the default distance rejects pure-diagonal
        # stencils at odd steps (3d9pt_cross fu3).  The reference tuner
        # handles exactly this by sweeping --dist over
        # [(step-1)*order, step*order] (tuning.py:24-25); mirror that as
        # a fallback to the largest valid distance in the range, so odd
        # steps stay in the space with one representative (the program
        # is identical for every valid distance).  Only partition()
        # depends on the distance, so fuse once per step and probe the
        # candidates against the partition directly (the fused-tap
        # convolution is the expensive part at deep steps).
        distance = 0
        fused = fuse(spec.taps, step)
        try:
            partition(fused, default_distance(fused))
        except AnalysisError:
            lo = max(1, (step - 1) * base_order)
            for d in range(step * base_order, lo - 1, -1):
                try:
                    partition(fused, d)
                    distance = d
                    break
                except AnalysisError:
                    continue
            else:
                continue  # no valid distance at this step (reference parity)
        if is3d:
            # tall layout: tm must exceed the fused row halo h*M + h
            hrow = step * base_order * spec.dims[1] + step * base_order
            tms = tuple(
                -(-k * hrow // 8) * 8 for k in (2, 3, 4, 6, 8, 12, 16, 24)
            )
            chs = (None, "tm/2", "tm/4")
        else:
            # 320-448 matter for deep trapezoids (halo refetch amortizes
            # with tm while tm=512 windows start timing out in Mosaic)
            tms = (64, 96, 128, 160, 256, 320, 384, 448, 512)
            # accumulation chunk: smaller chunks keep temporaries
            # register-resident (measured best for wide stencils; deep
            # trapezoids prefer 16-32 — fewer fori iterations)
            chs = (None, 8, 16, 24, 32)
        # NOTE: the reference also sweeps --dist, which shapes its
        # forward/backward split and shm Range; our kernel owns the whole
        # haloed tile in VMEM, so distance is analysis-only metadata and
        # never changes the generated program — keep it at auto (0).
        lane_modes = (None,) if is3d else ("roll", "slice")
        # coefficient fusion blows up taps ~quadratically — past step 3,
        # or past ~64 fused taps (Mosaic compiles of huge unrolled tap
        # sums run for many minutes and block even SIGALRM), only the
        # trapezoid is worth measuring
        try:
            n_fused = len(fuse(spec.taps, step))
        except Exception:
            n_fused = 1 << 30
        if step == 1:
            traps = (False,)
        elif step <= 3 and n_fused <= 64:
            traps = (False, True)
        else:
            traps = (True,)
        for tm, lm, trap, ch in itertools.product(tms, lane_modes, traps,
                                                  chs):
            if isinstance(ch, str):  # tm-derived: "tm/2", "tm/4"
                ch = tm // int(ch.split("/")[1]) // 8 * 8
                if ch < 8:
                    continue
            if ch is not None and tm % ch:
                continue
            # value-fused trapezoid (cfg.vfuse): the scratch round-trip
            # between levels disappears — sweep it alongside the scratch
            # path wherever it is legal (trapezoid, roll mode, step < 5).
            # Small chunks are excluded: chunks × levels unroll into the
            # kernel text (a tm512/ch8/fu3 candidate = 192 chunk blocks,
            # multi-minute Mosaic compile) and small ch maximizes the
            # overlap recompute vfuse pays — ch >= 32 or auto only.
            # trapezoid level granularity (cfg.block): levels apply the
            # block-step coefficient-fused operator — halves (b2) the
            # per-level machinery/scratch that bounds the light stencils.
            # Gate the per-level fused tap count at the SAME 64-tap bound
            # as the coefficient-fusion gate above: the 81-tap b2-fused
            # 2d25pt_box levels measured 870s-40min Mosaic compiles (r4f)
            # for configs that were 1.39x slower than the trapezoid
            # winner anyway.
            blocks = [1]
            # 3D block-fused levels are excluded from the space: the
            # b-fused 3D operator gains diagonal taps whose row×lane
            # shift product unrolls into a kernel Mosaic chews on for
            # 30+ min immune to SIGALRM (observed r4f: the first
            # 3d7pt_star stream_fu*_trap_b* candidate wedged the sweep;
            # the 2D b2/b3 families all measured 1.4-2x SLOWER than
            # their trapezoid winners anyway, so the family is priced).
            if trap and not is3d:
                for b in (2, 3):
                    if step % b or b >= step:
                        continue
                    # High-order b-levels are a second compile-sink class
                    # (r5k): the b-fused per-level operator has order
                    # b*base_order, and at b*base_order >= 6 Mosaic chews
                    # 40min-1.8h per config immune to SIGALRM — measured
                    # on the radius-3 2d13pt_star (fu4_tm256_ch8_b2
                    # 2474s, fu8_tm384_ch16_b2 6412s) at tm values the
                    # r5h tm>=448 gate doesn't reach.  Radius-2 b2
                    # (b*base_order = 4) compiles fine (r4f swept it on
                    # 2d5pt_cross/2d9pt_box; all measured, all slower).
                    if b * base_order >= 6:
                        continue
                    try:
                        if len(fuse(spec.taps, b)) <= 64:
                            blocks.append(b)
                    except Exception:
                        pass
            for blk in blocks:
                # vfuse legality follows LEVELS (step/block), see stream.
                # 3D vfuse is excluded from the space: the family is
                # fully priced and loses everywhere it compiles (ten+
                # ledger entries, best 1.12 vs winners 0.83-0.90 — the
                # chunk-overlap recompute scales with the 3D row halo
                # h*M+h), and at window >= ~10k rows it becomes a Mosaic
                # hang class (fu4_tm6160_trap_vf: 420s timeout, r5c) —
                # same treatment as 3D block-fused levels above.
                lv = step // blk
                # Unrolled-trapezoid compile-sink gate (r5h): below
                # DEEP_LEVELS the trapezoid levels unroll into the kernel
                # text, and at tm >= 448 with >= 20 unrolled tap-rows
                # (levels x (2*b*order + 1)) Mosaic chews 420s-24min per
                # config, SIGALRM-deferred — measured sinks: every
                # fu3/fu4 tm512 config on the radius-3 2d13pt_star
                # (worst 24 min), fu4 tm448/512+ch on 2d25pt_box (r2),
                # fu4_tm512_ch32_vf on 2d9pt_star (r3).  Nothing ever
                # published wins above the bound (the nearest, 2d13pt
                # fu3_tm448 1.262, loses to fu2_tm64_vf 1.235), and fu5+
                # is exempt: the deep fori_loop path compiles
                # constant-size at any tm (fu5-fu8 tm448/512 all ok on
                # 2d5pt_star/2d25pt_box ledgers).
                if (not is3d and trap and lv < stream_mod.DEEP_LEVELS
                        and tm >= 448
                        and lv * (2 * blk * base_order + 1) >= 20):
                    continue
                vfs = (False, True) if (
                    trap and lm != "slice" and not is3d
                    and lv < stream_mod.DEEP_LEVELS
                ) else (False,)
                if ch is not None and ch < 32:
                    vfs = (False,)
                # 3D j-frame restoration is a swept axis: in-kernel
                # restore measured 8% FASTER on 3d7pt_star but 13%
                # SLOWER on 3d9pt_cross (round 5, tuning/exp_jfix.py) —
                # per-stencil, like fusion depth
                jfixes = ("outer", "kernel") if (
                    is3d and stream_mod.jfk_legal(
                        spec.dims[1], step * base_order)
                ) else ("outer",)
                for vf in vfs:
                    for jfx in jfixes:
                        cand = vmem_estimate(
                            spec, KernelConfig(variant="stream", step=step,
                                               distance=distance,
                                               tm=tm, lane_mode=lm,
                                               trapezoid=trap, ch=ch,
                                               vfuse=vf, block=blk,
                                               jfix=jfx)
                        )
                        if cand is None:
                            continue
                        key = cand.cfg.label()
                        if key in seen:
                            continue
                        seen.add(key)
                        yield cand
        # NOTE: cfg.factor (ir/factor.py convolution factorization) is
        # deliberately NOT swept: measured on v5e it loses ~1.4x to the
        # plain trapezoid (per-level fixed cost dominates; see the
        # factor.py docstring).  It stays available as an explicit
        # config for non-benchmark tables where the tradeoff may differ.
        # bf16 state: halves HBM traffic and VMEM bytes per pass — worth
        # a focused slab (full product would explode the space)
        for tm, trap in itertools.product(tms[2:4] if not is3d else tms[:2],
                                          traps):
            cand = vmem_estimate(
                spec, KernelConfig(variant="stream", step=step, tm=tm,
                                   distance=distance,
                                   trapezoid=trap, dtype="bfloat16",
                                   lane_mode=None if is3d else "roll")
            )
            if cand is None:
                continue
            key = cand.cfg.label()
            if key in seen:
                continue
            seen.add(key)
            yield cand
        # XLA baseline variant (no tiling knobs; distance resolved above)
        cfg = KernelConfig(variant="xla", step=step, distance=distance)
        if cfg.label() not in seen:
            seen.add(cfg.label())
            yield Candidate(cfg=cfg, vmem_bytes=0, window=0)
