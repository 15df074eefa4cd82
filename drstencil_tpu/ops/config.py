"""Kernel configuration — the TPU analogue of the reference's CLI knobs.

Every reference flag (main.cpp:12-59) maps to a field here; GPU-specific
knobs become their TPU equivalents:

- ``bx/by`` thread-block shape + ``block/cyclic-merge`` thread coarsening
  → ``tn/tm/tl`` VMEM tile shape (the VPU is already 8×128-vectorized, so
  coarsening is just tile-shape selection);
- ``sn`` stream-chunk length → ``tl`` (3D) / ``tm`` (2D) rows per grid step
  along the streaming axis;
- ``--streaming`` → variant selection (strip kernels stream by
  construction; the XLA variant lets the compiler choose);
- ``--prefetch`` → ``prefetch`` (LIVE): per-input pipeline buffer depth.
  The Pallas TPU pipeline is double-buffered by default (depth 2 — the
  automatic incarnation of the reference's shared-memory prefetch,
  codegen.hpp:116-141); ``prefetch=1`` lowers the window fetch to
  ``pl.Buffered(1)`` (synchronous, no overlap) — the measurable
  off-position.  Mosaic rejects depth > 2, so the reference's depth
  axis collapses to {1, 2} on TPU.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional


VARIANTS = ("stream", "xla")


@dataclass(frozen=True)
class KernelConfig:
    """Configuration for one generated/compiled stencil kernel."""

    variant: str = "stream"
    # analysis knobs (reference: --step, --dist, --merge-forward)
    step: int = 1
    distance: int = 0  # 0 = auto (fused extent >> 1)
    merge_forward: int = 5
    # rows per streaming strip (the tile-shape knob; reference --bx);
    # None = auto from the VMEM budget
    tm: Optional[int] = None
    # accumulation chunk rows (must divide tm, multiple of 8);
    # None = auto (~2 MB temporaries)
    ch: Optional[int] = None
    # precision of device buffers
    dtype: str = "float32"
    # lane-shift strategy: "slice" (static slices into pad lanes),
    # "roll" (wrap-around, no padding), None = auto by lane width
    lane_mode: Optional[str] = None
    # temporal fusion strategy for step > 1: False = coefficient-level
    # fusion (reference parity: one wider operator, taps grow ~step^2);
    # True = trapezoid (apply the base stencil `step` times through VMEM
    # scratch per strip — FLOPs linear in step, the TPU-native win)
    trapezoid: bool = False
    # factor a radius-2 2D base operator into two 3-wide convolution
    # levels + a roll-free residual (ir/factor.py) — halves the lane
    # rolls per level; requires a solvable table, implies level-wise
    # (trapezoid-style) application
    factor: bool = False
    # value-fused trapezoid: intermediate levels are computed chunk-
    # locally as VALUES (registers) instead of round-tripping through
    # VMEM scratch — saves the scratch write+read per level at the cost
    # of 2*hr_b overlap rows recomputed per chunk.  Requires trapezoid,
    # roll lane-mode, step < DEEP_LEVELS, not factor.  Same plan and
    # summation order as the scratch path; results differ only by ~1 ulp
    # from compiler FMA contraction across the removed store boundary.
    vfuse: bool = False
    # trapezoid level granularity: each level applies the `block`-step
    # coefficient-fused base operator, so step/block levels advance
    # `step` timesteps — the hybrid of the two fusion strategies.
    # Halves (block=2) the per-level machinery and scratch round-trips
    # that bound the light stencils (measured floors: star machinery
    # 0.14/0.45, cross launch-bound) while the CSE plan keeps the
    # per-step VPU op growth at +0-10% on star/5pt/box tables.
    # Requires trapezoid, step % block == 0, block < step.
    block: int = 1
    # 3D j-frame restoration strategy: "outer" (default) fixes the
    # within-plane frozen frame after each application via two
    # dynamic_update_slices on a plane-view reshape of the padded buffer
    # (measured ~0.43 ms/pair of XLA copy ops on 3d7pt_star, ~7% of the
    # module); "kernel" restores it inside the Pallas kernel from a
    # grid-invariant frame-slab input via 8-row aligned read-modify-
    # write stores (plane starts are 8-aligned in the tall layout, so
    # the dynamic offsets are provably mod-8 for Mosaic).  3D only.
    jfix: str = "outer"
    # pipeline buffer depth for the streamed window fetch: 2 = Mosaic's
    # default double-buffered DMA (prefetch on), 1 = synchronous fetch
    # (prefetch off; the reference's --prefetch=0, codegen.hpp:116-141).
    # Depth > 2 is rejected by the Mosaic lowering.
    prefetch: int = 2
    # run kernels in the Pallas interpreter (for off-TPU tests)
    interpret: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "KernelConfig":
        """Build from a (possibly legacy) dict, ignoring unknown keys —
        ledgers/tuned.json may carry fields from older versions."""
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def replace(self, **kw) -> "KernelConfig":
        return dataclasses.replace(self, **kw)

    def replace_variant(self, variant: str) -> "KernelConfig":
        return dataclasses.replace(self, variant=variant)

    def label(self) -> str:
        """Compact config name for logs — analogue of the reference's
        cfgToString (tuning.py:72-86) e.g. 'strip2d_fu2d2tm256'."""
        parts = [self.variant, f"fu{self.step}"]
        if self.distance:
            parts.append(f"d{self.distance}")
        if self.tm is not None:
            parts.append(f"tm{self.tm}")
        if self.ch is not None:
            parts.append(f"ch{self.ch}")
        if self.trapezoid:
            parts.append("trap" if self.block == 1 else f"trap_b{self.block}")
        if self.vfuse:
            parts.append("vf")
        if self.factor:
            parts.append("fac")
        if self.lane_mode:
            parts.append(self.lane_mode)
        if self.prefetch != 2:
            parts.append(f"pf{self.prefetch}")
        if self.jfix != "outer":
            parts.append("jfk")
        if self.dtype != "float32":
            parts.append(self.dtype)
        return "_".join(parts)
