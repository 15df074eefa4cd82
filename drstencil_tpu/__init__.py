"""drstencil_tpu — a TPU-native stencil-compiler framework.

A from-scratch rebuild of the capabilities of simple86/DRStencil (a CUDA
source-to-source stencil compiler + autotuner, HPCC'21) designed TPU-first:

- the ``.stc`` front-end and the analysis passes (temporal fusion,
  data-reuse partition, halo-range analysis) live in :mod:`drstencil_tpu.ir`
  (pure Python) and in ``native/`` (C++17 compiler core, the production path);
- kernels are JAX/XLA + Pallas-TPU programs (:mod:`drstencil_tpu.ops`), with
  halos staged in VMEM and the streaming axis walked by the sequential
  Pallas grid — the TPU analogue of the reference's z-streaming +
  shared-memory plane revolve (reference: codegen.hpp:143-544);
- the autotuner (:mod:`drstencil_tpu.tune`) sweeps kernel variants and tile
  shapes against measured on-device time plus an HBM roofline model — the
  analogue of the reference's nvcc+ncu sweep (reference: tuning.py);
- multi-chip spatial domain decomposition with ICI halo exchange lives in
  :mod:`drstencil_tpu.parallel` (shard_map + ppermute), an extension beyond
  the strictly single-GPU reference.
"""

__version__ = "0.1.0"

from drstencil_tpu.ir.spec import StencilSpec, parse_stc, load_stc
from drstencil_tpu.ir.passes import (
    fuse,
    order_of,
    default_distance,
    partition,
    Partition,
    analyze,
    Analysis,
)

__all__ = [
    "StencilSpec",
    "parse_stc",
    "load_stc",
    "fuse",
    "order_of",
    "default_distance",
    "partition",
    "Partition",
    "analyze",
    "Analysis",
]
