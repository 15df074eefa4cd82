"""Weak-scaling prediction table for the sharded streaming kernel.

Prints, for every tuned winner in ``benchmarks/tuned.json``, the ICI
halo-exchange cost of :func:`stream_shard.halo_traffic_model` against the
winner's measured single-chip ms/step — i.e. the quantitative backing for
"multi-chip inherits single-chip performance" (VERDICT r4 weak #4).  The
traffic accounting itself is pinned to the jaxpr by
``tests/test_parallel.py::test_halo_traffic_accounting``; this module only
divides those bytes by the public v5e ICI figures.

Usage::

    python -m drstencil_tpu.parallel.model          # table for all winners
"""

from __future__ import annotations

import json
import os

from drstencil_tpu.ir.passes import analyze
from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops import stream as stream_mod
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.parallel import stream_shard
from drstencil_tpu.tune.tuned import TUNED_PATH

BENCH_DIR = os.path.dirname(TUNED_PATH)


def winner_rows(n_shards: int = 8) -> list[dict]:
    """One model row per tuned winner.

    Weak scaling: each chip keeps the FULL single-chip problem (the
    premise halo_traffic_model prices), so the geometry is the undivided
    spec's — and hrow/wb are dims[0]-independent anyway.  ``n_shards``
    is reported for context only; it does not change per-chip traffic
    on a 1-D mesh (one neighbor exchange per side regardless of n).
    """
    import numpy as np

    tuned = json.load(open(TUNED_PATH))
    rows = []
    for name in sorted(tuned):
        cfg = KernelConfig.from_dict(tuned[name]["config"])
        spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
        an = analyze(spec, step=cfg.step, distance=cfg.distance,
                     merge_forward=cfg.merge_forward)
        g = stream_mod.make_geometry(an, cfg)
        ms = tuned[name]["score"]["ms_per_step"]
        # bf16 halo rows are 2 B/item on ICI (np has no bfloat16 dtype)
        itemsize = 2 if cfg.dtype == "bfloat16" else np.dtype(cfg.dtype).itemsize
        m = stream_shard.halo_traffic_model(g, cfg.step, itemsize=itemsize,
                                            ms_per_step_single=ms)
        m["name"], m["config"], m["n_shards"] = name, cfg.label(), n_shards
        m["itemsize"] = itemsize
        rows.append(m)
    return rows


def main() -> None:
    rows = winner_rows()
    hdr = (f"{'stencil':<12} {'config':<34} {'hrow':>4} {'wb':>6} "
           f"{'KiB/apply':>9} {'halo us/step':>12} {'ms/step':>8} {'weak eff':>8}")
    print(hdr)
    print("-" * len(hdr))
    for m in rows:
        print(f"{m['name']:<12} {m['config']:<34} {m['hrow']:>4} {m['wb']:>6} "
              f"{m['bytes_per_apply'] / 1024:>9.1f} "
              f"{m['halo_ms_per_step'] * 1e3:>12.2f} "
              f"{m['ms_per_step_single']:>8.4f} "
              f"{m['weak_scaling_efficiency']:>8.4f}")


if __name__ == "__main__":
    main()
