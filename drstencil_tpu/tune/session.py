"""Tuning session driver — the starter.sh + getGpuMetrics.sh analogue.

Runs the autotuner over every benchmark stencil, appends session wall time
to ``tuning-time.log`` (starter.sh:8-11), and aggregates the per-config
metric rows into one wide ``gpuMetrics.csv``-style table
(benchmarks/gpuMetrics.csv in the reference; ours records the roofline
metric set instead of the 57 Nsight counters).
"""

from __future__ import annotations

import csv
import os
import time
from typing import List, Optional

from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.tune.tuner import Tuner

ALL = [
    "2d5pt_star", "2d5pt_cross", "2d9pt_star", "2d9pt_cross",
    "2d9pt_box", "2d25pt_box", "3d7pt_star", "3d9pt_cross",
]


def aggregate_metrics(out_dir: str, dest: Optional[str] = None) -> str:
    """Merge metrics.csv rows into the session-wide table."""
    dest = dest or os.path.join(out_dir, "gpuMetrics.csv")
    src = os.path.join(out_dir, "metrics.csv")
    rows: List[dict] = []
    if os.path.exists(src):
        with open(src) as f:
            rows = list(csv.DictReader(f))
    if rows:
        with open(dest, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    return dest


def run_session(bench_dir: str, out_dir: str, budget_per_stencil: float = 600.0,
                max_configs: Optional[int] = None, stencils=None, log=print):
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    results = {}
    for name in stencils or ALL:
        spec = load_stc(os.path.join(bench_dir, name + ".stc"))
        tuner = Tuner(spec, out_dir, time_budget_s=budget_per_stencil)
        res = tuner.sweep(max_configs=max_configs, log=log)
        results[name] = res
        log(f"[{name}] best: "
            f"{res.best_cfg.label() if res.best_cfg else 'none'} "
            f"{res.best_ms:.3f} ms/step")
    aggregate_metrics(out_dir)
    with open(os.path.join(out_dir, "tuning-time.log"), "a") as f:
        f.write(f"session: {time.time() - t0:.0f} s\n")
    return results


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="tune all benchmark stencils")
    ap.add_argument("--bench-dir", default="benchmarks")
    ap.add_argument("--out-dir", default="tuning")
    ap.add_argument("--budget", type=float, default=600.0)
    ap.add_argument("--max-configs", type=int, default=None)
    ap.add_argument("--stencils", default=None,
                    help="comma-separated subset")
    args = ap.parse_args(argv)
    run_session(
        args.bench_dir, args.out_dir, budget_per_stencil=args.budget,
        max_configs=args.max_configs,
        stencils=args.stencils.split(",") if args.stencils else None,
    )


if __name__ == "__main__":
    main()
