#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Runs the benchmark stencil suite (the reference's 8 .stc configs,
BASELINE.md) with the framework's best-known kernel configs, measures
per-pair device time via the slope protocol, and reports the geometric
mean of achieved HBM-roofline fraction (BASELINE.md north star:
>= 0.85 of roofline on all 8).

vs_baseline is the roofline fraction itself (the reference publishes no
numbers — BASELINE.md documents the empty published set), so 1.0 ==
hitting the HBM speed-of-light on this chip; the 0.85 target reads 0.85.

Env knobs:
  BENCH_STENCILS=name1,name2   subset (default: all 8)
  BENCH_PAIRS=N                timed pairs (default 12)
  BENCH_CHECK=1                also run on-device differential checks
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram
from drstencil_tpu.tune.tuned import best_config, HBM_PEAK_GBPS

BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks")

ALL = [
    "2d5pt_star",
    "2d5pt_cross",
    "2d9pt_star",
    "2d9pt_cross",
    "2d9pt_box",
    "2d25pt_box",
    "3d7pt_star",
    "3d9pt_cross",
]


def main():
    names = os.environ.get("BENCH_STENCILS")
    names = names.split(",") if names else ALL
    pairs = int(os.environ.get("BENCH_PAIRS", "12"))
    do_check = os.environ.get("BENCH_CHECK", "0") == "1"

    fracs = []
    detail = {}
    for name in names:
        spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
        cfg = best_config(name)
        prog = StencilProgram(spec, cfg)
        res = prog.time(pairs=pairs)
        frac = res.achieved_gbps / HBM_PEAK_GBPS
        fracs.append(frac)
        detail[name] = {
            "cfg": cfg.label(),
            "ms_per_pair": round(res.seconds_per_pair * 1e3, 4),
            "gstencil_per_s": round(res.gstencil_per_s, 2),
            "eff_gbps": round(res.achieved_gbps, 1),
            "roofline_frac": round(frac, 4),
        }
        if do_check:
            detail[name]["max_dev_diff"] = prog.device_check(pairs=1)
        print(f"# {name}: {detail[name]}", file=sys.stderr)

    geomean = math.exp(sum(math.log(max(f, 1e-9)) for f in fracs) / len(fracs))
    print(
        json.dumps(
            {
                "metric": "geomean HBM-roofline fraction over benchmark stencils",
                "value": round(geomean, 4),
                "unit": "fraction of v5e HBM speed-of-light (target 0.85)",
                "vs_baseline": round(geomean, 4),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
