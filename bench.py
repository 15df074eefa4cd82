#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Runs the benchmark stencil suite (the reference's 8 .stc configs,
BASELINE.md) with the framework's best-known kernel configs, measures
per-pair device time via the slope protocol, and reports the geometric
mean over stencils of

    GStencil/s  /  naive-roofline GStencil/s

where the denominator (HBM peak / 8 bytes-per-cell-step = 102.4 for fp32
on v5e) is the speed of light of an UNFUSED sweep.  Temporal fusion can
legitimately exceed 1.0 — one launch advances `step` timesteps on one
read+write of the grid; that is the data-reuse the reference (and this
framework) exists to exploit.  BASELINE.md's >= 0.85-of-roofline target
reads 0.85 on this metric.

vs_baseline is the same number (the reference publishes no numbers —
BASELINE.md documents the empty published set).

Env knobs:
  BENCH_STENCILS=name1,name2   subset (default: all 8)
  BENCH_PAIRS=N                timed pairs (default 12)
  BENCH_REPEATS=N              timing repetitions per stencil, MEDIAN-of
                               (default 2; compile is cached, repeats are
                               cheap and damp relay run-to-run drift; the
                               median carries the same winner's-curse
                               discipline as tuned.json/BASELINE.md)
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
from drstencil_tpu.tune.tuned import best_config, naive_sol_gstencil

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
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "2")))
    do_check = os.environ.get("BENCH_CHECK", "0") == "1"

    fracs = []
    detail = {}
    for name in names:
        spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
        cfg = best_config(name)
        try:
            prog = StencilProgram(spec, cfg)
            # median over repeats (not best-of): min-selection re-inherits
            # the winner's curse the finalists/BASELINE protocol removes
            runs = [prog.time(pairs=pairs) for _ in range(repeats)]
            runs.sort(key=lambda r: r.seconds_per_pair)
            if repeats % 2:
                res = runs[repeats // 2]
            else:  # even count: synthesize the mean of the middle two
                import statistics

                mid = statistics.mean(
                    r.seconds_per_pair
                    for r in runs[repeats // 2 - 1 : repeats // 2 + 1]
                )
                res = runs[repeats // 2 - 1]
                scale = mid / res.seconds_per_pair
                res = type(res)(
                    label=res.label, seconds_per_pair=mid, pairs=res.pairs,
                    warmup_pairs=res.warmup_pairs,
                    gstencil_per_s=res.gstencil_per_s / scale,
                    achieved_gbps=res.achieved_gbps / scale,
                )
        except Exception as e:  # a bad tuned config must not kill the bench
            detail[name] = {"cfg": cfg.label(), "error": str(e)[:300]}
            fracs.append(1e-6)
            print(f"# {name}: ERROR {str(e)[:200]}", file=sys.stderr)
            continue
        frac = res.gstencil_per_s / naive_sol_gstencil(prog.dtype.itemsize)
        fracs.append(frac)
        detail[name] = {
            "cfg": cfg.label(),
            "ms_per_pair": round(res.seconds_per_pair * 1e3, 4),
            "ms_per_step": round(
                res.seconds_per_pair * 1e3 / (2 * prog.an.step), 4),
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
                "metric": "geomean stencil throughput vs naive HBM roofline",
                "value": round(geomean, 4),
                "unit": "GStencil/s over naive-sweep speed-of-light "
                        "(102.4 GStencil/s fp32 @ 819 GB/s; fusion can "
                        "exceed 1.0; target 0.85)",
                "vs_baseline": round(geomean, 4),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
