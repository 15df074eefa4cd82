"""Generic one-process tm probe around a sweep winner.

The sweep grid is coarse (64/96/128/160/...) and cross-process ledger
noise (+-4-10%) can't resolve a few-% peak, so this times a whole tm
neighborhood IN ONE PROCESS (comparable, per CLAUDE.md variance notes),
including off-grid tms, with a repeat of the first tm at the end as a
drift check.  Each config is device-checked before timing.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tuning/probe_tm.py \
      2d9pt_cross --fu 3 --lane slice --tms 128,144,160,176,192,160

Options: --fu N  --lane roll|slice  --vf  --ch N  --pairs N
"""

import argparse

from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram

ap = argparse.ArgumentParser()
ap.add_argument("stencil")
ap.add_argument("--fu", type=int, default=2)
ap.add_argument("--lane", default="roll")
ap.add_argument("--vf", action="store_true")
ap.add_argument("--ch", type=int, default=None)
ap.add_argument("--pairs", type=int, default=8)
ap.add_argument("--tms", default="96,128,160,96")
args = ap.parse_args()

TMS = [int(t) for t in args.tms.split(",")]
spec = load_stc(f"benchmarks/{args.stencil}.stc")
results = []
for i, tm in enumerate(TMS):
    cfg = KernelConfig(variant="stream", step=args.fu, tm=tm, ch=args.ch,
                       trapezoid=(args.fu > 1), vfuse=args.vf,
                       lane_mode=args.lane)
    try:
        prog = StencilProgram(spec, cfg)
        err = prog.device_check(seed=0)
        if err > 1e-5:
            print(f"tm{tm}: FAILED device_check err={err:.2e}", flush=True)
            continue
        r = prog.time(pairs=args.pairs)
        ms_step = r.seconds_per_pair * 1000 / (2 * cfg.step)
        # the trailing repeat is a drift check, not a candidate
        if not (i == len(TMS) - 1 and tm in TMS[:i]):
            results.append((ms_step, tm))
        print(f"tm{tm}: {ms_step:.4f} ms/step  (err {err:.1e}, "
              f"{r.gstencil_per_s:.1f} GStencil/s)", flush=True)
    except Exception as e:
        print(f"tm{tm}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)

if results:
    best = min(results)
    print(f"\nbest: tm{best[1]} at {best[0]:.4f} ms/step")
