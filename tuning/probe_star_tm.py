"""One-process tm probe for 2d9pt_star's value-fused winner.

The sweep grid jumps 96 -> 128 -> 160 and budget cuts left fu2-vf tm96
untried; cross-process ledger noise (+-4-10%) also can't resolve a few-%
peak.  This probes the whole tm neighborhood of the fu2_tm128_vf winner
IN ONE PROCESS (comparable, per CLAUDE.md variance notes), including
off-grid tm112/tm144, with a repeat of tm128 at the end as a drift
check.  Each config is device-checked before timing.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tuning/probe_star_tm.py
       [tm tm ...]   (default: 96 112 128 144 160 128)
"""

import sys

from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram

TMS = [int(a) for a in sys.argv[1:]] or [96, 112, 128, 144, 160, 128]

spec = load_stc("benchmarks/2d9pt_star.stc")
results = []
for tm in TMS:
    cfg = KernelConfig(variant="stream", step=2, tm=tm, trapezoid=True,
                       vfuse=True, lane_mode="roll")
    try:
        prog = StencilProgram(spec, cfg)
        err = prog.device_check(seed=0)
        if err > 1e-5:
            print(f"tm{tm}: FAILED device_check err={err:.2e}")
            continue
        r = prog.time(pairs=8)
        ms_step = r.seconds_per_pair * 1000 / (2 * cfg.step)
        results.append((ms_step, tm))
        print(f"tm{tm}: {ms_step:.4f} ms/step  (err {err:.1e}, "
              f"{r.gstencil_per_s:.1f} GStencil/s)")
    except Exception as e:
        print(f"tm{tm}: ERROR {type(e).__name__}: {str(e)[:200]}")

if results:
    best = min(results)
    print(f"\nbest: tm{best[1]} at {best[0]:.4f} ms/step")
