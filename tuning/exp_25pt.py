"""Ablation experiments for the 2d25pt_box per-level compute floor.

Measured floor (round-2 ledger): ~0.88 ms/step across fu1/fu2 — compute-
bound, not HBM-bound.  Predicted VPU op count says ~0.5 ms; this script
measures where the extra time goes by timing ablated kernel variants in
ONE process (comparable per CLAUDE.md variance notes):

  base      — fu2_tm96_ch8_trap_roll as-is
  pltpu     — lane rolls via pltpu.roll instead of jnp.roll
  noroll    — rolls ablated to identity (wrong results, timing only)
  nocombo   — col combos ablated to a single unshifted combination
              (loads + presums + 1 combo + store only)

Usage: python tuning/exp_25pt.py [stencil] [fu] [tm] [ch] [variants]
       EXP_LANE=slice to ablate a slice-mode config (e.g. 2d9pt_cross's
       winner); EXP_VF=1 for the value-fused trapezoid.
"""

import os
import sys
import functools

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops import stream as sm
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram

name = sys.argv[1] if len(sys.argv) > 1 else "2d25pt_box"
fu = int(sys.argv[2]) if len(sys.argv) > 2 else 2
tm = int(sys.argv[3]) if len(sys.argv) > 3 else 96
ch = (None if sys.argv[4] == "-" else int(sys.argv[4])) if len(sys.argv) > 4 else 8

spec = load_stc(f"benchmarks/{name}.stc")
cfg = KernelConfig(variant="stream", step=fu, tm=tm, ch=ch,
                   trapezoid=(fu > 1),
                   lane_mode=os.environ.get("EXP_LANE", "roll"),
                   vfuse=bool(int(os.environ.get("EXP_VF", "0"))))

orig_roll = sm._roll
orig_plan = sm.plan_taps


def with_roll(fn):
    sm._roll = fn
    return None


def plan_nocombo(tap_list):
    row_groups, col_groups, _ = orig_plan(tap_list)
    # single combination, no lane shifts: every presum summed once at s=0
    cvec = tuple(1.0 for _ in row_groups)
    return row_groups, [(cvec, [0])], [None]


def plan_loadsonly(tap_list):
    # all row shifts in ONE presum group: 5 loads + 4 adds + 1 mult + store
    ds = sorted({d for d, _, _ in tap_list})
    return [ds], [((1.0,), [0])], [None]


def plan_oneload(tap_list):
    # single row load + store: the pure pass floor
    return [[0]], [((1.0,), [0])], [None]


def plan_nopresum(tap_list):
    # round-1-style: no symmetric row pre-sums (singleton row groups);
    # col grouping then happens over per-row vectors
    C = {(d, s): c for d, s, c in tap_list}
    ds = sorted({d for d, _, _ in tap_list})
    ss = sorted({s for _, s, _ in tap_list})
    row_groups = [[d] for d in ds]
    by_col = {}
    for si, s_ in enumerate(ss):
        cvec = tuple(C.get((d, s_), 0.0) for d in ds)
        by_col.setdefault(cvec, []).append(s_)
    cg = sorted(by_col.items(), key=lambda kv: kv[1][0])
    return row_groups, cg, [None] * len(cg)


def plan_noshift(tap_list):
    # full plan, but every member shift forced to 0 (aligned read /
    # no-op roll): isolates the pure lane-shift cost while keeping all
    # presums, muls, chains, and adds
    row_groups, col_groups, chains = orig_plan(tap_list)
    return (row_groups,
            [(cv, [0] * len(sl)) for cv, sl in col_groups], chains)


def plan_tworolls(tap_list):
    # keep row presums + center and |s|=1 col groups only: 2 rolls
    row_groups, col_groups, _ = orig_plan(tap_list)
    keep = [(cv, [s for s in sl if abs(s) <= 1]) for cv, sl in col_groups]
    kept = [(cv, sl) for cv, sl in keep if sl]
    return row_groups, kept, [None] * len(kept)


def measure(tag):
    prog = StencilProgram(spec, cfg)
    r = prog.time(pairs=8)
    print(f"{tag:8s} ms/step={r.seconds_per_pair * 1e3 / (2 * fu):.4f} "
          f"({r.gstencil_per_s:.1f} GStencil/s)", flush=True)
    return r.seconds_per_pair * 1e3 / (2 * fu)


results = {}
variants = sys.argv[5].split(",") if len(sys.argv) > 5 else [
    "base", "pltpu", "noroll", "nocombo"]
for tag in variants:
    sm._roll = orig_roll
    sm.plan_taps = orig_plan
    if tag == "cfused":
        # coefficient fusion: one application of the step-fused operator
        # (e.g. 81 taps at fu2), no trapezoid scratch levels
        saved, cfg = cfg, cfg.replace(trapezoid=False)
        results[tag] = measure(tag)
        cfg = saved
        continue
    if tag == "pltpu":
        sm._roll = lambda x, s: pltpu.roll(x, s % x.shape[1], 1)
    elif tag == "noroll":
        sm._roll = lambda x, s: x
    elif tag == "nocombo":
        sm.plan_taps = plan_nocombo
    elif tag == "loadsonly":
        sm.plan_taps = plan_loadsonly
    elif tag == "oneload":
        sm.plan_taps = plan_oneload
    elif tag == "noshift":
        sm.plan_taps = plan_noshift
    elif tag == "tworolls":
        sm.plan_taps = plan_tworolls
    elif tag == "nopresum":
        sm.plan_taps = plan_nopresum
    results[tag] = measure(tag)
sm._roll = orig_roll
sm.plan_taps = orig_plan

if "base" in results and "noroll" in results:
    print(f"roll share: {results['base'] - results['noroll']:.4f} ms/step")
if "noroll" in results and "nocombo" in results:
    print(f"combo share: {results['noroll'] - results['nocombo']:.4f} ms/step")
