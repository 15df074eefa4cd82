"""Measure the reference's 2D PLAIN-TILE kernel strategy as a direct
Pallas incarnation, against the tuned streaming winners.

The reference selects between two 2D strategies (`--streaming`,
codegen_2d.hpp:59-62): a streaming kernel (what the library builds,
with straddle carry) and a plain tile kernel (codegen_2d.hpp:456-561)
where each block loads its own haloed window and applies the FUSED
multi-step operator whole — no inter-tile reuse, halo rows recomputed
redundantly.  The library has always argued the streaming choice
(sequential Pallas grid) rather than measuring it; this experiment
closes that gap with a number.

TPU incarnation of "plain tile": grid over independent row strips
(rows on sublanes, full grid width on lanes — tiling the lane axis
would force misaligned 128-lane window fetches, so the natural TPU
tile is a full-width strip).  Each strip fetches its own
(tm + 2·halo)-row haloed window via a pl.Element spec and applies the
fused operator with per-column-shift grouping (row pre-sums per dj,
one lane roll per distinct dj) — the same algebraic structure the
reference's tile kernel gets from register blocking.  No carry, no
scratch, no frame slabs.

Ping-pong state lives in a (R + 2·tm, C) padded layout so the output
of one application is directly the input of the next (out blocks tile
the interior via an offset index map; the pad blocks are never
written).  Unwritten pads mean the boundary band diverges from the
interior-update golden semantics by halo rows per application — the
differential check compares an interior inset past the creep, exactly
like StencilProgram.device_check's deep-gold path.

Usage:
  python tuning/exp_tile2d.py [--interpret] [stencil ...]
Default sweep: 2d5pt_star (fu2/fu4 x tm 128/256), 2d9pt_star (fu2),
2d25pt_box (fu2) — one process, streaming winner re-measured alongside.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drstencil_tpu.ir.passes import analyze
from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram, device_sync
from drstencil_tpu.tune.tuned import best_config

INTERPRET = "--interpret" in sys.argv
ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]


def build_tile_program(spec, step: int, tm: int, interpret: bool = False):
    """The plain-tile strategy for one 2D spec: returns (pair, pad, pairs
    -> state runner pieces) mirroring the reference's fused tile kernel."""
    an = analyze(spec, step=step, merge_forward=5, require_partition=False)
    h = an.halo
    R, C = spec.dims
    assert R % tm == 0 and h <= tm
    # fused taps grouped by column shift: one row pre-sum + one lane
    # roll per distinct dj (reference register blocking analogue)
    by_dj: dict = {}
    for (di, dj), c in sorted(an.fused.items()):
        by_dj.setdefault(dj, []).append((di, float(c)))

    # Mosaic requires the window row-block to be a multiple of 8 and the
    # fetch start 8-aligned: round the row margin up to hr = ceil(h/8)·8
    # (the extra rows ride in the same DMA; slices below index from hr).
    hr = -(-h // 8) * 8
    assert hr <= tm

    def kernel(w_ref, o_ref):
        w = w_ref[...]
        acc = None
        for dj, rows in sorted(by_dj.items()):
            t = None
            for di, c in rows:
                term = c * w[hr + di : hr + di + tm, :]
                t = term if t is None else t + term
            if dj:
                t = jnp.roll(t, -dj, axis=1)
            acc = t if acc is None else acc + t
        o_ref[...] = acc

    # state layout: (R + 2·tm, C), data rows [tm, tm + R).  Window for
    # strip i = data rows [i·tm - hr, i·tm + tm + hr) — always in-bounds
    # thanks to the one-tile pad.  Out blocks tile the interior at block
    # offset +1; pad blocks are never written (boundary creep handled by
    # the inset check below).
    # trailing ×8 so Mosaic's mod-8 prover accepts the window row start
    # (alignment analysis does not propagate through the add/sub)
    win = pl.BlockSpec(
        (pl.Element(tm + 2 * hr), pl.Element(C)),
        lambda i: ((i * (tm // 8) + (tm - hr) // 8) * 8, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.BlockSpec((tm, C), lambda i: (i + 1, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(R // tm,),
        in_specs=[win],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((R + 2 * tm, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * len(an.fused) * R * C,
            bytes_accessed=2 * 4 * R * C,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def pair(a, b):
        b = call(a)
        a = call(b)
        return a, b

    def pad(x):
        buf = jnp.zeros((R + 2 * tm, C), jnp.float32)
        return jax.lax.dynamic_update_slice(buf, x, (tm, 0))

    def unpad(x):
        return x[tm : tm + R]

    return pair, pad, unpad, an


def measure_tile(spec, step: int, tm: int) -> float:
    """Differential-check then slope-time the plain-tile program.
    Returns ms per plain timestep (the tuner objective)."""
    pair, pad, unpad, an = build_tile_program(
        spec, step, tm, interpret=INTERPRET
    )
    h = an.halo
    pair_j = jax.jit(pair, donate_argnums=(0, 1))

    gold = StencilProgram(spec, KernelConfig(variant="xla", step=step))
    s_gd = gold.init_state(seed=0, on_device=True)
    a = pad(s_gd["a"])
    b = pad(s_gd["b"])

    # one checked pair: divergence creeps h per application from the
    # unwritten pads + interior-update band, so compare inset 3h
    a, b = pair_j(a, b)
    s_gd = gold.run_pairs(s_gd, 1)

    @jax.jit
    def maxdiff(x, y):
        ins = 3 * h
        xi = x[ins:-ins, ins:-ins]
        yi = y[ins:-ins, ins:-ins].astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(yi)), 1.0)
        return jnp.max(jnp.abs(xi - yi)) / scale

    err = float(maxdiff(unpad(a), s_gd["a"]))
    assert err < 1e-4, f"tile kernel diverges from gold: {err}"

    # runner.time's protocol: warmup, median-of-3 slope (T(3n)-T(n))/2n
    n1, n2 = 6, 18
    for _ in range(3):
        a, b = pair_j(a, b)
    device_sync(a)

    def timed(k, a, b):
        t0 = time.perf_counter()
        for _ in range(k):
            a, b = pair_j(a, b)
        device_sync(a)
        return time.perf_counter() - t0, a, b

    slopes = []
    for _ in range(3):
        t1, a, b = timed(n1, a, b)
        t2, a, b = timed(n2, a, b)
        slopes.append((t2 - t1) / (n2 - n1))
    sec_per_pair = sorted(slopes)[1]
    ms_step = sec_per_pair * 1e3 / (2 * step)
    print(
        f"{spec.name} TILE fu{step}_tm{tm}: {ms_step:.4f} ms/step "
        f"(dev_diff {err:.2e})",
        flush=True,
    )
    return ms_step


def measure_winner(spec) -> float:
    cfg = best_config(spec.name).replace(interpret=INTERPRET)
    prog = StencilProgram(spec, cfg)
    res = prog.time(pairs=6)
    ms = res.seconds_per_pair * 1e3 / (2 * prog.an.step)
    print(f"{spec.name} STREAM winner [{cfg.label()}]: {ms:.4f} ms/step",
          flush=True)
    return ms


SWEEP = {
    "2d5pt_star": [(2, 128), (2, 256), (4, 128), (4, 256)],
    "2d9pt_star": [(2, 128), (2, 256)],
    "2d25pt_box": [(2, 128)],
}


def main() -> None:
    names = ARGS or list(SWEEP)
    rows = []
    for name in names:
        spec = load_stc(f"benchmarks/{name}.stc")
        win = measure_winner(spec)
        for step, tm in SWEEP.get(name, [(2, 128)]):
            try:
                ms = measure_tile(spec, step, tm)
            except Exception as e:  # VMEM overflow / Mosaic reject: record
                msg = str(e).splitlines()[0][:120]
                print(f"{name} TILE fu{step}_tm{tm}: FAILED ({msg})",
                      flush=True)
                continue
            rows.append((name, step, tm, ms, win, ms / win))
    print("\nstencil       fu  tm   tile ms   winner ms  tile/winner")
    for name, step, tm, ms, win, r in rows:
        print(f"{name:<12} {step:>3} {tm:>4} {ms:>8.4f} {win:>10.4f} "
              f"{r:>10.3f}")


if __name__ == "__main__":
    main()
