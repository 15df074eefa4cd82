"""Does the Pallas pipeline overlap HBM DMA with compute for our kernel
shapes?  Timing-only standalone kernels (results are wrong on purpose):

  A: Blocked in/out tiles, 2 compute levels (5 loads + presums + combos
     + 4 rolls each) through VMEM scratch — the pipeline-friendly shape
  B: A with the input fetched as an overlapping pl.Element window
     (tm+2*hk rows at element offset i*tm) — our production input spec
  C: B plus a straddle-carry VMEM scratch written per strip

Model numbers at 8192x8192 fp32, tm=96: HBM in+out = 0.54 GB = 0.65 ms
at 819 GB/s; measured compute = 2 levels x ~0.45 ms.  Serial = ~1.55 ms
per sweep; overlapped = ~0.9 ms.  Which one do we get, and which
feature loses it?

Usage: python tuning/exp_overlap.py [variants]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, N = 8192, 8192
TM, HK = 96, 8
GRID = R // TM
CH = 8

COEFFS = [0.1, 0.2, 0.3, 0.2, 0.1]


def level(src_ref, lo, hi):
    """One trapezoid-ish level: 5 shifted loads, presums, 3 combos,
    4 rolls, final adds — matching the 2d25pt_box plan's op mix.
    Reads rows [lo, hi) + 8; writes back a (hi-lo, N) value."""
    outs = []
    for base in range(lo, hi, CH):
        loads = [src_ref[base + d : base + d + CH, :] for d in range(5)]
        p2 = loads[0] + loads[4]
        p1 = loads[1] + loads[3]
        p0 = loads[2]
        inners = [
            0.02 * p2 + 0.05 * p1 + 0.1 * p0,
            0.05 * p2 + 0.1 * p1 + 0.2 * p0,
            0.1 * p2 + 0.2 * p1 + 0.3 * p0,
        ]
        acc = inners[2]
        for s, inner in ((1, inners[1]), (2, inners[0])):
            acc = acc + jnp.roll(inner, -s, axis=1)
            acc = acc + jnp.roll(inner, s, axis=1)
        outs.append((base, acc))
    return outs


def make(variant):
    def kernel(a_ref, o_ref, scr, carry):
        for base, acc in level(a_ref, 0, TM - 2 * HK):
            scr[base : base + CH, :] = acc
        for base, acc in level(scr, 0, TM - 4 * HK):
            o_ref[base : base + CH, :] = acc
        if variant == "C":
            carry[...] = a_ref[0:HK, :] * 0.5

    if variant == "A":
        in_spec = pl.BlockSpec((TM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        shape = (R, N)
    else:
        in_spec = pl.BlockSpec(
            (pl.Element(TM + 2 * HK), pl.Element(N)), lambda i: (i * TM, 0),
            memory_space=pltpu.VMEM)
        shape = (R + 2 * HK, N)

    call = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, N), jnp.float32),
                        pltpu.VMEM((HK, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    return call, shape


@jax.jit
def _sync(x):
    return jnp.sum(x[:1, :8])


def measure(variant):
    call, shape = make(variant)
    f = jax.jit(lambda x: call(call(x)[: shape[0]] if shape[0] <= R else
                               jnp.pad(call(x), ((0, 2 * HK), (0, 0)))))
    x = jax.jit(lambda: jnp.ones(shape, jnp.float32))()
    y = f(x)
    float(_sync(y))
    def run(k):
        t0 = time.perf_counter()
        z = x
        for _ in range(k):
            z = f(z)
        float(_sync(z))
        return time.perf_counter() - t0
    run(2)
    ts = []
    for _ in range(3):
        t1, t2 = run(4), run(12)
        ts.append((t2 - t1) / 8 / 2)  # per call (f = 2 calls)
    ms = sorted(ts)[1] * 1e3
    print(f"{variant}: {ms:.4f} ms/sweep", flush=True)


for v in (sys.argv[1] if len(sys.argv) > 1 else "ABC"):
    measure(v)
