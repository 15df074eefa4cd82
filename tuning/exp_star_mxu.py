"""MXU lane-combination feasibility for 2d9pt_star (VERDICT r2 #2).

The proposed alternative kernel expresses one level's lane-axis taps
(s = ±1, ±2) as a banded matmul on a narrow (R*64, 128) layout:

    col_part = Z @ B        # B 128x128, band ±1..±2  (+ tiny boundary fix)

replacing the 4 VPU lane rolls + combines.  Whether that can win reduces
to one number: the wall time of the matmul at full-grid volume (8192^2
cells => Z is (8192*64, 128)) versus the measured cost of the stage it
replaces (exp_25pt.py ablation on 2d9pt_star fu2_tm128: combo stage
~0.34 ms/step including rolls; pass floor 0.45; base 0.82).

This script times exactly that matmul (fp32 and bf16-in/fp32-acc) via
XLA on-device, using the slope protocol to cancel dispatch cost.  It is
an upper-bound-friendly measurement: the real kernel would also pay the
boundary-fix lanes and the row-part VPU work on top.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tuning/exp_star_mxu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from drstencil_tpu.ops.runner import device_sync

M, K = 8192 * 64, 128  # full 8192^2 grid in the narrow (R*64, 128) layout


def banded(dtype):
    B = np.zeros((K, K), np.float32)
    for s, c in ((1, 0.11), (-1, 0.12), (2, 0.03), (-2, 0.04)):
        for i in range(K):
            j = i + s
            if 0 <= j < K:
                B[i, j] = c
    return jnp.asarray(B, dtype)


def slope_time(f, x, reps=3, n1=4):
    f(x).block_until_ready() if hasattr(f(x), "block_until_ready") else None
    device_sync(f(x))
    slopes = []
    for _ in range(reps):
        ts = []
        for n in (n1, 3 * n1):
            t0 = time.perf_counter()
            y = x
            for _ in range(n):
                y = f(y)
            device_sync(y)
            ts.append(time.perf_counter() - t0)
        slopes.append((ts[1] - ts[0]) / (2 * n1))
    return sorted(slopes)[1]


def main():
    key = jax.random.PRNGKey(0)
    x32 = jax.random.uniform(key, (M, K), jnp.float32)

    B32 = banded(jnp.float32)
    f32 = jax.jit(lambda x: x @ B32)
    t32 = slope_time(f32, x32)
    print(f"fp32  (M={M}, K=N=128) matmul: {t32*1e3:.4f} ms "
          f"({2*M*K*K/t32/1e12:.1f} TFLOP/s)", flush=True)

    Bbf = banded(jnp.bfloat16)
    fbf = jax.jit(lambda x: jax.lax.dot_general(
        x.astype(jnp.bfloat16), Bbf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.float32))
    tbf = slope_time(fbf, x32)
    print(f"bf16-in/fp32-acc matmul (incl. cast): {tbf*1e3:.4f} ms "
          f"({2*M*K*K/tbf/1e12:.1f} TFLOP/s)", flush=True)

    # the stage it would replace, measured by exp_25pt.py ablation:
    print("replaced VPU stage (combos+rolls, 2d9pt_star fu2_tm128): "
          "~0.34 ms/step (base 0.82, nocombo 0.49)")
    for tag, t in (("fp32", t32), ("bf16", tbf)):
        verdict = "VIABLE" if t < 0.34e-3 else "REFUTED"
        print(f"  {tag}: matmul alone {'<' if t < 0.34e-3 else '>='} "
              f"replaced stage -> {verdict}")


if __name__ == "__main__":
    main()
