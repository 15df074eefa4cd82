"""Measure in-kernel 3D j-frame restoration (jfix='kernel') vs the outer
dynamic_update_slice fixup on the tuned 3D winners, in one process.

The round-5 traces price the outer fixup at ~0.43 ms/pair of XLA copy
ops on 3d7pt_star (~7% of the module); the in-kernel restore replaces
them with ~22 8-row VMEM read-modify-writes per strip from a
grid-invariant slab input.  Bit-identical output (test_jfix_kernel_*).

Usage: python tuning/exp_jfix.py [stencil ...]   # default: both 3D
"""

import sys

sys.path.insert(0, ".")

from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops.runner import StencilProgram
from drstencil_tpu.tune.tuned import best_config

STENCILS = sys.argv[1:] or ["3d7pt_star", "3d9pt_cross"]


def measure(name: str, jfix: str) -> float:
    spec = load_stc(f"benchmarks/{name}.stc")
    cfg = best_config(name).replace(jfix=jfix, interpret=False)
    prog = StencilProgram(spec, cfg)
    err = prog.device_check(seed=0)
    res = prog.time(pairs=6)
    ms = res.seconds_per_pair * 1e3 / (2 * prog.an.step)
    print(f"{name} jfix={jfix} [{cfg.label()}]: {ms:.4f} ms/step "
          f"(dev_diff {err:.2e})", flush=True)
    return ms


def main() -> None:
    rows = []
    for name in STENCILS:
        outer = measure(name, "outer")
        kern = measure(name, "kernel")
        rows.append((name, outer, kern, kern / outer))
    print("\nstencil        outer     kernel   kernel/outer")
    for name, o, k, r in rows:
        print(f"{name:<14} {o:>7.4f}  {k:>7.4f}  {r:>8.3f}")


if __name__ == "__main__":
    main()
