"""Attempt ONE real jax.profiler trace on the relay TPU (VERDICT.md r3
weak #5: `session._session_trace` has never demonstrably succeeded — the
ncu-per-config-counters parity item, reference
benchmarks/*/compile_run.sh ncu wrapping).

Writes tuning/trace/ with either profiler artifacts (success) or
trace_error.txt carrying the full failing traceback (documented
platform limitation).  Prints a one-line verdict either way.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tuning/capture_trace.py \
         [stencil=2d5pt_star] [trace_subdir=trace]

With a stencil argument the TUNED winner config is traced (per-launch
device durations for the production kernel); the default traces a plain
step-1 2d5pt_star.
"""

import glob
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram
from drstencil_tpu.utils.profiling import maybe_trace


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else None
    sub = sys.argv[2] if len(sys.argv) > 2 else "trace"
    trace_dir = os.path.join(ROOT, "tuning", sub)
    if name:
        from drstencil_tpu.tune.tuned import best_config

        spec = load_stc(os.path.join(ROOT, "benchmarks", name + ".stc"))
        cfg = best_config(name)
        print(f"tracing {name} winner: {cfg.label()}")
        prog = StencilProgram(spec, cfg)
    else:
        spec = load_stc(os.path.join(ROOT, "benchmarks", "2d5pt_star.stc"))
        prog = StencilProgram(spec, KernelConfig(variant="stream", step=1,
                                                 tm=256))
    with maybe_trace(trace_dir) as active:
        prog.time(pairs=2, warmup_pairs=1)
    artifacts = [
        p for p in glob.glob(os.path.join(trace_dir, "**"), recursive=True)
        if os.path.isfile(p) and not p.endswith("trace_error.txt")
    ]
    if active and artifacts:
        print(f"trace: OK — {len(artifacts)} artifact(s) under {trace_dir}")
        for p in artifacts[:10]:
            print("  ", os.path.relpath(p, ROOT),
                  os.path.getsize(p), "bytes")
    elif active:
        print(f"trace: profiler context entered but produced NO artifacts "
              f"under {trace_dir} (silent-drop platform limitation)")
    else:
        err = os.path.join(trace_dir, "trace_error.txt")
        tail = open(err).read().splitlines()[-1] if os.path.exists(err) else "?"
        print(f"trace: FAILED — {tail} (full traceback in {err})")


if __name__ == "__main__":
    main()
