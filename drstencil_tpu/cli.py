"""``python -m drstencil_tpu.cli`` — Python front door to the compiler.

Mirrors the native CLI (native/main.cpp); uses the native core through the
ctypes bridge (building it on demand), so the analysis and emission are
the production C++ path either way.
"""

from __future__ import annotations

import argparse
import json
import sys

from drstencil_tpu import native_bridge


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="drstencil",
        description="Generate a data-reusing TPU stencil program (Pallas).",
    )
    ap.add_argument("stc", help="input .stc file")
    ap.add_argument("-o", "--output", default="out.py")
    ap.add_argument("--step", type=int, default=1)
    ap.add_argument("--dist", type=int, default=0)
    ap.add_argument("--bx", type=int, default=0,
                    help="rows per streaming strip (0 = auto)")
    ap.add_argument("--merge-forward", type=int, default=5)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--trapezoid", action="store_true",
                    help="for --step > 1: apply the base stencil step "
                    "times through VMEM scratch instead of coefficient "
                    "fusion (FLOPs linear in step)")
    ap.add_argument("--lane-mode", default="", choices=["", "slice", "roll"],
                    help="lane-shift strategy (default: auto by lane width)")
    ap.add_argument("--ch", type=int, default=0,
                    help="accumulation chunk rows (must divide tile rows, "
                    "multiple of 8; 0 = auto ~2MB temporaries)")
    ap.add_argument("--vfuse", action="store_true",
                    help="with --trapezoid: chain intermediate levels "
                    "through chunk-local values instead of VMEM scratch")
    ap.add_argument("--block", type=int, default=1,
                    help="with --trapezoid: each level applies the "
                    "block-step coefficient-fused base operator "
                    "(step/block levels; default 1)")
    ap.add_argument("--jfix", default="outer", choices=["outer", "kernel"],
                    help="3D j-frame restoration: outer fixup (default) "
                    "or in-kernel restore")
    ap.add_argument("--prefetch", type=int, default=2, choices=[1, 2],
                    help="window-fetch pipeline depth: 2 = double-"
                    "buffered DMA (default), 1 = synchronous fetch")
    ap.add_argument("--shard", type=int, default=0,
                    help="emit the multi-chip program over an n-device "
                    "mesh (shard_map + ppermute halo exchange)")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--gold", action="store_true")
    ap.add_argument("--dump-analysis", action="store_true")
    args = ap.parse_args(argv)

    with open(args.stc) as f:
        text = f.read()
    name = args.stc.rsplit("/", 1)[-1].rsplit(".", 1)[0]

    try:
        if args.dump_analysis:
            out = native_bridge.analyze(
                text, name, step=args.step, distance=args.dist,
                merge_forward=args.merge_forward,
            )
            json.dump(out, sys.stdout)
            print()
            return 0
        program = native_bridge.emit(
            text, name, step=args.step, distance=args.dist,
            merge_forward=args.merge_forward, tm=args.bx,
            check=args.check, gold_only=args.gold, dtype=args.dtype,
            trapezoid=args.trapezoid, lane_mode=args.lane_mode, ch=args.ch,
            shards=args.shard, vfuse=args.vfuse, block=args.block,
            prefetch=args.prefetch, jfix=args.jfix,
        )
    except native_bridge.NativeError as e:
        print(str(e), file=sys.stderr)
        return 1
    with open(args.output, "w") as f:
        f.write(program)
    return 0


if __name__ == "__main__":
    sys.exit(main())
