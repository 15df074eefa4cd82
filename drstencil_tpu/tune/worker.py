"""Isolated per-config measurement worker.

Reads one JSON job from stdin ({stc, name, config, pairs, check}), runs
the exact same measurement as the in-process tuner (tune.tuner.
measure_config), and prints the resulting ledger entry as a single
marker-prefixed JSON line on stdout.

This is the TPU analogue of the reference's per-config process boundary
(compile_run.sh:4-5 — each config is its own nvcc + binary run): a
Mosaic compile hang or compiler crash dies with this process instead of
eating the sweep; the parent enforces a hard wall-clock kill.

Test hook: DRSTENCIL_TEST_HANG=<seconds> sleeps before doing anything —
it simulates an uninterruptible compile hang (SIGALRM-immune in-process,
but a subprocess kill always works) without needing a real one.
"""

import json
import os
import sys
import time


def main():
    hang = os.environ.get("DRSTENCIL_TEST_HANG")
    if hang:
        time.sleep(float(hang))

    job = json.load(sys.stdin)

    from drstencil_tpu.ir.spec import parse_stc
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.tune.tuner import RESULT_MARKER, measure_config

    spec = parse_stc(job["stc"], name=job["name"])
    cfg = KernelConfig.from_dict(job["config"])
    entry = measure_config(spec, cfg, pairs=job.get("pairs", 10),
                           check=job.get("check", True))
    sys.stdout.write(RESULT_MARKER + json.dumps(entry) + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
