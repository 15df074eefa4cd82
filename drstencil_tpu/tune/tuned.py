"""Best-known kernel configs per benchmark stencil.

The analogue of the reference's ``duration.log`` best-config tracking
(tuning.py:93-115): the autotuner (tune.tuner) overwrites
``benchmarks/tuned.json`` with the winning config per stencil; bench.py
and users read it through :func:`best_config`.  Falls back to curated
defaults when no tuning record exists.
"""

from __future__ import annotations

import json
import os

from drstencil_tpu.ops.config import KernelConfig

# v5e HBM peak ~819 GB/s (16 GB @ 819 GBps); roofline denominator.
HBM_PEAK_GBPS = 819.0

TUNED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "benchmarks",
    "tuned.json",
)

# Curated defaults (hand-measured; the tuner refines these).
# Diagonal (cross) stencils need step>=2 for axis-0 reuse — same
# constraint the reference tuner encodes (tuning.py:24-25,125).
_DEFAULTS = {
    "2d5pt_star": dict(variant="stream", step=1, tm=256),
    "2d5pt_cross": dict(variant="stream", step=2, tm=256),
    "2d9pt_star": dict(variant="stream", step=1, tm=256),
    "2d9pt_cross": dict(variant="stream", step=2, tm=256),
    "2d9pt_box": dict(variant="stream", step=1, tm=256),
    "2d25pt_box": dict(variant="stream", step=1, tm=256),
    # tall 3D layout: tm must exceed the row halo h*M + h (= 513)
    "3d7pt_star": dict(variant="stream", step=1, tm=8192),
    "3d9pt_cross": dict(variant="stream", step=1, tm=8192),
}


def best_config(name: str) -> KernelConfig:
    try:
        with open(TUNED_PATH) as f:
            tuned = json.load(f)
        if name in tuned:
            return KernelConfig(**tuned[name]["config"])
    except (OSError, json.JSONDecodeError, TypeError):
        pass
    return KernelConfig(**_DEFAULTS.get(name, {"variant": "stream"}))


def record_best(name: str, cfg: KernelConfig, score: dict) -> None:
    tuned = {}
    try:
        with open(TUNED_PATH) as f:
            tuned = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    from dataclasses import asdict

    tuned[name] = {"config": asdict(cfg), "score": score}
    with open(TUNED_PATH, "w") as f:
        json.dump(tuned, f, indent=2, sort_keys=True)
