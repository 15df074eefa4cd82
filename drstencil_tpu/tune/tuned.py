"""Best-known kernel configs per benchmark stencil.

The analogue of the reference's ``duration.log`` best-config tracking
(tuning.py:93-115): the autotuner (tune.tuner) records the winning config
per stencil into ``benchmarks/tuned.json`` (monotone — a short sweep
never regresses it); bench.py and users read it through
:func:`best_config`, falling back to curated defaults.
``reconcile_from_ledgers`` rebuilds the file from every measurement in a
tuning directory's ledgers (the authoritative argmin).
"""

from __future__ import annotations

import json
import os

from drstencil_tpu.ops.config import KernelConfig

# v5e HBM peak ~819 GB/s (16 GB @ 819 GBps); roofline denominator.
HBM_PEAK_GBPS = 819.0


def naive_sol_gstencil(itemsize: int = 4) -> float:
    """Speed-of-light stencil throughput of a NAIVE (unfused) sweep:
    one read + one write per cell per timestep at HBM peak.  Temporal
    fusion legitimately exceeds 1.0 of this — the point of DRStencil."""
    return HBM_PEAK_GBPS / (2 * itemsize)


def objective_ms(ms_per_step: float, dtype: str = "float32") -> float:
    """SoL-normalized objective: fp32-equivalent ms per timestep.

    The headline metric is GStencil/s over the naive SoL *of the config's
    own dtype* — bf16's denominator is 2x fp32's, so a bf16 config must
    be 2x faster in raw ms to score the same roofline fraction.  Raw
    ms_per_step would let a merely-faster bf16 config displace a
    better-scoring fp32 one; minimize this instead (identical to raw ms
    for fp32, so historical ledgers/tuned entries compare unchanged)."""
    import numpy as np

    return ms_per_step * 4.0 / np.dtype(dtype).itemsize

TUNED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "benchmarks",
    "tuned.json",
)

# Curated defaults (hand-measured; the tuner refines these).
# Diagonal (cross) stencils need step>=2 for axis-0 reuse — same
# constraint the reference tuner encodes (tuning.py:24-25,125).
# Fusion (step=2) beats step=1 on per-timestep throughput for every
# measured stencil (e.g. 2d5pt: 107 vs 74 GStencil/s; 3d7pt: 77 vs 55).
# Wide-radius operators go compute-bound under coefficient fusion
# (2d9pt_star fused step2: 0.39 of naive roofline) — they default to the
# trapezoid.  The tuner refines these per stencil into tuned.json.
_DEFAULTS = {
    "2d5pt_star": dict(variant="stream", step=2, tm=512, lane_mode="roll"),
    "2d5pt_cross": dict(variant="stream", step=2, tm=512, lane_mode="roll"),
    "2d9pt_star": dict(variant="stream", step=2, tm=512, lane_mode="roll",
                       trapezoid=True),
    "2d9pt_cross": dict(variant="stream", step=2, tm=512, lane_mode="roll",
                        trapezoid=True),
    "2d9pt_box": dict(variant="stream", step=2, tm=512, lane_mode="roll",
                      trapezoid=True),
    "2d25pt_box": dict(variant="stream", step=2, tm=512, lane_mode="roll",
                       trapezoid=True),
    # tall 3D layout: tm must exceed the fused row halo step*h*(M+1)
    "3d7pt_star": dict(variant="stream", step=2, tm=8192, trapezoid=True),
    "3d9pt_cross": dict(variant="stream", step=2, tm=8192, trapezoid=True),
}


def best_config(name: str) -> KernelConfig:
    try:
        with open(TUNED_PATH) as f:
            tuned = json.load(f)
        if name in tuned:
            return KernelConfig.from_dict(tuned[name]["config"])
    except (OSError, json.JSONDecodeError, TypeError):
        pass
    return KernelConfig(**_DEFAULTS.get(name, {"variant": "stream"}))


def reconcile_from_ledgers(ledger_dir: str) -> dict:
    """Rebuild tuned.json as the true argmin over every measurement ever
    recorded in the per-stencil ledgers — the authoritative recovery path
    if a short sweep ever wrote a worse entry."""
    import glob

    best: dict = {}
    for path in glob.glob(os.path.join(ledger_dir, "*.ledger.json")):
        name = os.path.basename(path)[: -len(".ledger.json")]
        try:
            with open(path) as f:
                ledger = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for entry in ledger.values():
            if entry.get("status") != "ok":
                continue
            ms = entry.get("ms_per_step")
            if ms is None:
                ms = entry.get("ms_per_pair", 1e18) / (
                    2 * entry["config"].get("step", 1)
                )
            obj = objective_ms(ms, entry["config"].get("dtype", "float32"))
            if name not in best or obj < best[name][0]:
                best[name] = (obj, ms, entry["config"])
    for name, (obj, ms, cfg) in best.items():
        record_best(name, KernelConfig.from_dict(cfg), {"ms_per_step": ms})
    return {k: v[1] for k, v in best.items()}


def record_best(name: str, cfg: KernelConfig, score: dict) -> None:
    """Record a measured best config — monotone: never replaces a stored
    entry whose SoL-normalized objective is better (a short sweep must
    not regress the ledger of a longer earlier one)."""
    tuned = {}
    try:
        with open(TUNED_PATH) as f:
            tuned = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    entry = tuned.get(name, {})
    old = entry.get("score", {}).get("ms_per_step")
    new = score.get("ms_per_step")
    if old is not None and new is not None:
        old_obj = objective_ms(
            old, entry.get("config", {}).get("dtype", "float32"))
        if old_obj <= objective_ms(new, cfg.dtype):
            return
    from dataclasses import asdict

    tuned[name] = {"config": asdict(cfg), "score": score}
    with open(TUNED_PATH, "w") as f:
        json.dump(tuned, f, indent=2, sort_keys=True)
