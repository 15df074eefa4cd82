"""Render tuning artifacts into a human-readable summary.

``python -m drstencil_tpu.tune.report [--out-dir tuning]`` prints a
markdown table of the best measured config per stencil (from tuned.json)
plus sweep coverage stats from the ledgers — the human-facing face of the
duration.log / gpuMetrics.csv artifacts.
"""

from __future__ import annotations

import glob
import json
import os


def _stencil_dims(name: str, entry: dict) -> tuple:
    """Grid dims for a tuned entry: recorded score['dims'] if present,
    else the benchmark .stc next to tuned.json, else the historical
    benchmark-suite sizes as a last resort."""
    dims = entry.get("score", {}).get("dims")
    if dims:
        return tuple(dims)
    from drstencil_tpu.tune import tuned as tuned_mod

    stc = os.path.join(os.path.dirname(tuned_mod.TUNED_PATH), f"{name}.stc")
    try:
        from drstencil_tpu.ir.spec import load_stc

        return tuple(load_stc(stc).dims)
    except Exception:
        return (512, 512, 512) if name.startswith("3d") else (8192, 8192)


def render(out_dir: str = "tuning", tuned_path: str | None = None) -> str:
    from drstencil_tpu.tune import tuned as tuned_mod

    tuned_path = tuned_path or tuned_mod.TUNED_PATH
    lines = ["| stencil | best config | ms/step | GStencil/s | vs naive SoL "
             "| configs tried (ok/err) |",
             "|---|---|---|---|---|---|"]
    try:
        with open(tuned_path) as f:
            tuned = json.load(f)
    except (OSError, json.JSONDecodeError):
        tuned = {}

    for name in sorted(tuned):
        cfg = tuned_mod.KernelConfig.from_dict(tuned[name]["config"])
        ms = tuned[name]["score"].get("ms_per_step")
        ledger_path = os.path.join(out_dir, f"{name}.ledger.json")
        n_ok = n_err = 0
        cells = None
        try:
            with open(ledger_path) as f:
                ledger = json.load(f)
            n_ok = sum(1 for e in ledger.values() if e.get("status") == "ok")
            n_err = len(ledger) - n_ok
        except (OSError, json.JSONDecodeError):
            pass
        dims = _stencil_dims(name, tuned[name])
        cells = 1
        for d in dims:
            cells *= d
        if ms:
            import numpy as np

            gst = cells / (ms * 1e-3) / 1e9
            frac = gst / tuned_mod.naive_sol_gstencil(
                np.dtype(cfg.dtype).itemsize)
            lines.append(
                f"| {name} | {cfg.label()} | {ms:.4f} | {gst:.1f} "
                f"| {frac:.2f} | {n_ok}/{n_err} |"
            )
    geo = 1.0
    count = 0
    for name in tuned:
        import numpy as np

        ms = tuned[name]["score"].get("ms_per_step")
        if not ms:
            continue
        cfg = tuned_mod.KernelConfig.from_dict(tuned[name]["config"])
        dims = _stencil_dims(name, tuned[name])
        cells = 1
        for d in dims:
            cells *= d
        geo *= (cells / (ms * 1e-3) / 1e9) / tuned_mod.naive_sol_gstencil(
            np.dtype(cfg.dtype).itemsize)
        count += 1
    if count:
        lines.append(f"\ngeomean vs naive roofline: "
                     f"**{geo ** (1 / count):.3f}** over {count} stencils")
    return "\n".join(lines)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="tuning summary report")
    ap.add_argument("--out-dir", default="tuning")
    args = ap.parse_args(argv)
    print(render(args.out_dir))


if __name__ == "__main__":
    main()
