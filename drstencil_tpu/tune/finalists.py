"""Finalist re-measurement: pick tuned.json winners by best MEDIAN.

A sweep records each config's min-over-noise; the argmin over ~100
noisy measurements systematically flatters the winner (winner's curse —
round-1's self-published table overclaimed 2d5pt_star by 29% vs the
driver-captured bench for exactly this reason; VERDICT.md weak #4).

This pass re-times the top-K ledger configs per stencil REPS times each
within one process (configs compare cleanly in-process; CLAUDE.md
variance notes) and selects the config with the best SoL-normalized
median, then writes tuned.json directly (bypassing record_best's
monotonicity, which would refuse an honest-but-larger number).

Usage: python -m drstencil_tpu.tune.finalists [--out-dir tuning]
       [--top 4] [--reps 3] [--stencils a,b,...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
from dataclasses import asdict

from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram
from drstencil_tpu.tune.tuned import TUNED_PATH, objective_ms

BENCH_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "benchmarks",
)


def top_configs(paths, k: int):
    """Shortlist by recorded objective across current AND archived
    ledgers (archived timings may be stale — e.g. measured on an older
    kernel — but every finalist is re-measured, so staleness only
    influences which configs make the shortlist)."""
    rows = {}
    for ledger_path in paths:
        try:
            with open(ledger_path) as f:
                ledger = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for label, e in ledger.items():
            # one malformed entry must not abort the whole finalist pass
            if not isinstance(e, dict) or e.get("status") != "ok":
                continue
            cfg_d = e.get("config")
            if not isinstance(cfg_d, dict):
                continue
            ms = e.get("ms_per_step")
            if ms is None:
                ms = e.get("ms_per_pair", 1e18) / (
                    2 * cfg_d.get("step", 1))
            obj = objective_ms(ms, cfg_d.get("dtype", "float32"))
            if label not in rows or obj < rows[label][0]:
                rows[label] = (obj, label, cfg_d)
    out = sorted(rows.values(), key=lambda r: r[0])
    return out[:k]


def emit_artifact(spec, cfg: KernelConfig, out_dir: str) -> None:
    """Keep the winner's generated program in out_dir/cu/ in sync with
    tuned.json (the tuner does this during sweeps; a finalist selection
    changes winners too).  Soft-fail like the tuner's emitter."""
    if cfg.variant != "stream" or cfg.factor:
        # no native emit ABI for factor mode — an artifact would contain
        # the plain kernel under a '..._fac' label (see tuner._emit_artifact)
        return
    try:
        from drstencil_tpu import native_bridge

        text = native_bridge.emit(
            spec.to_stc(), spec.name, step=cfg.step, distance=cfg.distance,
            merge_forward=cfg.merge_forward, tm=cfg.tm or 0, check=True,
            dtype=cfg.dtype, trapezoid=cfg.trapezoid,
            lane_mode=cfg.lane_mode or "", ch=cfg.ch or 0, vfuse=cfg.vfuse,
            block=cfg.block, prefetch=cfg.prefetch, jfix=cfg.jfix,
        )
        cu_dir = os.path.join(out_dir, "cu")
        os.makedirs(cu_dir, exist_ok=True)
        with open(os.path.join(
                cu_dir, f"{spec.name}__{cfg.label()}.py"), "w") as f:
            f.write(text)
    except Exception as e:
        print(f"[{spec.name}] artifact emit skipped: {str(e)[:200]}",
              flush=True)


def writeback_medians(ledger_path: str, measured: dict, reps: int) -> None:
    """Fold re-measured medians back into the live ledger.

    Without this, a later sweep's argmin-over-the-ledger (tuner
    record_best, reconcile_from_ledgers) resurrects a lucky-draw raw
    minimum that this pass already overturned — observed round 3:
    2d9pt_cross's refuted 0.5186 re-entered tuned.json via the next
    sweep.  The raw sweep value is preserved as ms_per_step_sweep.
    """
    try:
        with open(ledger_path) as f:
            ledger = json.load(f)
    except (OSError, json.JSONDecodeError):
        return
    changed = False
    for label, med in measured.items():
        e = ledger.get(label)
        if not isinstance(e, dict):
            continue
        e.setdefault("ms_per_step_sweep", e.get("ms_per_step"))
        e["ms_per_step"] = med
        e["protocol"] = f"median-of-{reps}"
        changed = True
    if changed:
        with open(ledger_path, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="tuning")
    ap.add_argument("--top", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--stencils", default="")
    args = ap.parse_args()

    want = set(args.stencils.split(",")) if args.stencils else None
    by_name: dict = {}
    for pat in ("*.ledger.json", os.path.join("archive-*", "*.ledger.json")):
        for path in glob.glob(os.path.join(args.out_dir, pat)):
            name = os.path.basename(path)[: -len(".ledger.json")]
            by_name.setdefault(name, []).append(path)
    results = {}
    for name in sorted(by_name):
        if want and name not in want:
            continue
        spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
        finalists = top_configs(by_name[name], args.top)
        if not finalists:
            continue
        best = None
        measured = {}
        for _, label, cfg_d in finalists:
            cfg = KernelConfig.from_dict(cfg_d)
            try:
                prog = StencilProgram(spec, cfg)
                meds = []
                for _ in range(args.reps):
                    r = prog.time(pairs=args.pairs)
                    meds.append(r.seconds_per_pair * 1e3 / (2 * prog.an.step))
                med = statistics.median(meds)
            except Exception as e:
                print(f"[{name}] {label}: ERROR {str(e)[:120]}", flush=True)
                continue
            measured[label] = med
            obj = objective_ms(med, cfg.dtype)
            print(f"[{name}] {label}: median {med:.4f} ms/step "
                  f"(reps {['%.4f' % m for m in meds]})", flush=True)
            if best is None or obj < best[0]:
                best = (obj, med, label, cfg)
        writeback_medians(
            os.path.join(args.out_dir, name + ".ledger.json"),
            measured, args.reps)
        if best is None:
            continue
        _, med, label, cfg = best
        results[name] = {"config": asdict(cfg),
                         "score": {"ms_per_step": med,
                                   "protocol": f"median-of-{args.reps}"}}
        print(f"[{name}] FINALIST: {label} @ {med:.4f} ms/step", flush=True)
        emit_artifact(spec, cfg, args.out_dir)

    tuned = {}
    try:
        with open(TUNED_PATH) as f:
            tuned = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    tuned.update(results)
    with open(TUNED_PATH, "w") as f:
        json.dump(tuned, f, indent=2, sort_keys=True)
    print(f"tuned.json updated for {sorted(results)}")


if __name__ == "__main__":
    main()
