"""Autotuner sweep driver — the reference's tuning.py reborn on TPU.

Per config: build → compile → measure on device → (optionally) check
correctness on device → score against the HBM roofline.  Artifacts mirror
the reference's (SURVEY.md §5):

- ``duration.log``     best-so-far (elapsed_s, ms_per_step) lines
  (tuning.py:104-110);
- ``metrics.csv``      one row per config with kernel time + roofline
  metrics (the gpuMetrics.csv analogue, 57 ncu metrics → our roofline
  record);
- ``ledger.json``      config → status/score; a killed sweep resumes
  (upgrade over the reference, which only had append-only logs);
- ``tuned.json``       best config per stencil (via tune.tuned).

Failures (Mosaic crashes, VMEM OOM) are caught, logged as status=error,
and the sweep continues — the reference's unchecked os.system behaviour
(tuning.py:151-154) upgraded to skip-and-log.
"""

from __future__ import annotations

import csv
import json
import os
import random
import time
from dataclasses import asdict, dataclass
from typing import Optional

from drstencil_tpu.ir.spec import StencilSpec
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram
from drstencil_tpu.tune import tuned as tuned_mod
from drstencil_tpu.tune.space import Candidate, default_space

# relative tolerance vs the on-device XLA gold: fp32 roundoff across a
# few hundred accumulated terms.  bf16 states: BOTH sides now accumulate
# in fp32 (xla_ref upcasts) and round to bf16 once per launch, so the
# only legitimate divergence is fp32 associativity plus at most one
# bf16 ulp at the final rounding — up to 2^-7 ≈ 7.8e-3 relative for a
# value just under a power of two (measured 6.1e-3 on 2d9pt_box) — a
# tight gate (was 5e-2 when the gold accumulated in bf16; VERDICT r2 #5).
CHECK_TOL = {"float32": 1e-3, "bfloat16": 1e-2}

# stdout line prefix the isolated worker uses to hand its result back
# (Pallas/absl log noise shares the stream)
RESULT_MARKER = "DRSTENCIL_RESULT "


@dataclass
class SweepResult:
    best_cfg: Optional[KernelConfig]
    best_ms: float
    tried: int
    errors: int


def measure_config(spec: StencilSpec, cfg: KernelConfig, pairs: int = 10,
                   check: bool = True) -> dict:
    """Build, (device-)check, and time ONE config; returns a ledger entry.

    Module-level so the isolated worker process (tune.worker) and the
    in-process Tuner path run the identical measurement."""
    prog = StencilProgram(spec, cfg)
    entry: dict = {"config": asdict(cfg)}
    if check and cfg.variant != "xla":
        diff = prog.device_check(pairs=1)
        entry["max_dev_diff"] = diff
        if diff > CHECK_TOL.get(cfg.dtype, 1e-3):
            entry["status"] = "check_failed"
            return entry
    res = prog.time(pairs=pairs)
    entry.update(
        status="ok",
        ms_per_pair=res.seconds_per_pair * 1e3,
        # the objective: time per plain timestep — one launch advances
        # `step` timesteps, so deeper fusion amortizes (exactly why the
        # reference fuses; its ncu Duration objective divides the same
        # way since Iterations/(2*step) launches run, tuning.py:24).
        ms_per_step=res.seconds_per_pair * 1e3 / (2 * prog.an.step),
        gstencil_per_s=res.gstencil_per_s,
        eff_gbps=res.achieved_gbps,
        roofline_frac=res.gstencil_per_s / tuned_mod.naive_sol_gstencil(
            prog.dtype.itemsize),
    )
    # modeled HBM traffic vs measured time — the honest `SOL DRAM`
    # analogue (reference getGpuMetrics.py:9): modeled_gbps is the
    # analytic per-apply traffic over the measured per-apply time;
    # padding/refetch overheads show up as modeled_gbps > eff_gbps.
    if cfg.variant != "xla":
        try:
            from drstencil_tpu.utils.profiling import traffic_model

            tmod = traffic_model(prog.an, cfg)
            sec_per_apply = res.seconds_per_pair / 2
            gbps, frac = tmod.achieved(sec_per_apply,
                                       tuned_mod.HBM_PEAK_GBPS)
            entry["modeled_gbps"] = round(gbps, 1)
            entry["modeled_hbm_frac"] = round(frac, 4)
        except Exception:
            pass
    return entry


class Tuner:
    def __init__(self, spec: StencilSpec, out_dir: str,
                 time_budget_s: float = 3600.0, pairs: int = 10,
                 check: bool = True, seed: int = 0,
                 config_timeout_s: float = 420.0,
                 isolate: bool = False, keep_artifacts: bool = False):
        self.spec = spec
        self.out_dir = out_dir
        self.time_budget_s = time_budget_s
        self.pairs = pairs
        self.check = check
        self.seed = seed
        # hard per-config cap: one pathological compile (wide fused
        # operators can take many minutes in Mosaic) must not eat the
        # whole sweep budget; SIGALRM works because sweeps run in the
        # main thread — EXCEPT for Mosaic compile hangs, which only the
        # isolate=True subprocess worker can kill
        self.config_timeout_s = config_timeout_s
        # isolate: per-config subprocess worker (reference parity — each
        # config is its own nvcc+binary run).  Costs a jax+client init
        # per config, so in-process stays the default for bulk sweeps;
        # use isolate for spaces that may contain compile hangs.
        self.isolate = isolate
        # keep_artifacts: write cu/<cfg>.py for EVERY attempted config
        # (reference behaviour, tuning.py:149-151), not just the winner
        self.keep_artifacts = keep_artifacts
        os.makedirs(out_dir, exist_ok=True)
        self.ledger_path = os.path.join(out_dir, f"{spec.name}.ledger.json")
        self.metrics_path = os.path.join(out_dir, "metrics.csv")
        self.duration_path = os.path.join(out_dir, "duration.log")
        self.ledger = self._load_ledger()

    def _load_ledger(self) -> dict:
        try:
            with open(self.ledger_path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def _save_ledger(self):
        with open(self.ledger_path, "w") as f:
            json.dump(self.ledger, f, indent=1, sort_keys=True)

    def _append_metrics(self, row: dict):
        header = ",".join(row)
        try:
            with open(self.metrics_path) as f:
                last_header = None
                for line in f:
                    if line.startswith("stencil,"):
                        last_header = line.rstrip("\n")
        except OSError:
            last_header = None
        with open(self.metrics_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            # append-log across versions: re-emit the header whenever the
            # schema changed since the last header line
            if last_header != header:
                w.writeheader()
            w.writerow(row)

    def _log_best(self, elapsed: float, ms: float):
        with open(self.duration_path, "a") as f:
            f.write(f"{self.spec.name}: {elapsed:.0f} s, {ms:.4f} ms/step\n")

    def _measure_with_timeout(self, cand: Candidate) -> dict:
        import signal
        import threading

        if self.isolate:
            return self._measure_isolated(cand)
        if (self.config_timeout_s <= 0
                or threading.current_thread() is not threading.main_thread()):
            return self._measure(cand)

        def on_alarm(signum, frame):
            raise TimeoutError(
                f"config exceeded {self.config_timeout_s:.0f}s (compile or "
                "run); skipped"
            )

        old = signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(int(self.config_timeout_s))
        try:
            return self._measure(cand)
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    def _measure(self, cand: Candidate) -> dict:
        return measure_config(self.spec, cand.cfg, pairs=self.pairs,
                              check=self.check)

    def _measure_isolated(self, cand: Candidate) -> dict:
        """Measure one config in a fresh subprocess (tune.worker) with a
        hard kill at config_timeout_s.

        The reference gets this isolation for free — every config is its
        own nvcc + binary run (compile_run.sh:4-5).  In-process SIGALRM
        cannot interrupt a Mosaic compile hang (fully-unrolled deep
        levels hang >7 min immune to SIGALRM); killing the process is the
        only reliable cap, and it also quarantines compiler crashes.
        """
        import subprocess
        import sys

        payload = json.dumps({
            "stc": self.spec.to_stc(),
            "name": self.spec.name,
            "config": asdict(cand.cfg),
            "pairs": self.pairs,
            "check": self.check,
        })
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env = dict(os.environ)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "drstencil_tpu.tune.worker"],
                input=payload, capture_output=True, text=True, env=env,
                timeout=self.config_timeout_s if self.config_timeout_s > 0
                else None,
            )
        except subprocess.TimeoutExpired:
            raise TimeoutError(
                f"config exceeded {self.config_timeout_s:.0f}s in isolated "
                "worker (compile or run); process killed, sweep continues"
            )
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith(RESULT_MARKER):
                return json.loads(line[len(RESULT_MARKER):])
        raise RuntimeError(
            f"isolated worker failed (rc={proc.returncode}): "
            f"{proc.stdout[-800:]}\n{proc.stderr[-1500:]}"
        )

    def sweep(self, max_configs: Optional[int] = None,
              log=print, label_filter: Optional[str] = None) -> SweepResult:
        start = time.time()
        cands = list(default_space(self.spec))
        if label_filter:
            import fnmatch

            cands = [c for c in cands
                     if fnmatch.fnmatch(c.cfg.label(), label_filter)]
        rng = random.Random(self.seed)
        rng.shuffle(cands)  # uniform sampling under the time cap
        # but measure the best-known config first — a short sweep must
        # never do worse than the curated defaults / previous best
        prior = tuned_mod.best_config(self.spec.name)
        if prior.variant != "xla" and all(
            c.cfg.label() != prior.label() for c in cands
        ):
            from drstencil_tpu.tune.space import vmem_estimate

            pc = vmem_estimate(self.spec, prior)
            if pc is not None:
                cands.insert(0, pc)
        cands.sort(key=lambda c: c.cfg.label() != prior.label())
        if max_configs:
            cands = cands[:max_configs]

        # best tracking minimizes the SoL-normalized objective (raw ms for
        # fp32; bf16 must be 2x faster to displace an fp32 config — the
        # headline roofline fraction divides by the dtype's own SoL)
        best_obj, best_ms, best_cfg = float("inf"), float("inf"), None
        # seed best from a previous (resumed) sweep
        for label, entry in self.ledger.items():
            if entry.get("status") != "ok":
                continue
            # legacy ledger entries lack ms_per_step; derive it the same
            # way reconcile_from_ledgers does (per-pair time covers
            # 2*step plain timesteps)
            ms = entry.get("ms_per_step")
            if ms is None:
                ms = entry["ms_per_pair"] / (
                    2 * entry["config"].get("step", 1)
                )
            obj = tuned_mod.objective_ms(
                ms, entry["config"].get("dtype", "float32"))
            if obj < best_obj:
                best_obj = obj
                best_ms = ms
                best_cfg = KernelConfig.from_dict(entry["config"])

        tried = errors = 0
        for i, cand in enumerate(cands):
            label = cand.cfg.label()
            if label in self.ledger:
                continue  # resume: already measured
            if time.time() - start > self.time_budget_s:
                log(f"[{self.spec.name}] time budget reached")
                break
            tried += 1
            log(f"[{self.spec.name}] {i + 1}/{len(cands)}: {label}")
            if self.keep_artifacts:
                # reference behaviour: cu/<cfg>.cu for every attempted
                # config (tuning.py:149-151) — written BEFORE measuring so
                # failed/hung configs leave a debuggable artifact too
                self._emit_artifact(cand.cfg, log)
            try:
                entry = self._measure_with_timeout(cand)
            except Exception as e:  # Mosaic/compile/VMEM errors: skip+log
                entry = {
                    "config": asdict(cand.cfg),
                    "status": "error",
                    "error": str(e)[:500],
                }
                errors += 1
            entry["elapsed_s"] = round(time.time() - start, 1)
            self.ledger[label] = entry
            self._save_ledger()
            if entry.get("status") == "ok":
                self._append_metrics(
                    {
                        "stencil": self.spec.name,
                        "config": label,
                        "ms_per_pair": round(entry["ms_per_pair"], 4),
                        "ms_per_step": round(entry["ms_per_step"], 4),
                        "gstencil_per_s": round(entry["gstencil_per_s"], 2),
                        "eff_gbps": round(entry["eff_gbps"], 1),
                        "roofline_frac": round(entry["roofline_frac"], 4),
                        "vmem_bytes": cand.vmem_bytes,
                        "window": cand.window,
                        "modeled_gbps": entry.get("modeled_gbps", ""),
                        "modeled_hbm_frac": entry.get("modeled_hbm_frac", ""),
                        "max_dev_diff": entry.get("max_dev_diff", ""),
                    }
                )
                # 3D parity: the reference logs EVERY 3D config's duration
                # (3d7pt_star/getGpuMetrics.py:25-30), not just bests
                if self.spec.ndim == 3:
                    with open(self.duration_path, "a") as f:
                        f.write(
                            f"{self.spec.name} [{label}]: "
                            f"{entry['ms_per_step']:.4f} ms/step\n"
                        )
                obj = tuned_mod.objective_ms(
                    entry["ms_per_step"], cand.cfg.dtype)
                if obj < best_obj:
                    best_obj = obj
                    best_ms = entry["ms_per_step"]
                    best_cfg = cand.cfg
                    self._log_best(time.time() - start, best_ms)

        if best_cfg is not None:
            tuned_mod.record_best(
                self.spec.name, best_cfg,
                {"ms_per_step": best_ms, "dims": list(self.spec.dims)},
            )
            self._emit_artifact(best_cfg, log)
        return SweepResult(best_cfg=best_cfg, best_ms=best_ms,
                           tried=tried, errors=errors)

    def _emit_artifact(self, cfg: KernelConfig, log=print) -> None:
        """Persist the winning config's generated program under
        ``out_dir/cu/<stencil>__<label>.py`` — the inspectable-artifact
        property of the reference sweep (starter.sh:3-4 keeps
        cu/<cfg>.cu per config; we keep the winner, or every attempted
        config with keep_artifacts).  Soft-fail: artifact emission must
        never kill a sweep."""
        if cfg.variant != "stream":
            return
        if cfg.factor:
            # the native emit ABI has no factor parameter; emitting would
            # write a '..._fac'-labeled artifact containing the plain
            # kernel — silently wrong, so skip (like the variant guard)
            return
        try:
            from drstencil_tpu import native_bridge

            text = native_bridge.emit(
                self.spec.to_stc(), self.spec.name, step=cfg.step,
                distance=cfg.distance, merge_forward=cfg.merge_forward,
                tm=cfg.tm or 0, check=True, dtype=cfg.dtype,
                trapezoid=cfg.trapezoid, lane_mode=cfg.lane_mode or "",
                ch=cfg.ch or 0, vfuse=cfg.vfuse, block=cfg.block,
                prefetch=cfg.prefetch, jfix=cfg.jfix,
            )
            cu_dir = os.path.join(self.out_dir, "cu")
            os.makedirs(cu_dir, exist_ok=True)
            path = os.path.join(
                cu_dir, f"{self.spec.name}__{cfg.label()}.py"
            )
            with open(path, "w") as f:
                f.write(text)
        except Exception as e:
            log(f"[{self.spec.name}] artifact emit skipped: {str(e)[:200]}")


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="drstencil_tpu autotuner")
    ap.add_argument("stc", help=".stc file to tune")
    ap.add_argument("--out-dir", default="tuning")
    ap.add_argument("--budget", type=float, default=3600.0,
                    help="wall-clock budget in seconds (reference: 1h cap)")
    ap.add_argument("--pairs", type=int, default=10)
    ap.add_argument("--max-configs", type=int, default=None)
    ap.add_argument("--filter", default=None,
                    help="fnmatch glob over config labels, e.g. "
                    "'stream_fu2_*ch8*roll' — targeted mini-sweeps")
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--isolate", action="store_true",
                    help="measure each config in its own subprocess with a "
                    "hard kill at the per-config timeout (survives Mosaic "
                    "compile hangs; reference parity: per-config nvcc)")
    ap.add_argument("--keep-artifacts", action="store_true",
                    help="write cu/<cfg>.py for every attempted config "
                    "(reference behaviour), not just the winner")
    ap.add_argument("--config-timeout", type=float, default=420.0,
                    help="per-config cap in seconds (hard kill with "
                    "--isolate, SIGALRM otherwise)")
    args = ap.parse_args(argv)

    from drstencil_tpu.ir.spec import load_stc

    spec = load_stc(args.stc)
    tuner = Tuner(spec, args.out_dir, time_budget_s=args.budget,
                  pairs=args.pairs, check=not args.no_check,
                  isolate=args.isolate, keep_artifacts=args.keep_artifacts,
                  config_timeout_s=args.config_timeout)
    res = tuner.sweep(max_configs=args.max_configs,
                      label_filter=args.filter)
    print(
        f"best for {spec.name}: "
        f"{res.best_cfg.label() if res.best_cfg else 'none'} "
        f"at {res.best_ms:.4f} ms/step ({res.tried} tried, {res.errors} errors)"
    )


if __name__ == "__main__":
    main()
