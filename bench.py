#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Runs the benchmark stencil suite (the reference's 8 .stc configs,
BASELINE.md) with the framework's best-known kernel configs, measures
per-pair device time via the slope protocol, and reports the geometric
mean over stencils of

    GStencil/s  /  naive-roofline GStencil/s

where the denominator (HBM peak / 8 bytes-per-cell-step = 102.4 for fp32
on v5e) is the speed of light of an UNFUSED sweep.  Temporal fusion can
legitimately exceed 1.0 — one launch advances `step` timesteps on one
read+write of the grid; that is the data-reuse the reference (and this
framework) exists to exploit.  BASELINE.md's >= 0.85-of-roofline target
reads 0.85 on this metric.

vs_baseline is the same number (the reference publishes no numbers —
BASELINE.md documents the empty published set).

Environment hardening (VERDICT.md r3 weak #1: a wedged TPU relay made
BENCH_r03 read 0.0): the parent process never touches JAX.  It

  1. pre-flight probes the device in a SUBPROCESS (tiny matmul + scalar
     fetch — the only real sync on the axon relay) with bounded
     retries/backoff,
  2. runs the suite in a subprocess (fresh TPU client per attempt),
  3. re-probes and retries ONLY the environment-failed stencils once,
  4. and if the environment never comes back, emits a JSON whose
     detail carries an unambiguous ``environment_error`` marker instead
     of folding failures into the geomean as fake 1e-6 scores.

Per-stencil errors are classified: device/relay/init signatures are
environment errors (excluded from the geomean, retried, marked);
anything else means the tuned config itself is broken and scores 1e-6 —
a perf bug must still hurt.  The reference's generated programs abort
visibly on device errors (codegen.hpp:99-105); this is the
one-JSON-line-contract equivalent.

Env knobs:
  BENCH_STENCILS=name1,name2   subset (default: all 8)
  BENCH_PAIRS=N                timed pairs (default 12)
  BENCH_REPEATS=N              timing repetitions per stencil, median-of;
                               forced odd (even N is bumped to N+1) so
                               the median is a real draw, never a
                               synthetic mean of two noisy ones
                               (default 3)
  BENCH_CHECK=1                also run on-device differential checks
  BENCH_PROBE_BACKOFF=s1,s2    probe retry backoff seconds
                               (default 0,20,60,120)
  BENCH_SUITE_TIMEOUT=secs     per-suite-attempt timeout (default 7200)
"""

import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_DIR = os.path.join(REPO, "benchmarks")

ALL = [
    "2d5pt_star",
    "2d5pt_cross",
    "2d9pt_star",
    "2d9pt_cross",
    "2d9pt_box",
    "2d25pt_box",
    "3d7pt_star",
    "3d9pt_cross",
]

METRIC = "geomean stencil throughput vs naive HBM roofline"
UNIT = (
    "GStencil/s over naive-sweep speed-of-light "
    "(102.4 GStencil/s fp32 @ 819 GB/s; fusion can exceed 1.0; "
    "target 0.85)"
)

# Signatures of the relay/libtpu environment failures seen in
# BENCH_r03 / MULTICHIP_r01/r02 tails, plus generic device-loss ones.
# A message matching any of these means the DEVICE is broken, not the
# tuned config.
_ENV_SIGNATURES = (
    "FAILED_PRECONDITION",
    "TPU backend error",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "version mismatch",
    "libtpu",
    "Unable to initialize backend",
    "failed to connect",
    "No visible TPU",
    "ABORTED",
)


def is_env_error(msg: str) -> bool:
    return any(sig in msg for sig in _ENV_SIGNATURES)


def _probe_inprocess():
    """Tiny on-device op + scalar fetch; raises if the backend is wedged.

    Scalar fetch (float()) is the only true sync on the axon relay —
    jax.block_until_ready is a no-op there (CLAUDE.md platform gotchas).
    """
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128), jnp.float32)
    s = float(jnp.sum(x @ x.T))
    assert s == 8 * 128 * 8, s
    print(f"probe: ok ({jax.default_backend()})")


def _suite():
    """Run the stencil suite in THIS process and print the JSON line.

    Called in a subprocess by the orchestrator so every attempt gets a
    fresh TPU client; also runnable directly (python bench.py --suite).
    """
    from drstencil_tpu.ir.spec import load_stc
    from drstencil_tpu.ops.runner import StencilProgram
    from drstencil_tpu.tune.tuned import best_config, naive_sol_gstencil

    names = os.environ.get("BENCH_STENCILS")
    names = names.split(",") if names else ALL
    pairs = int(os.environ.get("BENCH_PAIRS", "12"))
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
    if repeats % 2 == 0:
        repeats += 1  # median-of-odd only (VERDICT.md r3 weak #6)
    do_check = os.environ.get("BENCH_CHECK", "0") == "1"

    detail = {}
    for name in names:
        spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
        cfg = best_config(name)
        try:
            prog = StencilProgram(spec, cfg)
            # median over repeats (not best-of): min-selection re-inherits
            # the winner's curse the finalists/BASELINE protocol removes
            runs = sorted(
                (prog.time(pairs=pairs) for _ in range(repeats)),
                key=lambda r: r.seconds_per_pair,
            )
            res = runs[len(runs) // 2]
        except Exception as e:
            msg = str(e)[:300]
            key = "env_error" if is_env_error(msg) else "error"
            detail[name] = {"cfg": cfg.label(), key: msg}
            print(f"# {name}: {key.upper()} {msg[:200]}", file=sys.stderr)
            continue
        frac = res.gstencil_per_s / naive_sol_gstencil(prog.dtype.itemsize)
        detail[name] = {
            "cfg": cfg.label(),
            "ms_per_pair": round(res.seconds_per_pair * 1e3, 4),
            "ms_per_step": round(
                res.seconds_per_pair * 1e3 / (2 * prog.an.step), 4),
            "gstencil_per_s": round(res.gstencil_per_s, 2),
            "eff_gbps": round(res.achieved_gbps, 1),
            "roofline_frac": round(frac, 4),
        }
        if do_check:
            detail[name]["max_dev_diff"] = prog.device_check(pairs=1)
        print(f"# {name}: {detail[name]}", file=sys.stderr)

    print(json.dumps(_assemble(detail)))


def _assemble(detail: dict) -> dict:
    """The one-line JSON from per-stencil detail rows.

    Geomean over scored stencils only: ok rows contribute their roofline
    fraction, broken-config rows contribute 1e-6 (a perf bug must hurt),
    environment-failed rows are EXCLUDED and flagged — a wedged relay is
    not a perf number.
    """
    fracs = []
    env_failed = []
    for name, row in detail.items():
        if "roofline_frac" in row:
            fracs.append(max(row["roofline_frac"], 1e-9))
        elif "env_error" in row:
            env_failed.append(name)
        else:
            fracs.append(1e-6)
    if fracs:
        geomean = math.exp(sum(math.log(f) for f in fracs) / len(fracs))
    else:
        geomean = 0.0
    out = {
        "metric": METRIC,
        "value": round(geomean, 4),
        "unit": UNIT,
        "vs_baseline": round(geomean, 4),
        "detail": detail,
    }
    if env_failed:
        out["detail"]["_environment"] = {
            "environment_error": True,
            "stencils_env_failed": env_failed,
            "note": "device/relay failure, NOT a perf result; "
                    "geomean covers the scored stencils only",
        }
    return out


# ---------------------------------------------------------------- parent


def _run_probe() -> "subprocess.CompletedProcess":
    return subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )


def _probe_with_retries(backoffs) -> tuple:
    """(ok, last_tail): retry the subprocess probe across backoffs."""
    tail = ""
    for i, delay in enumerate(backoffs):
        if delay:
            print(f"# probe retry in {delay}s", file=sys.stderr)
            time.sleep(delay)
        try:
            proc = _run_probe()
        except subprocess.TimeoutExpired:
            tail = "probe timeout (relay stalled >600s)"
            print(f"# probe attempt {i + 1}: {tail}", file=sys.stderr)
            continue
        if proc.returncode == 0 and "probe: ok" in proc.stdout:
            return True, proc.stdout.strip()
        tail = (proc.stdout + proc.stderr)[-2000:]
        print(f"# probe attempt {i + 1} failed (rc={proc.returncode})",
              file=sys.stderr)
    return False, tail


def _run_suite(names, timeout) -> dict:
    """One suite attempt in a fresh subprocess; returns per-stencil
    detail (synthesizing env_error rows if the whole process died)."""
    env = dict(os.environ)
    if names is not None:
        env["BENCH_STENCILS"] = ",".join(names)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--suite"],
            capture_output=True, text=True, timeout=timeout, cwd=REPO,
            env=env,
        )
    except subprocess.TimeoutExpired as e:
        tail = ((e.stdout or "") + (e.stderr or ""))[-1000:]
        return {n: {"env_error": f"suite timeout after {timeout}s: {tail}"}
                for n in (names or ALL)}
    sys.stderr.write(proc.stderr)
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)["detail"]
            except (json.JSONDecodeError, KeyError):
                break
    # no JSON line: the process crashed before assembling — environment
    tail = (proc.stdout + proc.stderr)[-1000:]
    return {n: {"env_error": f"suite crashed (rc={proc.returncode}): {tail}"}
            for n in (names or ALL)}


def main():
    backoffs = [
        float(s) for s in
        os.environ.get("BENCH_PROBE_BACKOFF", "0,20,60,120").split(",")
    ]
    timeout = float(os.environ.get("BENCH_SUITE_TIMEOUT", "7200"))
    names = os.environ.get("BENCH_STENCILS")
    names = names.split(",") if names else ALL

    ok, tail = _probe_with_retries(backoffs)
    if not ok:
        print(json.dumps({
            "metric": METRIC, "value": 0.0, "unit": UNIT,
            "vs_baseline": 0.0,
            "detail": {"_environment": {
                "environment_error": True,
                "note": "device probe never succeeded; NOT a perf result",
                "probe_attempts": len(backoffs),
                "probe_tail": tail[-1500:],
            }},
        }))
        return

    detail = _run_suite(names, timeout)
    detail.pop("_environment", None)
    failed = [n for n, row in detail.items() if "env_error" in row]
    if failed:
        print(f"# retrying env-failed stencils once: {failed}",
              file=sys.stderr)
        ok, _ = _probe_with_retries(backoffs)
        if ok:
            retry = _run_suite(failed, timeout)
            retry.pop("_environment", None)
            detail.update(retry)
    print(json.dumps(_assemble(detail)))


if __name__ == "__main__":
    if "--probe" in sys.argv:
        _probe_inprocess()
    elif "--suite" in sys.argv:
        _suite()
    else:
        main()
