"""bench.py hardening: a wedged device must read as an ENVIRONMENT
error, never as a perf score (VERDICT.md r3 weak #1 — BENCH_r03 recorded
geomean 0.0 because every stencil hit the relay's FAILED_PRECONDITION
libtpu skew and bench.py folded each into the geomean as 1e-6)."""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_env_error_classifier():
    assert bench.is_env_error(
        "FAILED_PRECONDITION: TPU backend error (FailedPrecondition).")
    assert bench.is_env_error("UNAVAILABLE: failed to connect to relay")
    assert bench.is_env_error("libtpu version mismatch: client vs terminal")
    # a broken tuned config is NOT an environment error
    assert not bench.is_env_error("tm=96 does not divide padded rows")
    assert not bench.is_env_error("Mosaic lowering failed: unsupported op")


def test_assemble_separates_env_from_config_errors():
    detail = {
        "2d5pt_star": {"cfg": "a", "roofline_frac": 1.0},
        "2d9pt_star": {"cfg": "b", "error": "bad config"},
        "3d7pt_star": {"cfg": "c", "env_error": "FAILED_PRECONDITION: ..."},
    }
    out = bench._assemble(detail)
    # geomean over {1.0, 1e-6} only — the env-failed stencil is excluded
    assert out["value"] == round((1.0 * 1e-6) ** 0.5, 4)
    marker = out["detail"]["_environment"]
    assert marker["environment_error"] is True
    assert marker["stencils_env_failed"] == ["3d7pt_star"]


def test_assemble_all_env_failed_scores_zero_with_marker():
    detail = {n: {"env_error": "TPU backend error"} for n in bench.ALL}
    out = bench._assemble(detail)
    assert out["value"] == 0.0
    assert out["detail"]["_environment"]["environment_error"] is True


def test_assemble_clean_run_has_no_marker():
    detail = {n: {"cfg": "x", "roofline_frac": 0.9} for n in bench.ALL}
    out = bench._assemble(detail)
    assert out["value"] == 0.9
    assert "_environment" not in out["detail"]


def test_retry_merges_recovered_stencils(monkeypatch, capsys):
    """main() retries only the env-failed stencils and merges the
    recovered rows — a transient wedge costs nothing."""
    first = {
        "2d5pt_star": {"cfg": "a", "roofline_frac": 1.0},
        "2d9pt_star": {"cfg": "b", "env_error": "TPU backend error"},
    }
    second = {"2d9pt_star": {"cfg": "b", "roofline_frac": 1.0}}
    calls = []

    monkeypatch.setattr(bench, "_probe_with_retries", lambda b: (True, "ok"))
    monkeypatch.setattr(
        bench, "_run_suite",
        lambda names, timeout: calls.append(names) or
        (dict(first) if len(calls) == 1 else dict(second)))
    monkeypatch.setenv("BENCH_STENCILS", "2d5pt_star,2d9pt_star")
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls == [["2d5pt_star", "2d9pt_star"], ["2d9pt_star"]]
    assert out["value"] == 1.0
    assert "_environment" not in out["detail"]


def test_persistent_env_failure_keeps_marker(monkeypatch, capsys):
    failing = {"2d5pt_star": {"cfg": "a", "env_error": "TPU backend error"}}
    monkeypatch.setattr(bench, "_probe_with_retries", lambda b: (True, "ok"))
    monkeypatch.setattr(bench, "_run_suite",
                        lambda names, timeout: dict(failing))
    monkeypatch.setenv("BENCH_STENCILS", "2d5pt_star")
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 0.0
    assert out["detail"]["_environment"]["environment_error"] is True


@pytest.mark.slow
def test_bench_survives_broken_backend_end_to_end():
    """The BENCH_r03 failure mode, end to end: a backend whose init
    raises.  bench.py must exit 0 with an unambiguous environment
    marker instead of a fake perf score (mirrors
    test_dryrun_survives_broken_default_backend)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "bogus_broken_tpu"
    # the axon sitecustomize hook force-registers the relay TPU and
    # overrides JAX_PLATFORMS; empty pool disables it (CLAUDE.md) so the
    # bogus platform really breaks backend init
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["BENCH_PROBE_BACKOFF"] = "0,0"  # no real sleeps in tests
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["value"] == 0.0
    assert out["detail"]["_environment"]["environment_error"] is True
    assert "probe" in out["detail"]["_environment"]["note"]


def test_suite_repeats_forced_odd(monkeypatch):
    """BENCH_REPEATS even values are bumped to odd — median-of-odd only
    (VERDICT.md r3 weak #6 killed the mean-of-middle-two synthesis)."""
    src = open(os.path.join(REPO, "bench.py")).read()
    assert "repeats += 1" in src
    assert "statistics.mean" not in src  # synthesis branch deleted
