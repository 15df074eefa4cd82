"""Tests for the Python CLI module and the profiling/roofline model."""

import json
import os
import subprocess
import sys

import pytest

from drstencil_tpu.ir.passes import analyze
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.utils.profiling import maybe_trace, traffic_model

from conftest import BENCH_DIR, small_spec


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "drstencil_tpu.cli", *args],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir),
    )


def test_cli_dump_analysis():
    r = run_cli(os.path.join(BENCH_DIR, "2d5pt_star.stc"),
                "--step", "2", "--dump-analysis")
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["order"] == 2 and out["distance"] == 2


def test_cli_emit(tmp_path):
    out_py = str(tmp_path / "o.py")
    r = run_cli(os.path.join(BENCH_DIR, "2d9pt_box.stc"),
                "-o", out_py, "--bx", "64", "--check")
    assert r.returncode == 0, r.stderr
    text = open(out_py).read()
    assert "pl.pallas_call" in text
    assert "golden_apply" in text


def test_cli_error_path(tmp_path):
    bad = tmp_path / "bad.stc"
    bad.write_text("M 8 N 8 iteratioins 1 stencil 0 0 1.0")
    r = run_cli(str(bad))
    assert r.returncode == 1
    assert "iteratioins" in r.stderr


def test_traffic_model_sane():
    spec = small_spec("2d5pt_star", dims=(256, 1024))
    an = analyze(spec, step=1)
    tmdl = traffic_model(an, KernelConfig(variant="stream", tm=64))
    cells = 256 * 1024
    # reads within [1x, 1.6x] of the array, writes within [1x, 1.3x]
    assert cells * 4 <= tmdl.read_bytes <= 1.6 * cells * 4
    assert cells * 4 <= tmdl.write_bytes <= 1.3 * cells * 4
    assert tmdl.flops == 2 * 5 * cells
    gbps, frac = tmdl.achieved(seconds_per_apply=1e-3, peak_gbps=819.0)
    assert gbps > 0 and 0 < frac < 1


def test_maybe_trace_noop():
    with maybe_trace(None) as active:
        assert active is False
