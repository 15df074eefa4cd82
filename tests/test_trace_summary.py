"""Device-timeline metrics extraction (the getGpuMetrics.py analogue)."""

import gzip
import json
import os

import pytest

from drstencil_tpu.utils.trace_summary import Row, summarize, write_csv

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def _mk_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_summarize_aggregates_device_events_only(tmp_path):
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # two launches of the same kernel: 1.5 ms + 2.5 ms
        {"ph": "X", "pid": 3, "tid": 2, "name": "pair.2", "dur": 1500},
        {"ph": "X", "pid": 3, "tid": 2, "name": "pair.2", "dur": 2500},
        # host event must be excluded by default
        {"ph": "X", "pid": 7, "tid": 9, "name": "python_gunk", "dur": 9999},
    ]
    rows = summarize(_mk_trace(tmp_path, events))
    assert rows == [Row(name="pair.2", thread="XLA Ops",
                        count=2, total_ms=4.0)]
    assert rows[0].mean_ms == 2.0
    # --all keeps the host rows
    assert len(summarize(str(tmp_path), device_only=False)) == 2


def test_missing_trace_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        summarize(str(tmp_path))


def test_csv_roundtrip(tmp_path):
    rows = [Row(name="k", thread="XLA Ops", count=3, total_ms=6.0)]
    out = tmp_path / "deviceMetrics.csv"
    write_csv(rows, str(out), label="cfgA")
    write_csv(rows, str(out), label="cfgB")  # append, header once
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("label,")
    assert len(lines) == 3
    assert lines[1].split(",")[0] == "cfgA"


def test_checked_in_star_trace_parses():
    """The committed round-4 artifact must keep parsing: the 2d9pt_star
    winner's device timeline with the timed pair launches visible."""
    trace_dir = os.path.join(REPO, "tuning", "trace_star")
    if not os.path.isdir(trace_dir):
        pytest.skip("trace_star artifact not present")
    rows = summarize(trace_dir)
    pairs = [r for r in rows if r.name.startswith("pair.")]
    assert len(pairs) == 2  # the two ping-pong kernel applications
    assert all(p.count == 25 for p in pairs)
    assert all(1.0 < p.mean_ms < 2.5 for p in pairs)
