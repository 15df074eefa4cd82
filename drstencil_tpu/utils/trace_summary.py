"""Extract per-kernel device metrics from a captured jax.profiler trace.

The getGpuMetrics.py analogue (reference
benchmarks/*/getGpuMetrics.py:9 pulls 57 ncu counters per config into
gpuMetrics.csv): given a trace directory written by
``utils.profiling.maybe_trace`` / ``tuning/capture_trace.py``, parse the
Chrome-trace export and aggregate the TPU-device timeline into
per-kernel rows (count, total/mean device ms) — real measured device
time per launch, separating kernel time from module overhead and
ping-pong copies.

Library: ``summarize(trace_dir) -> list[Row]``.
CLI: ``python -m drstencil_tpu.utils.trace_summary <trace_dir> [out.csv]``
prints the table and optionally appends CSV rows (deviceMetrics.csv —
the gpuMetrics.csv analogue).
"""

from __future__ import annotations

import csv
import glob
import gzip
import json
import os
from dataclasses import dataclass


@dataclass(frozen=True)
class Row:
    name: str        # XLA op / module name on the device timeline
    thread: str      # 'XLA Modules' | 'XLA Ops' | ...
    count: int
    total_ms: float

    @property
    def mean_ms(self) -> float:
        return self.total_ms / self.count if self.count else 0.0


def _find_trace_json(trace_dir: str) -> str:
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    hits = [p for pat in pats for p in glob.glob(pat, recursive=True)]
    if not hits:
        raise FileNotFoundError(
            f"no *.trace.json(.gz) under {trace_dir} — was the trace "
            "captured? (see trace_error.txt if present)")
    return max(hits, key=os.path.getmtime)


def summarize(trace_dir: str, device_only: bool = True) -> list[Row]:
    """Aggregate complete ('X') events by (thread, name).

    ``device_only`` keeps processes whose name contains 'TPU' (the
    device timeline); the host python/runtime rows are thousands of
    interpreter frames and rarely what a kernel investigation needs.
    """
    path = _find_trace_json(trace_dir)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    proc_names: dict = {}
    thread_names: dict = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            thread_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    keep = {
        pid for pid, nm in proc_names.items()
        if not device_only or "TPU" in str(nm)
    }
    agg: dict = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in keep:
            continue
        key = (thread_names.get((e["pid"], e["tid"]), str(e.get("tid"))),
               e.get("name", "?"))
        n, tot = agg.get(key, (0, 0.0))
        agg[key] = (n + 1, tot + e.get("dur", 0) / 1e3)
    rows = [Row(name=k[1], thread=k[0], count=n, total_ms=tot)
            for k, (n, tot) in agg.items()]
    rows.sort(key=lambda r: -r.total_ms)
    return rows


def write_csv(rows: list[Row], path: str, label: str = "") -> None:
    """Append rows to a deviceMetrics.csv (gpuMetrics.csv analogue)."""
    new = not os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["label", "thread", "kernel",
                        "count", "total_ms", "mean_ms"])
        for r in rows:
            w.writerow([label, r.thread, r.name, r.count,
                        round(r.total_ms, 4), round(r.mean_ms, 4)])


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="summarize a jax.profiler trace's TPU device timeline")
    ap.add_argument("trace_dir")
    ap.add_argument("out_csv", nargs="?", default=None)
    ap.add_argument("--label", default="",
                    help="CSV row label (config); defaults to the trace "
                    "directory's basename")
    ap.add_argument("--all", action="store_true",
                    help="include host processes, not just the device")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args(argv)
    rows = summarize(args.trace_dir, device_only=not args.all)
    print(f"{'thread':<14} {'kernel':<44} {'n':>4} "
          f"{'total ms':>10} {'mean ms':>9}")
    for r in rows[: args.top]:
        print(f"{r.thread:<14.14} {r.name:<44.44} {r.count:>4} "
              f"{r.total_ms:>10.3f} {r.mean_ms:>9.4f}")
    if args.out_csv:
        label = args.label or os.path.basename(
            os.path.normpath(args.trace_dir))
        write_csv(rows, args.out_csv, label=label)
        print(f"appended {len(rows)} rows to {args.out_csv}")


if __name__ == "__main__":
    main()
