"""Regenerate BASELINE.md's results table from driver-protocol bench runs.

VERDICT round-1 flagged a 29% gap between BASELINE.md's claims and the
driver-captured BENCH_r01.json (stale tuned.json + cross-process
variance).  This script closes the loop: it runs `python bench.py` (the
EXACT driver protocol) N times, takes per-stencil MEDIANS of ms/step,
and rewrites the results section of BASELINE.md from those numbers, so
the published table is definitionally within run-to-run noise of the
next BENCH_r*.json.

Usage: python tuning/regen_baseline.py [runs=3]
"""

import json
import math
import os
import re
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

runs = []
for i in range(RUNS):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, cwd=ROOT, timeout=3600,
        env={**os.environ, "BENCH_REPEATS": "3"},
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    runs.append(rec)
    print(f"run {i + 1}/{RUNS}: geomean {rec['value']}", flush=True)

names = [n for n in runs[0]["detail"] if n != "_environment"]
med = {}
for name in names:
    ds = [r["detail"][name] for r in runs]
    if any("error" in d or "env_error" in d for d in ds):
        print(f"!! {name} errored in a run", file=sys.stderr)
    ms = statistics.median(d["ms_per_step"] for d in ds if "ms_per_step" in d)
    pick = min(
        (d for d in ds if "ms_per_step" in d),
        key=lambda d: abs(d["ms_per_step"] - ms),
    )
    med[name] = pick

fracs = [d["roofline_frac"] for d in med.values()]
geomean = math.exp(sum(math.log(f) for f in fracs) / len(fracs))

rows = [
    "| stencil | config | ms/step | GStencil/s | GB/s (eff.) | vs naive SoL |",
    "|---|---|---|---|---|---|",
]
for name in names:
    d = med[name]
    rows.append(
        f"| {name} | `{d['cfg']}` | {d['ms_per_step']:.4f} | "
        f"{d['gstencil_per_s']:.1f} | {d['eff_gbps']:.0f} | "
        f"**{d['roofline_frac']:.2f}** |"
    )
rows.append(
    f"\n**Geomean vs naive roofline: {geomean:.3f}** "
    f"(median of {RUNS} driver-protocol bench runs; per-stencil medians)."
)
table = "\n".join(rows)

marker_a = "<!-- RESULTS:BEGIN -->"
marker_b = "<!-- RESULTS:END -->"
for fname in ("BASELINE.md", "README.md"):
    path = os.path.join(ROOT, fname)
    text = open(path).read()
    if marker_a in text:
        new = re.sub(
            re.escape(marker_a) + r".*?" + re.escape(marker_b),
            marker_a + "\n" + table + "\n" + marker_b,
            text, flags=re.S,
        )
    elif fname == "BASELINE.md":
        new = text.rstrip() + f"\n\n{marker_a}\n{table}\n{marker_b}\n"
    else:
        continue  # README without markers: leave untouched
    open(path, "w").write(new)
    print(f"{fname} updated")
print(table)
