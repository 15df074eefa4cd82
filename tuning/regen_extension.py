"""Regenerate the EXTENSION-benchmark results table (beyond-reference).

Same protocol as regen_baseline.py — N full driver-protocol bench runs,
per-stencil medians — but over the three extension stencils
(benchmarks/{2d13pt_star,3d13pt_star,3d27pt_box}.stc) and splicing
between EXT-RESULTS markers, so the headline 8-fixture table and its
geomean are never touched.

Usage: python tuning/regen_extension.py [runs=3]
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
EXT = ["2d13pt_star", "3d13pt_star", "3d27pt_box"]

runs = []
for i in range(RUNS):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, cwd=ROOT, timeout=3600,
        env={**os.environ, "BENCH_REPEATS": "3",
             "BENCH_STENCILS": ",".join(EXT)},
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        # a crashed bench run must not discard the completed ones
        print(f"!! run {i + 1}/{RUNS} produced no JSON line "
              f"(rc={out.returncode}); stderr tail:\n"
              + out.stderr[-2000:], file=sys.stderr)
        continue
    rec = json.loads(lines[-1])
    runs.append(rec)
    print(f"run {i + 1}/{RUNS}: geomean {rec['value']}", flush=True)

if not runs:
    sys.exit("regen_extension: every bench run failed — nothing to splice")

names = [n for n in runs[0]["detail"] if n != "_environment"]
med = {}
for name in names:
    ds = [r["detail"][name] for r in runs]
    if any("error" in d or "env_error" in d for d in ds):
        print(f"!! {name} errored in a run", file=sys.stderr)
    good = [d for d in ds if "ms_per_step" in d]
    if not good:
        # keep the stencils that did measure instead of crashing the splice
        print(f"!! {name} errored in EVERY run — omitted from the table",
              file=sys.stderr)
        continue
    ms = statistics.median(d["ms_per_step"] for d in good)
    med[name] = min(good, key=lambda d: abs(d["ms_per_step"] - ms))
names = [n for n in names if n in med]

if not med:
    sys.exit("regen_extension: no stencil measured in any run — aborting")
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
    f"\n**Extension geomean vs naive roofline: {geomean:.3f}** "
    f"(median of {RUNS} driver-protocol bench runs; NOT part of the "
    f"headline 8-fixture geomean)."
)
table = "\n".join(rows)

marker_a = "<!-- EXT-RESULTS:BEGIN -->"
marker_b = "<!-- EXT-RESULTS:END -->"
for fname in ("BASELINE.md", "README.md"):
    path = os.path.join(ROOT, fname)
    text = open(path).read()
    if marker_a in text:
        new = re.sub(
            re.escape(marker_a) + r".*?" + re.escape(marker_b),
            marker_a + "\n" + table + "\n" + marker_b,
            text, flags=re.S,
        )
        open(path, "w").write(new)
        print(f"{fname} updated")
    else:
        print(f"{fname}: no {marker_a} marker — add one where the table "
              f"belongs and re-run", file=sys.stderr)
print(table)
