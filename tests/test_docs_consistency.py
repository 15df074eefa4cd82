"""The published RESULTS tables must agree with benchmarks/tuned.json.

Round-4's advisor finding: the README/BASELINE tables went stale when a
tuned winner moved (the regen was pending but uncommitted), so three
different "current" winners existed depending where you looked.  The
calibration protocol says tables regenerate when a winner config moves
(tuning/regen_baseline.py rewrites both between the RESULTS markers,
tuning/regen_extension.py between the EXT-RESULTS markers); this pins
config-label agreement so staleness fails CI instead of waiting for a
reviewer.

The headline table must hold exactly bench.ALL (the 8 upstream
fixtures — the driver geomean's domain); any further tuned.json entry
(the extension stencils) must be published in the EXT-RESULTS table and
nowhere else.
"""

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402  (repo-root module; import has no side effects)


def _table_configs(path: str, tag: str, required: bool = True) -> dict:
    text = open(os.path.join(ROOT, path)).read()
    m = re.search(rf"<!-- {tag}:BEGIN -->(.*?)<!-- {tag}:END -->",
                  text, re.S)
    assert m, f"{path} has no {tag} markers"
    rows = re.findall(r"^\| (\S+) \| `([^`]+)` \|", m.group(1), re.M)
    if required:
        assert rows, f"{path} {tag} table has no parsable rows"
    return dict(rows)


def test_results_tables_match_tuned_json():
    from drstencil_tpu.ops.config import KernelConfig

    tuned = json.load(open(os.path.join(ROOT, "benchmarks", "tuned.json")))
    winners = {k: KernelConfig.from_dict(v["config"]).label()
               for k, v in tuned.items()}
    for doc in ("README.md", "BASELINE.md"):
        head = _table_configs(doc, "RESULTS")
        ext = _table_configs(doc, "EXT-RESULTS", required=False)
        assert set(head) == set(bench.ALL) & set(winners), (
            f"{doc} headline RESULTS table must hold exactly the "
            f"tuned upstream fixtures\ntable: {sorted(head)}"
        )
        assert not set(ext) & set(head), (
            f"{doc}: stencils published in both tables: "
            f"{sorted(set(ext) & set(head))}"
        )
        published = {**head, **ext}
        stale = {k: (published[k], winners.get(k)) for k in published
                 if winners.get(k) != published[k]}
        assert not stale, (
            f"{doc} table is stale vs benchmarks/tuned.json — run "
            f"`python tuning/regen_baseline.py 3` / regen_extension.py\n"
            f"{stale}"
        )
        unpublished = set(winners) - set(published)
        assert not unpublished, (
            f"{doc}: tuned.json stencils missing from every table "
            f"(run tuning/regen_extension.py): {sorted(unpublished)}"
        )


def test_tuned_winners_construct():
    """Every published winner config must still CONSTRUCT against its
    full-size spec: StencilProgram.__init__ runs analyze, make_geometry
    and the kernel build (all plan/VMEM/legality gates) without
    executing, so a space/stream regression that invalidates a
    published config fails the CPU suite instead of the next TPU run."""
    from drstencil_tpu.ir.spec import load_stc
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram

    tuned = json.load(open(os.path.join(ROOT, "benchmarks", "tuned.json")))
    for name, entry in sorted(tuned.items()):
        spec = load_stc(os.path.join(ROOT, "benchmarks", name + ".stc"))
        cfg = KernelConfig.from_dict(entry["config"])
        prog = StencilProgram(spec, cfg)
        assert prog.pair_fn() is not None, name


def test_tuned_winners_in_space():
    """Every published winner must still be a MEMBER of default_space.

    The space carries compile-sink gates (unrolled-trapezoid tap-row
    gate, b-level gates, VMEM budget) added per round as Mosaic sinks
    were found; a gate tuned too wide would silently orphan a published
    winner — finalists could never re-measure it and the next sweep
    would tune a strictly worse region.  Construction alone
    (test_tuned_winners_construct) doesn't catch that: gated configs
    still construct."""
    from drstencil_tpu.ir.spec import load_stc
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.tune.space import default_space

    tuned = json.load(open(os.path.join(ROOT, "benchmarks", "tuned.json")))
    for name, entry in sorted(tuned.items()):
        spec = load_stc(os.path.join(ROOT, "benchmarks", name + ".stc"))
        cfg = KernelConfig.from_dict(entry["config"])
        assert any(c.cfg == cfg for c in default_space(spec)), (
            f"{name}: published winner {entry['config']} is no longer "
            f"in default_space — a sweep gate excludes it"
        )
