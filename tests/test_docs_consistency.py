"""The published RESULTS tables must agree with benchmarks/tuned.json.

Round-4's advisor finding: the README/BASELINE tables went stale when a
tuned winner moved (the regen was pending but uncommitted), so three
different "current" winners existed depending where you looked.  The
calibration protocol says tables regenerate when a winner config moves
(tuning/regen_baseline.py rewrites both between the RESULTS markers);
this pins config-label agreement so staleness fails CI instead of
waiting for a reviewer.
"""

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _table_configs(path: str) -> dict:
    text = open(os.path.join(ROOT, path)).read()
    m = re.search(r"<!-- RESULTS:BEGIN -->(.*?)<!-- RESULTS:END -->",
                  text, re.S)
    assert m, f"{path} has no RESULTS markers"
    rows = re.findall(r"^\| (\S+) \| `([^`]+)` \|", m.group(1), re.M)
    assert rows, f"{path} RESULTS table has no parsable rows"
    return dict(rows)


def test_results_tables_match_tuned_json():
    from drstencil_tpu.ops.config import KernelConfig

    tuned = json.load(open(os.path.join(ROOT, "benchmarks", "tuned.json")))
    winners = {k: KernelConfig.from_dict(v["config"]).label()
               for k, v in tuned.items()}
    for doc in ("README.md", "BASELINE.md"):
        table = _table_configs(doc)
        assert table == winners, (
            f"{doc} RESULTS table is stale vs benchmarks/tuned.json — "
            f"run `python tuning/regen_baseline.py 3`\n"
            f"table:   {table}\nwinners: {winners}"
        )
