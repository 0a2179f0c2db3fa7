"""The driver-parse contract: bench.py's LAST stdout line must be a
BOUNDED JSON object with the headline fields + counts, regardless of
battery size (VERDICT r3 #4 / r4 #1 — r3's "compact" line still carried
the full 181-entry per-query medians dict and overflowed the driver's
~2 KB tail capture, so two rounds recorded `parsed: null`; the medians
now live only on the preceding full-record line)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_last_line_is_compact_json():
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        GRAFT_HEADLINE_ONLY="1",
        GRAFT_HEADLINE_REPS="1",
        GRAFT_AMPLIFY="1",
        RAY_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        check=True,
    ).stdout
    lines = [l for l in out.strip().splitlines() if l.startswith("{")]
    assert len(lines) >= 2  # full record first, compact contract last
    compact = json.loads(lines[-1])
    for k in (
        "metric", "value", "unit", "n_queries", "n_errors",
        "budget_exceeded", "sf", "num_cpus", "docs", "docs_per_sec",
    ):
        assert k in compact, k
    assert compact["metric"] == "flagship_conversion_sec"
    assert compact["unit"] == "sec"
    assert isinstance(compact["value"], (int, float))
    assert compact["docs"] > 0
    # battery-size-independent: counts only, no dicts or rep arrays
    assert "raw_headline_secs" not in compact
    assert "queries" not in compact and "errors" not in compact
    assert len(lines[-1]) < 1_500  # the driver tail capture is ~2 KB
    # the full record (per-query medians + raw reps) precedes it
    full = json.loads(lines[-2])
    assert "queries" in full and "raw_headline_secs" in full


def test_bench_battery_names_resolve():
    """Every battery entry must be a real queries() key — a typo would
    surface as an err: count in the driver's BENCH run."""
    import re

    import __ray_entry__ as E

    src = open(os.path.join(REPO, "bench.py")).read()
    m = re.search(
        r"bench_queries = \[\] if.*?else \[(.*?)\n    \]", src, re.S
    )
    names = re.findall(r'"([a-z0-9_]+)"', m.group(1))
    qs = E.queries()
    missing = [n for n in names if n not in qs]
    assert not missing, missing
    assert len(names) == len(set(names)), "duplicate battery entries"
