"""The driver parses bench.py's final JSON from the LAST ~2000 chars of
captured output (empirical: round 4's 1756-char line parsed into
BENCH_r04.json; round 5's >2000-char line recorded ``"parsed": null``).
These tests pin the compact-line invariant without launching Spark.
"""

from __future__ import annotations

import importlib.util
import json
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench_lists():
    """Import bench.py's HEADLINE/CORE without pulling in Spark."""
    src = (REPO / "bench.py").read_text()
    head = src.split("def materialize")[0]
    head = head.replace(
        "from fordgobike_data_pipeline_spark import harness  # noqa: E402",
        "harness = None",
    )
    head = head.replace(
        "from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402",
        "get_spark = None",
    )
    ns = {"__file__": str(REPO / "bench.py")}
    exec(compile(head, "bench_head", "exec"), ns)
    return ns["HEADLINE"], ns["CORE"]


def test_headline_names_resolve():
    from fordgobike_data_pipeline_spark import harness

    headline, core = _load_bench_lists()
    known = set(harness.all_queries())
    missing = [n for n in headline if n not in known]
    assert not missing, f"bench HEADLINE names not in harness: {missing}"
    assert set(core) <= set(headline)


def test_compact_line_fits_driver_tail_window():
    """Worst-case compact line (every timing at max width, triple-digit
    totals) must stay under 1900 chars so the full line survives the
    driver's 2000-char tail capture."""
    headline, core = _load_bench_lists()
    timings = {n: 99.999 for n in headline}
    core_timings = {n: timings[n] for n in core}
    compact = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": core_timings,
        "sf": 0.1,
        "runs_per_query": 3,
        "aggregation": "min",
        "n_queries": len(timings),
        "core_total": round(sum(core_timings.values()), 3),
        "pipeline_e2e": {"n_trips": 200000, "sec": 99.999},
        "regression_count": 99,
        "full": "BENCH_FULL.json",
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1900, (
        f"compact bench line is {len(line)} chars; the driver only "
        "captures the last ~2000 — shrink CORE or the extra fields"
    )
    # and it parses back from a simulated tail capture
    captured = ("noise\n" * 1000 + line + "\n")[-2000:]
    assert json.loads(captured.splitlines()[-1])["metric"] == compact["metric"]
