"""Isolated best-of-N re-time of flagged bench queries vs the anchor.

The official per-round bench runs while the driver is busy; sub-second
queries show uniform 1.5-1.9x inflation under that contention that a
clean rerun clears (round-6 pattern, NOTES_r06.md). This tool re-times
ONLY the flagged names, isolated, best-of-N, and writes a JSON verdict
so regressions can be separated into "contention" vs "real" before
anyone re-anchors or panics.

Usage: python tools/bench_recheck.py out.json q_a q_b ...
       (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_BENCH_RUNS honoured)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fordgobike_data_pipeline_spark import harness  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    out_path, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    anchor_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_ANCHOR.json",
    )
    anchor = json.load(open(anchor_path))["queries"]

    spark = get_spark(app_name="bench-recheck")
    spark.sparkContext.setLogLevel("ERROR")
    queries = harness.all_queries()
    materialize(queries["q_agg_daily_summary"](spark, sf_dir))  # warmup

    result = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            materialize(queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        a = anchor.get(name)
        result[name] = {
            "anchor": a,
            "isolated_best": round(best, 3),
            "ratio": round(best / a, 2) if a else None,
        }
        print(name, result[name], flush=True)

    cleared = [n for n, r in result.items() if r["ratio"] and r["ratio"] <= 1.5]
    persistent = [n for n, r in result.items() if r["ratio"] and r["ratio"] > 1.5]
    no_anchor = [n for n, r in result.items() if r["ratio"] is None]
    payload = {
        "sf_dir": sf_dir,
        "runs_per_query": runs,
        "queries": result,
        "cleared": cleared,
        "persistent": persistent,
        "no_anchor": no_anchor,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"\ncleared {len(cleared)}/{len(result)}; persistent: {persistent}")
    if no_anchor:
        print(f"NO ANCHOR (typo or never anchored — not in any bucket): {no_anchor}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
