"""Optimization-round snapshot: per-key formatted plan + isolated timing.

For each named query, writes ``plans/<round>/<name>_<tag>.txt`` (round
from SPARK_GRAFT_PLANS_ROUND, default r13) containing
the ``explain("formatted")`` output and records an isolated best-of-N
noop-sink timing into ``<out>.json`` — the before/after evidence pair
the optimization round commits alongside each plan change.

Usage:
    python tools/opt_snapshot.py <tag> <out.json> q_a q_b ...
    (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_BENCH_RUNS honoured; tag is
    "before" or "after")
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, os.environ.get("PYTHONPATH")) if p
)

from fordgobike_data_pipeline_spark import harness  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402


def _formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    tag, out_path, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    plans_dir = os.path.join(
        _REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name=f"opt-snapshot-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = harness.all_queries()
    materialize(queries["q_agg_daily_summary"](spark, sf_dir))  # warmup

    result: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt-{tag}: {name}")
        df = queries[name](spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(_formatted(spark, df))
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            materialize(queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        result[name] = round(best, 3)
        print(f"{name}: {result[name]}s", flush=True)
        spark.sparkContext.setJobDescription(None)

    payload = {"tag": tag, "sf_dir": sf_dir, "runs_per_query": runs, "queries": result}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path} + {len(names)} plans to {plans_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
