"""Decision-support walkthrough — the complete TPC-H family in one
script.

    python examples/decision_support.py [sf_dir]

Runs the COMPLETE 22-query TPC-H family (queries needing absent
columns — partsupp, shipmode, commit/receipt dates, container,
phone — adapt the predicate, documented in each docstring) and prints the headline figure from each with its
wall time. The interesting part is HOW each plan is shaped for a
1000-executor cluster: dimension filters pushed into scans, bounded
sides broadcast, exact fixed-point money sums, top-k as
TakeOrderedAndProject — run with .explain("formatted") on any of
these to inspect.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fordgobike_data_pipeline_spark import harness  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    ("q_tpch_q1", "pricing summary", lambda r: f"{len(r)} flag/status groups"),
    ("q_tpch_q2", "min-cost supplier", lambda r: f"{len(r)} part-supplier rows"),
    ("q_tpch_q3", "shipping priority", lambda r: f"top order {r[0].l_orderkey} rev {r[0].revenue:,.2f}"),
    ("q_tpch_q4", "priority check", lambda r: f"{sum(x.order_count for x in r):,} late orders"),
    ("q_tpch_q5", "local supplier volume", lambda r: f"{len(r)} nations"),
    ("q_tpch_q6", "forecast revenue", lambda r: f"rev {r[0].revenue:,.2f}"),
    ("q_tpch_q7", "volume shipping", lambda r: f"{len(r)} nation-pair-years"),
    ("q_tpch_q8", "market share", lambda r: f"{len(r)} years"),
    ("q_tpch_q9", "product profit", lambda r: f"{len(r)} nation-years"),
    ("q_tpch_q10", "returned items", lambda r: f"top cust {r[0].c_custkey}"),
    ("q_tpch_q11", "important stock", lambda r: f"{len(r)} high-value parts"),
    ("q_tpch_q12", "late-ship priority", lambda r: f"{len(r)} ship classes"),
    ("q_tpch_q13", "cust distribution", lambda r: f"{len(r)} order-count bins"),
    ("q_tpch_q14", "promo effect", lambda r: f"promo share {r[0].promo_revenue:.3f}%"),
    ("q_tpch_q15", "top supplier", lambda r: f"supplier {r[0].s_suppkey} rev {r[0].total_revenue:,.2f}"),
    ("q_tpch_q16", "supplier counts", lambda r: f"{len(r)} attr combos"),
    ("q_tpch_q17", "small-qty revenue", lambda r: f"avg yearly {r[0].avg_yearly:,.2f}"),
    ("q_tpch_q18", "large-volume custs", lambda r: f"{len(r)} orders > 300 units"),
    ("q_tpch_q19", "OR-of-ANDs revenue", lambda r: f"rev {r[0].revenue:,.2f}"),
    ("q_tpch_q20", "part promotion", lambda r: f"{len(r)} hot suppliers"),
    ("q_tpch_q21", "kept orders waiting", lambda r: f"worst {r[0].s_name} ({r[0].numwait})"),
    ("q_tpch_q22", "sales opportunity", lambda r: f"{len(r)} country codes"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    qs = harness.all_queries()
    total = 0.0
    print(f"TPC-H family over {sf_dir}\n")
    for name, title, describe in QUERIES:
        t0 = time.perf_counter()
        rows = qs[name](spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        total += dt
        try:
            desc = describe(rows) if rows else "0 rows"
        except (TypeError, IndexError):  # NULL aggregates on foreign corpora
            desc = f"{len(rows)} rows"
        print(f"  {name:<11} {title:<22} {dt:>6.2f}s  {desc}")
    print(f"\n{len(QUERIES)} queries in {total:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
