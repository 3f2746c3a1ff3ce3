"""Units for the prefix-filtered set-similarity join, position-based
attribution, and Theil–Sen trend (round-6 wave); oracle parity is
covered by the harness queries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import analytics, dedup


def test_setsim_prefix_finds_exactly_the_qualifying_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),   # jacc(1,2) = 3/5 >= 1/2
            (3, "alpha beta gamma delta"),     # jacc(1,3) = 1
            (4, "zeta eta theta iota"),        # disjoint from 1-3
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.setsim_join_prefix(docs, 1, 2).collect()
    }
    assert out[(1, 2)] == 0.6 and out[(2, 3)] == 0.6
    assert out[(1, 3)] == 1.0
    assert not any(4 in k for k in out)
    assert len(out) == 3


def test_setsim_prefix_rational_threshold_boundary(spark):
    # jacc = 1/2 exactly: {a,b} vs {a,c} -> inter 1, union 3 -> 1/3 NO;
    # {a,b,c} vs {a,b,d}: inter 2 union 4 = 1/2 -> inclusive at t=1/2
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id LONG, text STRING"
    )
    rows = dedup.setsim_join_prefix(docs, 1, 2).collect()
    assert len(rows) == 1 and rows[0]["jaccard"] == 0.5
    assert dedup.setsim_join_prefix(docs, 2, 3).count() == 0  # 1/2 < 2/3


def test_position_attribution_credit_arithmetic(spark):
    rows = [
        # user 1: three touches then purchase -> 400 / 200 / 400
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 01:00:00", 1, "click"),
        (3, "2024-01-01 02:00:00", 1, "view"),
        (4, "2024-01-01 03:00:00", 1, "purchase"),
        # user 2: purchase with no touch -> unattributed 1000
        (5, "2024-01-02 00:00:00", 2, "purchase"),
        # user 3: five touches -> 400, 66+2, 66, 66, 400 (rem to rk=2)
        (6, "2024-01-03 00:00:00", 3, "click"),
        (7, "2024-01-03 01:00:00", 3, "click"),
        (8, "2024-01-03 02:00:00", 3, "click"),
        (9, "2024-01-03 03:00:00", 3, "click"),
        (10, "2024-01-03 04:00:00", 3, "click"),
        (11, "2024-01-03 05:00:00", 3, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, s STRING, user_id LONG, event_type STRING"
    ).select("event_id", F.to_timestamp("s").alias("ts"), "user_id", "event_type")
    out = {r["channel"]: r for r in analytics.attribute_position_based(ev).collect()}
    # user1: view 400+400, click 200; user3: all five are clicks = 1000
    assert out["view"]["credited_conversions"] == 0.8
    assert out["click"]["credited_conversions"] == pytest.approx(0.2 + 1.0)
    assert out["unattributed"]["credited_conversions"] == 1.0
    # total credit conserved: one unit per converting user
    assert sum(r["credited_conversions"] for r in out.values()) == pytest.approx(3.0)


def test_theil_sen_ignores_single_outlier(spark):
    # counts 10,20,30,...,100 except one wild spike: slope stays 10
    rows = []
    for d in range(10):
        n = 1000 if d == 5 else 10 * (d + 1)
        rows += [(f"2024-02-{d + 1:02d} 00:00:00",)] * n
    ev = spark.createDataFrame(rows, "s STRING").select(
        F.to_timestamp("s").alias("ts")
    )
    r = analytics.theil_sen_trend(ev).collect()[0]
    assert r["sen_slope"] == pytest.approx(10.0)


def test_rank_select_kth_edges(spark):
    from fordgobike_data_pipeline_spark.operators import quality

    df = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate([5, 3, 9, 1, 7, 3])],
        "v DOUBLE, id LONG",
    )
    # lower median of [1,3,3,5,7,9] -> k=3 -> value 3 (id tiebreak: the
    # second 3 has the larger id, so k=3 is id 5)
    r = quality.rank_select_kth(df, "v", "id").collect()[0]
    assert (r["n"], r["k"], r["kth_value"]) == (6, 3, 3.0)
    # k = 1 (min) and k = n (max)
    lo = quality.rank_select_kth(df, "v", "id", k_expr="1").collect()[0]
    hi = quality.rank_select_kth(df, "v", "id", k_expr="n").collect()[0]
    assert lo["kth_value"] == 1.0 and hi["kth_value"] == 9.0
    # degenerate: all values equal -> single bucket 0 path
    eq = spark.createDataFrame([(2.0, i) for i in range(5)], "v DOUBLE, id LONG")
    r = quality.rank_select_kth(eq, "v", "id").collect()[0]
    assert r["kth_value"] == 2.0 and r["kth_id"] == 2  # (v, id) order -> 3rd id


def test_isotonic_trend_is_monotone_and_mean_preserving(spark):
    from fordgobike_data_pipeline_spark import harness

    qs = harness.all_queries()
    rows = sorted(
        qs["q_isotonic_trend"](spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["day"],
    )
    iso = [r["iso"] for r in rows]
    y = [r["y"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))  # monotone
    # PAV preserves the total mass of the series
    assert abs(sum(iso) - sum(y)) < 1e-4 * max(1, sum(y))
