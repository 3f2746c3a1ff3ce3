"""Wave-8 operator semantics: clamped-balance closed form vs a
literal sequential scan, BFS hop minimality, Benford digit extraction,
weighted-median tie handling, and Kaplan-Meier censoring."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import analytics, graph, temporal


def _scan_reference(deltas: list[int], floor: int = 0):
    """Literal sequential recurrence — the spec the closed form must
    reproduce."""
    bal, hits, mx = floor, 0, floor
    for d in deltas:
        nxt = bal + d
        if nxt < floor:
            bal = floor
            hits += 1
        else:
            bal = nxt
        mx = max(mx, bal)
    return hits, mx, bal


def test_running_balance_matches_sequential_scan(spark):
    rng = random.Random(8)
    rows = []
    expected = {}
    for key in range(6):
        deltas = [rng.randint(-50, 40) for _ in range(rng.randint(1, 40))]
        expected[key] = _scan_reference(deltas)
        rows += [(key, i, i, d) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, "k LONG, ts LONG, tb LONG, delta LONG")
    out = {
        r.key: (r.floor_hits, r.max_balance, r.final_balance)
        for r in temporal.clamped_running_balance(
            df, "k", "ts", "tb", "delta"
        ).collect()
    }
    assert out == expected


def test_running_balance_nonzero_floor(spark):
    # floor 10, start at the floor: +5 -> 15, -20 clamps to 10 (1 hit)
    df = spark.createDataFrame(
        [(1, 0, 0, 5), (1, 1, 1, -20), (1, 2, 2, 3)],
        "k LONG, ts LONG, tb LONG, delta LONG",
    )
    r = temporal.clamped_running_balance(df, "k", "ts", "tb", "delta", floor=10)
    row = r.collect()[0]
    assert (row.floor_hits, row.max_balance, row.final_balance) == (1, 15, 13)


def test_bfs_hops_minimal_distance(spark):
    # path 1-2-3-4 plus shortcut 1-3: node 3 is hop 1 via the
    # shortcut, never hop 2; node 5 disconnected
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (5, 6)], "a LONG, b LONG"
    )
    out = {r.node: r.hop for r in graph.bfs_hops(edges, [1], 3).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_hops_cap(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(6)], "a LONG, b LONG")
    out = {r.node: r.hop for r in graph.bfs_hops(edges, [0], 2).collect()}
    assert out == {0: 0, 1: 1, 2: 2}


def test_benford_digits(spark):
    # values 1..9 once each, plus 1000..1999 absent -> digit from the
    # integer rendering; 19.5 floors to 19 -> digit 1
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 10)] + [(19.5,), (0.4,)], "x DOUBLE"
    )
    out = {r.digit: r.n_obs for r in analytics.benford_digit_audit(df, "x").collect()}
    assert out == {1: 2, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1, 8: 1, 9: 1}
    shares = {
        r.digit: r.benford_share
        for r in analytics.benford_digit_audit(df, "x").collect()
    }
    assert shares[1] == 0.30103  # log10(2) to 6dp


def test_weighted_median_tie_and_weight(spark):
    # group g: value 10 weight 1, value 20 weight 1, value 30 weight 6
    # -> half of total 8 reached at 30; unweighted median would be 20
    df = spark.createDataFrame(
        [("g", 10, 1), ("g", 20, 1), ("g", 30, 6), ("h", 5, 2), ("h", 7, 2)],
        "grp STRING, v LONG, w LONG",
    )
    out = {
        r.grp: (r.wmedian, r.total_w)
        for r in analytics.weighted_median(df, "grp", "v", "w").collect()
    }
    assert out == {"g": (30, 8), "h": (5, 4)}  # h: 2*2 >= 4 at the lower value


def test_km_survival_hand_computed(spark):
    # 4 observed at t=1,1,2,3 and 1 censored at t=2:
    # t=1: d=2 n=5 -> S=0.6
    # t=2: d=1 n=3 -> S=0.6*(2/3)=0.4   (censored leaves at t=2 too)
    # t=3: d=1 n=1 -> S=0 (at-risk extinguished)
    df = spark.createDataFrame(
        [(1, True), (1, True), (2, True), (3, True), (2, False)],
        "dur LONG, obs BOOLEAN",
    )
    out = {
        r.t: (r.d, r.n_at_risk, r.survival)
        for r in analytics.km_survival(df, "dur", "obs").collect()
    }
    assert out == {1: (2, 5, 0.6), 2: (1, 3, 0.4), 3: (1, 1, 0.0)}
