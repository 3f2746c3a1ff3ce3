"""Wave-4 statistical-operator semantics: chi-square on planted
(in)dependence, exact-correlation endpoints, OLS on a perfect line,
skyline dominance edge cases, gap islands, A/B degenerate guard."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import analytics, quality


def test_chi_square_independent_and_dependent(spark):
    # perfectly independent 2x2 (all cells equal) -> chi2 = 0
    ind = spark.createDataFrame(
        [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 5 + [("b", "y")] * 5,
        "u STRING, v STRING",
    )
    r = quality.chi_square_independence(ind, "u", "v").collect()[0]
    assert (r.n_cells, r.dof, r.chi2) == (4, 1, 0.0)
    # perfectly dependent (diagonal) -> chi2 = n
    dep = spark.createDataFrame(
        [("a", "x")] * 6 + [("b", "y")] * 6, "u STRING, v STRING"
    )
    # full grid including zero cells: 4 cells, X^2 = n for the diagonal
    r2 = quality.chi_square_independence(dep, "u", "v").collect()[0]
    assert (r2.n_cells, r2.dof, r2.chi2) == (4, 1, 12.0)


def test_corr_matrix_exact_endpoints(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0)],
        "x DOUBLE, y DOUBLE, z DOUBLE",
    )
    out = {
        (r.col_x, r.col_y): r.corr
        for r in quality.corr_matrix(df, ["x", "y", "z"]).collect()
    }
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0


def test_ols_trend_perfect_line_and_degenerate(spark):
    rows = [("a", x, 3 * x + 7) for x in range(10)] + [("b", 5, 1), ("b", 5, 9)]
    df = spark.createDataFrame(rows, "k STRING, x LONG, y LONG")
    out = {r.grp: r for r in analytics.ols_trend(df, "k", "x", "y").collect()}
    assert out["a"].slope == 3.0 and out["a"].intercept == 7.0
    assert out["b"].slope is None  # single distinct x: no fit


def test_skyline_dominance_edges(spark):
    df = spark.createDataFrame(
        [
            (1, 10, 5.0),   # frontier (biggest size)
            (2, 10, 7.0),   # dominated by 1 (same size, pricier)
            (3, 8, 4.0),    # frontier
            (4, 8, 4.0),    # tie with 3 on both dims: neither dominates
            (5, 6, 4.5),    # dominated by 3 (smaller, pricier)
            (6, 2, 1.0),    # frontier (cheapest)
        ],
        "id LONG, size INT, price DOUBLE",
    )
    out = sorted(
        r.id for r in analytics.skyline_2d(df, "size", "price", "id").collect()
    )
    assert out == [1, 3, 4, 6]


def test_id_gap_islands(spark):
    df = spark.createDataFrame(
        [(k,) for k in [1, 2, 3, 7, 8, 12]], "k LONG"
    )
    out = sorted(
        (r.gap_start, r.gap_end, r.gap_len)
        for r in analytics.id_gap_islands(df, "k").collect()
    )
    assert out == [(4, 6, 3), (9, 11, 3)]


def test_ab_test_z_and_degenerate_guard(spark):
    import datetime as dt

    rows = []
    # arm 0 (even ids): 4 users, 3 convert; arm 1 (odd): 4 users, 1 converts
    for uid, conv in [(0, 1), (2, 1), (4, 1), (6, 0), (1, 1), (3, 0), (5, 0), (7, 0)]:
        rows.append((uid * 10, dt.datetime(2024, 1, 1), uid, "view", 0.0))
        if conv:
            rows.append((uid * 10 + 1, dt.datetime(2024, 1, 2), uid, "buy", 0.0))
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    )
    r = analytics.ab_test_two_proportion(
        ev, F.pmod(F.col("user_id"), F.lit(2)), F.col("event_type") == "buy"
    ).collect()[0]
    assert (r.n0, r.c0, r.n1, r.c1) == (4, 3, 4, 1)
    p0, p1, pp = 0.75, 0.25, 0.5
    z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (1 / 4 + 1 / 4))
    assert r.z == round(z, 6)
    # degenerate: everyone converts -> pooled variance 0 -> z NULL
    r2 = analytics.ab_test_two_proportion(
        ev, F.pmod(F.col("user_id"), F.lit(2)), F.lit(True)
    ).collect()[0]
    assert r2.z is None
