"""Edge-case units for operators/features.py and the time-series
probes (operators/temporal.py acf_daily / cusum_changepoint /
seasonal_profile_dow). Oracle parity is covered by the harness
queries; these pin the branch semantics oracles can't isolate:
singleton-category LOO fallback, degenerate min-max groups, hash-sign
balance, top-k tie ordering.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import features, temporal


def test_target_encode_loo_singleton_falls_back_to_global(spark):
    df = spark.createDataFrame(
        [("a", 100), ("a", 300), ("b", 500)], "cat STRING, cents LONG"
    )
    out = {
        (r["cat"], r["cents"]): r["te_loo"]
        for r in features.target_encode_loo(df, "cat", "cents").collect()
    }
    # 'a' rows: the other a-row's value
    assert out[("a", 100)] == 3.0
    assert out[("a", 300)] == 1.0
    # singleton 'b': global LOO mean = (100+300)/2 cents = 2.0
    assert out[("b", 500)] == 2.0


def test_minmax_scale_degenerate_group_is_zero(spark):
    df = spark.createDataFrame(
        [("g1", 10.0), ("g1", 30.0), ("g2", 7.0)], "g STRING, v DOUBLE"
    )
    out = {
        (r["g"], r["v"]): r["scaled"]
        for r in features.minmax_scale(df, "v", "g").collect()
    }
    assert out[("g1", 10.0)] == 0.0
    assert out[("g1", 30.0)] == 1.0
    assert out[("g2", 7.0)] == 0.0  # single-value group, not NaN/null


def test_feature_hash_buckets_bounded_and_counts_conserved(spark):
    df = spark.createDataFrame(
        [(f"v{i % 10}", f"w{i % 3}") for i in range(100)], "a STRING, b STRING"
    )
    hist = features.feature_hash(df, ["a", "b"], n_buckets=8).collect()
    assert all(0 <= r["bucket"] < 8 for r in hist)
    assert sum(r["n"] for r in hist) == 200  # one hash per row per feature
    assert all(abs(r["signed_sum"]) <= r["n"] for r in hist)


def test_onehot_topk_rank_ties_break_by_name(spark):
    rows = [("x",)] * 3 + [("y",)] * 3 + [("z",)] * 1
    df = spark.createDataFrame(rows, "c STRING")
    out = features.onehot_topk(df, "c", k=2).collect()
    by_cat = {r["c"]: r for r in out}
    # x and y tie on count 3 — name asc puts x at rank 1
    assert by_cat["x"]["oh_1"] == 1 and by_cat["y"]["oh_2"] == 1
    assert by_cat["z"]["mapped"] == "OTHER"
    assert by_cat["z"]["oh_1"] == 0 and by_cat["z"]["oh_2"] == 0


def test_acf_perfect_weekly_cycle(spark):
    # counts with exact period 7 -> lag-7 autocorrelation == 1
    rows = [
        (f"2024-01-{d + 1:02d} 00:00:00",)
        for d in range(28)
        for _ in range(1 + d % 7)
    ]
    ev = spark.createDataFrame(rows, "s STRING").select(
        F.to_timestamp("s").alias("ts")
    )
    acf = {r["lag"]: r["acf"] for r in temporal.acf_daily(ev, max_lag=7).collect()}
    assert acf[7] == pytest.approx(1.0)
    assert acf[1] < 1.0


def test_cusum_finds_the_level_shift(spark):
    # 10 days at value 1, then 10 days at value 9 -> changepoint at day 10
    rows = [(f"2024-03-{d + 1:02d} 12:00:00", 1.0 if d < 10 else 9.0) for d in range(20)]
    ev = spark.createDataFrame(rows, "s STRING, value DOUBLE").select(
        F.to_timestamp("s").alias("ts"), "value"
    )
    r = temporal.cusum_changepoint(ev).collect()[0]
    assert str(r["changepoint_day"]) == "2024-03-10"
    assert r["n_days"] == 20 and r["cusum_frac"] > 0


def test_seasonal_profile_flat_series_is_all_ones(spark):
    rows = [(f"2024-01-{d + 1:02d} 00:00:00",) for d in range(14) for _ in range(5)]
    ev = spark.createDataFrame(rows, "s STRING").select(
        F.to_timestamp("s").alias("ts")
    )
    out = temporal.seasonal_profile_dow(ev).collect()
    assert len(out) == 7
    assert all(r["seasonal_index"] == pytest.approx(1.0) for r in out)
