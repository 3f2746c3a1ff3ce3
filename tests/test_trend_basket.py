"""Wave-5 operator semantics: EWMA fold, rolling z-score baseline
exclusion, basket pair statistics, rule direction asymmetry."""

from __future__ import annotations

from fordgobike_data_pipeline_spark.operators import analytics, temporal


def test_ewma_fold_exact(spark):
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate([8, 4, 2, 6])] + [("b", 0, 10)],
        "k STRING, t LONG, v LONG",
    )
    out = {r.grp: r for r in temporal.ewma_latest(df, "k", "t", "v").collect()}
    # a: 8 -> (8+4)/2=6 -> (6+2)/2=4 -> (4+6)/2=5
    assert out["a"].n_points == 4 and out["a"].ewma == 5.0
    assert out["b"].n_points == 1 and out["b"].ewma == 10.0  # single point


def test_rolling_zscore_excludes_self(spark):
    # constant baseline then a spike: baseline must not include the spike
    rows = [("a", i, 10) for i in range(7)] + [("a", 7, 100)]
    df = spark.createDataFrame(rows, "k STRING, t LONG, v LONG")
    out = {
        r.t: (r.z, r.is_anomaly)
        for r in temporal.rolling_zscore_anomalies(
            df, "k", "t", "v", n_rows=7, threshold=3.0
        ).collect()
    }
    for t in range(7):
        assert out[t] == (None, None)  # no full window, or zero variance
    assert out[7] == (None, None)  # constant baseline: zero variance
    # varied baseline: z defined and the spike flags
    rows2 = [("b", i, v) for i, v in enumerate([10, 12, 8, 11, 9, 10, 12])] + [
        ("b", 7, 40)
    ]
    df2 = spark.createDataFrame(rows2, "k STRING, t LONG, v LONG")
    r7 = {
        r.t: r
        for r in temporal.rolling_zscore_anomalies(
            df2, "k", "t", "v", n_rows=7, threshold=3.0
        ).collect()
    }[7]
    assert r7.z is not None and r7.is_anomaly


def test_basket_pair_counts_and_rules(spark):
    # baskets: {a,b,c}, {a,b}, {a,b}, {b,c}
    rows = []
    for bk, its in [(1, "abc"), (2, "ab"), (3, "ab"), (4, "bc")]:
        rows += [(bk, it) for it in its]
    df = spark.createDataFrame(rows, "bk LONG, it STRING")
    stats = {
        (r.a, r.b): (r.n_ab, r.n_a, r.n_b, r.n_baskets)
        for r in analytics.basket_pair_counts(df, "bk", "it").collect()
    }
    assert stats[("a", "b")] == (3, 3, 4, 4)
    assert stats[("a", "c")] == (1, 3, 2, 4)
    assert stats[("b", "c")] == (2, 4, 2, 4)
    rules = {
        (r.lhs, r.rhs): (r.confidence, r.lift)
        for r in analytics.association_rules(
            df, "bk", "it", min_pair_count=2, k=10
        ).collect()
    }
    # confidence is directional: a->b = 3/3, b->a = 3/4
    assert rules[("a", "b")][0] == 1.0
    assert rules[("b", "a")][0] == 0.75
    assert rules[("a", "b")][1] == 1.0  # lift symmetric: 3*4/(3*4)
    sims = {
        (r.a, r.b): r.cosine
        for r in analytics.item_cosine_similarity(
            df, "bk", "it", min_pair_count=2, k=10
        ).collect()
    }
    assert sims[("a", "b")] == round(3 / (3 * 4) ** 0.5, 6)
