"""Wave-37 operators: watermark lateness audit, compaction planning,
ER blocking quality, Huber location, DP quantiles — planted-value
tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import (
    analytics,
    dedup,
    governance,
    temporal,
    warehouse,
)


def _ts(minute: int):
    return dt.datetime(2024, 1, 1, 10, minute, 0)


def test_lateness_planted_late_event(spark):
    # arrival order: fast events push the watermark to 10:30; event 5
    # arrives afterwards with event time 10:00 -> late for delay=1,5
    # (30 min behind), on time for delay=60
    rows = [
        (0, _ts(0)), (1, _ts(10)), (2, _ts(20)), (3, _ts(30)),
        (4, _ts(31)), (5, _ts(0)),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {
        r.delay_min: r
        for r in temporal.watermark_lateness_audit(
            ev, delays_minutes=[1, 60], batch_size=2
        ).collect()
    }
    # batches of 2: event 5 is in batch 2; watermark before batch 2 =
    # max(ts of batches 0,1) = 10:30 -> 10:00 < 10:30 - 1min => late
    assert out[1].n_late == 1
    assert out[60].n_late == 0
    assert out[1].n_total == 6


def test_compaction_plan_next_fit(spark):
    rows = [("p", 0, 60), ("p", 1, 60), ("p", 2, 60), ("p", 3, 60)]
    census = spark.createDataFrame(rows, "part string, file_id long, n_bytes long")
    out = {r.bin: r for r in warehouse.compaction_plan(census, target_bytes=100).collect()}
    # cum-before: 0,60,120,180 -> bins 0,0,1,1
    assert out[0].n_files == 2 and out[0].total_bytes == 120
    assert out[1].n_files == 2
    assert abs(out[0].fill_ratio - 1.2) < 1e-9


def test_compaction_plan_append_stability(spark):
    rows = [("p", i, 40) for i in range(5)]
    c1 = spark.createDataFrame(rows, "part string, file_id long, n_bytes long")
    c2 = spark.createDataFrame(
        rows + [("p", 5, 40)], "part string, file_id long, n_bytes long"
    )
    p1 = {(r.part, r.bin): r.n_files for r in warehouse.compaction_plan(c1, target_bytes=100).collect()}
    p2 = {(r.part, r.bin): r.n_files for r in warehouse.compaction_plan(c2, target_bytes=100).collect()}
    # appending a file never changes fully-earlier bins
    for key, n in p1.items():
        if key != max(p1):
            assert p2[key] == n


def test_blocking_quality_planted(spark):
    # two near-dup docs share length band and prefix but differ in
    # first word; one unrelated doc
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "s", 22),
            (2, "alphx beta gamma delta", "s", 22),
            (3, "zz", "s", 2),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    truth = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = {r.scheme: r for r in dedup.blocking_quality(docs, truth).collect()}
    assert out["len16"].pair_completeness == 1.0
    assert out["first_word"].pair_completeness == 0.0
    # len16 puts docs 1,2 in one block (C(2,2)=1 pair of 3 total)
    assert out["len16"].cand_pairs == 1
    assert abs(out["len16"].reduction_ratio - (1 - 1 / 3)) < 1e-9


def test_huber_downweights_outlier(spark):
    rows = [("a", 1.0), ("a", 1.1), ("a", 0.9), ("a", 1.0), ("a", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = analytics.huber_location(df, "g", "v").collect()[0]
    assert r.plain_mean > 20
    assert r.huber_mean < r.plain_mean  # outlier pulled in
    assert r.delta < 0


def test_huber_all_extreme_residuals_keeps_iterate(spark):
    # residuals of +/-3e6 are ~3e12 integer units, so every outlier
    # weight rint(cu/|r|*scale) rounds to 0 and sum(w) = 0; the guard
    # keeps the previous iterate (the start mean, 0) instead of a
    # divide-by-zero/NULL.
    rows = [("a", -3_000_000.0), ("a", 3_000_000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = analytics.huber_location(df, "g", "v").collect()[0]
    assert r.huber_mean == 0.0 and r.plain_mean == 0.0 and r.delta == 0.0


def test_huber_clean_data_matches_mean(spark):
    rows = [("a", 2.0), ("a", 2.2), ("a", 1.8)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = analytics.huber_location(df, "g", "v").collect()[0]
    assert abs(r.huber_mean - r.plain_mean) < 1e-5


def test_dp_quantiles_rank_error_bounded(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "v long")
    rows = governance.dp_quantiles(df, "v", qs=[0.5], epsilon=8.0).collect()
    assert len(rows) == 1
    r = rows[0]
    # with a strong epsilon the mechanism stays near the true median
    assert r.rank_error < 0.25
    assert r.true_value > 0 and r.dp_value > 0


def test_dp_quantiles_reproducible(spark):
    df = spark.createDataFrame([(i * 3,) for i in range(500)], "v long")
    a = sorted(map(tuple, governance.dp_quantiles(df, "v").collect()))
    b = sorted(map(tuple, governance.dp_quantiles(df, "v").collect()))
    assert a == b
