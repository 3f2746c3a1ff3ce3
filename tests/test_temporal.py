"""Temporal join edge cases: equal-timestamp inclusion, no-match NULLs,
bin-boundary pairs in the bucketed range join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import temporal

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_asof_join_semantics(spark):
    clicks = spark.createDataFrame(
        [(1, _ts(100), 900), (1, _ts(50), 901), (2, _ts(10), 902), (1, _ts(0), 903)],
        "user_id LONG, ts TIMESTAMP, click_id LONG",
    )
    views = spark.createDataFrame(
        [(1, _ts(100), 10), (1, _ts(40), 11), (1, _ts(99), 12)],
        "user_id LONG, ts TIMESTAMP, view_id LONG",
    )
    out = {
        r.click_id: r.view_id
        for r in temporal.asof_join(
            clicks, views, "user_id", "ts", ["click_id"], ["view_id"]
        ).collect()
    }
    assert out[900] == 10  # equal timestamp matches (≤ semantics)
    assert out[901] == 11  # latest at-or-before 50 is 40
    assert out[902] is None  # user 2 has no views
    assert out[903] is None  # click before any view


def test_range_join_bin_boundaries(spark):
    # gap=60s; pairs straddling the bin boundary must be found exactly once
    events = spark.createDataFrame(
        [(1, _ts(0), 1), (1, _ts(59), 2), (1, _ts(60), 3), (1, _ts(61), 4),
         (1, _ts(200), 5), (2, _ts(30), 6)],
        "user_id LONG, ts TIMESTAMP, event_id LONG",
    )
    pairs = temporal.range_join_pairs(events, "user_id", "ts", "event_id", 60)
    got = {(r.id_a, r.id_b): r.dt_sec for r in pairs.collect()}
    want = {
        (1, 2): 59.0, (1, 3): 60.0,  # inclusive upper bound
        (2, 3): 1.0, (2, 4): 2.0, (3, 4): 1.0,
    }
    assert got == want  # (1,4) is 61s > gap; user 2 pairs with nobody; no dups


def test_range_join_no_duplicates_on_dense_data(spark):
    from fordgobike_data_pipeline_spark.io import load_tables

    from .conftest import SF_SMOKE

    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    pairs = temporal.range_join_pairs(ev, "user_id", "ts", "event_id", 1800)
    total = pairs.count()
    distinct = pairs.select("id_a", "id_b").distinct().count()
    assert total == distinct


def test_gap_fill_daily_locf_and_density(spark):
    """Every (key, day) in the global span appears exactly once;
    missing days get n_events=0 and carry the last observed mean."""
    import datetime as dt

    rows = [
        ("a", dt.datetime(2021, 1, 1, 9), 10.0),
        ("a", dt.datetime(2021, 1, 4, 9), 40.0),   # gap: Jan 2-3 missing
        ("b", dt.datetime(2021, 1, 2, 9), 5.0),    # b absent Jan 1, 3, 4
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r.grp, str(r.day)): (r.n_events, r.locf_avg)
        for r in temporal.gap_fill_daily(df, "k", "ts", "v").collect()
    }
    assert len(out) == 8  # 2 keys × 4-day global span
    assert out[("a", "2021-01-01")] == (1, 10.0)
    assert out[("a", "2021-01-02")] == (0, 10.0)  # zero-filled + LOCF
    assert out[("a", "2021-01-03")] == (0, 10.0)
    assert out[("a", "2021-01-04")] == (1, 40.0)
    assert out[("b", "2021-01-01")] == (0, None)  # nothing observed yet
    assert out[("b", "2021-01-02")] == (1, 5.0)
    assert out[("b", "2021-01-04")] == (0, 5.0)
