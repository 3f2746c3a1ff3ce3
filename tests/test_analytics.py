"""Behavioral-analytics operator semantics: cohort bucketing and
offsets, Markov row-normalization, attribution window expiry and
unattributed fallback, rolling-median middle indexing, RFM tiling."""

from __future__ import annotations

import datetime as dt

from fordgobike_data_pipeline_spark.operators import analytics

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)  # 2024-01-01 is a Monday


def _ts(days=0, sec=0):
    return T0 + dt.timedelta(days=days, seconds=sec)


def _ev(rows):
    return [
        (i, ts, user, etype, float(val))
        for i, (ts, user, etype, val) in enumerate(rows)
    ]


EV_SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"


def test_cohort_retention_offsets_and_sizes(spark):
    # user 1 starts week 0, active weeks 0 and 2; user 2 starts week 0,
    # active week 0 only; user 3 starts week 1, active weeks 1 and 2.
    rows = _ev(
        [
            (_ts(0), 1, "view", 1),
            (_ts(14), 1, "view", 1),
            (_ts(1), 2, "view", 1),
            (_ts(7), 3, "view", 1),
            (_ts(15), 3, "view", 1),
        ]
    )
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    out = {
        (r.cohort_week.isoformat(), r.week_offset): (r.n_active, r.cohort_size)
        for r in analytics.cohort_retention(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): (2, 2),
        ("2024-01-01", 2): (1, 2),
        ("2024-01-08", 0): (1, 1),
        ("2024-01-08", 1): (1, 1),
    }


def test_markov_transitions_normalize_per_row(spark):
    # user 1: a->b->a ; user 2: a->b  =>  from a: {b:2} p=1.0;
    # from b: {a:1} p=1.0 within user1, but user2 ends at b (no pair)
    rows = _ev(
        [
            (_ts(0, 0), 1, "a", 1),
            (_ts(0, 10), 1, "b", 1),
            (_ts(0, 20), 1, "a", 1),
            (_ts(0, 0), 2, "a", 1),
            (_ts(0, 10), 2, "b", 1),
        ]
    )
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    out = {
        (r.prev_type, r.next_type): (r.n_trans, r.p_trans)
        for r in analytics.markov_transitions(ev).collect()
    }
    assert out == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_attribution_window_and_fallback(spark):
    # u1: click then purchase 1 day later -> attributed to click.
    # u2: view then purchase 8 days later -> expired -> unattributed.
    # u3: purchase with no prior touch -> unattributed.
    # u1 second purchase: view in between wins over the older click.
    rows = _ev(
        [
            (_ts(0), 1, "click", 0),
            (_ts(1), 1, "purchase", 10.50),
            (_ts(2), 1, "view", 0),
            (_ts(3), 1, "purchase", 1.25),
            (_ts(0), 2, "view", 0),
            (_ts(8, 1), 2, "purchase", 5.00),
            (_ts(0), 3, "purchase", 2.00),
        ]
    )
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    out = {
        r.channel: (r.n_conversions, r.credited_value)
        for r in analytics.attribute_last_touch(ev, window_days=7).collect()
    }
    assert out == {
        "click": (1, 10.50),
        "view": (1, 1.25),
        "unattributed": (2, 7.00),
    }


def test_rolling_median_odd_even_windows(spark):
    daily = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate([10, 2, 30, 4, 50])],
        "k STRING, d LONG, v LONG",
    )
    out = {
        r.d: r.rolling_median
        for r in analytics.rolling_median(daily, "k", "d", "v", n_rows=3).collect()
    }
    # windows: [10]=10; [10,2]=6; [10,2,30]=10; [2,30,4]=4; [30,4,50]=30
    assert out == {0: 10.0, 1: 6.0, 2: 10.0, 3: 4.0, 4: 30.0}


def test_rfm_scores_and_segment(spark):
    # 4 purchasers with strictly ordered metrics -> each quartile hit once.
    rows = _ev(
        [
            (_ts(0), 1, "purchase", 400.0),
            (_ts(1), 2, "purchase", 300.0),
            (_ts(1), 2, "purchase", 1.0),
            (_ts(2), 3, "purchase", 200.0),
            (_ts(2), 3, "purchase", 1.0),
            (_ts(2), 3, "purchase", 1.0),
            (_ts(3), 4, "purchase", 100.0),
            (_ts(3), 4, "purchase", 1.0),
            (_ts(3), 4, "purchase", 1.0),
            (_ts(3), 4, "purchase", 1.0),
            (_ts(3), 9, "view", 0.0),  # non-purchaser: excluded
        ]
    )
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r.user_id: r for r in analytics.rfm_segments(ev).collect()}
    assert 9 not in out
    assert out[4].recency_days == 0 and out[1].recency_days == 3
    assert out[4].r_score == 1 and out[1].r_score == 4  # recent = best
    assert out[4].f_score == 1 and out[1].f_score == 4  # frequent = best
    assert out[1].m_score == 1 and out[4].m_score == 4  # big spender = best
    assert out[1].segment == "441" and out[4].segment == "114"
