"""Sessionization — gap-based session windows over an event stream.

Batch formulation (lag → gap flag → running-sum session id → group):
two window passes over the same (user_id, ts) partitioning, so Catalyst
reuses one sort+shuffle for both. The streaming twin is
``F.session_window(ts, gap)`` (native since Spark 3.2) — exposed here
too for parity with streaming/incremental.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_windows(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """One row per (user, session): bounds + event count + value sum.

    A new session starts when the gap to the previous event exceeds
    ``gap_seconds`` (microsecond-exact comparison so the oracle
    matches bit-for-bit). Deterministic ordering tiebreak on id_col.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w_lag = Window.partitionBy(user_col).orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col(ts_col))
    gap_us = gap_seconds * 1_000_000
    new_session = F.when(
        F.lag(us).over(w_lag).isNull() | ((us - F.lag(us).over(w_lag)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        events.withColumn("_new", new_session)
        .withColumn("session_id", F.sum("_new").over(w_run).cast("int"))
        .groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def session_windows_native(
    events: DataFrame, gap: str = "30 minutes", user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """The built-in session_window variant (streaming-capable: works
    under a watermark with state cleanup). Window bounds differ from the
    gap-flag formulation by construction (end = last event + gap)."""
    return (
        events.groupBy(user_col, F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def concurrency_by_day(
    sessions_df: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line (+1/−1 running
    sum) over session intervals, the classic capacity-planning probe.

    Scale shape: a global sweep would be one totally-ordered window
    (single-partition bottleneck), so each session is first CLIPPED to
    the days it spans (sequence + explode — sessions are minutes long,
    so almost always one segment) and the sweep runs PER DAY
    (partitionBy(day)) — embarrassingly parallel in the number of
    days. Boundary points order by (t, delta DESC) so a session
    starting the instant another ends counts both (inclusive-end
    semantics); the default RANGE window frame makes tied points
    peers, so the running sum at a tie is the whole tie-group total —
    order-insensitive, hence deterministic.
    """
    seg = sessions_df.select(
        F.explode(
            F.sequence(F.to_date(start_col), F.to_date(end_col))
        ).alias("day"),
        F.greatest(F.col(start_col), F.to_timestamp(F.col("day"))).alias("seg_start"),
        F.least(
            F.col(end_col),
            F.to_timestamp(F.date_add(F.col("day"), 1)) - F.expr("INTERVAL 1 MICROSECOND"),
        ).alias("seg_end"),
    )
    points = seg.select(
        "day", F.col("seg_start").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        seg.select("day", F.col("seg_end").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.partitionBy("day").orderBy(F.col("t").asc(), F.col("delta").desc())
    running = points.withColumn("conc", F.sum("delta").over(w))
    return (
        running.groupBy("day")
        .agg(
            F.max("conc").cast("int").alias("max_concurrent"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_sessions"),
        )
    )
