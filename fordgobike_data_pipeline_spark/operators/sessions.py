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
