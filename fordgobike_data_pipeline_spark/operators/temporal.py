"""Temporal join operators Spark's DataFrame API lacks natively:
as-of join and bounded range join — composed from existing operators
(union + carry-forward window; bucketed equi-join) rather than a
quadratic inequality join, per the custom-operator policy
(composition first, Pandas UDF second, mapPartitions last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: for every left row, the latest right row of the
    same key with right.ts ≤ left.ts (NULLs when none).

    Distributed formulation: tag + union both sides, one window sort
    per key, carry the right payload forward with
    ``last(..., ignorenulls=True)``. One shuffle on the key — no
    inequality join, no per-key collect. Right rows order before left
    rows at equal timestamps so same-instant matches count (the ``≤``
    of SQL ASOF JOIN).

    Ties inside the right side (same key, same ts) must be resolved by
    the caller first (e.g. keep max id per (key, ts)) — mirrors what a
    SQL ASOF JOIN needs for determinism.
    """
    l_payload = F.struct(*[F.col(c) for c in left_cols])
    r_payload = F.struct(*[F.col(c) for c in right_cols])
    tagged_l = left.select(
        F.col(key_col), F.col(ts_col), F.lit(1).alias("_is_left"),
        l_payload.alias("_l"), F.lit(None).cast(
            right.select(r_payload.alias("x")).schema["x"].dataType
        ).alias("_r"),
    )
    tagged_r = right.select(
        F.col(key_col), F.col(ts_col), F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(l_payload.alias("x")).schema["x"].dataType
        ).alias("_l"), r_payload.alias("_r"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out_cols = (
        [F.col(key_col), F.col(ts_col)]
        + [F.col(f"_l.{c}").alias(c) for c in left_cols]
        + [F.col(f"_match.{c}").alias(c) for c in right_cols]
    )
    return carried.filter(F.col("_is_left") == 1).select(*out_cols)


def range_join_pairs(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Pairs of rows with the same key and 0 < t_b − t_a ≤ max_gap.

    A naive inequality join is O(n²) per key; bucketing time into
    max_gap-sized bins turns it into an equi-join on (key, bin) where a
    qualifying pair is always in the same or adjacent bin — the left
    side fans out to 2 keys, candidates are filtered exactly. At scale
    the join work is Σ per-bin densities, not per-key row counts².
    """
    if max_gap_seconds <= 0:
        raise ValueError(f"max_gap_seconds must be positive, got {max_gap_seconds}")
    gap_us = max_gap_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    base = events.select(
        F.col(key_col), F.col(id_col), us.alias("_us"), (us / gap_us).cast("long").alias("_bin")
    )
    a = base.select(
        F.col(key_col),
        F.col(id_col).alias("id_a"),
        F.col("_us").alias("us_a"),
        F.explode(F.array(F.col("_bin"), F.col("_bin") + 1)).alias("_bin"),
    )
    b = base.select(
        F.col(key_col), F.col(id_col).alias("id_b"), F.col("_us").alias("us_b"), "_bin"
    )
    dt = F.col("us_b") - F.col("us_a")
    return (
        a.join(b, [key_col, "_bin"])
        .filter((dt > 0) & (dt <= gap_us))
        .select(
            key_col, "id_a", "id_b", (dt / 1_000_000.0).alias("dt_sec")
        )
    )
