"""Data-quality validation operators.

The reference validates manually (notebooks/data_exploration.ipynb:
null census, dtype checks, outlier probes) and declares — but cannot
distributedly enforce — FK constraints (silver_ddl.sql:62-66). These
operators turn both into engine checks that run as ordinary jobs and
emit small report DataFrames (append them to the run-metrics table or
gate a publish on them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_census(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column null counts + ratios in ONE pass (notebook cell 7's
    isna().sum(), distributed). Output: one row per column."""
    cols = cols or df.columns
    aggs = [F.count("*").alias("_total")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_n_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_n_{c}").alias("n_null"),
                F.round(F.col(f"_n_{c}") / F.col("_total"), 6).alias("null_ratio"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("s"), F.col("_total").alias("n_rows")).select(
        "s.column", "s.n_null", "s.null_ratio", "n_rows"
    )


def fk_integrity(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, allow_null: bool = True
) -> DataFrame:
    """Referential-integrity report: rows whose FK resolves to no dim
    row (the check behind silver_ddl.sql's FK constraints). One
    broadcast-or-shuffle anti-join; returns a 1-row summary."""
    candidates = fact if not allow_null else fact.filter(F.col(fact_key).isNotNull())
    orphans = candidates.join(
        dim.select(F.col(dim_key).alias(fact_key)), fact_key, "left_anti"
    )
    return candidates.agg(F.count("*").alias("n_checked")).crossJoin(
        orphans.agg(F.count("*").alias("n_orphans"))
    ).select("n_checked", "n_orphans", (F.col("n_orphans") == 0).alias("ok"))


def range_check(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Out-of-range census for a numeric column (notebook cells 21-26
    outlier probes). NULLs are not violations."""
    c = F.col(col)
    viol = F.count(F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1))
    return df.agg(
        F.lit(col).alias("column"),
        F.count(c).alias("n_values"),
        viol.alias("n_out_of_range"),
        (viol == 0).alias("ok"),
    )


def expect_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """Uniqueness check on a key set (the reference's PRIMARY KEY /
    UNIQUE constraints): reports duplicate key count."""
    dups = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
    )
    return df.agg(F.count("*").alias("n_rows")).crossJoin(
        dups.agg(
            F.count("*").alias("n_duplicate_keys"),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("n_rows_in_duplicates"),
        )
    ).select(
        "n_rows",
        "n_duplicate_keys",
        "n_rows_in_duplicates",
        (F.col("n_duplicate_keys") == 0).alias("ok"),
    )


def iqr_outlier_census(
    df: DataFrame, value_col: str, group_col: str, k: float = 1.5
) -> DataFrame:
    """Per-group Tukey-fence outlier census (the notebook's outlier
    probes, cells 21-26, as a distributed check): values outside
    [q1 − k·IQR, q3 + k·IQR] count as outliers. Quartiles are exact
    interpolated percentiles rounded to 4dp BEFORE the fences are
    derived, so any engine computes identical bounds. Two passes: one
    per-group quartile aggregation (bounded — one row per group), one
    conditional count after joining the bounds back (AQE broadcasts
    the bounds table). At 100 TB swap percentile → approx_percentile
    (t-digest, partial-aggregatable) — same flagged deviation as the
    percentile harness query."""
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    q = df.groupBy(group_col).agg(
        F.round(F.percentile(value_col, F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile(value_col, F.lit(0.75)), 4).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - k * iqr
    hi = F.col("q3") + k * iqr
    return (
        df.select(g, v.alias("_v"))
        .join(q, group_col)
        .groupBy(group_col, "q1", "q3")
        .agg(
            F.count("_v").alias("n_values"),
            F.count(F.when((F.col("_v") < lo) | (F.col("_v") > hi), 1)).alias(
                "n_outliers"
            ),
        )
        .select(
            group_col,
            "q1",
            "q3",
            "n_values",
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n_values"), 6).alias("outlier_ratio"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
) -> DataFrame:
    """Per-group percentile clamp (robust cleaning's fix step, where
    :func:`iqr_outlier_census` is the detect step): values below the
    group's p_lo percentile or above p_hi are clamped to those bounds,
    and a flag records which rows were touched. Bounds are exact
    interpolated percentiles rounded to 4dp BEFORE clamping — any
    engine derives identical bounds (the q_outlier_iqr-proven parity).
    Same two-pass shape: one bounded per-group percentile agg, one
    broadcast-joined clamp pass. At 100 TB swap percentile →
    approx_percentile (t-digest partials), same flagged deviation as
    the percentile queries."""
    v = F.col(value_col).cast("double")
    q = df.groupBy(group_col).agg(
        F.round(F.percentile(value_col, F.lit(p_lo)), 4).alias("c_lo"),
        F.round(F.percentile(value_col, F.lit(p_hi)), 4).alias("c_hi"),
    )
    out = df.join(q, group_col)
    clamped = F.least(F.greatest(v, F.col("c_lo")), F.col("c_hi"))
    return out.select(
        *df.columns,
        clamped.alias(f"{value_col}_w"),
        ((v < F.col("c_lo")) | (v > F.col("c_hi"))).alias("was_clipped"),
    )
