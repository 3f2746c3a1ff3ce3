"""ML feature-preparation operators: leave-one-out target encoding,
the feature-hashing trick, top-k one-hot encoding, per-group min-max
scaling.

These are the tabular-feature half of a training-data pipeline (the
text/embedding half lives in text.py / similarity.py / curation.py):
before a model sees a categorical column it gets target-encoded,
hashed, or one-hot'd, and numeric columns get scaled — all of which
are pure DataFrame algebra here, no Python in the hot path.

Determinism rules (the repo-wide oracle-parity discipline):
* Monetary / continuous targets are summed in FIXED-POINT BIGINT
  (cents), never double — double addition is order-dependent across
  partitions, integer addition is not (same trick as
  operators/graph.py pagerank).
* Every emitted fraction is ONE double division of exact integers.
* Hash buckets use the md5 parity idiom shared with
  functions/exprs.py surrogate_key_md5: Spark
  ``conv(substring(md5(x),1,16),16,-10)`` ==
  DuckDB ``cast(cast(from_hex(substr(md5(x),1,16)) as bit) as bigint)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_cents_col: str,
    out_col: str = "te_loo",
) -> DataFrame:
    """Leave-one-out target encoding: each row's category is replaced
    by the mean target of OTHER rows in the same category —
    ``(sum_cat − x) / (cnt_cat − 1)`` — so the encoding never leaks
    the row's own label (the standard CV-safe variant). Singleton
    categories fall back to the leave-one-out GLOBAL mean
    ``(total − x) / (n − 1)``.

    ``target_cents_col`` must already be fixed-point BIGINT; sums are
    then exact and the single final division is deterministic.

    Scale shape: one groupBy over the category column (map-side
    combined), one global 1-row aggregate, then a join of the
    category stats back onto the rows. Category cardinality is
    typically tiny — Spark broadcasts the stats side; no per-row
    window function needed.
    """
    stats = df.groupBy(cat_col).agg(
        F.sum(target_cents_col).alias("_sum_cat"),
        F.count(F.lit(1)).alias("_cnt_cat"),
    )
    glob = df.agg(
        F.sum(target_cents_col).alias("_total"), F.count(F.lit(1)).alias("_n")
    )
    x = F.col(target_cents_col)
    # Fixed-point determinism (see VERIFY playbook): the encoding is
    # computed as exact integer MICRO-units — numerator cents × 1e4
    # (cents → units is /100, micro-units is ×1e6) stays an exact
    # BIGINT, ONE correctly-rounded int/int double division, then
    # round-to-integer (rint needs no decimal scaling, so it cannot
    # drift across engines the way round(x, 9) does at 1e5 magnitude
    # — 15 significant digits exceeds what decimal-scaled rounding of
    # a double reproduces bit-stably), and one exact /1e6 at render.
    loo_micros = F.round(
        F.when(
            F.col("_cnt_cat") > 1,
            ((F.col("_sum_cat") - x) * 10000).cast("double")
            / (F.col("_cnt_cat") - 1).cast("double"),
        ).otherwise(
            ((F.col("_total") - x) * 10000).cast("double")
            / (F.col("_n") - 1).cast("double")
        )
    ).cast("long")
    return (
        df.join(F.broadcast(stats), cat_col)
        .crossJoin(F.broadcast(glob))
        .withColumn(out_col, loo_micros.cast("double") / F.lit(1000000.0))
        .drop("_sum_cat", "_cnt_cat", "_total", "_n")
    )


def _md5_bucket(s, n_buckets: int):
    """Non-negative md5-derived bucket in [0, n_buckets) — parity idiom
    shared with the DuckDB oracles (see module docstring)."""
    h = F.conv(F.substring(F.md5(s), 1, 16), 16, -10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def feature_hash(
    df: DataFrame, cols: list[str], n_buckets: int = 64
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): every
    ``feature=value`` string hashes to one of ``n_buckets`` buckets
    with a ±1 sign from an independent hash bit, so collisions cancel
    in expectation. Emits the pooled histogram — one row per
    (feature, bucket): occurrence count and signed sum.

    Everything is codegen'd expressions (md5 + conv + pmod) followed
    by one map-side-combined groupBy — no vocabulary build, no
    driver state, which is the entire point of hashing features at
    100 TB: the encoding is stateless and embarrassingly parallel.
    """
    parts = []
    for c in cols:
        s = F.concat_ws("=", F.lit(c), F.col(c).cast("string"))
        parts.append(
            df.select(
                F.lit(c).alias("feature"),
                _md5_bucket(s, n_buckets).alias("bucket"),
                # sign bit: parity of the LAST md5 hex nibble (independent
                # of the bucket bits taken from the first 16 chars)
                F.when(
                    F.conv(F.substring(F.md5(s), 32, 1), 16, 10).cast("int") % 2 == 0,
                    F.lit(1),
                )
                .otherwise(F.lit(-1))
                .alias("sign"),
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union.groupBy("feature", "bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("sign").alias("signed_sum")
    )


def onehot_topk(
    df: DataFrame, cat_col: str, k: int = 5, other_label: str = "OTHER"
) -> DataFrame:
    """Top-k one-hot encoding: the k most frequent categories (count
    desc, name asc tiebreak) keep their identity, the long tail maps
    to ``other_label``. Emits the input rows plus ``mapped`` and one
    0/1 ``oh_<rank>`` column per kept category (rank-indexed, so the
    output schema is stable regardless of which categories win).

    The top-k table is k rows — computed with one aggregate + window
    and broadcast back; the wide encode is a CASE chain in codegen.
    """
    counts = df.groupBy(cat_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy(F.desc("_n"), F.asc(cat_col))
    top = (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(F.col(cat_col).alias("_topcat"), "_rk")
    )
    out = df.join(
        F.broadcast(top), df[cat_col] == F.col("_topcat"), "left"
    ).withColumn(
        "mapped",
        F.when(F.col("_rk").isNotNull(), F.col(cat_col)).otherwise(
            F.lit(other_label)
        ),
    )
    for r in range(1, k + 1):
        out = out.withColumn(
            f"oh_{r}",
            F.when(F.col("_rk") == r, F.lit(1)).otherwise(F.lit(0)),
        )
    return out.drop("_topcat", "_rk")


def minmax_scale(
    df: DataFrame,
    val_col: str,
    group_col: str,
    out_col: str = "scaled",
) -> DataFrame:
    """Per-group min-max scaling to [0, 1]: ``(x − min) / (max − min)``
    with a 0.0 result for degenerate single-value groups. min/max of
    doubles are order-independent (unlike sums), and the scale is one
    division — deterministic without fixed-point.

    One map-side-combined groupBy for the |groups|-sized stats table,
    broadcast back onto the rows; nothing shuffles the fact side.
    """
    stats = df.groupBy(group_col).agg(
        F.min(val_col).alias("_lo"), F.max(val_col).alias("_hi")
    )
    scaled = F.when(F.col("_hi") == F.col("_lo"), F.lit(0.0)).otherwise(
        (F.col(val_col) - F.col("_lo")) / (F.col("_hi") - F.col("_lo"))
    )
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn(out_col, F.round(scaled, 9))
        .drop("_lo", "_hi")
    )
