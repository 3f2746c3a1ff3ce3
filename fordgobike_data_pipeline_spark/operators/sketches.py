"""Count–min sketch: sublinear frequency estimation over unbounded
term domains (Cormode & Muthukrishnan 2005). The streaming-friendly
complement to the exact heavy_hitters pass (warehouse.py:163): the
sketch is a FIXED d×w counter grid whatever the vocabulary size, its
cells are plain sums — so sketches from shards/batches MERGE by cell
addition (the same partial-aggregate algebra as aggregate_partials),
and any term's count is estimated after the fact with d lookups,
guaranteed ≥ the true count (over-estimates only, by collisions).

Hash family parity: row hashes are the repo's md5 surrogate idiom
(functions/exprs.py surrogate_key_md5 — signed-64 via conv radix -10)
seeded per row, reduced by a floor-mod into [0, width). DuckDB
reproduces it as ((x % w) + w) % w over the from_hex/bit cast — the
established oracle pairing. Production swap: xxhash64(seed, term) —
one JVM op, same structure; md5 kept where bit-parity adjudication is
wanted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_hash(term: Column, seed: int, width: int) -> Column:
    """Row-``seed``'s bucket for a term: signed-64 md5 key → pmod width."""
    key = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(f"cms{seed}"), term)), 1, 16),
        16,
        -10,
    ).cast("long")
    return F.pmod(key, F.lit(width)).cast("int")


def count_min_build(
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch from a term-occurrence table (one row per
    occurrence): returns the d×w cell table (row, col, cnt).

    One explode (×depth — a constant), one groupBy (row, col): the
    output is ≤ depth·width rows REGARDLESS of input size, so at
    100 TB the sketch is still a broadcast-sized artifact. Cells are
    plain sums → shard sketches merge by summing matching cells
    (union + re-groupBy), the partial-aggregate contract.
    """
    if depth <= 0 or width <= 0:
        raise ValueError(f"depth/width must be positive, got {depth}x{width}")
    t = F.col(term_col)
    cells = terms.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _row_hash(t, r, width).alias("col")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def count_min_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate each query term's frequency: min over the d cells the
    term hashes to. The sketch side is ≤ d·w rows — broadcast — so the
    lookup join never shuffles the query table; the min-of-d fold is a
    groupBy over d rows per term.

    Guarantee: est ≥ true count always; est ≤ true + εN with
    probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
    """
    t = F.col(term_col)
    probes = queries.select(
        t.alias("term"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _row_hash(t, r, width).alias("col")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select("term", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("term")
        .agg(F.min("cnt").alias("est_count"))
    )
