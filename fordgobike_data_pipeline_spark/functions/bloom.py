"""Bloom-filter join pruning — the explicit form of runtime row-level
filtering (what Spark's `spark.sql.optimizer.runtime.bloomFilter` and
Trino's dynamic filtering do implicitly).

A semi-join against a dimension still shuffles the FULL fact side on
the join key before any row is dropped. When the dimension's key set
fits a few KB of bitmap, broadcasting a Bloom bitmap and
pre-filtering the fact scan removes most non-matching rows BEFORE the
shuffle — the exact join afterwards only pays for the survivors (plus
the bitmap's false positives, which cost extra rows but never wrong
output, because the exact join still runs).

Design constraints for scale and determinism:
- the bitmap is built with one hash-bucket aggregation (map-side
  combined into ≤ m_bits/64 word rows per task) and collected as
  BOUNDED control data — m_bits/64 longs, same class as IVF centroids;
- membership is k AND-ed bit tests on a broadcast literal array, pure
  codegen (xxhash64 + shift/mask), no UDF, fused into the fact scan;
- hashes are seeded ``xxhash64(key, seed_i)`` so the filter is a pure
  function of the key — deterministic across runs and partitionings.

The reference's joins (gold_ddl.sql marts) all run against small dims
where Spark broadcasts the whole table; this lever is for the region
between "broadcastable dim" and "big-big join": dim too wide to
broadcast as rows, but its KEY SET fits as one bit each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD = 64


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) for a key: seeded xxhash64."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5) -> list[int]:
    """Build the bitmap: one distributed pass over the dim keys, OR-ing
    bit contributions per 64-bit word, collected as ``m_bits/64``
    longs (dense; absent words are 0). For the classic ~1% false-
    positive rate size ``m_bits ≈ 10·n_keys`` with k≈7; at 100 TB the
    build is a map-side-combined agg over the dim — never the fact."""
    if m_bits % _WORD:
        raise ValueError("m_bits must be a multiple of 64")
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, m_bits, k))).alias("pos")
    # the DataFrame-API shiftleft wants a Python-int shift; SQL shiftleft
    # takes expressions for both operands, so drop to expr for the bit
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / _WORD).cast("int").alias("wi"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD} AS INT))"
            ).alias("contrib"),
        )
        .groupBy("wi")
        .agg(F.bit_or("contrib").alias("word"))
        .collect()
    )
    dense = [0] * (m_bits // _WORD)
    for r in words:
        dense[r["wi"]] = r["word"]
    return dense


def bloom_filter_rows(
    df: DataFrame, key_col: str, words: list[int], m_bits: int, k: int
) -> DataFrame:
    """Keep the rows whose key the bitmap MIGHT contain (all k bits
    set). No false negatives (every inserted key's bits are set by
    construction); false positives pass the pre-filter and are removed
    by the exact join that follows. The words array is attached ONCE
    as a literal column — Catalyst ships it with the plan — and the k
    bit tests are codegen shift/mask ops over named position columns
    (the DataFrame-API shift functions only take Python-int shifts, so
    the per-row bit extraction drops to SQL expressions)."""
    pos_names = []
    tmp = df.withColumn("_bf_words", F.lit(words))
    for i, p in enumerate(_positions(F.col(key_col), m_bits, k)):
        pn = f"_bf_pos{i}"
        tmp = tmp.withColumn(pn, p)
        pos_names.append(pn)
    checks = [
        F.expr(
            f"(shiftrightunsigned(element_at(_bf_words, CAST({pn} / {_WORD} AS INT) + 1),"
            f" CAST({pn} % {_WORD} AS INT)) & CAST(1 AS BIGINT)) = 1"
        )
        for pn in pos_names
    ]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return tmp.filter(cond).drop("_bf_words", *pos_names)


def bloom_prefiltered_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Exact semi-join with a Bloom pre-filter on the fact side: result
    rows are IDENTICAL to ``fact.join(dim, ..., 'left_semi')`` (the
    oracle pins this), but the shuffle/join input is cut to matches +
    false positives. The bitmap build triggers one job on the dim."""
    words = bloom_build(dim, dim_key, m_bits, k)
    pre = bloom_filter_rows(fact, fact_key, words, m_bits, k)
    return pre.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(), fact_key, "left_semi"
    )
