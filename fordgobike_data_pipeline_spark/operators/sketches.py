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


def bloom_filter_design(
    keys: DataFrame,
    probes: DataFrame,
    key_col: str,
    probe_col: str,
    bits_per_key: tuple[int, ...] = (4, 8, 12, 16),
) -> DataFrame:
    """Bloom-filter design audit: for a grid of bits-per-key budgets,
    build the filter RELATIONALLY over the real key set and measure
    the false-positive rate against a known-absent probe set, next to
    the textbook prediction (1 − e^(−k/r))^k — the sizing table a
    100 TB join-pruning or shard-routing bloom gets designed from
    (measured, because real key sets are never the uniform hashes the
    formula assumes).

    k per budget is the optimal ⌊r·ln2⌉ (computed driver-side from
    the literal grid). Bit positions use the repo's md5 double-hash
    (h1 + i·h2 mod m, h2 forced odd — the minhash/oracle-reproducible
    family); the filter IS the distinct (budget, position) relation,
    never a driver-side bitmap, so filter construction is one
    hash aggregate and membership testing is one join — both
    partition-parallel at any m. A probe is a false positive iff all
    k of its positions hit.

    Returns one row per budget: (bits_per_key, k_hashes, m_bits,
    n_keys, n_probes, n_false_pos, fpp_measured, fpp_predicted)."""
    import math

    grid = [(int(r), max(1, round(r * math.log(2)))) for r in bits_per_key]

    def h12(c):
        md = F.md5(c.cast("string"))
        half = lambda s: F.conv(F.substring(md, s, 16), 16, -10).cast("long")  # noqa: E731
        return (
            F.pmod(half(1), F.lit(1 << 32)).alias("h1"),
            F.pmod(half(17), F.lit(1 << 32)).bitwiseOR(F.lit(1)).alias("h2"),
        )

    # The per-budget frames below share the hashed key/probe lineage;
    # without a cut the distinct+md5 scan would rerun once per budget
    # (4x each side). Eager localCheckpoint hashes each key set once —
    # the vocab_coverage_curve shared-type-table pattern.
    k_keys = keys.select(F.col(key_col).alias("k")).distinct()
    kh = k_keys.select(*h12(F.col("k"))).localCheckpoint(eager=True)
    n_tot = kh.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    p_keys = probes.select(F.col(probe_col).alias("p")).distinct()
    ph = p_keys.select("p", *h12(F.col("p"))).localCheckpoint(eager=True)

    frames = []
    for r, k in grid:
        # greatest(., 1): an empty key set would make m = 0 and ANSI
        # mode throws on pmod-by-zero; with m = 1 every probe position
        # is 0, the inserted set is empty, and fpp_measured = 0
        m = F.greatest(F.col("n_keys") * F.lit(int(r)), F.lit(1))
        ins = (
            kh.crossJoin(F.broadcast(n_tot))
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(int(k) - 1)),
                        lambda i: F.pmod(F.col("h1") + i * F.col("h2"), m),
                    )
                ).alias("pos")
            )
            .distinct()
        )
        pb = ph.crossJoin(F.broadcast(n_tot)).select(
            "p",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(int(k) - 1)),
                    lambda i: F.pmod(F.col("h1") + i * F.col("h2"), m),
                )
            ).alias("pos"),
        )
        hits = (
            pb.join(ins, "pos", "left_semi")
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("nh"))
            .filter(F.col("nh") == int(k))
            .agg(F.count(F.lit(1)).cast("long").alias("n_false_pos"))
        )
        stat = (
            n_tot.crossJoin(ph.agg(F.count(F.lit(1)).cast("long").alias("n_probes")))
            .crossJoin(hits)
            .select(
                F.lit(int(r)).alias("bits_per_key"),
                F.lit(int(k)).alias("k_hashes"),
                (F.col("n_keys") * F.lit(int(r))).cast("long").alias("m_bits"),
                "n_keys",
                "n_probes",
                "n_false_pos",
                F.round(
                    F.col("n_false_pos").cast("double")
                    / F.col("n_probes").cast("double"),
                    9,
                ).alias("fpp_measured"),
                F.round(
                    F.pow(
                        F.lit(1.0)
                        - F.exp(-F.lit(float(k)) / F.lit(float(r))),
                        F.lit(float(k)),
                    ),
                    9,
                ).alias("fpp_predicted"),
            )
        )
        frames.append(stat)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
