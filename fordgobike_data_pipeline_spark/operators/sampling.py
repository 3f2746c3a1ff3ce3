"""Deterministic sampling — reproducible dataset subsetting at scale.

``df.sample()`` is seed-dependent per partitioning and not stable
across runs/cluster layouts; training-data pipelines need samples that
are a pure function of the ROW, so any engine, any re-run, any
repartitioning selects the same rows. Hash-threshold sampling gives
that: keep a row iff hash(key) mod M < rate·M. No shuffle, no state,
composable with incremental ingest (new rows sample themselves).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def _bucket(key: Column) -> Column:
    """Uniform bucket in [0, M) from the md5-based signed-64 hash (the
    same construction as the surrogate keys, so a SQL oracle reproduces
    the selection bit-exactly)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 16), 16, -10).cast("long")
    return F.pmod(h, F.lit(_M))


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float
) -> DataFrame:
    """Keep ≈rate of rows, chosen purely by the key's hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_bucket(F.col(key_col)) < int(rate * _M))


def stratified_deterministic_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, float], default_rate: float = 0.0
) -> DataFrame:
    """Per-stratum rates (the deterministic twin of ``df.sampleBy``):
    e.g. keep 100% of rare 'error' events but 5% of 'view's."""
    threshold = F.lit(int(default_rate * _M))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * _M))
        ).otherwise(threshold)
    return df.filter(_bucket(F.col(key_col)) < threshold)


def per_stratum_fixed_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    n: int,
    n_salt: int = 32,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, deterministically —
    the fixed-COUNT twin of the rate-based samplers above (eval-set
    construction wants "500 docs per language", not "0.1% of each").

    Selection order is the md5 hash of the key (so the sample is a
    pure row function, stable across engines/layouts), realized as a
    salted two-phase top-n — per-(stratum, salt) partial top-n bounds
    every collect_list to ≈|stratum|/n_salt, then one merge of
    n_salt·n structs per stratum. No per-stratum global sort, so a
    hot stratum never serializes through one task (the same shape as
    similarity.cosine_topk).
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 16), 16, -10
    ).cast("long")
    entry = F.struct(h.alias("hv"), F.col(key_col).alias("k"))
    partial = (
        df.select(F.col(stratum_col).alias("stratum"), entry.alias("e"))
        .withColumn("salt", F.pmod(F.xxhash64(F.col("e.k")), F.lit(n_salt)))
        .groupBy("stratum", "salt")
        .agg(F.slice(F.array_sort(F.collect_list("e")), 1, n).alias("top"))
    )
    final = (
        partial.select("stratum", F.explode("top").alias("e"))
        .groupBy("stratum")
        .agg(F.slice(F.array_sort(F.collect_list("e")), 1, n).alias("top"))
    )
    return final.select("stratum", F.posexplode("top").alias("pos", "e")).select(
        "stratum",
        (F.col("pos") + 1).cast("int").alias("sample_rank"),
        F.col("e.k").alias(key_col),
    )


def capped_topk(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str,
    per_group_cap: int,
    k: int,
) -> DataFrame:
    """Global top-k with a per-group cap — "take the k best documents
    but at most ``per_group_cap`` from any one domain", the
    diversity-constrained selection every curation pass wants instead
    of a plain top-k that one crawler-heavy domain can flood.

    Phase 1 caps each group with a per-group window (partition size =
    group size; a hot group sorts only its own rows). Phase 2 is a
    plain orderBy+limit over the capped survivors, which Catalyst
    compiles to TakeOrderedAndProject — per-partition heaps of k, no
    global sort. The final dense rank is a window over exactly k rows.
    Deterministic: (score DESC, id) everywhere."""
    from pyspark.sql import Window

    w_g = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    capped = (
        df.withColumn("_gr", F.row_number().over(w_g))
        .filter(F.col("_gr") <= per_group_cap)
        .drop("_gr")
    )
    top = capped.orderBy(F.col(score_col).desc(), F.col(id_col).asc()).limit(k)
    w_all = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return top.withColumn("sel_rank", F.row_number().over(w_all).cast("int"))


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws u ∈ (0, 1] as a pure
    hash of its key and scores ln(u)/w — the n largest scores are a
    weighted sample (heavier rows need a smaller u to lose). Same
    engine-reproducible md5 construction as the rate samplers, so the
    SELECTION (not just the rate) is stable across runs, engines, and
    partitionings — and the top-n is a TakeOrderedAndProject, never a
    global sort. The score is rounded to 9dp BEFORE ordering so the
    transcendental ln stays tiebreak-stable cross-engine."""
    u = (_bucket(F.col(key_col)) + 1) / F.lit(1000000.0)
    score = F.round(F.log(u) / F.col(weight_col).cast("double"), 9) + F.lit(0.0)
    scored = df.withColumn("es_score", score)
    return scored.orderBy(
        F.col("es_score").desc(), F.col(key_col).asc()
    ).limit(n)


def kcenter_coreset(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10_000,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez' 2-approximation,
    the farthest-point traversal) over an embedding corpus — the
    geometric data-pruning primitive: the selected rows are the most
    mutually-distant exemplars, the k-center radius after selection
    bounds how well the coreset covers the corpus, and "active
    learning / coreset" pipelines (e.g. greedy k-center selection for
    CNN coresets, Sener & Savarese) use exactly this traversal to pick
    which documents to label or keep.

    Determinism & exactness: vectors snap to 1e-4 integer units
    (rint, engine-stable); ALL distances are exact integer squared
    L2 in BIGINT (max term ≈ dim·(2·scale·|x|)² ≈ 4e11 at dim 64 —
    well inside int64); the seed is the minimum id; every argmax
    tiebreaks on ascending id. The oracle unrolls the same k greedy
    steps as CTEs over the position-exploded integers.

    Scale: k bounded scans, each a TakeOrdered reduce (no global
    sort); the selected set is k rows of driver control data (the
    sanctioned bounded-collect class, same as k-means centroids); the
    running min-distance column updates by composition, so Catalyst
    fuses each round's distance into one stage. Never materializes
    pairs. Returns k rows: (sel_rank, vec_id, d2) where d2 is the
    exact integer squared distance (1e-8 units) from the selected
    point to the previously selected set (0 for the seed)."""
    # fan_out before the checkpoint: it freezes the partition count, and
    # a single-file input would pin every one of the k distance scans to
    # one core (§2.5 input rebalance; no-op when the scan has splits)
    from ..functions.skew import fan_out

    ints = fan_out(emb).select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.rint(x.cast("double") * F.lit(float(scale))).cast(
                "long"
            ),
        ).alias("_xi"),
    ).localCheckpoint(eager=True)

    def _d2(center: list[int]):
        carr = F.array(*[F.lit(int(c)).cast("long") for c in center])
        return F.aggregate(
            F.zip_with(F.col("_xi"), carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    from pyspark.sql import types as T

    # result id column keeps the INPUT id type (string doc ids work,
    # not just bigint vec_ids)
    out_schema = T.StructType(
        [
            T.StructField("sel_rank", T.IntegerType(), False),
            T.StructField("vec_id", emb.schema[id_col].dataType, True),
            T.StructField("d2", T.LongType(), True),
        ]
    )
    seed_rows = ints.orderBy("_id").limit(1).collect()
    if not seed_rows:
        # empty corpus: empty coreset, stable schema (no seed to scan)
        return emb.sparkSession.createDataFrame([], out_schema)
    seed = seed_rows[0]
    selected = [(1, seed["_id"], 0)]
    cur = ints.withColumn("dmin", _d2(list(seed["_xi"])))
    for rank in range(2, k + 1):
        far = (
            cur.orderBy(F.col("dmin").desc(), F.col("_id").asc())
            .limit(1)
            .collect()[0]
        )
        selected.append((rank, far["_id"], int(far["dmin"])))
        cur = cur.withColumn(
            "dmin", F.least(F.col("dmin"), _d2(list(far["_xi"])))
        )
    return emb.sparkSession.createDataFrame(selected, out_schema)
