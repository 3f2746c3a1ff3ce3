"""Hybrid-retrieval operators: per-query top-k under a second metric
(L2) and reciprocal-rank fusion of multiple rankers.

A retrieval stack for training-data curation (and RAG eval) rarely
trusts one ranker: lexical BM25 (operators/text.py) and dense rankers
under different metrics (cosine vs L2 — genuinely different orderings
on unnormalized embeddings) disagree, and rank fusion beats either
alone. RRF (Cormack et al., SIGIR'09) is the standard score-free
fusion: score(item) = Σ_lists 1/(k0 + rank).

Scale shape: each ranker's top-k output is |queries|·k rows — tiny
relative to the corpus — so the fusion itself (one union + one
grouped sum + one per-query window over ≤ Σk rows) is never the
bottleneck; the rankers are, and they use the salted two-phase top-k
(similarity.cosine_topk) so no collect_list exceeds |corpus|/n_salt.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import (
    _hyperplanes,
    _topk_struct,
    cosine_topk,
    dot,
    lsh_signature,
    unit_normalize,
)


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_salt: int = 32,
) -> DataFrame:
    """Exact brute-force Euclidean top-k per query (ASCENDING distance)
    over the RAW vectors — the metric twin of similarity.cosine_topk,
    same salted two-phase aggregation (every collect_list bounded by
    ≈|corpus|/n_salt, queries broadcast, corpus scanned once).

    The distance is a left-to-right double fold (zip_with diff² +
    sequential sum), so a SQL oracle reproduces every distance — and
    hence every rank — bit-exactly."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    n_part = corpus.sparkSession.sparkContext.defaultParallelism
    c = corpus.repartition(n_part).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    )
    diff = F.zip_with(
        F.col("q_vec"),
        F.col("c_vec"),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    dist = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v))
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            (F.round(dist, 6) + F.lit(0.0)).alias("dist"),
        )
    )
    # ascending distance: the sortable struct negates DESC metrics, so
    # feed it the negated distance (top-k smallest == top-k largest -d)
    entry = _topk_struct(-F.col("dist"), F.col("cand_id").alias("cand_id"))
    partial = (
        pairs.withColumn("salt", F.pmod(F.xxhash64("cand_id"), F.lit(n_salt)))
        .groupBy("query_id", "salt")
        .agg(F.slice(F.array_sort(F.collect_list(entry)), 1, k).alias("top"))
    )
    final = (
        partial.select("query_id", F.explode("top").alias("e"))
        .groupBy("query_id")
        .agg(F.slice(F.array_sort(F.collect_list("e")), 1, k).alias("top"))
    )
    return final.select("query_id", F.posexplode("top").alias("pos", "e")).select(
        "query_id",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("e.cand_id").alias("cand_id"),
        F.col("e.neg_sim").alias("dist"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    topk: int = 10,
    query_col: str = "query_id",
    item_col: str = "cand_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion: union the ranked lists, score each
    (query, item) as Σ 1/(k0 + rank) over the lists it appears in,
    re-rank per query (score DESC, item id tiebreak), keep ``topk``.

    Score-free by design — it consumes only RANKS, so rankers with
    incomparable score scales (BM25 logs vs cosine in [-1,1] vs L2
    distances) fuse without calibration. ``n_lists`` is kept in the
    output: consensus items (in every list) vs single-ranker items is
    the first thing an eval wants to slice by.

    With ≤ a handful of lists, the per-(query, item) sum adds at most
    that many doubles — IEEE addition of two summands is commutative,
    and the rounded output pins the oracle regardless."""
    tagged = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(item_col).alias("cand_id"),
            F.col(rank_col).cast("int").alias("rank"),
        )
        for r in rankings
    ]
    u = reduce(DataFrame.unionByName, tagged)
    scored = u.groupBy("query_id", "cand_id").agg(
        (F.round(F.sum(F.lit(1.0) / (F.lit(k0) + F.col("rank"))), 9) + F.lit(0.0)).alias(
            "rrf_score"
        ),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= topk)
        .select("query_id", "fused_rank", "cand_id", "rrf_score", "n_lists")
    )


def knn_graph(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN graph over the whole corpus — the structure
    semantic-dedup clustering, diversity sampling, and label
    propagation all start from.

    Unlike lsh_ann_topk (few queries, broadcast), EVERY node is a
    query, so both sides shuffle once on the LSH bucket key and the
    exact cosine runs within buckets only: expected work is
    |corpus|²/2^n_planes pairs instead of |corpus|² — n_planes is the
    recall/cost knob, and at 100 TB you'd also band the signature
    (multiple shorter hashes, union of bucket joins) exactly as the
    MinHash path does (dedup.py) rather than raise n_planes alone. The
    per-node top-k is one bounded sort-slice per node (candidates ≤
    bucket size). Deterministic end-to-end: seeded hyperplanes,
    rounded cosine, id tiebreaks — the oracle reproduces every edge.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    # both bucket-join legs read the signature table — checkpoint so
    # the normalize + hyperplane hashing pass runs once, not twice
    sig = corpus.select(
        F.col(id_col).alias("id"),
        unit_normalize(F.col(vec_col)).alias("nv"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    ).localCheckpoint()
    a = sig.select(
        F.col("id").alias("src_id"), F.col("nv").alias("a_vec"), "bucket"
    )
    b = sig.select(
        F.col("id").alias("nbr_id"), F.col("nv").alias("b_vec"), "bucket"
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("src_id") != F.col("nbr_id"))
        .select(
            "src_id",
            "nbr_id",
            (F.round(dot(F.col("a_vec"), F.col("b_vec")), 6) + F.lit(0.0)).alias(
                "sim"
            ),
        )
    )
    entry = _topk_struct(F.col("sim"), F.col("nbr_id").alias("nbr_id"))
    per = pairs.groupBy("src_id").agg(
        F.slice(F.array_sort(F.collect_list(entry)), 1, k).alias("top")
    )
    return per.select("src_id", F.posexplode("top").alias("pos", "e")).select(
        "src_id",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("e.nbr_id").alias("nbr_id"),
        (-F.col("e.neg_sim")).alias("sim"),
    )


def maxsim_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 4,
    sub_dim: int = 16,
    n_salt: int = 32,
) -> DataFrame:
    """ColBERT-style late interaction (MaxSim) top-k: treat each
    embedding as ``n_sub`` token sub-vectors of ``sub_dim`` dims;
    score(q, c) = Σ_{query tokens} max_{cand tokens} cos(qt, ct).
    Multi-vector scoring keeps per-token matching signal that a single
    pooled vector destroys — the standard retrieval-quality upgrade
    between bi-encoder and cross-encoder cost.

    Shape: token expansion is a per-row posexplode (n_sub× rows, no
    shuffle), query tokens broadcast, and the n_sub maxes per
    (query, cand) collapse in ONE aggregation (conditional max per
    query-token index — no pivot, no second shuffle), then the salted
    two-phase top-k. Determinism: per-token cosines round to 6dp, the
    n_sub maxes add in fixed left-to-right order, ids break ties — so
    a SQL oracle reproduces the full ranking.
    """
    def tokens(df: DataFrame, idname: str) -> DataFrame:
        subs = F.array(
            *[
                unit_normalize(F.slice(F.col(vec_col), i * sub_dim + 1, sub_dim))
                for i in range(n_sub)
            ]
        )
        return df.select(
            F.col(id_col).alias(idname), F.posexplode(subs).alias("ti", "tv")
        )

    q_t = tokens(queries, "query_id").withColumnRenamed("ti", "q_ti")
    n_part = corpus.sparkSession.sparkContext.defaultParallelism
    c_t = (
        tokens(corpus.repartition(n_part), "cand_id")
        .withColumnRenamed("tv", "c_tv")
        .withColumnRenamed("ti", "c_ti")
    )
    pairs = (
        c_t.crossJoin(F.broadcast(q_t))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            "q_ti",
            (F.round(dot(F.col("tv"), F.col("c_tv")), 6) + F.lit(0.0)).alias("cos"),
        )
    )
    maxes = [
        F.max(F.when(F.col("q_ti") == i, F.col("cos"))).alias(f"m{i}")
        for i in range(n_sub)
    ]
    scored = pairs.groupBy("query_id", "cand_id").agg(*maxes)
    score = F.col("m0")
    for i in range(1, n_sub):
        score = score + F.col(f"m{i}")
    scored = scored.select("query_id", "cand_id", score.alias("score"))
    entry = _topk_struct(F.col("score"), F.col("cand_id").alias("cand_id"))
    partial = (
        scored.withColumn("salt", F.pmod(F.xxhash64("cand_id"), F.lit(n_salt)))
        .groupBy("query_id", "salt")
        .agg(F.slice(F.array_sort(F.collect_list(entry)), 1, k).alias("top"))
    )
    final = (
        partial.select("query_id", F.explode("top").alias("e"))
        .groupBy("query_id")
        .agg(F.slice(F.array_sort(F.collect_list("e")), 1, k).alias("top"))
    )
    return final.select("query_id", F.posexplode("top").alias("pos", "e")).select(
        "query_id",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("e.cand_id").alias("cand_id"),
        (-F.col("e.neg_sim")).alias("score"),
    )


def knn_graph_increment(
    old_edges: DataFrame,
    corpus: DataFrame,
    batch: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Incrementally maintain a :func:`knn_graph` when ``batch`` new
    vectors arrive: only nodes sharing an LSH bucket with a batch
    vector can gain a better neighbor (candidates never cross
    buckets), so the update recomputes edges for AFFECTED BUCKETS only
    and keeps every other node's edges verbatim from ``old_edges``.

    Cost is Σ(affected bucket sizes)² instead of the full Σ(bucket²)
    — proportional to the batch's bucket footprint, not corpus size;
    the archive's vectors are re-read only for signature hashing (a
    scan, no pairwise work outside affected buckets). The result is
    IDENTICAL to rebuilding over corpus ∪ batch — an exact equivalence
    the oracle adjudicates, not an approximation — because bucket
    membership is a pure function of the vector and untouched buckets
    see no new candidates. Same incremental-index shape as the
    MinHash band index (dedup.incremental_near_dedup).
    """
    planes = _hyperplanes(dim, n_planes, seed)

    def sig(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            unit_normalize(F.col(vec_col)).alias("nv"),
            lsh_signature(F.col(vec_col), planes).alias("bucket"),
        )

    c_sig, b_sig = sig(corpus), sig(batch)
    affected = b_sig.select("bucket").distinct()
    # three consumers (both pair-join legs + the touched-id anti-join
    # key set) — checkpoint so the signature scan + bucket filter runs
    # once, not once per consumer
    touched = (
        c_sig.unionByName(b_sig)
        .join(F.broadcast(affected), "bucket", "inner")
        .localCheckpoint()
    )
    a = touched.select(
        F.col("id").alias("src_id"), F.col("nv").alias("a_vec"), "bucket"
    )
    b = touched.select(
        F.col("id").alias("nbr_id"), F.col("nv").alias("b_vec"), "bucket"
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("src_id") != F.col("nbr_id"))
        .select(
            "src_id",
            "nbr_id",
            (F.round(dot(F.col("a_vec"), F.col("b_vec")), 6) + F.lit(0.0)).alias(
                "sim"
            ),
        )
    )
    entry = _topk_struct(F.col("sim"), F.col("nbr_id").alias("nbr_id"))
    per = pairs.groupBy("src_id").agg(
        F.slice(F.array_sort(F.collect_list(entry)), 1, k).alias("top")
    )
    recomputed = per.select("src_id", F.posexplode("top").alias("pos", "e")).select(
        "src_id",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("e.nbr_id").alias("nbr_id"),
        (-F.col("e.neg_sim")).alias("sim"),
    )
    touched_ids = touched.select(F.col("id").alias("src_id")).distinct()
    kept = old_edges.join(touched_ids, "src_id", "left_anti")
    return kept.unionByName(recomputed)


def keyword_search(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Conjunctive (AND) keyword search ranked by total term
    frequency: documents containing EVERY query term, top-k by summed
    tf with a deterministic id tiebreak — the boolean-retrieval
    complement to the BM25 ranker (text.bm25_scores), and the posting-
    list primitive an inverted index serves.

    Shape: tokenize → filter to the |terms|-bounded probe set BEFORE
    any aggregation (the filter is a pushed-down IN over the exploded
    tokens, so the posting build only materializes matching terms) →
    one groupBy(doc) counting distinct matched terms and summing tf →
    HAVING n_matched = |terms| → TakeOrderedAndProject for the top-k
    (per-partition heaps, no global sort). At scale this is the
    query-side scan of an inverted index; served repeatedly, the
    postings table is the thing to materialize and bucket by term.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
    ).filter(F.col("w").isin(*terms))
    scored = (
        tok.groupBy(id_col)
        .agg(
            F.countDistinct("w").alias("_nm"),
            F.count(F.lit(1)).alias("score"),
        )
        .filter(F.col("_nm") == len(terms))
        .select(id_col, "score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def minmax_fuse(
    sim_ranking: DataFrame,
    dist_ranking: DataFrame,
    w_sim: float = 0.7,
    sim_col: str = "sim",
    dist_col: str = "dist",
) -> DataFrame:
    """Weighted linear fusion of a similarity ranker (higher better)
    and a distance ranker (lower better) on min-max-normalized
    scores — the score-aware complement to rrf_fuse (RRF discards
    score magnitudes; min-max fusion keeps them, the other standard
    hybrid-retrieval combiner).

    Per query: sim → (s−min)/(max−min), dist → (max−d)/(max−min)
    (degenerate one-score lists normalize to 1.0), fused =
    w_sim·sim_n + (1−w_sim)·dist_n with 0 for a list that missed the
    candidate; rank by fused desc, cand_id asc. Inputs are
    |queries|·k rows, so every join here is broadcast-sized; the
    expensive work happened in the rankers.
    """
    # per-query min/max as WINDOW aggregates: one pass per ranking
    # instead of a groupBy + join-back pair, so the upstream RANKER (a
    # full corpus top-k scan at real scale) is consumed exactly once —
    # identical arithmetic, and the window partitions by query over
    # |queries|·k rows only
    from pyspark.sql import Window

    wq = Window.partitionBy("query_id")
    _amn, _amx = F.min(sim_col).over(wq), F.max(sim_col).over(wq)
    sa = sim_ranking.select(
        "query_id",
        "cand_id",
        F.when(_amx == _amn, F.lit(1.0))
        .otherwise((F.col(sim_col) - _amn) / (_amx - _amn))
        .alias("cn"),
    )
    _bmn, _bmx = F.min(dist_col).over(wq), F.max(dist_col).over(wq)
    sb = dist_ranking.select(
        F.col("query_id").alias("query_id2"),
        F.col("cand_id").alias("cand_id2"),
        F.when(_bmx == _bmn, F.lit(1.0))
        .otherwise((_bmx - F.col(dist_col)) / (_bmx - _bmn))
        .alias("ln"),
    )
    f = sa.join(
        sb,
        (sa.query_id == sb.query_id2) & (sa.cand_id == sb.cand_id2),
        "full_outer",
    ).select(
        F.coalesce(sa.query_id, sb.query_id2).alias("query_id"),
        F.coalesce(sa.cand_id, sb.cand_id2).alias("cand_id"),
        F.round(
            F.lit(w_sim) * F.coalesce(F.col("cn"), F.lit(0.0))
            + F.lit(1.0 - w_sim) * F.coalesce(F.col("ln"), F.lit(0.0)),
            9,
        ).alias("fused_score"),
        (
            F.col("cn").isNotNull().cast("int")
            + F.col("ln").isNotNull().cast("int")
        ).alias("n_lists"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("fused_score"), F.asc("cand_id")
    )
    return f.select(
        "query_id",
        F.row_number().over(w).cast("int").alias("fused_rank"),
        "cand_id",
        "fused_score",
        "n_lists",
    )


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: MRR@k and nDCG@k
# ---------------------------------------------------------------------------

# LCM(1..10): every reciprocal rank 1/r (r <= 10) times this is an
# exact integer, so reciprocal-rank sums are order-independent BIGINTs
# and MRR needs exactly one division at render. For k > 10 the scale
# is computed as LCM(1..k) so the exact-integer invariant holds at any
# depth (a fixed 2520 would silently truncate 2520//11).
_RR_LCM = 2520


def _rr_lcm(k: int) -> int:
    """2520 (the documented LCM(1..10) scale) for any k <= 10, the
    true LCM(1..k) beyond — 2520 divides every 1..10 reciprocal so the
    published rr_int values for small k stay stable. LCM(1..k)
    exceeds int64 at k=43 (LCM(1..42) ≈ 2.2e17 < 2^63 < LCM(1..43)),
    so deeper cutoffs are rejected rather than silently overflowing
    the BIGINT rr_int column."""
    import math

    if k > 42:
        raise ValueError(
            f"k={k}: LCM(1..k) overflows int64 beyond k=42; rr_int "
            "would wrap. Use k <= 42 or aggregate rr as a double."
        )
    return _RR_LCM if k <= 10 else math.lcm(*range(1, k + 1))


def _ndcg_discount_ints(k: int, scale: int = 10**9) -> list[int]:
    """w_i = round(scale / log2(i+1)) for i=1..k, computed ONCE in
    Python and embedded as literals on both engines — log2 is not
    guaranteed correctly-rounded across engines, a literal table is."""
    import math

    return [round(scale / math.log2(i + 1)) for i in range(1, k + 1)]


def mrr_at_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Mean-reciprocal-rank labels-as-relevance evaluation of the
    exact cosine retriever: a candidate is relevant iff it shares the
    query's label, the metric is 1/rank of the FIRST relevant hit in
    the top-k (0 if none). The retrieval-quality gate run before
    trusting an embedding model for RAG or hard-negative mining — the
    ranked twin of the set-overlap recall eval (``ann_recall_eval``).

    Determinism: ranks come from :func:`similarity.cosine_topk`
    (6dp-rounded cosine, cand-id tiebreak), and the reciprocal rank is
    carried as the exact integer LCM(1..10)/rank (``rr_int``), so any
    aggregation over queries is an order-independent BIGINT sum; the
    double rendering divides once. Scale: one corpus scan (the top-k
    is salted two-phase), label lookups are broadcast joins onto the
    k·|queries|-row result.

    Every input query appears in the output: a query with zero top-k
    candidates (corpus holds only the query itself) is joined back and
    scored rr=0 rather than silently dropped.

    Returns one row per query: (query_id, first_rel_rank — 0 when no
    relevant doc in the top k — rr_int, rr)."""
    lcm = _rr_lcm(k)
    topk = cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    lab = corpus.select(F.col(id_col).alias("_cid"), F.col(label_col).alias("_clbl"))
    qlab = queries.select(F.col(id_col).alias("_qid"), F.col(label_col).alias("_qlbl"))
    rel = (
        topk.join(F.broadcast(lab), F.col("cand_id") == F.col("_cid"))
        .join(F.broadcast(qlab), F.col("query_id") == F.col("_qid"))
        .select("query_id", "rank", (F.col("_clbl") == F.col("_qlbl")).alias("rel"))
    )
    fr = rel.groupBy("query_id").agg(
        F.min(F.when(F.col("rel"), F.col("rank"))).alias("_fr")
    )
    base = queries.select(F.col(id_col).alias("query_id"))
    fr = base.join(fr, "query_id", "left")
    # Integer division: lcm is divisible by every 1.._fr <= k, so
    # `div` is exact at any k <= 42; a double divide would go inexact
    # past 2^53 (k >= 41) and break the exact-integer invariant.
    rr_int = F.when(
        F.col("_fr").isNotNull(),
        F.expr(f"CAST({lcm} AS BIGINT) div _fr"),
    ).otherwise(F.lit(0).cast("long"))
    return fr.select(
        "query_id",
        F.coalesce(F.col("_fr"), F.lit(0)).cast("int").alias("first_rel_rank"),
        rr_int.alias("rr_int"),
        (rr_int.cast("double") / F.lit(float(lcm))).alias("rr"),
    )


def ndcg_at_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Binary-gain nDCG@k of the exact cosine retriever with
    labels-as-relevance: DCG = Σ rel_i / log2(i+1) over the top-k,
    normalized by the ideal DCG given how many relevant docs exist in
    the corpus (min(R, k) front-loaded). Position-sensitive where MRR
    only sees the first hit — the standard ranking-quality pair.

    Determinism: the log2 discounts are NOT computed in-engine (log2
    is not correctly-rounded everywhere); they are a Python-computed
    integer literal table (round(1e9/log2(i+1))), so DCG and IDCG are
    exact BIGINT sums and nDCG is ONE division of integers. R per
    query is corpus label frequency minus the query itself (broadcast
    of the |labels|-row frequency table).

    Every input query appears in the output: a query with zero top-k
    candidates is joined back with dcg=0, and a query whose label is
    absent from the corpus gets n_rel=0/ndcg=0 rather than dropping.

    Returns (query_id, n_rel_in_corpus, dcg_int, idcg_int, ndcg)."""
    w = _ndcg_discount_ints(k)
    prefix = [sum(w[: i + 1]) for i in range(k)]
    topk = cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    lab = corpus.select(F.col(id_col).alias("_cid"), F.col(label_col).alias("_clbl"))
    qlab = queries.select(F.col(id_col).alias("_qid"), F.col(label_col).alias("_qlbl"))
    lfreq = corpus.groupBy(F.col(label_col).alias("_flbl")).agg(
        F.count(F.lit(1)).alias("_fn")
    )
    w_arr = F.array(*[F.lit(x) for x in w])
    dcg = (
        topk.join(F.broadcast(lab), F.col("cand_id") == F.col("_cid"))
        .join(F.broadcast(qlab), F.col("query_id") == F.col("_qid"))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("_clbl") == F.col("_qlbl"),
                    F.element_at(w_arr, F.col("rank")),
                ).otherwise(F.lit(0))
            ).alias("dcg_int")
        )
    )
    base = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("_qlbl")
    )
    prefix_arr = F.array(*[F.lit(x) for x in prefix])
    out = (
        base.join(dcg, "query_id", "left")
        .join(F.broadcast(lfreq), F.col("_qlbl") == F.col("_flbl"), "left")
        .withColumn("_fn", F.coalesce(F.col("_fn"), F.lit(1)))
        .withColumn("dcg_int", F.coalesce(F.col("dcg_int"), F.lit(0)))
        .select(
            "query_id",
            (F.col("_fn") - 1).cast("int").alias("n_rel_in_corpus"),
            F.col("dcg_int").cast("long").alias("dcg_int"),
            F.when(
                F.col("_fn") > 1,
                F.element_at(
                    prefix_arr, F.least(F.col("_fn") - 1, F.lit(k)).cast("int")
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("idcg_int"),
        )
    )
    return out.select(
        "query_id",
        "n_rel_in_corpus",
        "dcg_int",
        "idcg_int",
        F.when(
            F.col("idcg_int") > 0,
            F.col("dcg_int").cast("double") / F.col("idcg_int").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k_scan: int = 10,
    n_neg: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining: for each query, the ``n_neg``
    highest-cosine candidates whose label DIFFERS — the "close but
    wrong" examples that make embedding fine-tuning and reranker
    training work (random negatives are too easy; the model only
    learns from near-misses). The scan depth ``k_scan`` bounds how far
    down the ranking we look, so a query whose entire neighborhood
    shares its label yields fewer (possibly zero) negatives rather
    than dredging easy ones.

    Reuses the salted two-phase :func:`similarity.cosine_topk` (one
    corpus scan, broadcast queries) and re-ranks the k_scan·|queries|
    survivors after a broadcast label join — rank-stable: cosine
    rounded 6dp with cand-id tiebreak, negative rank dense within the
    filtered set.

    Returns (query_id, neg_rank, cand_id, sim, neg_label)."""
    topk = cosine_topk(corpus, queries, k=k_scan, id_col=id_col, vec_col=vec_col)
    lab = corpus.select(F.col(id_col).alias("_cid"), F.col(label_col).alias("_clbl"))
    qlab = queries.select(F.col(id_col).alias("_qid"), F.col(label_col).alias("_qlbl"))
    negs = (
        topk.join(F.broadcast(lab), F.col("cand_id") == F.col("_cid"))
        .join(F.broadcast(qlab), F.col("query_id") == F.col("_qid"))
        .filter(F.col("_clbl") != F.col("_qlbl"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id").asc()
    )
    return (
        negs.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= n_neg)
        .select(
            "query_id",
            F.col("neg_rank").cast("int").alias("neg_rank"),
            "cand_id",
            "sim",
            F.col("_clbl").alias("neg_label"),
        )
    )


def inbatch_collision(
    df: DataFrame,
    label_col: str = "label",
    n_batches: int = 16,
    id_col: str = "vec_id",
) -> DataFrame:
    """In-batch-negative collision audit for contrastive training:
    items are assigned to training batches by a deterministic hash of
    their id (the shuffle a dataloader would apply), and within each
    batch every same-label pair is a FALSE NEGATIVE — the collision
    that quietly caps contrastive-loss quality when batches are built
    label-blind. The audit reports per-batch pair mass and collision
    counts so the batch size / grouping strategy can be fixed before
    training, not after.

    collisions = Σ_label C(c,2) per batch — one (batch, label)
    aggregate then a batch re-aggregate, exact integers throughout,
    the rate is ONE division. The batch hash is the md5 64-bit half
    (cross-engine surrogate-key construction) mod n_batches.

    Returns one row per batch: (batch, n_items, n_pairs,
    n_collisions, collision_rate)."""
    if n_batches < 1:
        raise ValueError(f"n_batches must be >= 1, got {n_batches}")
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 16), 16, -10
    ).cast("long")
    per_cell = (
        df.select(
            F.pmod(h, F.lit(n_batches)).cast("int").alias("batch"),
            F.col(label_col).alias("_lbl"),
        )
        .groupBy("batch", "_lbl")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # C(c,2) via integer div — a /2 through double loses exactness past
    # 2^53, which 1e9-item batches would hit
    per_batch = per_cell.groupBy("batch").agg(
        F.sum("c").cast("long").alias("n_items"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("n_collisions"),
    )
    n_pairs = F.expr("n_items * (n_items - 1) div 2").cast("long")
    return per_batch.select(
        "batch",
        "n_items",
        n_pairs.alias("n_pairs"),
        "n_collisions",
        F.when(
            n_pairs > 0,
            F.col("n_collisions").cast("double") / n_pairs.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("collision_rate"),
    )


def hubness_census(
    knn_edges: DataFrame,
    nbr_col: str = "nbr_id",
) -> DataFrame:
    """Hubness audit of a kNN graph: the k-occurrence histogram — how
    many nodes appear as SOMEONE's neighbor 0,1,2,… times. In high
    dimensions a few points become hubs (k-occurrence ≫ k) while many
    become anti-hubs (0) — the curse-of-dimensionality symptom that
    silently degrades ANN recall and makes semantic dedup collapse
    unrelated docs into hub-centered clusters. A long right tail here
    says: normalize/center the embeddings or re-rank before trusting
    neighbor lists.

    Two hash aggregations over the |V|·k edge list; anti-hubs (nodes
    never cited) are NOT in the edge list, so the census reports the
    cited distribution — join externally against the node table for
    the 0-bucket if needed.

    Returns (k_occurrence, n_nodes) sorted ascending (the histogram
    is tiny — #distinct occurrence counts — so the sort is free)."""
    per = knn_edges.groupBy(F.col(nbr_col)).agg(
        F.count(F.lit(1)).cast("long").alias("k_occurrence")
    )
    return (
        per.groupBy("k_occurrence")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("k_occurrence")
    )


def mutual_knn_stats(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Mutual-kNN degree census — the robustness filter on top of the
    directed kNN graph: an edge survives only if BOTH endpoints rank
    each other in their top-k. Hub nodes (q_hubness_census) collect
    thousands of inbound edges that are not reciprocated; mutual-kNN
    strips exactly those, which is why density-based clustering and
    SemDeDup-style pipelines run on the mutual graph. The degree
    histogram (how many nodes keep 0..k mutual neighbours) is the
    one-screen readout of how hub-distorted the neighbourhood
    structure is.

    Built as one self-join of the deterministic LSH kNN graph
    (:func:`knn_graph` — seeded hyperplanes, rounded cosine, id
    tiebreaks) on the reversed edge key; the join carries (src, nbr)
    id pairs only. Output is bounded: k+1 rows.

    Returns (mutual_degree, n_nodes) — nodes with ≥1 directed edge,
    bucketed by how many of their k edges are reciprocated."""
    g = knn_graph(
        corpus, k=k, id_col=id_col, vec_col=vec_col, dim=dim,
        n_planes=n_planes, seed=seed,
    ).select("src_id", "nbr_id")
    rev = g.select(
        F.col("nbr_id").alias("src_id"), F.col("src_id").alias("nbr_id")
    )
    mutual = g.join(rev, ["src_id", "nbr_id"], "left_semi")
    deg = g.select("src_id").distinct().join(
        mutual.groupBy("src_id").agg(
            F.count(F.lit(1)).cast("long").alias("md")
        ),
        "src_id",
        "left",
    ).select(
        "src_id", F.coalesce(F.col("md"), F.lit(0)).cast("long").alias("md")
    )
    return (
        deg.groupBy(F.col("md").alias("mutual_degree"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
