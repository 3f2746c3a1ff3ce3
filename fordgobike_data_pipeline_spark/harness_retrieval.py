"""Harness entries for hybrid-retrieval composition beyond RRF:
score-aware min-max weighted fusion (operators/retrieval.py
minmax_fuse) of the cosine and Euclidean rankers — the oracle
reproduces both rankers bit-exactly (shared rounded metrics and id
tiebreaks, same CTE fragments as q_rrf_fusion) and then the
normalization/fusion arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from .harness import query
from .harness_scale import _L2_DIST, _NDOT, _NORM_CTE
from .io import load_tables
from .operators import retrieval, similarity


@query(
    "q_fusion_minmax",
    f"""
    WITH {_NORM_CTE},
    q AS (SELECT vec_id, nv FROM n WHERE vec_id < 5),
    ra AS (
        SELECT query_id, cand_id, s FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   round({_NDOT.format(a='q', b='c')}, 6) + 0.0 AS s,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_NDOT.format(a='q', b='c')}, 6) DESC,
                                c.vec_id) AS rank
            FROM q JOIN n c ON c.vec_id != q.vec_id
        ) WHERE rank <= 10
    ),
    qr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    rb AS (
        SELECT query_id, cand_id, d FROM (
            SELECT qr.vec_id AS query_id, e.vec_id AS cand_id,
                   {_L2_DIST.format(a='qr', b='e')} AS d,
                   row_number() OVER (
                       PARTITION BY qr.vec_id
                       ORDER BY {_L2_DIST.format(a='qr', b='e')} ASC,
                                e.vec_id) AS rank
            FROM qr JOIN embeddings e ON e.vec_id != qr.vec_id
        ) WHERE rank <= 10
    ),
    na AS (SELECT query_id, min(s) AS amn, max(s) AS amx FROM ra GROUP BY query_id),
    nb AS (SELECT query_id, min(d) AS bmn, max(d) AS bmx FROM rb GROUP BY query_id),
    sa AS (
        SELECT ra.query_id, cand_id,
               CASE WHEN amx = amn THEN 1.0
                    ELSE (s - amn) / (amx - amn) END AS cn
        FROM ra JOIN na ON na.query_id = ra.query_id
    ),
    sb AS (
        SELECT rb.query_id, cand_id,
               CASE WHEN bmx = bmn THEN 1.0
                    ELSE (bmx - d) / (bmx - bmn) END AS ln
        FROM rb JOIN nb ON nb.query_id = rb.query_id
    ),
    f AS (
        SELECT COALESCE(sa.query_id, sb.query_id) AS query_id,
               COALESCE(sa.cand_id, sb.cand_id) AS cand_id,
               round(0.7 * COALESCE(cn, 0) + 0.3 * COALESCE(ln, 0), 9)
                   AS fused_score,
               CAST(CASE WHEN cn IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN ln IS NOT NULL THEN 1 ELSE 0 END AS INT)
                   AS n_lists
        FROM sa FULL JOIN sb
        ON sa.query_id = sb.query_id AND sa.cand_id = sb.cand_id
    )
    SELECT query_id,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY fused_score DESC, cand_id) AS INT) AS fused_rank,
           cand_id, fused_score, n_lists
    FROM f
    """,
)
def q_fusion_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max weighted fusion (retrieval.minmax_fuse, 0.7·cosine +
    0.3·euclidean) of the two exact top-10 rankers — the score-aware
    hybrid combiner next to q_rrf_fusion's score-free one. Candidates
    missing from a list contribute 0 from it; n_lists records the
    overlap. Fusion reads |queries|·k rows; the rankers bound the
    cost."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5)
    by_cos = similarity.cosine_topk(emb, queries, k=10)
    by_l2 = retrieval.l2_topk(emb, queries, k=10)
    return retrieval.minmax_fuse(by_cos, by_l2, w_sim=0.7)


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: MRR@k / nDCG@k (labels as relevance)
# ---------------------------------------------------------------------------

_TOPK_LBL_CTES = f"""
    q AS (SELECT vec_id, nv FROM n WHERE vec_id < 10),
    topk AS (
        SELECT query_id, cand_id, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_NDOT.format(a='q', b='c')}, 6) DESC,
                                c.vec_id) AS rank
            FROM q JOIN n c ON c.vec_id != q.vec_id
        ) WHERE rank <= 10
    ),
    lbl AS (
        SELECT t.query_id, t.rank, (cl.label = ql.label) AS rel
        FROM topk t
        JOIN embeddings cl ON cl.vec_id = t.cand_id
        JOIN embeddings ql ON ql.vec_id = t.query_id
    )
"""


@query(
    "q_mrr_at_k",
    f"""
    WITH {_NORM_CTE},
    {_TOPK_LBL_CTES},
    fr AS (
        SELECT query_id, min(CASE WHEN rel THEN rank END) AS fr
        FROM lbl GROUP BY query_id
    )
    SELECT q.vec_id AS query_id,
           CAST(coalesce(fr, 0) AS INT) AS first_rel_rank,
           CAST(CASE WHEN fr IS NOT NULL THEN 2520 // fr ELSE 0 END
                AS BIGINT) AS rr_int,
           CAST(CASE WHEN fr IS NOT NULL THEN 2520 // fr ELSE 0 END
                AS DOUBLE) / 2520.0 AS rr
    FROM q LEFT JOIN fr ON fr.query_id = q.vec_id
    """,
)
def q_mrr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 of the exact cosine retriever with labels-as-relevance
    (retrieval.mrr_at_k): 1/rank of the first same-label hit per
    query, 0 when the top-10 has none — the ranked-retrieval quality
    gate (the set-overlap twin is q_ann_recall). Reciprocal ranks are
    exact LCM(1..10)/rank BIGINTs, so query-set aggregations are
    order-independent; one division renders the double."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    return retrieval.mrr_at_k(emb, queries, k=10)


@query(
    "q_ndcg_at_k",
    f"""
    WITH {_NORM_CTE},
    {_TOPK_LBL_CTES},
    dcg AS (
        SELECT query_id,
               CAST(sum(CASE WHEN rel THEN [1000000000, 630929754, 500000000, 430676558, 386852807, 356207187, 333333333, 315464877, 301029996, 289064826][rank] ELSE 0 END)
                    AS BIGINT) AS dcg_int
        FROM lbl GROUP BY query_id
    ),
    freq AS (
        SELECT ql.vec_id AS query_id, count(*) AS fn
        FROM embeddings ql JOIN embeddings c ON c.label = ql.label
        WHERE ql.vec_id < 10
        GROUP BY ql.vec_id
    )
    SELECT q.vec_id AS query_id,
           CAST(coalesce(fn, 1) - 1 AS INT) AS n_rel_in_corpus,
           CAST(coalesce(d.dcg_int, 0) AS BIGINT) AS dcg_int,
           CAST(CASE WHEN coalesce(fn, 1) > 1
                     THEN [1000000000, 1630929754, 2130929754, 2561606312, 2948459119, 3304666306, 3637999639, 3953464516, 4254494512, 4543559338][CAST(least(fn - 1, 10) AS INT)]
                     ELSE 0 END AS BIGINT) AS idcg_int,
           CASE WHEN coalesce(fn, 1) > 1
                THEN CAST(coalesce(d.dcg_int, 0) AS DOUBLE)
                     / CAST([1000000000, 1630929754, 2130929754, 2561606312, 2948459119, 3304666306, 3637999639, 3953464516, 4254494512, 4543559338][CAST(least(fn - 1, 10) AS INT)] AS DOUBLE)
                ELSE 0.0 END AS ndcg
    FROM q
    LEFT JOIN dcg d ON d.query_id = q.vec_id
    LEFT JOIN freq ON freq.query_id = q.vec_id
    """,
)
def q_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-gain nDCG@10 with labels-as-relevance
    (retrieval.ndcg_at_k): position-weighted ranking quality where MRR
    only sees the first hit, normalized by the ideal ranking given the
    corpus's same-label supply. The log2 discounts are a Python-
    computed integer literal table shared verbatim with the oracle —
    in-engine log2 is not correctly-rounded everywhere — so DCG/IDCG
    are exact BIGINT sums and nDCG is one int/int division."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    return retrieval.ndcg_at_k(emb, queries, k=10)


@query(
    "q_hard_negatives",
    f"""
    WITH {_NORM_CTE},
    q AS (SELECT vec_id, nv FROM n WHERE vec_id < 10),
    topk AS (
        SELECT query_id, cand_id, sim FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   round({_NDOT.format(a='q', b='c')}, 6) + 0.0 AS sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_NDOT.format(a='q', b='c')}, 6) DESC,
                                c.vec_id) AS rank
            FROM q JOIN n c ON c.vec_id != q.vec_id
        ) WHERE rank <= 10
    ),
    negs AS (
        SELECT t.query_id, t.cand_id, t.sim, cl.label AS neg_label,
               row_number() OVER (
                   PARTITION BY t.query_id
                   ORDER BY t.sim DESC, t.cand_id) AS neg_rank
        FROM topk t
        JOIN embeddings cl ON cl.vec_id = t.cand_id
        JOIN embeddings ql ON ql.vec_id = t.query_id
        WHERE cl.label <> ql.label
    )
    SELECT query_id, CAST(neg_rank AS INT) AS neg_rank, cand_id, sim,
           neg_label
    FROM negs WHERE neg_rank <= 3
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (retrieval.hard_negatives):
    per query, the 3 highest-cosine candidates with a DIFFERENT label
    inside the top-10 scan window — the near-miss examples embedding
    fine-tuning and reranker training need (random negatives are too
    easy to teach anything). One corpus scan via the salted two-phase
    top-k; the negative re-rank runs on the 10·|queries|-row survivor
    set after broadcast label joins."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    return retrieval.hard_negatives(emb, queries, k_scan=10, n_neg=3)


@query(
    "q_inbatch_collision",
    """
    WITH cell AS (
        SELECT CAST(((CAST(CAST(from_hex(substr(md5(CAST(vec_id AS VARCHAR)),
                         1, 16)) AS BIT) AS BIGINT) % 16) + 16) % 16 AS INT)
                   AS batch,
               label, count(*) AS c
        FROM embeddings GROUP BY 1, 2
    ),
    pb AS (
        SELECT batch,
               CAST(sum(c) AS BIGINT) AS n_items,
               CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_collisions
        FROM cell GROUP BY batch
    )
    SELECT batch, n_items,
           CAST(n_items * (n_items - 1) // 2 AS BIGINT) AS n_pairs,
           n_collisions,
           CASE WHEN n_items > 1
                THEN CAST(n_collisions AS DOUBLE)
                     / CAST(n_items * (n_items - 1) // 2 AS DOUBLE)
                ELSE 0.0 END AS collision_rate
    FROM pb
    """,
)
def q_inbatch_collision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-batch-negative collision audit (retrieval.inbatch_collision):
    items batched by a deterministic md5 hash of their id; within a
    batch every same-label pair is a FALSE NEGATIVE for contrastive
    training. Per-batch pair mass and collision counts — the check
    that sizes batches / fixes label-blind batching before a training
    run, exact integers with one division at render."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return retrieval.inbatch_collision(emb, label_col="label", n_batches=16)


# ---------------------------------------------------------------------------
# Round-12 wave 41: Dirichlet-smoothed query likelihood — the LM
# retrieval twin of q_bm25 (same query terms, same dl/tokenization
# conventions, different scoring family).
# ---------------------------------------------------------------------------

_QL_TERMS = ("join", "hash", "scan", "filter", "merge")


@query(
    "q_query_likelihood",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    hits AS (
        SELECT doc_id, token FROM toks
        WHERE token IN {str(tuple(_QL_TERMS))}
    ),
    tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM hits GROUP BY doc_id, token
    ),
    cand AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM tf GROUP BY doc_id
    ),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    cf AS (SELECT token, CAST(count(*) AS BIGINT) AS cf FROM hits GROUP BY token),
    nt AS (
        SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_corpus
        FROM documents
    ),
    s AS (
        SELECT cand.doc_id, cand.n_hits,
               ln((CAST(coalesce(tf.tf, 0) AS DOUBLE)
                   + CAST(100.0 AS DOUBLE)
                     * (CAST(cf.cf AS DOUBLE) / CAST(nt.n_corpus AS DOUBLE)))
                  / (CAST(dl.dl AS DOUBLE) + CAST(100.0 AS DOUBLE))) AS s
        FROM cand
        JOIN dl USING (doc_id)
        CROSS JOIN cf
        CROSS JOIN nt
        LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.token = cf.token
    )
    SELECT doc_id, n_hits, round(sum(s), 6) AS ql_score
    FROM s GROUP BY doc_id, n_hits
    """,
)
def q_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query likelihood (μ=100) of the shared fixed
    query-term set against every matching doc
    (text.query_likelihood_scores). Unlike BM25, zero-count query
    terms still contribute smoothed background mass, so the score is a
    true LM log-probability — the second ranker a hybrid-retrieval
    stack fuses. The oracle mirrors the exact expression tree
    (coalesced tf → smoothed ratio → ln → 5-term sum, 6dp)."""
    from .operators import text

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.query_likelihood_scores(docs, list(_QL_TERMS), mu=100.0)
