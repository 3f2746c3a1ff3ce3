"""Corpus-cleaning pipeline: planted low-quality docs, exact dups and
near-dups must each be removed at the right stage, with the accounting
report matching."""

from __future__ import annotations

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.io import load_tables
from fordgobike_data_pipeline_spark.operators import similarity
from fordgobike_data_pipeline_spark.plans import corpus

from .conftest import SF_SMOKE


def test_clean_corpus_removes_planted_junk(spark):
    docs = load_tables(spark, SF_SMOKE, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    n0 = docs.count()
    junk = spark.createDataFrame(
        [(9_001, "x"), (9_002, "!!! ??? ...")], "doc_id LONG, text STRING"
    )
    exact_dup = docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 9_100).alias("doc_id"), "text"
    )
    # near-dup: same text plus one appended token
    near_dup = docs.filter(F.col("doc_id") == 5).select(
        (F.col("doc_id") + 9_200).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    corpus_in = docs.unionByName(junk).unionByName(exact_dup).unionByName(near_dup)

    cleaned, report = corpus.clean_corpus(corpus_in, min_quality=0.4)
    ids = {r.doc_id for r in cleaned.select("doc_id").collect()}

    assert 9_001 not in ids and 9_002 not in ids  # quality gate
    assert 9_100 not in ids and 3 in ids  # exact dedup keeps min id
    assert 9_205 not in ids and 5 in ids  # near-dedup drops higher id
    rep = {r.stage: r.n_docs for r in report.collect()}
    assert rep["input"] == n0 + 4
    assert rep["quality_gate"] == n0 + 2
    assert rep["exact_dedup"] == n0 + 1
    assert rep["near_dedup"] <= n0  # near-dups in the base corpus drop too
    assert cleaned.count() == rep["near_dedup"]


def test_token_budget_filter(spark):
    from fordgobike_data_pipeline_spark.operators import text as text_ops

    docs = load_tables(spark, SF_SMOKE, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    total = (
        text_ops.token_count_bpe_ish(docs).agg(F.sum("n_bpe_tokens")).first()[0]
    )
    budget = total // 3
    kept = corpus.token_budget_filter(docs, budget)
    kept_tokens = (
        text_ops.token_count_bpe_ish(kept).agg(F.sum("n_bpe_tokens")).first()[0]
    )
    assert kept_tokens <= budget
    assert 0 < kept.count() < docs.count()
    # kept docs skew to higher quality than dropped ones
    q = text_ops.quality_score(docs)
    kept_q = q.join(kept.select("doc_id"), "doc_id", "left_semi").agg(
        F.avg("quality")
    ).first()[0]
    dropped_q = q.join(kept.select("doc_id"), "doc_id", "left_anti").agg(
        F.avg("quality")
    ).first()[0]
    assert kept_q > dropped_q
    # whole corpus fits → untouched
    assert corpus.token_budget_filter(docs, total + 1).count() == docs.count()
    # determinism
    a = {r.doc_id for r in kept.collect()}
    b = {r.doc_id for r in corpus.token_budget_filter(docs, budget).collect()}
    assert a == b


def test_cosine_pairs_lsh_subset_of_bruteforce(spark):
    emb = load_tables(spark, SF_SMOKE, ("embeddings",))["embeddings"]
    twins = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
        "label",
    )
    both = emb.unionByName(twins)
    brute = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.cosine_pairs(both, threshold=0.4).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.cosine_pairs_lsh(both, threshold=0.4, n_planes=6).collect()
    }
    assert set(lsh) <= set(brute)
    for k, v in lsh.items():
        assert brute[k] == v
    # colinear twins (cos=1) share every plane bit → always recalled
    for q in range(3):
        assert (q, q + 10_000) in lsh and lsh[(q, q + 10_000)] == 1.0


def test_cosine_pairs_guard_refuses_oversized_broadcast(spark):
    """cosine_pairs broadcasts the whole corpus: above the guard it must
    raise (pointing at the LSH scale path), never attempt the broadcast;
    None bypasses the guard explicitly."""
    import pytest

    emb = load_tables(spark, SF_SMOKE, ("embeddings",))["embeddings"]
    with pytest.raises(ValueError, match="cosine_pairs_lsh"):
        similarity.cosine_pairs(emb, threshold=0.4, max_broadcast_rows=10)
    # explicit bypass still works on a small corpus
    assert (
        similarity.cosine_pairs(
            emb.limit(20), threshold=-1.0, max_broadcast_rows=None
        ).count()
        > 0
    )
