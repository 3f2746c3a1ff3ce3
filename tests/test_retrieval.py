"""Hybrid retrieval (operators/retrieval.py): L2 top-k exactness on
crafted vectors, RRF fusion arithmetic/tiebreaks, and the
consensus-boost property that motivates fusion."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import retrieval


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_l2_topk_exact_on_crafted_vectors(spark):
    """Distances and ranks match a hand computation; self is excluded."""
    corpus = _vec_df(
        spark,
        [
            (0, [0.0, 0.0]),
            (1, [3.0, 4.0]),   # dist 5 from origin
            (2, [1.0, 0.0]),   # dist 1
            (3, [0.0, 2.0]),   # dist 2
        ],
    )
    q = corpus.filter(F.col("vec_id") == 0)
    got = {
        r.rank: (r.cand_id, r.dist)
        for r in retrieval.l2_topk(corpus, q, k=3, n_salt=2).collect()
    }
    assert got == {1: (2, 1.0), 2: (3, 2.0), 3: (1, 5.0)}


def test_l2_and_cosine_disagree_on_unnormalized(spark):
    """The two metrics order a long near-parallel vector differently —
    the disagreement RRF exists to reconcile."""
    from fordgobike_data_pipeline_spark.operators import similarity

    corpus = _vec_df(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [10.0, 0.1]),   # almost parallel but far (L2 ~9)
            (2, [0.5, 0.5]),    # 45° off but close (L2 ~0.707)
        ],
    )
    q = corpus.filter(F.col("vec_id") == 0)
    cos1 = {
        r.rank: r.cand_id for r in similarity.cosine_topk(corpus, q, k=2).collect()
    }
    l2_1 = {r.rank: r.cand_id for r in retrieval.l2_topk(corpus, q, k=2).collect()}
    assert cos1[1] == 1 and l2_1[1] == 2


def test_rrf_scores_and_consensus(spark):
    """Fused score is Σ 1/(60+rank); an item ranked mid-list by BOTH
    rankers beats an item ranked first by only one."""
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, cand_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (0, 12, 3)], "query_id long, cand_id long, rank int"
    )
    out = {r.cand_id: r for r in retrieval.rrf_fuse([a, b], topk=10).collect()}
    # 11: in both lists (ranks 2 and 1) → top fused
    assert out[11].fused_rank == 1 and out[11].n_lists == 2
    assert math.isclose(out[11].rrf_score, round(1 / 62 + 1 / 61, 9))
    # 12 (ranks 3+3 in both) beats 10 (rank 1 in one list only)
    assert out[12].rrf_score > out[10].rrf_score
    # single-list items still score
    assert out[13].n_lists == 1
    assert math.isclose(out[13].rrf_score, round(1 / 62, 9))


def test_rrf_tiebreak_deterministic(spark):
    """Equal fused scores order by item id — rerun-stable output."""
    a = spark.createDataFrame([(0, 5, 1), (0, 3, 2)], "query_id long, cand_id long, rank int")
    b = spark.createDataFrame([(0, 3, 1), (0, 5, 2)], "query_id long, cand_id long, rank int")
    out = retrieval.rrf_fuse([a, b], topk=10).collect()
    assert [(r.fused_rank, r.cand_id) for r in sorted(out, key=lambda r: r.fused_rank)] == [
        (1, 3),
        (2, 5),
    ]


def test_knn_graph_shape_and_determinism(spark):
    """≤ k ranked edges per node, no self-edges, descending sim with
    contiguous ranks, and a rerun yields the identical edge set."""
    from fordgobike_data_pipeline_spark.io import load_tables

    from .conftest import SF_SMOKE

    emb = load_tables(spark, SF_SMOKE, ("embeddings",))["embeddings"].filter(
        F.col("vec_id") < 300
    )
    g1 = retrieval.knn_graph(emb, k=3, n_planes=4).collect()
    assert all(r.src_id != r.nbr_id for r in g1)
    per = {}
    for r in g1:
        per.setdefault(r.src_id, []).append((r.rank, r.sim))
    for edges in per.values():
        edges.sort()
        assert [rk for rk, _ in edges] == list(range(1, len(edges) + 1))
        sims = [s for _, s in edges]
        assert sims == sorted(sims, reverse=True)
        assert len(edges) <= 3
    g2 = retrieval.knn_graph(emb, k=3, n_planes=4).collect()
    assert sorted(map(tuple, g1)) == sorted(map(tuple, g2))


def test_maxsim_rewards_per_token_match(spark):
    """A candidate matching each query token in a different sub-vector
    beats one pooled-similar candidate — the signal MaxSim keeps."""
    # 32-dim vectors = 2 sub-vectors of 16 (n_sub=2)
    def vec(a, b):
        return [float(a)] * 16 + [float(b)] * 16

    corpus = spark.createDataFrame(
        [
            (0, vec(1, -1)),   # query: token0=+1s, token1=-1s
            (1, vec(1, -1)),   # perfect per-token match
            (2, vec(1, 1)),    # matches token0 only
            (3, vec(-1, 1)),   # anti-matches both
        ],
        "vec_id long, embedding array<float>",
    )
    q = corpus.filter(F.col("vec_id") == 0)
    got = {
        r.rank: (r.cand_id, r.score)
        for r in retrieval.maxsim_topk(corpus, q, k=3, n_sub=2, sub_dim=16).collect()
    }
    # cand 1 matches per token; cand 3 matches both query tokens too —
    # in SWAPPED sub-vector positions, which MaxSim's max-over-candidate-
    # tokens deliberately forgives (order-invariant token matching);
    # cand 2 can satisfy only one query token (0.0 = 1 + (-1))
    assert got[1] == (1, 2.0)
    assert got[2] == (3, 2.0)
    assert got[3] == (2, 0.0)


def test_knn_graph_increment_equals_rebuild_and_keeps_untouched(spark):
    """Incremental update == full rebuild edge-for-edge, and nodes in
    unaffected buckets keep their old edge rows verbatim."""
    from fordgobike_data_pipeline_spark.io import load_tables

    from .conftest import SF_SMOKE

    emb = load_tables(spark, SF_SMOKE, ("embeddings",))["embeddings"].filter(
        F.col("vec_id") < 400
    )
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    old = retrieval.knn_graph(corpus, k=3, n_planes=5).localCheckpoint()
    inc = retrieval.knn_graph_increment(old, corpus, batch, k=3, n_planes=5)
    full = retrieval.knn_graph(emb, k=3, n_planes=5)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
