"""Wave-38 operators: mutual-kNN census, simplified silhouette,
greedy source set cover, shingle-width sweep, Hill tail index —
planted-value tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import (
    analytics,
    curation,
    dedup,
    retrieval,
    similarity,
)


def test_mutual_knn_two_tight_clusters(spark):
    # two tight clusters of 4: within a cluster every node ranks the
    # other 3 mutually (k=3) -> every node has mutual degree 3
    rows = [(i, [1.0 + i * 0.001, 1.0]) for i in range(4)] + [
        (10 + i, [-1.0 - i * 0.001, -1.0]) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.mutual_degree: r.n_nodes for r in retrieval.mutual_knn_stats(df, k=3, n_planes=2).collect()}
    assert out == {3: 8}


def test_silhouette_compact_clusters_near_one(spark):
    # seed centroids = ids 0,1; the rest sit almost ON their centroid
    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])] + [
        (10 + i, [1.0, 0.001 * i]) for i in range(5)
    ] + [(20 + i, [-1.0, 0.001 * i]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.cluster: r for r in similarity.simplified_silhouette(df, k=2).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r.mean_silhouette > 0.95


def test_silhouette_misassigned_negative(spark):
    # a point sitting on the OTHER centroid would score s = -1 if it
    # were assigned to cluster 0, but argmin assigns it to 1 -> all
    # assignments here are correct and non-negative
    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0]), (5, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.cluster: r for r in similarity.simplified_silhouette(df, k=2).collect()}
    assert out[1].n == 2 and out[1].mean_silhouette == 1.0


def test_source_set_cover_greedy_order(spark):
    # srcA covers grams {x y z, y z w}; srcB a subset of A; srcC adds
    # one new gram -> greedy picks A first, then C (gain 1), then B (0)
    rows = [
        (1, "x y z w", "A"),
        (2, "x y z", "B"),
        (3, "x y z q", "C"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.step: r for r in curation.source_set_cover(docs, steps=3).collect()}
    assert out[1].source == "A"
    assert out[2].source == "C" and out[2].marginal_gain >= 1
    assert out[3].marginal_gain == 0
    assert out[3].cum_coverage == 1.0


def test_source_set_cover_fewer_sources_than_steps(spark):
    # one distinct source, three steps: steps 2-3 must still emit rows
    # (NULL source/gain/coverage), matching the oracle's empty scalar
    # subqueries — not silently return fewer rows.
    docs = spark.createDataFrame(
        [(1, "x y z w", "A")], "doc_id long, text string, source string"
    )
    out = {r.step: r for r in curation.source_set_cover(docs, steps=3).collect()}
    assert sorted(out) == [1, 2, 3]
    assert out[1].source == "A" and out[1].cum_coverage == 1.0
    for s in (2, 3):
        assert out[s].source is None
        assert out[s].marginal_gain is None
        assert out[s].cum_coverage is None


def test_shingle_sensitivity_monotone(spark):
    # docs sharing vocabulary collapse at k=1-ish widths but separate
    # at larger k: dup_rate must be non-increasing in k
    rows = [
        (1, "a b c d e"),
        (2, "a b x d e"),
        (3, "a b c d e"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.k: r for r in dedup.shingle_set_sensitivity(docs, ks=(2, 3, 5)).collect()}
    assert out[2].dup_rate >= out[3].dup_rate >= out[5].dup_rate
    # docs 1 and 3 are identical -> always >= one collapse
    assert all(r.dup_docs >= 1 for r in out.values())


def test_hill_tail_pareto_recovers_alpha(spark):
    # exact Pareto(alpha=2) grid: x_i = round(1e6 / sqrt(i)) has
    # tail index ~2; Hill on top-20 should land near it
    rows = [(i, int(1_000_000 / (i ** 0.5))) for i in range(1, 500)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    r = analytics.hill_tail_index(df, "n_chars", "doc_id", k=20).collect()[0]
    assert r.k == 20
    assert 1.4 < r.alpha_hat < 2.6
