"""Wave-36 operators: W1 drift, leave-one-source-out valuation,
content-defined chunking, k-center coreset, mean-centered binary
signatures — planted-value tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import (
    curation,
    dedup,
    quality,
    sampling,
    similarity,
)


def test_wasserstein_known_shift(spark):
    # every a-value in bucket 0, every b-value in bucket 1 -> the
    # closed form gives width * |1 - 0| summed over the one gap = 32
    rows = [("a", 0)] * 4 + [("b", 40)] * 4
    df = spark.createDataFrame(rows, "g string, v long")
    r = quality.wasserstein_hist_drift(df, "g", "a", "b", "v", 32).collect()[0]
    assert r.w1 == 32.0 and r.n_a == 4 and r.n_b == 4


def test_wasserstein_gapped_support(spark):
    # a=0 vs b=96 at width 32: buckets 0 and 3, two EMPTY buckets in
    # between. The gap-weighted closed form gives |dCDF|=1 across a
    # run of 3 grid steps -> 32*3 = 96 (the true W1), not 32.
    df = spark.createDataFrame([("a", 0), ("b", 96)], "g string, v long")
    r = quality.wasserstein_hist_drift(df, "g", "a", "b", "v", 32).collect()[0]
    assert r.w1 == 96.0


def test_wasserstein_identical_is_zero(spark):
    rows = [("a", i * 7) for i in range(10)] + [("b", i * 7) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v long")
    assert quality.wasserstein_hist_drift(df, "g", "a", "b", "v").collect()[0].w1 == 0.0


def test_wasserstein_empty_side_is_null(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    assert quality.wasserstein_hist_drift(df, "g", "a", "b", "v").collect()[0].w1 is None


def test_source_loo_dup_bookkeeping(spark):
    # "dup" lives in s1 AND s2; "only1" twice in s1 only.
    rows = [
        (1, "dup", "s1", 3),
        (2, "dup", "s2", 3),
        (3, "only1", "s1", 5),
        (4, "only1", "s1", 5),
        (5, "uniq", "s2", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    out = {r.source: r for r in curation.source_loo_impact(df).collect()}
    # drop s1: remaining docs 2,5 -> hashes {dup, uniq} distinct=2, dups=0
    assert out["s1"].dup_rate_loo == 0.0
    # drop s2: remaining docs 1,3,4 -> hashes {dup, only1}: 3 docs, 2 distinct
    assert abs(out["s2"].dup_rate_loo - 1 / 3) < 1e-9
    # mean chars: drop s1 -> (3+7)/2 = 5.0
    assert out["s1"].mean_chars_loo == 5.0


def test_cdc_chunks_shift_robust(spark):
    # a prefix insertion must NOT re-chunk the whole document: every
    # chunk that starts after the first content-defined boundary keeps
    # its identity (the fixed-width chunker would shift all of them)
    base = " ".join(f"w{i * 37 % 101}x{i}" for i in range(400))
    df1 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    df2 = spark.createDataFrame(
        [(1, base), (2, "inserted prefix " + base)], "doc_id long, text string"
    )
    s1 = dedup.cdc_chunk_stats(df1).collect()[0]
    s2 = dedup.cdc_chunk_stats(df2).collect()[0]
    # doc2 shares most chunks with doc1 -> heavy chunk-level dedup
    assert s2.dup_chunks >= int(s1.n_chunks * 0.6)
    # boundary rate sanity: expected chunk ~8 words
    assert 4 <= s1.avg_chunk_words <= 16


def test_kcenter_planted_geometry(spark):
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.1, 0.0]),
        (2, [10.0, 0.0]),
        (3, [5.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sel = sampling.kcenter_coreset(df, k=3).collect()
    order = [(r.sel_rank, r.vec_id) for r in sorted(sel, key=lambda r: r.sel_rank)]
    # seed = min id (0); farthest from 0 is 2 (d=100); then 3 (d=25 to both)
    assert order == [(1, 0), (2, 2), (3, 3)]
    d2 = {r.sel_rank: r.d2 for r in sel}
    assert d2[1] == 0
    assert d2[2] == 100_000 ** 2  # (10 * 1e4)^2 = 1e10
    assert d2[3] == 25 * 10_000 ** 2


def test_kcenter_empty_corpus_returns_empty(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = sampling.kcenter_coreset(df, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["sel_rank", "vec_id", "d2"]


def test_kcenter_string_ids(spark):
    # vec_id type follows the INPUT id column — string doc ids work
    rows = [("a", [0.0]), ("b", [1.0]), ("c", [10.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    sel = sorted(sampling.kcenter_coreset(df, k=2).collect(), key=lambda r: r.sel_rank)
    assert [r.vec_id for r in sel] == ["a", "c"]
    assert sampling.kcenter_coreset(df, k=2).schema["vec_id"].dataType.typeName() == "string"


def test_balanced_bits_clustered_recall_is_one(spark):
    rows = [(i, [1.0 + i * 0.001, 1.0]) for i in range(20)] + [
        (100 + i, [-1.0 - i * 0.001, -1.0]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in similarity.balanced_bits_recall(df, n_queries=3, k=10).collect()}
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r.recall_at_k == 1.0
