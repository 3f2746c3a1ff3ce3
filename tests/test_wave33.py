"""Wave-33 operators: spectral top-eigen share, shard manifest,
seeded-DP histogram — planted-value tests."""

from __future__ import annotations

from fordgobike_data_pipeline_spark.operators import similarity


def test_spectral_rank1_share_is_one(spark):
    # every row a multiple of e1 -> second-moment matrix is rank 1:
    # share = 1, dominant axis 0
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(3)] + [(9, [-0.5, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = similarity.spectral_top_share(df).collect()[0]
    assert r.n_rows == 4 and r.dim == 3
    assert abs(r.top_eigen_share - 1.0) < 1e-9
    assert r.dominant_dim == 0


def test_spectral_isotropic_share_near_inverse_dim(spark):
    # perfectly isotropic pair of axes -> share = 1/2 exactly
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0]), (3, [0.0, -1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = similarity.spectral_top_share(df).collect()[0]
    assert abs(r.top_eigen_share - 0.5) < 1e-6


def test_spectral_dominant_axis_picked(spark):
    # variance 100x larger along axis 2 -> dominant_dim 2, share ~ 1
    rows = [(i, [0.01, 0.01, 1.0]) for i in range(4)] + [
        (i, [-0.01, 0.01, -1.0]) for i in range(4, 8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = similarity.spectral_top_share(df).collect()[0]
    assert r.dominant_dim == 2 and r.top_eigen_share > 0.99


def test_spectral_empty_corpus_returns_null_row(spark):
    # ADVICE r9: .first() on an empty frame returned None and raised
    # TypeError — degenerate corpora now yield the NULL-shaped row
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    r = similarity.spectral_top_share(df).collect()
    assert len(r) == 1
    assert r[0].n_rows == 0 and r[0].top_eigen_share is None


def test_spectral_explicit_dim_skips_probe(spark):
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = similarity.spectral_top_share(df, dim=3).collect()[0]
    assert r.dim == 3 and abs(r.top_eigen_share - 1.0) < 1e-9


def test_bitext_empty_corpus_returns_empty(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    docs = spark.createDataFrame([], "doc_id long, lang string")
    assert similarity.bitext_margin_mine(emb, docs).count() == 0


def test_shard_manifest_partitions_corpus(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["q_shard_manifest"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert len({r.shard_id for r in rows}) == len(rows) <= 16
    # fingerprint must react to content: all shards distinct here
    assert len({r.xor_fingerprint for r in rows}) == len(rows)


def test_dp_histogram_noise_bounded_and_seeded(spark):
    import __spark_entry__ as entry

    fn = entry.queries()["q_dp_histogram"]
    a = {r.lang: r.noised_count for r in fn(spark, "/root/testdata/sf0.001").collect()}
    b = {r.lang: r.noised_count for r in fn(spark, "/root/testdata/sf0.001").collect()}
    assert a == b  # seeded -> reproducible release
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    true = {r.lang: r.cnt for r in docs.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    for lang, noised in a.items():
        # Laplace(b=1) noise: |noise| < 40 with overwhelming margin
        assert abs(noised - true[lang]) < 40.0
