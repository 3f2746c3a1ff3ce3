"""Wave-30 audit operators: Cohen's kappa, modality pairing
integrity, epoch-order overlap — planted-value tests."""

from __future__ import annotations

from fordgobike_data_pipeline_spark.operators import quality


def test_cohen_kappa_perfect_agreement(spark):
    df = spark.createDataFrame([(1, 1), (0, 0), (1, 1), (0, 0)], "a int, b int")
    r = quality.cohen_kappa(df, "a", "b").collect()[0]
    assert (r.n, r.n_both_pass, r.n_both_fail, r.n_only_a, r.n_only_b) == (4, 2, 2, 0, 0)
    assert r.kappa == 1.0


def test_cohen_kappa_known_value(spark):
    # classic 2x2: n00=20 n01=5 n10=10 n11=15 -> po=0.7,
    # pe = (25*30 + 25*20)/2500 = 0.5 -> kappa = 0.4
    rows = [(1, 1)] * 15 + [(1, 0)] * 10 + [(0, 1)] * 5 + [(0, 0)] * 20
    df = spark.createDataFrame(rows, "a int, b int")
    r = quality.cohen_kappa(df, "a", "b").collect()[0]
    assert abs(r.kappa - 0.4) < 1e-12


def test_cohen_kappa_degenerate_raters_null(spark):
    df = spark.createDataFrame([(1, 1), (1, 1)], "a int, b int")
    r = quality.cohen_kappa(df, "a", "b").collect()[0]
    assert r.kappa is None  # 1 - pe = 0


def test_modality_integrity_harness(spark):
    import __spark_entry__ as entry

    r = entry.queries()["q_modality_integrity"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert r.n_paired + r.n_missing_embedding == docs
    assert r.n_paired + r.n_orphan_vector == emb


def test_epoch_order_overlap_near_zero(spark):
    import __spark_entry__ as entry

    r = entry.queries()["q_epoch_order_overlap"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    # independent per-epoch permutations: overlap ~ 1/n per slot
    assert r.n_docs > 0 and r.overlap_rate < 0.2
