"""Wave-35: margin-scored bitext mining — planted-value tests."""

from __future__ import annotations

from fordgobike_data_pipeline_spark.operators import similarity


def _df(spark, rows):
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        None,
    )


def test_bitext_margin_accepts_clear_pair(spark):
    # src 0 (de) is nearly identical to tgt 10 (en); tgt 11/12 are
    # orthogonal-ish noise -> margin well above threshold
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.02, 0.0]),
            (10, [1.0, 0.0, 0.0]),
            (11, [0.6, 0.75, 0.0]),
            (12, [0.6, 0.0, 0.75]),
        ],
        "vec_id long, embedding array<float>",
    )
    docs = spark.createDataFrame(
        [(0, "de"), (10, "en"), (11, "en"), (12, "en")], "doc_id long, lang string"
    )
    rows = similarity.bitext_margin_mine(
        emb, docs, k=3, n_planes=2, margin_threshold=1.02
    ).collect()
    got = {r.src_id: r for r in rows}
    if 0 in got:  # bucket recall permitting, the pair is (0 -> 10)
        assert got[0].tgt_id == 10 and got[0].margin >= 1.02


def test_bitext_harness_nontrivial_and_thresholded(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["q_bitext_mining"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    src_ids = [r.src_id for r in rows]
    assert len(src_ids) == len(set(src_ids))  # one best pair per source doc
    for r in rows:
        assert r.margin >= 1.02 and -1.0 <= r.sim <= 1.0


def test_sample_bias_chi2_consistency(spark):
    import __spark_entry__ as entry

    r = entry.queries()["q_sample_bias"](spark, "/root/testdata/sf0.001").collect()[0]
    # a hash-uniform 20% sample of an unskewed corpus: chi2 should be
    # small relative to a wildly biased one; invariants always hold
    assert 0 < r.n_sample < r.n_corpus
    assert r.dof == r.n_cells - 1 >= 1
    assert r.chi2 >= 0.0


def test_index_purge_report_planted(spark):
    from pyspark.sql import functions as F

    from fordgobike_data_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # exact dup of 1
            (3, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    band_index = dedup.minhash_band_index(docs, hash_fn="md5-parity")
    fp_index = dedup.fingerprint_index(docs)
    # delete doc 3 entirely: its (unshared) buckets must all empty
    deleted = docs.filter(F.col("doc_id") == 3).select("doc_id")
    rep = {r.band: r for r in dedup.index_purge_report(
        band_index, fp_index, deleted).collect()}
    for band, r in rep.items():
        if band == -1:
            # fp index: 2 distinct contents, doc 3's entry tombstoned
            assert r.n_buckets == 2 and r.n_rows_purged == 1
        else:
            # docs 1/2 share every bucket; doc 3 is alone in its own
            assert r.n_rows_purged == 1 and r.n_buckets_emptied == 1
