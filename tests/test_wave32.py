"""Wave-32 operators: IVF list balance, template-flood detection,
parquet schema evolution — planted-value tests."""

from __future__ import annotations

from fordgobike_data_pipeline_spark.operators import similarity


def test_ivf_balance_counts_and_empties(spark):
    # 2 centroids (ids 0, 25 via mod 25): +e1 cluster and -e1 cluster;
    # id 50 is a third centroid identical to +e1 -> ties break to the
    # LOWEST centroid id, so list 50 stays EMPTY (size 0).
    rows = (
        [(0, [1.0, 0.0]), (25, [-1.0, 0.0]), (50, [1.0, 0.0])]
        + [(i, [1.0, 0.1]) for i in range(1, 5)]
        + [(i, [-1.0, -0.1]) for i in range(26, 31)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    hist = {r.list_size: r.n_lists for r in similarity.ivf_list_balance(df).collect()}
    # list 0: centroid 0 itself + id 50 + 4 positives = 6; list 25: itself + 5 = 6
    assert hist == {6: 2, 0: 1}


def test_template_prefix_planted(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["q_template_prefix"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows  # the synthetic corpus contains template families
    for r in rows:
        assert r.n_docs >= 3 and r.n_variants >= 2 and len(r.prefix) <= 40


def test_schema_evolution_merge(spark):
    import __spark_entry__ as entry

    r = entry.queries()["q_schema_evolution"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    n_odd = docs.filter("doc_id % 2 = 1").count()
    assert r.n_rows == n
    assert r.n_source_nonnull == n_odd == r.n_chars_nonnull
    assert r.n_chars_sum > 0
