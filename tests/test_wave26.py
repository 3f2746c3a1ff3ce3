"""Wave-26 operators: centroid drift between embedding snapshots and
the kNN hubness census — planted-value tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import retrieval, similarity


def test_centroid_drift_identical_snapshots_cosine_one(spark):
    rows = [(i, [0.1 * (i % 3 + 1), 0.2], 1) for i in range(6)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.centroid_drift(df, df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_old == 6 and r.n_new == 6
    assert abs(r.centroid_cosine - 1.0) < 1e-12


def test_centroid_drift_orthogonal_is_zero(spark):
    old = spark.createDataFrame(
        [(0, [1.0, 0.0], 1)], "vec_id long, embedding array<float>, label int"
    )
    new = spark.createDataFrame(
        [(1, [0.0, 1.0], 1)], "vec_id long, embedding array<float>, label int"
    )
    r = similarity.centroid_drift(old, new).collect()[0]
    assert r.centroid_cosine == 0.0


def test_centroid_drift_known_angle(spark):
    # old centroid (1,0), new centroid (1,1)/1 -> cos = 1/sqrt(2)
    old = spark.createDataFrame(
        [(0, [1.0, 0.0], 1)], "vec_id long, embedding array<float>, label int"
    )
    new = spark.createDataFrame(
        [(1, [1.0, 1.0], 1)], "vec_id long, embedding array<float>, label int"
    )
    r = similarity.centroid_drift(old, new).collect()[0]
    import math

    assert abs(r.centroid_cosine - 1 / math.sqrt(2)) < 1e-12


def test_centroid_drift_labels_must_be_in_both(spark):
    old = spark.createDataFrame(
        [(0, [1.0, 0.0], 1), (1, [1.0, 0.0], 2)],
        "vec_id long, embedding array<float>, label int",
    )
    new = spark.createDataFrame(
        [(2, [1.0, 0.0], 1)], "vec_id long, embedding array<float>, label int"
    )
    out = similarity.centroid_drift(old, new).collect()
    assert {r.label for r in out} == {1}


def test_hubness_census_planted(spark):
    # node 9 cited 3x (hub), nodes 1,2 cited once each
    edges = spark.createDataFrame(
        [(0, 9), (1, 9), (2, 9), (3, 1), (4, 2)], "src_id long, nbr_id long"
    )
    out = {r.k_occurrence: r.n_nodes for r in retrieval.hubness_census(edges).collect()}
    assert out == {3: 1, 1: 2}
