"""Wave-31 audit operators: MCC, embedding anisotropy, JSD drift,
Wilson CI, t-closeness, source diversity — planted-value tests."""

from __future__ import annotations

import math

from fordgobike_data_pipeline_spark.operators import quality, similarity


def test_mcc_perfect_and_inverse(spark):
    df = spark.createDataFrame([(1, 1), (0, 0), (1, 1), (0, 0)], "a int, b int")
    assert quality.matthews_corr(df, "a", "b").collect()[0].mcc == 1.0
    inv = spark.createDataFrame([(1, 0), (0, 1), (1, 0), (0, 1)], "a int, b int")
    assert quality.matthews_corr(inv, "a", "b").collect()[0].mcc == -1.0


def test_mcc_known_value(spark):
    # TP=6 TN=3 FP=1 FN=2 -> mcc = (18-2)/sqrt(7*8*4*5) = 16/sqrt(1120)
    rows = [(1, 1)] * 6 + [(0, 0)] * 3 + [(1, 0)] * 1 + [(0, 1)] * 2
    df = spark.createDataFrame(rows, "a int, b int")
    r = quality.matthews_corr(df, "a", "b").collect()[0]
    assert (r.n_tp, r.n_tn, r.n_fp, r.n_fn) == (6, 3, 1, 2)
    assert abs(r.mcc - 16.0 / math.sqrt(1120.0)) < 1e-12


def test_mcc_constant_rater_null(spark):
    df = spark.createDataFrame([(1, 1), (1, 0)], "a int, b int")
    assert quality.matthews_corr(df, "a", "b").collect()[0].mcc is None


def test_anisotropy_identical_vectors_is_one(spark):
    # every vector identical -> ||mean||^2 == mean(||x||^2) -> ratio 1
    rows = [(i, [0.5, -0.25, 0.125], 0) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in similarity.anisotropy(df).collect()}
    assert abs(out[0].anisotropy - 1.0) < 1e-12
    assert abs(out[None].anisotropy - 1.0) < 1e-12 and out[None].n == 4


def test_anisotropy_symmetric_pair_is_zero(spark):
    # x and -x -> mean vector is 0 -> ratio 0
    rows = [(0, [0.5, 0.5], 0), (1, [-0.5, -0.5], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in similarity.anisotropy(df).collect()}
    assert out[0].anisotropy == 0.0 and out[None].anisotropy == 0.0


def test_anisotropy_two_labels_global_mix(spark):
    # label 0: all +e1; label 1: all -e1 -> per-label 1.0, global 0.0
    rows = [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0), (2, [-1.0, 0.0], 1), (3, [-1.0, 0.0], 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in similarity.anisotropy(df).collect()}
    assert abs(out[0].anisotropy - 1.0) < 1e-12
    assert abs(out[1].anisotropy - 1.0) < 1e-12
    assert out[None].anisotropy == 0.0


def test_jsd_identical_sources_zero_and_bounded(spark):
    import __spark_entry__ as entry

    r = entry.queries()["q_jsd_drift"](spark, "/root/testdata/sf0.001").collect()[0]
    assert 0.0 <= r.jsd_bits <= 1.0 and r.vocab > 0


def test_wilson_ci_brackets_rate(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["q_wilson_ci"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        p = r.n_pass / r.n_docs
        assert 0.0 <= r.ci_lo <= p <= r.ci_hi <= 1.0


def test_t_closeness_groups_exceed_threshold(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["q_t_closeness"](spark, "/root/testdata/sf0.001").collect()
    assert rows  # small bands genuinely fail t=0.15
    for r in rows:
        assert r.t_value > 0.15 and 0.0 < r.t_value <= 1.0


def test_source_diversity_invariants(spark):
    import __spark_entry__ as entry

    r = entry.queries()["q_source_diversity"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    # effective count within [1, n_cells]; simpson >= 1/n_cells; entropy
    # consistent with the effective count
    assert 1.0 <= r.effective_cells <= r.n_cells
    assert r.simpson >= 1.0 / r.n_cells - 1e-12
    assert abs(r.effective_cells - 2.0 ** r.shannon_bits) < 1e-4
