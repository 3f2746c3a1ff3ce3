"""Hand-computed checks for the MRR@k / nDCG@k retrieval evaluators.

A planted 2-D corpus where cosine order is obvious by construction:
vectors lie on the unit circle at increasing angles from the query, so
ranks are exactly the angular order and first-relevant positions /
DCG sums can be worked out on paper."""

from __future__ import annotations

import math

import pytest

from fordgobike_data_pipeline_spark.operators import retrieval


def _vec(angle_deg: float) -> list[float]:
    a = math.radians(angle_deg)
    return [math.cos(a), math.sin(a)]


@pytest.fixture(scope="module")
def planted(spark):
    # query 0 at angle 0, label 7. Candidates at 10..60 degrees:
    # rank order by cosine = angular order 1..6.
    # labels: rank1=5, rank2=5, rank3=7 (first relevant), rank4=7,
    #         rank5=5, rank6=5  -> first_rel_rank=3, R(corpus)=2
    rows = [(0, _vec(0), 7)]
    labels = [5, 5, 7, 7, 5, 5]
    for i, lbl in enumerate(labels, start=1):
        rows.append((i, _vec(10 * i), lbl))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def test_mrr_first_relevant_at_rank_3(planted):
    out = retrieval.mrr_at_k(
        planted, planted.filter("vec_id = 0"), k=6
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["first_rel_rank"] == 3
    assert r["rr_int"] == 2520 // 3
    assert r["rr"] == pytest.approx(1 / 3, abs=1e-12)


def test_mrr_zero_when_no_relevant_in_topk(planted):
    # k=2: only the two label-5 candidates fit -> no relevant hit
    r = retrieval.mrr_at_k(planted, planted.filter("vec_id = 0"), k=2).collect()[0]
    assert r["first_rel_rank"] == 0 and r["rr_int"] == 0 and r["rr"] == 0.0


def test_ndcg_matches_hand_computation(planted):
    # relevant at ranks 3 and 4; R = 2 (two label-7 candidates), so
    # DCG = w3 + w4 and IDCG = w1 + w2 with w_i = round(1e9/log2(i+1))
    w = retrieval._ndcg_discount_ints(6)
    r = retrieval.ndcg_at_k(planted, planted.filter("vec_id = 0"), k=6).collect()[0]
    assert r["n_rel_in_corpus"] == 2
    assert r["dcg_int"] == w[2] + w[3]
    assert r["idcg_int"] == w[0] + w[1]
    assert r["ndcg"] == pytest.approx((w[2] + w[3]) / (w[0] + w[1]), abs=1e-12)


def test_ndcg_perfect_ranking_is_one(spark):
    # all candidates share the query's label -> every hit relevant,
    # DCG == IDCG regardless of order
    rows = [(i, _vec(10 * i), 1) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    r = retrieval.ndcg_at_k(df, df.filter("vec_id = 0"), k=4).collect()[0]
    assert r["dcg_int"] == r["idcg_int"] > 0
    assert r["ndcg"] == 1.0


def test_ndcg_zero_when_label_unique(spark):
    # the query's label appears nowhere else -> IDCG 0, ndcg defined 0
    rows = [(0, _vec(0), 99)] + [(i, _vec(10 * i), 1) for i in range(1, 4)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    r = retrieval.ndcg_at_k(df, df.filter("vec_id = 0"), k=3).collect()[0]
    assert r["n_rel_in_corpus"] == 0
    assert r["idcg_int"] == 0 and r["ndcg"] == 0.0


def test_discount_table_is_monotone_exact():
    w = retrieval._ndcg_discount_ints(10)
    assert w[0] == 10**9  # 1/log2(2) == 1
    assert all(a > b for a, b in zip(w, w[1:]))
    assert w[2] == 5 * 10**8  # 1/log2(4) == 0.5 exactly


def test_hard_negatives_planted(planted):
    # query 0 (label 7): ranks 1,2 are label-5 (negatives), 3,4 are
    # label-7 (positives), 5,6 label-5. n_neg=3 within k_scan=6 ->
    # negatives at original ranks 1,2,5 => cand_ids 1,2,5 in order.
    from fordgobike_data_pipeline_spark.operators import retrieval

    out = retrieval.hard_negatives(
        planted, planted.filter("vec_id = 0"), k_scan=6, n_neg=3
    ).collect()
    assert [(r["neg_rank"], r["cand_id"], r["neg_label"]) for r in out] == [
        (1, 1, 5),
        (2, 2, 5),
        (3, 5, 5),
    ]
    sims = [r["sim"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_hard_negatives_empty_when_all_same_label(spark):
    rows = [(i, _vec(10 * i), 1) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    from fordgobike_data_pipeline_spark.operators import retrieval

    assert retrieval.hard_negatives(df, df.filter("vec_id = 0"), 3, 2).count() == 0


def test_mrr_k_above_10_uses_exact_lcm(spark):
    # 12 candidates: the only relevant one ranks 11th. With the old
    # fixed 2520 scale, 2520//11 = 229 would make rr != 1/11; the
    # dynamic LCM(1..12) = 27720 keeps the exact-integer invariant.
    import math as _m

    rows = [(0, _vec(0), 7)]
    for i in range(1, 13):
        rows.append((i, _vec(5 * i), 7 if i == 11 else 5))
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    r = retrieval.mrr_at_k(corpus, corpus.filter("vec_id = 0"), k=12).collect()[0]
    assert r.first_rel_rank == 11
    assert r.rr_int == 27720 // 11 == 2520
    assert r.rr == (27720 // 11) / 27720.0


def test_mrr_query_with_no_candidates_yields_zero_row(spark):
    # corpus = only the query itself -> zero candidates after
    # self-exclusion; the query must still appear with rr = 0
    corpus = spark.createDataFrame(
        [(0, _vec(0), 7)], "vec_id bigint, embedding array<float>, label int"
    )
    out = retrieval.mrr_at_k(corpus, corpus, k=5).collect()
    assert len(out) == 1
    assert out[0].first_rel_rank == 0 and out[0].rr == 0.0
    nd = retrieval.ndcg_at_k(corpus, corpus, k=5).collect()
    assert len(nd) == 1
    assert nd[0].dcg_int == 0 and nd[0].ndcg == 0.0 and nd[0].n_rel_in_corpus == 0
