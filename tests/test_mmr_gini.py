"""Wave-7 operator semantics: Gini endpoints, A-priori triple pruning,
funnel latency, and MMR's diversity-over-relevance pick."""

from __future__ import annotations

import datetime as dt

from fordgobike_data_pipeline_spark.operators import analytics, similarity


def test_gini_endpoints(spark):
    equal = spark.createDataFrame([(i, 100) for i in range(4)], "id LONG, v LONG")
    assert analytics.gini_coefficient(equal, "v", "id").collect()[0].gini == 0.0
    # all value on one entity of four: G = (2*4 - 5)/4 = 0.75
    concentrated = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1000)], "id LONG, v LONG"
    )
    assert analytics.gini_coefficient(concentrated, "v", "id").collect()[0].gini == 0.75


def test_frequent_triples_apriori(spark):
    # {a,b,c} x2 -> triple support 2 with all pairs frequent;
    # {d,e,f} appears once -> its pairs fail the floor, triple pruned
    rows = []
    for bk, its in [(1, "abc"), (2, "abc"), (3, "abd"), (4, "def")]:
        rows += [(bk, it) for it in its]
    df = spark.createDataFrame(rows, "bk LONG, it STRING")
    out = [
        (r.a, r.b, r.c, r.support)
        for r in analytics.frequent_triples(
            df, "bk", "it", min_pair_count=2, min_triple_count=2, k=10
        ).collect()
    ]
    assert out == [("a", "b", "c", 2)]


def test_funnel_latency_quartiles(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users 1..4: view at t0, purchase 10/20/30/40s later; user 5 never purchases
    for u, lat in [(1, 10), (2, 20), (3, 30), (4, 40)]:
        rows.append((eid, t0, u, "view", 0.0)); eid += 1
        rows.append((eid, t0 + dt.timedelta(seconds=lat), u, "purchase", 1.0)); eid += 1
    rows.append((eid, t0, 5, "view", 0.0))
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    )
    r = analytics.funnel_latency(ev, "view", "purchase").collect()[0]
    assert r.n_converted == 4
    assert (r.p25_s, r.p50_s, r.p75_s) == (17.5, 25.0, 32.5)


def test_mmr_prefers_diversity_over_rank(spark):
    # query q on the x axis; a1, a2, b all equally relevant
    # (same x component after normalization), but a2 duplicates a1
    # while b is orthogonal to it. MMR must pick a1 (id tiebreak on
    # the relevance tie) then b: 0.7·rel − 0.3·1 loses to
    # 0.7·rel − 0.3·0 by a wide margin.
    def vec(x, y, z):
        return [float(x), float(y), float(z)] + [0.0] * 61

    emb = spark.createDataFrame(
        [
            (0, vec(1, 0, 0)),       # query
            (1, vec(1, 1, 0)),       # a1
            (2, vec(1, 1, 0.001)),   # a2: near-dup of a1
            (3, vec(1, -1, 0)),      # b: equally relevant, orthogonal to a1
        ],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = [
        (r.rank, r.cand_id)
        for r in similarity.mmr_rerank(
            emb, query_id=0, n_candidates=3, k=2, lam_tenths=7
        ).collect()
    ]
    assert out == [(1, 1), (2, 3)]  # pure relevance would pick (1, 2)
