"""Wave-41 operators: stopword profile, Dirichlet query likelihood,
contamination-rate audit, truncation loss, PQ recall@k, and the set-op
/ unpivot surface — planted-value tests pinning hand-computed answers."""

from __future__ import annotations

import math

from fordgobike_data_pipeline_spark.operators import curation, retrieval, similarity, text


def test_stopword_profile_planted(spark):
    docs = spark.createDataFrame(
        [
            # s1 doc1: 4 words, 2 stop tokens ("the" x2), 1 distinct -> low-stop
            (1, "the cat the mat", "s1"),
            # s1 doc2: 4 words, 2 distinct stopwords -> passes the >=2 gate
            (2, "the dog and cat", "s1"),
            # s2: zero-token doc is EXCLUDED (ratio undefined)
            (3, "   ", "s2"),
            # s2: no stopwords at all
            (4, "zz yy", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in text.stopword_profile(docs).collect()}
    assert out["s1"].n_docs == 2
    # ratios 0.5 and 0.5 -> mean 0.5
    assert out["s1"].avg_stop_ratio == 0.5
    assert out["s1"].avg_distinct_stop == 1.5
    assert out["s1"].n_low_stop == 1  # doc1 has only 1 distinct stopword
    assert out["s2"].n_docs == 1  # the whitespace doc dropped
    assert out["s2"].avg_stop_ratio == 0.0 and out["s2"].n_low_stop == 1


def test_query_likelihood_planted(spark):
    # corpus: d1 = "cat mat", d2 = "cat cat dog"; terms = (cat, dog)
    # N = 5, cf(cat)=3, cf(dog)=1, mu=1
    docs = spark.createDataFrame(
        [(1, "cat mat"), (2, "cat cat dog")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in text.query_likelihood_scores(docs, ["cat", "dog"], mu=1.0).collect()
    }
    # d1: ln((1 + 1*3/5)/(2+1)) + ln((0 + 1*1/5)/(2+1))
    want1 = math.log((1 + 3 / 5) / 3.0) + math.log((1 / 5) / 3.0)
    # d2: ln((2 + 3/5)/4) + ln((1 + 1/5)/4)
    want2 = math.log((2 + 3 / 5) / 4.0) + math.log((1 + 1 / 5) / 4.0)
    assert out[1].n_hits == 1 and abs(out[1].ql_score - want1) < 1e-6
    assert out[2].n_hits == 2 and abs(out[2].ql_score - want2) < 1e-6


def test_query_likelihood_smoothing_monotone(spark):
    # zero-count terms must still contribute background mass: a doc
    # matching ONE term scores lower than its twin matching both,
    # and raising mu pulls the two scores together
    docs = spark.createDataFrame(
        [(1, "cat x"), (2, "cat dog")], "doc_id long, text string"
    )
    lo = {
        r.doc_id: r.ql_score
        for r in text.query_likelihood_scores(docs, ["cat", "dog"], mu=1.0).collect()
    }
    hi = {
        r.doc_id: r.ql_score
        for r in text.query_likelihood_scores(docs, ["cat", "dog"], mu=1000.0).collect()
    }
    assert lo[1] < lo[2]
    assert (hi[2] - hi[1]) < (lo[2] - lo[1])


def test_contamination_overlap_planted(spark):
    # bench doc 10 = exact copy of train doc 1 -> overlap 1.0
    # bench doc 11 shares no 2-gram with training -> 0.0
    train = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(10, "a b c d"), (11, "x y z")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in curation.contamination_overlap(train, bench, n=2).collect()
    }
    assert out[10].n_grams == 3 and out[10].n_hit == 3 and out[10].overlap_frac == 1.0
    assert out[11].n_grams == 2 and out[11].n_hit == 0 and out[11].overlap_frac == 0.0


def test_contamination_overlap_partial(spark):
    # bench doc shares exactly 1 of its 3 distinct 2-grams
    train = spark.createDataFrame([(1, "a b zz")], "doc_id long, text string")
    bench = spark.createDataFrame([(10, "a b c d")], "doc_id long, text string")
    r = curation.contamination_overlap(train, bench, n=2).collect()[0]
    assert r.n_grams == 3 and r.n_hit == 1
    assert abs(r.overlap_frac - 1 / 3) < 1e-6


def test_truncation_loss_planted(spark):
    # token counts 2, 4, 6 (split-on-space length convention)
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d"), (3, "a b c d e f")],
        "doc_id long, text string",
    )
    out = {r.max_len: r for r in curation.truncation_loss(docs, (3, 6)).collect()}
    assert out[3].n_docs_truncated == 2  # the 4- and 6-token docs
    assert out[3].lost_tokens == 1 + 3 and out[3].total_tokens == 12
    assert abs(out[3].loss_frac - 4 / 12) < 1e-6
    assert out[6].n_docs_truncated == 0 and out[6].lost_tokens == 0
    assert out[6].loss_frac == 0.0


def test_pq_recall_identity(spark):
    # k=1-subspace PQ over 1-d vectors with every vector its own code
    # word reproduces the exact ranking -> recall 1.0 for every query
    emb = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    cb = similarity.pq_codebooks(emb, dim=4, n_subspaces=1, seed_mod=1, n_iter=0)
    codes = similarity.pq_encode(
        emb, cb, dim=4, n_subspaces=1, exact_assign=True
    ).select("vec_id", "subspace", "code_id")
    queries = emb.filter("vec_id < 2")
    adc = similarity.pq_adc_topk(codes, queries, cb, k=3, dim=4, n_subspaces=1)
    exact = retrieval.l2_topk(emb, queries, k=3)
    out = similarity.ann_recall_at_k(exact, adc, k=3).collect()
    assert len(out) == 2
    for r in out:
        assert r.n_hits == 3 and r.recall_at_k == 1.0


def test_set_ops_and_unpivot_semantics(spark):
    # the q_set_ops / q_unpivot building blocks on planted frames:
    # distinct set semantics and the melt row layout
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(2,), (4,)], "k long")
    assert sorted(r.k for r in a.intersect(b).collect()) == [2]
    assert sorted(r.k for r in a.subtract(b).collect()) == [1, 3]
    wide = spark.createDataFrame(
        [("x", 1.0, 2.0)], "g string, m1 double, m2 double"
    )
    long = wide.unpivot(["g"], ["m1", "m2"], "measure", "value").collect()
    assert {(r.g, r.measure, r.value) for r in long} == {
        ("x", "m1", 1.0),
        ("x", "m2", 2.0),
    }
