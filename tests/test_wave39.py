"""Wave-39 operators: n-gram entropy rate, JM smoothing sweep,
dup-source matrix, near-dup transitivity, bloom design audit, one-way
ANOVA — planted-value tests pinning hand-computed answers."""

from __future__ import annotations

import math

from fordgobike_data_pipeline_spark.operators import (
    analytics,
    dedup,
    sketches,
    text,
)


def test_entropy_rate_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a", "s1"),        # H1 = 0, H2|1 = 0
            (2, "a b a b a", "s2"),      # H1 > 0, deterministic transitions
            (3, "x", "s3"),              # no bigrams
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in text.ngram_entropy_rate(docs).collect()}
    assert out["s1"].n_tokens == 4 and out["s1"].h_unigram == 0.0
    assert out["s1"].h_bigram_cond == 0.0
    assert out["s1"].redundancy is None  # H1 = 0 -> undefined
    h1 = -(3 / 5) * math.log2(3 / 5) - (2 / 5) * math.log2(2 / 5)
    assert abs(out["s2"].h_unigram - h1) < 1e-9
    # a->b and b->a are the only transitions: conditional entropy 0
    assert out["s2"].h_bigram_cond == 0.0 and out["s2"].redundancy == 1.0
    assert out["s3"].n_bigrams == 0 and out["s3"].h_bigram_cond is None


def test_jm_sweep_planted(spark):
    # train "a b": P_bi(b|a)=1; P_uni+(b) = (1+1)/(2+2+1) = 0.4.
    # test "a b": CE(lam) = -log2(lam + (1-lam)*0.4), decreasing in lam.
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b")], "doc_id long, text string"
    )
    out = {r.lam: r for r in text.jm_smoothing_sweep(docs).collect()}
    assert all(r.n_test_bigrams == 1 for r in out.values())
    assert abs(out[0.2].cross_entropy_bits - (-math.log2(0.2 + 0.8 * 0.4))) < 1e-8
    assert out[0.8].cross_entropy_bits < out[0.2].cross_entropy_bits


def test_dup_source_matrix_planted(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.85)], "id_a long, id_b long, jaccard double"
    )
    docs = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "A")], "doc_id long, source string"
    )
    out = {(r.src_a, r.src_b): r for r in dedup.dup_source_matrix(pairs, docs).collect()}
    assert out[("A", "B")].n_pairs == 1 and out[("A", "B")].mean_jaccard == 0.9
    assert out[("A", "A")].n_pairs == 1 and out[("A", "A")].mean_jaccard == 0.85


def test_transitivity_open_and_closed(spark):
    open_g = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.9)], "id_a long, id_b long, jaccard double"
    )
    r = dedup.near_dup_transitivity(open_g).collect()[0]
    assert r.n_edges == 2 and r.n_wedges == 1 and r.n_closed == 0
    assert r.transitivity == 0.0
    closed_g = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.9), (2, 3, 0.9)],
        "id_a long, id_b long, jaccard double",
    )
    r = dedup.near_dup_transitivity(closed_g).collect()[0]
    assert r.n_wedges == 3 and r.n_closed == 3 and r.transitivity == 1.0


def test_entropy_rate_ignores_empty_tokens(spark):
    # repeated/leading/trailing spaces must not contribute '' states:
    # "a  a  a" (double spaces) tokenizes to [a,'',a,'',a] — 3 real
    # tokens, but every raw bigram touches '' so none survive, while
    # the single-spaced twin keeps its 2 transitions (ADVICE r11)
    docs = spark.createDataFrame(
        [(1, "a  a  a", "gap"), (2, "a a a", "tight"), (3, " b b ", "pad")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in text.ngram_entropy_rate(docs).collect()}
    assert out["gap"].n_tokens == 3 and out["gap"].n_bigrams == 0
    assert out["tight"].n_tokens == 3 and out["tight"].n_bigrams == 2
    assert out["pad"].n_tokens == 2 and out["pad"].n_bigrams == 1
    assert out["pad"].h_bigram_cond == 0.0


def test_jm_sweep_ignores_empty_tokens(spark):
    # test doc "a b  c": raw bigrams (a,b), (b,''), ('',c) — only the
    # all-non-empty (a,b) is scored, so the sweep equals the clean twin
    gapped = spark.createDataFrame(
        [(0, "a b"), (1, "a b  c")], "doc_id long, text string"
    )
    clean = spark.createDataFrame(
        [(0, "a b"), (1, "a b")], "doc_id long, text string"
    )
    got = {r.lam: r for r in text.jm_smoothing_sweep(gapped).collect()}
    want = {r.lam: r for r in text.jm_smoothing_sweep(clean).collect()}
    assert set(got) == set(want)
    for lam in want:
        assert got[lam].n_test_bigrams == want[lam].n_test_bigrams == 1
        assert got[lam].cross_entropy_bits == want[lam].cross_entropy_bits


def test_transitivity_canonicalizes_input(spark):
    # reversed, duplicated-both-directions, and self-loop rows must
    # yield the same audit as the canonical (id_a < id_b) pair table
    canonical = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.9), (2, 3, 0.9)],
        "id_a long, id_b long, jaccard double",
    )
    messy = spark.createDataFrame(
        [
            (2, 1, 0.9),            # reversed
            (1, 2, 0.9),            # and its mirror
            (3, 1, 0.9),            # reversed
            (2, 3, 0.9),
            (3, 2, 0.9),            # mirror of the above
            (2, 2, 1.0),            # self-loop: dropped
        ],
        "id_a long, id_b long, jaccard double",
    )
    want = dedup.near_dup_transitivity(canonical).collect()[0]
    got = dedup.near_dup_transitivity(messy).collect()[0]
    assert (got.n_edges, got.n_wedges, got.n_closed) == (
        want.n_edges,
        want.n_wedges,
        want.n_closed,
    ) == (3, 3, 3)
    assert got.transitivity == want.transitivity == 1.0


def test_transitivity_no_wedges(spark):
    g = spark.createDataFrame([(1, 2, 0.9)], "id_a long, id_b long, jaccard double")
    r = dedup.near_dup_transitivity(g).collect()[0]
    assert r.n_wedges == 0 and r.transitivity is None


def test_bloom_design_members_always_hit(spark):
    # probing the INSERTED keys themselves: every position hits, so the
    # "false-positive" count equals n_probes at every budget (no false
    # negatives is the Bloom guarantee)
    keys = spark.createDataFrame([(i,) for i in range(50)], "k long")
    out = sketches.bloom_filter_design(keys, keys, "k", "k").collect()
    assert all(r.n_false_pos == r.n_probes == 50 for r in out)


def test_bloom_design_fpp_shrinks_with_budget(spark):
    keys = spark.createDataFrame([(i,) for i in range(200)], "k long")
    probes = spark.createDataFrame([(i + 10_000,) for i in range(200)], "p long")
    out = {
        r.bits_per_key: r
        for r in sketches.bloom_filter_design(keys, probes, "k", "p").collect()
    }
    assert out[4].m_bits == 800 and out[4].k_hashes == 3
    assert 0.0 <= out[16].fpp_measured <= out[4].fpp_measured <= 1.0
    for r in out.values():
        assert 0.0 <= r.fpp_predicted <= 1.0


def test_anova_planted(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6)],
        "g string, v long",
    )
    r = analytics.one_way_anova(df, "g", "v").collect()[0]
    assert r.n_groups == 2 and r.n_rows == 6
    assert abs(r.ss_between - 13.5) < 1e-6
    assert abs(r.ss_within - 4.0) < 1e-6
    assert abs(r.f_stat - 13.5) < 1e-6
    assert abs(r.eta_sq - 13.5 / 17.5) < 1e-9


def test_anova_degenerate(spark):
    one = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
    r = analytics.one_way_anova(one, "g", "v").collect()[0]
    assert r.f_stat is None  # n_groups = 1
    flat = spark.createDataFrame(
        [("a", 2), ("a", 2), ("b", 4), ("b", 4)], "g string, v long"
    )
    r = analytics.one_way_anova(flat, "g", "v").collect()[0]
    assert r.f_stat is None and r.eta_sq == 1.0  # SSW = 0


def test_sentence_stats_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hi there. Bye!", "s1"),   # 2 sentences, 3 words
            (2, "word", "s1"),             # min-1 sentence, 1 word
            (3, " ".join(["w"] * 40), "s2"),  # no punctuation: run-on
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in text.sentence_stats(docs).collect()}
    assert out["s1"].n_docs == 2 and out["s1"].n_sentences == 3
    assert out["s1"].n_words == 4 and out["s1"].runon_share == 0.0
    assert out["s1"].sents_per_doc == 1.5
    assert out["s2"].n_sentences == 1 and out["s2"].runon_share == 1.0


def test_idf_drift_planted(spark):
    import math

    # "x" lives only in the even half (df 3 vs 0); "y" is everywhere
    rows = [(i, ("x y" if i % 2 == 0 else "y")) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.idf_drift(docs, top_k=5, min_df=3).collect()
    assert out[0].term == "x"
    assert abs(out[0].idf_drift - round(math.log(4.0), 6)) < 1e-9
    ys = [r for r in out if r.term == "y"]
    assert ys and ys[0].idf_drift == 0.0


def test_dedup_bias_planted(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.9)], "id_a long, id_b long, jaccard double"
    )
    docs = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "B")], "doc_id long, source string"
    )
    out = {r.source: r for r in dedup.dedup_source_bias(pairs, docs).collect()}
    assert out["A"].n_before == 1 and out["A"].n_after == 1
    assert out["B"].n_before == 2 and out["B"].n_after == 1
    assert abs(out["A"].delta_share - (0.5 - 1 / 3)) < 1e-8
    assert abs(out["B"].delta_share - (0.5 - 2 / 3)) < 1e-8


def test_dedup_bias_source_fully_dropped(spark):
    # every doc of source C is a dropped duplicate: share_after 0
    pairs = spark.createDataFrame(
        [(1, 4, 0.9)], "id_a long, id_b long, jaccard double"
    )
    docs = spark.createDataFrame(
        [(1, "A"), (4, "C")], "doc_id long, source string"
    )
    out = {r.source: r for r in dedup.dedup_source_bias(pairs, docs).collect()}
    assert out["C"].n_after == 0 and out["C"].share_after == 0.0
    assert out["A"].share_after == 1.0
