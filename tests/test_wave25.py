"""Wave-25 operators: ROUGE-N pair overlap, source-overlap matrix,
filter-bias report — planted-value tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import quality, text


def test_rouge_n_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # bigrams: ab bc cd
            (2, "a b c e"),      # bigrams: ab bc ce
            (3, "x y"),          # bigram: xy (disjoint from 4)
            (4, "p q"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "ref_id long, cand_id long")
    out = {(r.ref_id, r.cand_id): r for r in text.rouge_n(pairs, docs, n=2).collect()}
    r = out[(1, 2)]
    assert r.n_ref == 3 and r.n_cand == 3 and r.n_overlap == 2
    assert r.rouge_recall == 2 / 3 and r.rouge_precision == 2 / 3
    assert r.rouge_f1 == 4 / 6
    r = out[(3, 4)]
    assert r.n_overlap == 0 and r.rouge_f1 == 0.0


def test_rouge_n_clips_repeats(spark):
    # ref has 'a a' x3, cand has it once -> clipped overlap 1, not 3
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a a b c")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "ref_id long, cand_id long")
    r = text.rouge_n(pairs, docs, n=2).collect()[0]
    assert r.n_ref == 3 and r.n_overlap == 1


def test_source_overlap_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "sA", "a b c d"),   # grams: abc bcd
            (2, "sB", "a b c e"),   # grams: abc bce
            (3, "sC", "x y z w"),   # grams: xyz yzw (disjoint)
        ],
        "doc_id long, source string, text string",
    )
    out = {(r.source_a, r.source_b): r for r in text.source_overlap(docs, 3).collect()}
    r = out[("sA", "sB")]
    assert r.n_a == 2 and r.n_b == 2 and r.n_common == 1
    assert r.jaccard == 1 / 3
    # disjoint pairs are absent (no common gram to join on)
    assert ("sA", "sC") not in out and ("sB", "sC") not in out


def test_filter_bias_report_hand_computed(spark):
    rows = (
        [("web", True)] * 8 + [("web", False)] * 2      # keep_rate .8
        + [("spam", True)] * 1 + [("spam", False)] * 9  # keep_rate .1
    )
    df = spark.createDataFrame(rows, "source string, keep boolean")
    out = {r.source: r for r in quality.filter_bias_report(df, "keep", "source").collect()}
    assert out["web"].n_rows == 10 and out["web"].n_kept == 8
    assert out["web"].keep_rate == 0.8 and out["spam"].keep_rate == 0.1
    # global keep rate = 9/20 = .45; ratios = (kept*20)/(10*9)
    assert out["web"].rate_ratio == (8 * 20) / (10 * 9)
    assert out["spam"].rate_ratio == (1 * 20) / (10 * 9)
