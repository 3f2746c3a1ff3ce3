"""Wave-23 operators: n-gram novelty vs a reference corpus, vocab
coverage curve, n-gram loopiness, in-batch negative collisions —
planted-value tests pinning hand-computed answers."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import retrieval, text


def test_ngram_novelty_planted(spark):
    ref = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # every 3-gram in ref -> novelty 0
            (2, "a b c x y z"),      # 1 of 4 grams in ref -> novelty 3/4
            (3, "p q r s"),          # nothing shared -> novelty 1
            (4, "a b"),              # too short -> drops out
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.ngram_novelty(docs, ref, n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_grams == 3 and out[1].n_novel == 0 and out[1].novelty == 0.0
    assert out[2].n_grams == 4 and out[2].n_novel == 3 and out[2].novelty == 0.75
    assert out[3].novelty == 1.0


def test_ngram_novelty_counts_distinct_grams(spark):
    ref = spark.createDataFrame([(100, "x y z")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string"
    )
    out = text.ngram_novelty(docs, ref, n=3).collect()[0]
    # 7 occurrences but only 3 DISTINCT grams (a b c / b c a / c a b)
    assert out.n_grams == 3 and out.n_novel == 3


def test_vocab_coverage_curve_planted(spark):
    # 'a' x6, 'b' x3, 'c' x1  -> top-1 covers 6/10, top-2 covers 9/10
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a a a b")], "doc_id long, text string"
    )
    out = {
        r.vocab_size: r
        for r in text.vocab_coverage_curve(docs, sizes=(1, 2, 3)).collect()
    }
    assert out[1].covered_tokens == 6 and out[1].coverage == 0.6
    assert out[2].covered_tokens == 9 and out[2].coverage == 0.9
    assert out[3].covered_tokens == 10 and out[3].coverage == 1.0
    assert out[3].n_types == 3 and out[3].total_tokens == 10


def test_vocab_coverage_tiebreak_on_token(spark):
    # equal counts -> token asc decides who makes the top-1 cut
    docs = spark.createDataFrame([(1, "b a")], "doc_id long, text string")
    out = {r.vocab_size: r for r in text.vocab_coverage_curve(docs, sizes=(1,)).collect()}
    assert out[1].covered_tokens == 1  # 'a' ranks first


def test_vocab_coverage_probe_path_equals_window_path(spark):
    # exact_window_below=0 forces the rank_select_kth histogram-probe
    # plan (no global window); results must be identical to the
    # windowed plan, including V > |vocab| and count ties.
    docs = spark.createDataFrame(
        [(1, "a a a b b c d d"), (2, "a a e b f g c"), (3, "h")],
        "doc_id long, text string",
    )
    sizes = (1, 2, 3, 5, 100)
    win = sorted(
        text.vocab_coverage_curve(docs, sizes=sizes).collect(),
        key=lambda r: r.vocab_size,
    )
    probe = sorted(
        text.vocab_coverage_curve(
            docs, sizes=sizes, exact_window_below=0
        ).collect(),
        key=lambda r: r.vocab_size,
    )
    assert [tuple(r) for r in win] == [tuple(r) for r in probe]


def test_vocab_coverage_probe_path_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert text.vocab_coverage_curve(docs, sizes=(1, 2)).count() == 0
    assert (
        text.vocab_coverage_curve(docs, sizes=(1, 2), exact_window_below=0).count()
        == 0
    )


def test_ngram_loopiness_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "x y x y x y x y"),   # 'x y x'/'y x y' alternate: max 3 of 6
            (2, "a b c d e f"),       # all distinct: max 1 of 4
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.ngram_loopiness(docs, n=3).collect()}
    assert out[1].n_ngrams == 6 and out[1].max_repeat == 3
    assert out[1].loop_score == 0.5
    assert out[2].max_repeat == 1 and out[2].loop_score == 0.25


def _md5_batch(vid: int, m: int = 16) -> int:
    h = int(hashlib.md5(str(vid).encode()).hexdigest()[:16], 16)
    if h >= 1 << 63:
        h -= 1 << 64
    return ((h % m) + m) % m


def test_inbatch_collision_planted(spark):
    # force everything into known batches by checking against the same
    # md5 arithmetic independently
    rows = [(i, i % 3) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    out = {r.batch: r for r in retrieval.inbatch_collision(df, "label", 16).collect()}
    import collections

    cells: dict[int, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for vid, lbl in rows:
        cells[_md5_batch(vid)][lbl] += 1
    for b, counter in cells.items():
        n = sum(counter.values())
        coll = sum(c * (c - 1) // 2 for c in counter.values())
        assert out[b].n_items == n
        assert out[b].n_pairs == n * (n - 1) // 2
        assert out[b].n_collisions == coll
        if n > 1:
            assert out[b].collision_rate == coll / (n * (n - 1) // 2)


def test_inbatch_collision_rejects_bad_batches(spark):
    df = spark.createDataFrame([(1, 0)], "vec_id long, label int")
    with pytest.raises(ValueError):
        retrieval.inbatch_collision(df, "label", 0)
