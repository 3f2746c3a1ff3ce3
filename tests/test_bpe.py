"""Semantic tests for operators/bpe.py — trainer correctness on a
hand-computable corpus, encode parity against an independent reference
implementation, and determinism under repartitioning."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import bpe
from fordgobike_data_pipeline_spark.operators.text import TOKEN_RE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- independent reference implementation (deliberately different code
# path: no memoization, recursive merge application) -------------------


def _ref_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    # apply merges strictly by rank, rescanning from the start each time
    syms = list(word)
    ranks = {p: i for i, p in enumerate(merges)}
    while True:
        cand = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cand:
            return syms
        _, i = min(cand)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]


def _ref_count(text: str, merges: list[tuple[str, str]]) -> int:
    return sum(len(_ref_encode_word(w, merges)) for w in re.findall(TOKEN_RE, text))


def test_learn_merges_hand_computed():
    # "aaab" x3: pairs aa(x6), ab(x3) -> merge ('a','a') first; then
    # symbols [aa,a,b]: pairs (aa,a) x3, (a,b) x3 -> tie, lexic. asc
    # picks ('a','b').
    merges = bpe.learn_bpe_merges({"aaab": 3}, 2)
    assert merges == [("a", "a"), ("a", "b")]


def test_learn_merges_stops_when_no_repeats():
    merges = bpe.learn_bpe_merges({"ab": 1, "cd": 1}, 10)
    assert merges == []


def test_token_count_matches_reference(spark):
    rows = [
        (1, "the cat sat on the mat, the cat ate."),
        (2, "low lower lowest, lowly slow slower!"),
        (3, ""),
        (4, "unseen zxqv words survive as char runs"),
    ]
    df = _docs(spark, rows)
    merges = bpe.train_bpe(df, n_merges=30, max_vocab_words=1000)
    assert len(merges) > 0
    got = {r.doc_id: r.n_bpe_tokens for r in bpe.bpe_token_count(df, merges).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == _ref_count(text, merges), doc_id


def test_encode_concat_preserves_words(spark):
    # merges never cross word boundaries: joining a word's pieces
    # reconstructs the word, in order
    df = _docs(spark, [(1, "hello, hello world"), (2, "worldly hello")])
    merges = bpe.train_bpe(df, n_merges=20, max_vocab_words=100)
    out = {r.doc_id: r.bpe_tokens for r in bpe.bpe_encode(df, merges).collect()}
    assert "".join(out[1]) == "hello,helloworld"
    assert "".join(out[2]) == "worldlyhello"


def test_count_repartition_invariant(spark):
    rows = [(i, f"doc {i} common words repeat common words {i % 5}") for i in range(50)]
    df = _docs(spark, rows)
    merges = bpe.train_bpe(df, n_merges=25, max_vocab_words=500)
    a = sorted(bpe.bpe_token_count(df, merges).collect())
    b = sorted(bpe.bpe_token_count(df.repartition(7), merges).collect())
    assert a == b


def test_driver_guard_raises(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="control-data guard"):
        bpe.train_bpe(df, max_vocab_words=bpe._MAX_DRIVER_WORDS + 1)


def test_merges_table_roundtrip(spark):
    merges = [("a", "a"), ("aa", "b")]
    t = bpe.merges_table(spark, merges).orderBy("rank").collect()
    assert [(r.left, r.right) for r in t] == merges


def test_bpe_vocab_covers_every_emitted_symbol(spark):
    """Every symbol bpe_encode emits on the fitting corpus must have a
    vocab id (base chars cover unmergeable symbols, C+rank covers
    merges), and ids must be unique."""
    docs = _docs(spark, [(1, "hello, hello world again"), (2, "worldly hello world"),
                         (3, "again and again the world")])
    merges = bpe.train_bpe(docs, n_merges=60)
    vocab = bpe.bpe_vocab(docs, merges)
    rows = vocab.collect()
    ids = [r.token_id for r in rows]
    assert len(ids) == len(set(ids))
    known = {r.symbol for r in rows}
    emitted = {
        s
        for r in bpe.bpe_encode(docs, merges).collect()
        for s in r.bpe_tokens
    }
    assert emitted <= known, sorted(emitted - known)[:5]


def test_bpe_encode_ids_roundtrip(spark):
    """ids ↔ symbols: decoding the id sequence through the vocab must
    reproduce bpe_encode's symbol sequence exactly, with no -1 (the
    vocab was fitted on the same corpus)."""
    docs = _docs(spark, [(1, "hello, hello world again"), (2, "worldly hello world"),
                         (3, "again and again the world")])
    merges = bpe.train_bpe(docs, n_merges=60)
    vocab = bpe.bpe_vocab(docs, merges)
    id2sym = {r.token_id: r.symbol for r in vocab.collect()}
    want = {r.doc_id: r.bpe_tokens for r in bpe.bpe_encode(docs, merges).collect()}
    got = {
        r.doc_id: [id2sym.get(i, "<unk>") for i in r.token_ids]
        for r in bpe.bpe_encode_ids(docs, merges, vocab).collect()
    }
    assert got == want
    assert all(i >= 0 for r in bpe.bpe_encode_ids(docs, merges, vocab).collect() for i in r.token_ids)


def test_bpe_vocab_dedupes_colliding_merge_symbols(spark):
    """Two merge paths producing the same string (('a','bc') then
    ('ab','c') would both yield 'abc') must collapse to ONE vocab row
    keeping the lowest token_id, so symbol→id assignment is
    order-independent."""
    docs = _docs(spark, [(1, "abc abc")])
    # hand-built colliding merges: both rank 1 and rank 2 produce "ab c"→"abc"
    merges = [("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc")]
    vocab = bpe.bpe_vocab(docs, merges)
    rows = vocab.collect()
    syms = [r.symbol for r in rows]
    assert len(syms) == len(set(syms)), "duplicate symbol rows in vocab"
    n_base = sum(1 for r in rows if len(r.symbol) == 1)
    abc = [r.token_id for r in rows if r.symbol == "abc"]
    # 'abc' appears at ranks 1 and 3 → keep the lower id (n_base + 1)
    assert abc == [n_base + 1]


def test_bpe_encode_ids_unknown_symbol_maps_to_minus_one(spark):
    """A vocab fitted on a different corpus maps unseen symbols to -1
    instead of raising mid-job."""
    fit_docs = spark.createDataFrame([(1, "aa ab ba")], ["doc_id", "text"])
    merges = bpe.train_bpe(fit_docs, n_merges=5)
    vocab = bpe.bpe_vocab(fit_docs, merges)
    other = spark.createDataFrame([(2, "zz qq")], ["doc_id", "text"])
    out = bpe.bpe_encode_ids(other, merges, vocab).collect()[0]
    assert all(i == -1 for i in out.token_ids) and out.token_ids
