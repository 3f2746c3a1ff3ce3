"""Property-based tests (hypothesis) for the round-12 operators:
bound/consistency invariants that must hold on ANY corpus —
truncation-loss monotonicity and conservation, contamination-overlap
bounds and self-contamination, stopword-profile ratio bounds, and
encoding-census count consistency."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fordgobike_data_pipeline_spark.operators import curation, quality, text

_words = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=3), min_size=1, max_size=12
)
_texts = st.lists(_words.map(" ".join), min_size=1, max_size=8)


@given(_texts)
@settings(max_examples=6, deadline=None)
def test_truncation_loss_monotone_and_conserved(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r.max_len: r for r in curation.truncation_loss(docs, (1, 4, 16)).collect()
    }
    totals = {r.total_tokens for r in rows.values()}
    assert len(totals) == 1  # total is budget-independent
    total = totals.pop()
    prev = None
    for length in (1, 4, 16):
        r = rows[length]
        assert 0 <= r.lost_tokens <= total
        assert 0 <= r.n_docs_truncated <= len(texts)
        if prev is not None:  # longer budget never loses MORE
            assert r.lost_tokens <= prev.lost_tokens
            assert r.n_docs_truncated <= prev.n_docs_truncated
        prev = r


@given(_texts)
@settings(max_examples=6, deadline=None)
def test_contamination_self_overlap_is_total(spark, texts):
    # a benchmark contained verbatim in the corpus is 100% contaminated,
    # and overlap_frac is always within [0, 1]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = curation.contamination_overlap(docs, bench, n=2).collect()
    assert len(out) == len(texts)
    for r in out:
        assert r.n_grams >= 1 and r.n_hit == r.n_grams
        assert r.overlap_frac == 1.0


@given(_texts)
@settings(max_examples=6, deadline=None)
def test_stopword_profile_bounds(spark, texts):
    docs = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    for r in text.stopword_profile(docs).collect():
        assert 0.0 <= r.avg_stop_ratio <= 1.0
        assert 0 <= r.n_low_stop <= r.n_docs
        assert r.avg_distinct_stop >= 0.0


@given(
    st.lists(
        st.text(alphabet="ab �é" + chr(7), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=8, deadline=None)
def test_encoding_census_consistency(spark, texts):
    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    r = quality.encoding_census(docs).collect()[0]
    assert r.n_docs == len(texts)
    assert r.n_docs_repl <= r.n_docs and r.n_docs_ctrl <= r.n_docs
    # every replacement char is also non-ascii
    assert r.n_nonascii_chars >= r.n_repl_chars
    total_chars = sum(len(t) for t in texts)
    assert r.n_repl_chars == sum(t.count("�") for t in texts)
    assert r.n_ctrl_chars == sum(t.count(chr(7)) for t in texts)
    assert r.n_nonascii_chars <= total_chars
    if any(len(t) > 0 for t in texts):
        assert 0.0 <= r.avg_ascii_ratio <= 1.0
    else:
        assert r.avg_ascii_ratio is None
