"""Property-based tests (hypothesis) for the round-11 changes:
the vocab-coverage histogram-probe plan must equal the windowed plan
on ANY corpus (the escape hatch promised in vocab_coverage_curve's
round-10 docstring, wired this round), and the gap-weighted W1 must
match a brute-force full-grid reference."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fordgobike_data_pipeline_spark.operators import quality, text

_words = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=3), min_size=1, max_size=12
)
_texts = st.lists(_words.map(" ".join), min_size=1, max_size=8)


@given(_texts)
@settings(max_examples=6, deadline=None)
def test_vocab_coverage_two_plans_agree(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sizes = (1, 2, 4, 50)
    win = sorted(
        text.vocab_coverage_curve(docs, sizes=sizes).collect(),
        key=lambda r: r.vocab_size,
    )
    probe = sorted(
        text.vocab_coverage_curve(docs, sizes=sizes, exact_window_below=0).collect(),
        key=lambda r: r.vocab_size,
    )
    assert [tuple(r) for r in win] == [tuple(r) for r in probe]


@given(
    st.lists(st.integers(0, 300), min_size=1, max_size=15),
    st.lists(st.integers(0, 300), min_size=1, max_size=15),
)
@settings(max_examples=8, deadline=None)
def test_wasserstein_matches_full_grid_reference(spark, xs, ys):
    width = 16
    rows = [("a", int(v)) for v in xs] + [("b", int(v)) for v in ys]
    df = spark.createDataFrame(rows, "g string, v long")
    got = quality.wasserstein_hist_drift(df, "g", "a", "b", "v", width).collect()[0]
    # brute force: CDF difference summed over EVERY grid bucket
    buckets = range(0, max(max(xs), max(ys)) // width + 1)
    na, nb = len(xs), len(ys)
    w1 = width * sum(
        abs(
            sum(1 for v in xs if v // width <= b) / na
            - sum(1 for v in ys if v // width <= b) / nb
        )
        for b in buckets
    )
    assert abs(got.w1 - w1) < 1e-6


from fordgobike_data_pipeline_spark.operators import analytics, dedup, sketches


@given(_texts, st.lists(st.sampled_from(["s0", "s1", "s2"]), min_size=1, max_size=8))
@settings(max_examples=5, deadline=None)
def test_entropy_rate_bounds(spark, texts, srcs):
    rows = [
        (i, t, srcs[i % len(srcs)]) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    for r in text.ngram_entropy_rate(docs).collect():
        assert r.h_unigram >= 0.0
        if r.h_bigram_cond is not None:
            assert r.h_bigram_cond >= 0.0
        if r.redundancy is not None:
            assert r.redundancy <= 1.0 + 1e-9


@given(_texts)
@settings(max_examples=5, deadline=None)
def test_jm_sweep_nonnegative(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in text.jm_smoothing_sweep(docs).collect():
        # the mixture probability is a convex combo of probs <= 1, so
        # cross-entropy is non-negative (NULL when the test half has
        # no bigrams)
        if r.cross_entropy_bits is not None:
            assert r.cross_entropy_bits >= -1e-9


@given(st.lists(st.tuples(st.sampled_from("abc"), st.integers(0, 1000)),
                min_size=1, max_size=20))
@settings(max_examples=6, deadline=None)
def test_anova_invariants(spark, rows):
    df = spark.createDataFrame(
        [(g, int(v)) for g, v in rows], "g string, v long"
    )
    r = analytics.one_way_anova(df, "g", "v").collect()[0]
    assert r.ss_between >= -1e-3 and r.ss_within >= -1e-3
    if r.eta_sq is not None:
        assert -1e-9 <= r.eta_sq <= 1.0 + 1e-9
    if r.f_stat is not None:
        assert r.f_stat >= -1e-9


@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=12))
@settings(max_examples=6, deadline=None)
def test_transitivity_in_unit_interval(spark, es):
    edges = [(min(a, b), max(a, b), 0.9) for a, b in es if a != b]
    if not edges:
        edges = [(0, 1, 0.9)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long, jaccard double")
    r = dedup.near_dup_transitivity(pairs).collect()[0]
    if r.transitivity is not None:
        assert -1e-9 <= r.transitivity <= 1.0 + 1e-9
    assert r.n_closed <= r.n_wedges


def test_dedup_bias_shares_sum_to_one(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (3, 5, 0.85)], "id_a long, id_b long, jaccard double"
    )
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(1, 7)], "doc_id long, source string"
    )
    out = dedup.dedup_source_bias(pairs, docs).collect()
    assert abs(sum(r.share_before for r in out) - 1.0) < 1e-6
    assert abs(sum(r.share_after for r in out) - 1.0) < 1e-6
    assert abs(sum(r.delta_share for r in out)) < 1e-6


def test_bloom_design_empty_keys_no_throw(spark):
    # empty key set: m would be 0 — the greatest(., 1) guard keeps the
    # position arithmetic defined; every probe misses (fpp 0)
    keys = spark.createDataFrame([], "k long")
    probes = spark.createDataFrame([(1,), (2,)], "p long")
    out = sketches.bloom_filter_design(keys, probes, "k", "p").collect()
    assert all(r.n_false_pos == 0 and r.fpp_measured == 0.0 for r in out)
