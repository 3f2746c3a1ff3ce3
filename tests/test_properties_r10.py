"""Property-based tests (hypothesis) for the round-10 operators:
W1 drift metric axioms, Huber-location bracketing, leave-one-out
conservation, DP-quantile grid membership, Hill positivity, next-fit
fill bound — invariants that hold for ANY input, not just the planted
fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fordgobike_data_pipeline_spark.operators import (
    analytics,
    governance,
    quality,
    warehouse,
)

_vals = st.lists(st.integers(0, 500), min_size=1, max_size=25)


@given(_vals, _vals)
@settings(max_examples=8, deadline=None)
def test_wasserstein_metric_axioms(spark, xs, ys):
    rows = [("a", int(v)) for v in xs] + [("b", int(v)) for v in ys]
    df = spark.createDataFrame(rows, "g string, v long")
    ab = quality.wasserstein_hist_drift(df, "g", "a", "b", "v", 16).collect()[0]
    ba = quality.wasserstein_hist_drift(df, "g", "b", "a", "v", 16).collect()[0]
    assert ab.w1 >= 0
    assert abs(ab.w1 - ba.w1) < 1e-9  # symmetry
    # identity of indiscernibles on the grid: same multiset -> 0
    same = spark.createDataFrame(
        [("a", int(v)) for v in xs] + [("b", int(v)) for v in xs],
        "g string, v long",
    )
    assert quality.wasserstein_hist_drift(same, "g", "a", "b", "v", 16).collect()[0].w1 == 0.0
    # upper bound: W1 <= max value gap
    assert ab.w1 <= max(max(xs, default=0), max(ys, default=0)) + 16


@given(
    st.lists(
        st.floats(min_value=-50.0, max_value=50.0, allow_nan=False, width=32),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_huber_bracketed_by_min_max(spark, vs):
    rows = [("g", float(v)) for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = analytics.huber_location(df, "g", "v").collect()[0]
    lo, hi = min(vs), max(vs)
    # weighted mean of the values can never leave their hull (allow
    # the 1e-6 quantization slack)
    assert lo - 1e-5 <= r.huber_mean <= hi + 1e-5
    assert lo - 1e-5 <= r.plain_mean <= hi + 1e-5


@given(st.lists(st.integers(0, 2000), min_size=5, max_size=60))
@settings(max_examples=8, deadline=None)
def test_dp_quantile_released_value_on_grid(spark, vs):
    df = spark.createDataFrame([(int(v),) for v in vs], "v long")
    rows = governance.dp_quantiles(df, "v", qs=[0.5], bucket_width=32).collect()
    assert len(rows) == 1
    r = rows[0]
    # released + true values are right edges of occupied grid buckets
    occupied = {(v // 32 + 1) * 32 for v in vs}
    assert r.dp_value in occupied
    assert r.true_value in occupied
    assert 0.0 <= r.rank_error <= 1.0


@given(
    st.lists(st.integers(1, 1_000_000), min_size=25, max_size=60),
)
@settings(max_examples=8, deadline=None)
def test_hill_positive_or_null(spark, vs):
    rows = [(i, int(v)) for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    r = analytics.hill_tail_index(df, "n_chars", "doc_id", k=20).collect()[0]
    assert r.x_tail >= 1
    # sum of log-ratios is >= 0 by construction; alpha positive or
    # NULL (all top-21 values equal -> sum 0 -> NULL)
    assert r.alpha_hat is None or r.alpha_hat > 0


@given(
    st.lists(st.integers(1, 300), min_size=1, max_size=30),
)
@settings(max_examples=8, deadline=None)
def test_compaction_next_fit_invariants(spark, sizes):
    rows = [("p", i, int(b)) for i, b in enumerate(sizes)]
    census = spark.createDataFrame(rows, "part string, file_id long, n_bytes long")
    out = warehouse.compaction_plan(census, target_bytes=100).collect()
    # conservation: every byte lands in exactly one bin
    assert sum(r.total_bytes for r in out) == sum(sizes)
    assert sum(r.n_files for r in out) == len(sizes)
    # bin ids are the cum//target prefix — strictly increasing, first
    # one 0 (an oversized file may SKIP indices: [200, 1] at target
    # 100 yields bins {0, 2} — ids are labels, not a dense range)
    bins = sorted(r.bin for r in out)
    assert bins[0] == 0 and len(set(bins)) == len(bins)


_texts = st.lists(
    st.text(alphabet="ab cd", min_size=1, max_size=40), min_size=1, max_size=8
)


@given(_texts)
@settings(max_examples=6, deadline=None)
def test_cdc_conserves_tokens(spark, texts):
    from fordgobike_data_pipeline_spark.operators import dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_toks = sum(len(t.lower().split()) for t in texts)
    r = dedup.cdc_chunk_stats(df).collect()[0]
    if n_toks == 0:
        assert r.n_chunks is None or r.n_chunks == 0
        return
    # every token lands in exactly one chunk
    total_words = int(round(r.avg_chunk_words * r.n_chunks))
    assert total_words == n_toks
    assert 0 <= r.dup_chunks <= r.n_chunks


@given(_texts)
@settings(max_examples=6, deadline=None)
def test_blocking_quality_ratios_bounded(spark, texts):
    from fordgobike_data_pipeline_spark.operators import dedup

    rows = [(i, t, "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    truth = spark.createDataFrame(
        [(i, i + 1) for i in range(len(texts) - 1)], "id_a long, id_b long"
    )
    for r in dedup.blocking_quality(docs, truth).collect():
        if r.reduction_ratio is not None:
            assert -1e-9 <= r.reduction_ratio <= 1.0 + 1e-9
        if r.pair_completeness is not None:
            assert -1e-9 <= r.pair_completeness <= 1.0 + 1e-9
        assert r.cand_pairs >= 0


@given(_texts)
@settings(max_examples=5, deadline=None)
def test_set_cover_gains_non_increasing(spark, texts):
    from fordgobike_data_pipeline_spark.operators import curation

    rows = [(i, t, f"s{i % 3}") for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sorted(curation.source_set_cover(docs, steps=3).collect(), key=lambda r: r.step)
    gains = [r.marginal_gain for r in out]
    # NULL padding (fewer distinct sources than steps) only at the tail
    real = [g for g in gains if g is not None]
    assert gains[: len(real)] == real
    # greedy marginal gains are non-increasing; coverage is monotone in [0,1]
    assert real == sorted(real, reverse=True)
    covs = [r.cum_coverage for r in out if r.cum_coverage is not None]
    assert covs == sorted(covs)
    assert all(-1e-9 <= c <= 1.0 + 1e-9 for c in covs)


_vecs4 = st.lists(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=3,
        max_size=3,
    ),
    min_size=5,
    max_size=10,
)


@given(_vecs4)
@settings(max_examples=5, deadline=None)
def test_mutual_degree_bounded_and_silhouette_in_range(spark, vecs):
    from fordgobike_data_pipeline_spark.operators import retrieval, similarity

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    k = 3
    for r in retrieval.mutual_knn_stats(df, k=k, n_planes=2).collect():
        assert 0 <= r.mutual_degree <= k
        assert r.n_nodes >= 1
    for r in similarity.simplified_silhouette(df, k=2).collect():
        assert -1.0 - 1e-9 <= r.mean_silhouette <= 1.0 + 1e-9
