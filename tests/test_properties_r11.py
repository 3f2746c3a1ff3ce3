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
