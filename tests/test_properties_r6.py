"""Hypothesis property tests for the round-6 operators — invariants
that hold for ARBITRARY inputs, complementing the fixed-oracle rows:
allocation exactness, rank-selection vs sorted truth, LOO-encoding
mass balance, k-core monotonicity.

Settings follow tests/test_properties.py: small example counts (each
example launches Spark jobs), deadline disabled.
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from fordgobike_data_pipeline_spark.operators import features, graph, quality

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@PROP
@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=1000),
)
def test_largest_remainder_allocation_is_exact(spark, counts, budget):
    """Hamilton apportionment: allocations are non-negative ints that
    sum EXACTLY to the budget, and each is within 1 of the exact
    pro-rata share (the no-drift property round(p*B) lacks)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"s{i}", n) for i, n in enumerate(counts)], "source STRING, n LONG"
    )
    t = df.agg(F.sum("n").alias("total"))
    b = df.crossJoin(F.broadcast(t)).select(
        "source",
        "n",
        F.expr(f"(n * {budget}) div total").alias("base"),
        F.expr(f"n * {budget} - ((n * {budget}) div total) * total").alias("rem"),
        "total",
    )
    leftover = b.agg((F.lit(budget) - F.sum("base")).alias("leftover"))
    r = b.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source"))),
    )
    out = r.crossJoin(F.broadcast(leftover)).select(
        "n",
        "total",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc"),
    ).collect()
    total = sum(c for c in counts)
    assert sum(row["alloc"] for row in out) == budget
    for row in out:
        exact = row["n"] * budget / total
        assert abs(row["alloc"] - exact) < 1  # quota property: base or base+1


@PROP
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    st.data(),
)
def test_rank_select_matches_sorted_truth(spark, values, data):
    k = data.draw(st.integers(min_value=1, max_value=len(values)))
    df = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate(values)], "v DOUBLE, id LONG"
    )
    r = quality.rank_select_kth(df, "v", "id", k_expr=str(k), n_buckets=7).collect()
    assert len(r) == 1
    truth = sorted((v, i) for i, v in enumerate(values))[k - 1]
    assert (r[0]["kth_value"], r[0]["kth_id"]) == truth


@PROP
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-10_000, max_value=10_000),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_target_encode_loo_mass_balance(spark, rows):
    """Σ over rows of LOO encodings, each weighted by (cnt−1), equals
    (cnt−1)·sum per category — i.e. every row's encoding excludes
    exactly its own value. Verified via the reconstruction
    loo·(cnt−1) == sum_cat − x for multi-member categories."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "cat STRING, cents LONG")
    out = features.target_encode_loo(df, "cat", "cents", out_col="loo").collect()
    from collections import Counter, defaultdict

    cnt = Counter(c for c, _ in rows)
    sums = defaultdict(int)
    for c, v in rows:
        sums[c] += v
    for r in out:
        c, x = r["cat"], r["cents"]
        if cnt[c] > 1:
            expect = (sums[c] - x) / (cnt[c] - 1) / 100.0
            # encodings are quantized to exact integer MICRO-units
            # (engine-stable rint, see target_encode_loo) — half a
            # micro-unit is the max quantization error
            assert abs(r["loo"] - expect) <= 5.01e-7


@PROP
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_kcore_monotone_shrinking(spark, edges):
    """Each peel round only removes: n_nodes and n_edges are
    non-increasing across rounds for arbitrary edge lists."""
    pairs = [(a, b) for a, b in edges if a != b]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "a LONG, b LONG")
    rows = sorted(
        graph.kcore_peel(df, k=2, iterations=3).collect(),
        key=lambda r: r["iter"],
    )
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_nodes"] <= prev["n_nodes"]
        assert cur["n_edges"] <= prev["n_edges"]


@PROP
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=1,
            max_size=6,
        ),
        min_size=2,
        max_size=8,
    )
)
def test_setsim_prefix_complete_vs_bruteforce(spark, docs_tokens):
    """The prefix filter must find EXACTLY the pairs brute force finds
    (completeness is the pigeonhole guarantee; this fuzzes it)."""
    from fordgobike_data_pipeline_spark.operators import dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.setsim_join_prefix(df, 1, 2).collect()
    }
    sets = [set(t) for t in docs_tokens]
    want = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            uni = len(sets[i] | sets[j])
            if inter * 2 >= uni:
                want.add((i, j))
    assert got == want


@PROP
@given(
    st.lists(
        st.sampled_from(
            [
                "alpha beta gamma delta epsilon zeta",
                "alpha beta gamma delta epsilon eta",
                "one two three four five six seven",
                "unique words entirely different here now",
            ]
        ),
        min_size=2,
        max_size=8,
    )
)
def test_minhash_pairs_verified_and_identical_always_pair(spark, texts):
    """Two guarantees of the LSH pipeline regardless of banding luck:
    (1) every emitted pair's EXACT verified Jaccard >= threshold (the
    verify step filters candidates), and (2) identical texts always
    pair (equal signatures land in every band together)."""
    from fordgobike_data_pipeline_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    pairs = dedup.minhash_lsh_pairs(df, threshold=0.8, k=3).collect()
    for r in pairs:
        assert r["jaccard"] >= 0.8
    dup_groups = {}
    for i, t in enumerate(texts):
        dup_groups.setdefault(t, []).append(i)
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    for ids in dup_groups.values():
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                assert (min(ids[a], ids[b]), max(ids[a], ids[b])) in got


@PROP
@given(
    st.lists(
        st.sampled_from(["x y z", "p q r", "x y z", "m n o"]),
        min_size=1,
        max_size=12,
    )
)
def test_exact_dedup_one_survivor_per_text(spark, texts):
    from fordgobike_data_pipeline_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    out = dedup.exact_dedup(df, ["text"]).collect()
    assert len(out) == len(set(texts))
    from collections import Counter

    c = Counter(texts)
    # survivor is the MIN id of its group; counts conserved
    by_text = {t: min(i for i, tt in enumerate(texts) if tt == t) for t in c}
    total = sum(r["n_copies"] for r in out)
    assert total == len(texts)
    for r in out:
        assert r["keep_id"] in by_text.values()
