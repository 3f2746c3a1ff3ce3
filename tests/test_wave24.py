"""Wave-24 operators: label propagation, split-conformal threshold,
leakage-safe split — planted-value tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import curation, graph, quality


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_label_propagation_two_hops(spark):
    # 0(seed,l=7) <- 1 <- 2 : node 1 labels in round 1, node 2 in round 2
    edges = _edges(spark, [(1, 0), (2, 1)])
    seeds = spark.createDataFrame([(0, 7)], "node long, label int")
    out = {r.node: r for r in graph.label_propagation(edges, seeds, 2).collect()}
    assert out[0].label == 7 and out[0].is_seed
    assert out[1].label == 7 and not out[1].is_seed
    assert out[2].label == 7 and not out[2].is_seed
    one_round = {
        r.node for r in graph.label_propagation(edges, seeds, 1).collect()
    }
    assert one_round == {0, 1}  # node 2 unreachable in one round


def test_label_propagation_majority_and_tiebreak(spark):
    # node 9 sees labels {5,5,3} -> majority 5; node 8 sees {5,3} tie
    # -> smallest label 3
    edges = _edges(spark, [(9, 0), (9, 1), (9, 2), (8, 0), (8, 2)])
    seeds = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 3)], "node long, label int"
    )
    out = {r.node: r.label for r in graph.label_propagation(edges, seeds, 1).collect()}
    assert out[9] == 5 and out[8] == 3


def test_label_propagation_seeds_clamped(spark):
    # seed 0 surrounded by label-9 voters keeps its own label
    edges = _edges(spark, [(0, 1), (0, 2)])
    seeds = spark.createDataFrame(
        [(0, 1), (1, 9), (2, 9)], "node long, label int"
    )
    out = {r.node: r.label for r in graph.label_propagation(edges, seeds, 3).collect()}
    assert out[0] == 1


def test_conformal_threshold_hand_computed(spark):
    # 9 scores 0.1..0.9; alpha=0.1 -> k = ceil(10*0.9) = 9 -> thr 0.9
    rows = [(i, i / 10.0) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    r = quality.conformal_threshold(df, "score", "doc_id", alpha=0.1).collect()[0]
    assert r.n == 9 and r.k == 9
    assert r.threshold == 0.9
    assert r.n_accepted == 9 and r.accept_rate == 1.0
    # alpha=0.5 -> k = ceil(10*0.5) = 5 -> thr 0.5, 5 accepted
    r = quality.conformal_threshold(df, "score", "doc_id", alpha=0.5).collect()[0]
    assert r.k == 5 and r.threshold == 0.5
    assert r.n_accepted == 5 and r.accept_rate == 5 / 9


def test_conformal_threshold_rejects_bad_alpha(spark):
    df = spark.createDataFrame([(1, 0.5)], "doc_id long, score double")
    with pytest.raises(ValueError):
        quality.conformal_threshold(df, "score", "doc_id", alpha=0.0)


def _bucket(component: int) -> int:
    h = int(hashlib.md5(str(component).encode()).hexdigest()[:16], 16)
    if h >= 1 << 63:
        h -= 1 << 64
    return ((h % 100) + 100) % 100


def test_leakage_split_components_stay_together(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    )
    # components: {0,1,2} (chained), {5,6}; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    out = {r.doc_id: r for r in curation.leakage_safe_split(docs, pairs).collect()}
    assert len(out) == 10
    assert out[0].component == out[1].component == out[2].component == 0
    assert out[5].component == out[6].component == 5
    assert out[3].component == 3  # singleton = own component
    # every member of a component shares the split
    assert out[0].split == out[1].split == out[2].split
    assert out[5].split == out[6].split
    # split matches the independent md5 bucket arithmetic
    for d, r in out.items():
        b = _bucket(r.component)
        want = "train" if b < 90 else ("val" if b < 95 else "test")
        assert r.split == want, (d, b)


def test_leakage_split_rejects_bad_weights(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError):
        curation.leakage_safe_split(docs, pairs, weights=(80, 10, 5))


def test_epoch_shuffle_deterministic_and_distinct_orders(spark):
    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = curation.epoch_shuffle(docs, n_epochs=2, n_shards=4).collect()
    b = curation.epoch_shuffle(docs, n_epochs=2, n_shards=4).collect()
    key = lambda r: (r.epoch, r.doc_id)  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    rows = {key(r): (r.shard, r.shard_pos) for r in a}
    assert len(rows) == 100  # every (epoch, doc) present
    # within an (epoch, shard), positions are 1..k contiguous
    import collections

    per = collections.defaultdict(list)
    for r in a:
        per[(r.epoch, r.shard)].append(r.shard_pos)
    for poss in per.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # the two epochs produce different orders (overwhelmingly likely)
    e0 = sorted((r.shard, r.shard_pos, r.doc_id) for r in a if r.epoch == 0)
    e1 = sorted((r.shard, r.shard_pos, r.doc_id) for r in a if r.epoch == 1)
    assert [x[2] for x in e0] != [x[2] for x in e1]


def test_epoch_shuffle_rejects_bad_params(spark):
    import pytest as _pt

    docs = spark.createDataFrame([(1,)], "doc_id long")
    with _pt.raises(ValueError):
        curation.epoch_shuffle(docs, n_epochs=0)
