"""Fixed-point PageRank (operators/graph.py): hand-checkable ranks on
a tiny graph, mass conservation up to deterministic truncation, and
partitioning invariance of the integer arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import graph


def _edges(spark, pairs):
    und = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(und, "src string, dst string")


def test_pagerank_symmetric_graph_uniform(spark):
    """On a symmetric regular graph (triangle), every node keeps the
    uniform rank: base + damping·(1/N) exactly."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    out = {r.node: r.rank_int for r in graph.pagerank(e, iterations=3).collect()}
    assert len(set(out.values())) == 1  # symmetry → identical ranks
    n = 3
    r = graph.SCALE // n
    for _ in range(3):
        r = ((graph.SCALE // n) * 15) // 100 + 2 * ((r * 85) // (100 * 2))
    assert set(out.values()) == {r}


def test_pagerank_hub_outranks_leaves(spark):
    """A star center accumulates rank from every leaf."""
    e = _edges(spark, [("hub", "l1"), ("hub", "l2"), ("hub", "l3"), ("hub", "l4")])
    out = {r.node: r.rank_int for r in graph.pagerank(e, iterations=3).collect()}
    assert out["hub"] > out["l1"]
    assert len({out[f"l{i}"] for i in range(1, 5)}) == 1


def test_pagerank_partitioning_invariant(spark):
    """Integer arithmetic ⇒ identical ranks under different partition
    layouts (the property a double-sum implementation cannot give)."""
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(20)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e1 = _edges(spark, pairs)
    e2 = _edges(spark, pairs).repartition(17)
    r1 = sorted(map(tuple, graph.pagerank(e1, 3).collect()))
    r2 = sorted(map(tuple, graph.pagerank(e2, 3).collect()))
    assert r1 == r2
