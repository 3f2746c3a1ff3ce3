"""Bloom-filter join pruning (functions/bloom.py): no false negatives
ever, useful selectivity on disjoint keys, and end-to-end equivalence
of the pre-filtered semi-join with the plain one."""

from __future__ import annotations

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.functions import bloom
from fordgobike_data_pipeline_spark.io import load_tables

from .conftest import SF_SMOKE

_M, _K = 1 << 12, 5


def test_no_false_negatives(spark):
    """Every inserted key passes the membership test — the guarantee
    the exact-result claim rests on."""
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom.bloom_build(keys, "k", _M, _K)
    kept = bloom.bloom_filter_rows(keys, "k", words, _M, _K)
    assert kept.count() == 500


def test_false_positive_rate_bounded(spark):
    """Disjoint probe keys mostly fail the test: with m=4096 bits,
    n=500 keys, k=5 the textbook fp rate is ~(1-e^(-kn/m))^k ≈ 2.6% —
    assert an order-of-magnitude bound, not the exact value."""
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom.bloom_build(keys, "k", _M, _K)
    probes = spark.range(10_000, 20_000).select(F.col("id").alias("k"))
    fp = bloom.bloom_filter_rows(probes, "k", words, _M, _K).count()
    assert fp / 10_000 < 0.10


def test_prefiltered_semi_join_equals_plain(spark):
    """The bloom layer changes row flow, never the result."""
    t = load_tables(spark, SF_SMOKE, ("orders", "customer"))
    dim = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    got = bloom.bloom_prefiltered_semi_join(
        t["orders"], dim, "o_custkey", "c_custkey", m_bits=_M, k=_K
    )
    want = t["orders"].join(
        dim.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        "o_custkey",
        "left_semi",
    )
    assert sorted(r.o_orderkey for r in got.select("o_orderkey").collect()) == sorted(
        r.o_orderkey for r in want.select("o_orderkey").collect()
    )


def test_bitmap_is_bounded_control_data(spark):
    """The collected bitmap is exactly m/64 longs regardless of key
    volume — the 'control data, not data' invariant."""
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    words = bloom.bloom_build(keys, "k", _M, _K)
    assert len(words) == _M // 64
    assert all(isinstance(w, int) for w in words)
