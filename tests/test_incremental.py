"""Semantic tests for incremental cross-batch dedup (dedup.py) and
int8 embedding quantization (similarity.py) — planted-case invariants
beyond the DuckDB oracle parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import dedup, similarity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_exact_dedup_planted(spark):
    archive = _docs(spark, [(1, "the quick brown fox"), (2, "old news item")])
    batch = _docs(
        spark,
        [
            (10, "THE  quick   brown fox "),  # dup of archive 1 after normalize
            (11, "a genuinely new document"),
            (12, "a genuinely new document"),  # within-batch dup of 11
            (13, "another fresh one"),
        ],
    )
    index = dedup.fingerprint_index(archive)
    out = sorted(r.doc_id for r in dedup.incremental_exact_dedup(batch, index).collect())
    assert out == [11, 13]


def test_incremental_exact_dedup_index_growth_is_content_bounded(spark):
    archive = _docs(spark, [(i, "same text") for i in range(100)])
    assert dedup.fingerprint_index(archive).count() == 1


def test_incremental_minhash_finds_archive_near_dup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    old = _docs(spark, [(1, base), (2, "totally unrelated words about cats and dogs")])
    new = _docs(
        spark,
        [
            (100, base + "lambda"),  # near-dup of archive doc 1
            (101, "fresh subject matter nothing shared here at all today"),
        ],
    )
    index = dedup.minhash_band_index(old)
    pairs = dedup.incremental_minhash_pairs(new, index, old, threshold=0.7).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(100, 1)]
    assert pairs[0].jaccard >= 0.7


def test_quantize_range_and_error_bound(spark):
    rows = [(i, [math.sin(i * 7.3 + j) * (j + 1) for j in range(16)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = similarity.quantize_embeddings(emb)
    scales = similarity.dim_max_abs(emb)
    joined = q.crossJoin(F.broadcast(scales)).select(
        "vec_id",
        F.array_max(F.transform("qvec", lambda x: F.abs(x))).alias("max_abs_q"),
        similarity.dequantize(F.col("qvec"), F.col("scales")).alias("deq"),
    )
    assert joined.filter(F.col("max_abs_q") > 127).count() == 0
    # dequantized vectors must stay cosine-close to the originals
    both = emb.join(joined.select("vec_id", "deq"), "vec_id").select(
        similarity.cosine(F.col("embedding"), F.col("deq")).alias("cs")
    )
    assert both.agg(F.min("cs")).first()[0] > 0.999


def test_quantize_zero_dimension(spark):
    emb = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [0.0, -2.0])], "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: r.qvec for r in similarity.quantize_embeddings(emb).collect()}
    assert rows[1] == [0, 64] and rows[2] == [0, -127]
