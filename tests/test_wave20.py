"""Behavioral tests for the perceptual-hash image dedup (wave 20):
planted exact and near duplicates through the stub decoder, band
pigeonhole completeness for small hamming distances."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark import harness
from fordgobike_data_pipeline_spark.operators import multimodal

from .conftest import SF_SMOKE


def _media(spark, payloads):
    rows = [(i, bytearray(p)) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "media_id long, content binary")


def _smooth(period_a: float, period_b: float, n: int = 1024) -> bytes:
    """Image-like payload: smooth 2-tone signal (the stub average-pools
    it into the pixel grid, so it behaves like a downscaled photo)."""
    return bytes(
        int(127 + 100 * math.sin(i / period_a) + 20 * math.sin(i / period_b)) % 256
        for i in range(n)
    )


def test_phash_identical_payloads_hash_equal(spark):
    base = _smooth(37.0, 7.0)
    df = _media(spark, [base, base, _smooth(53.0, 11.0)])
    hashes = {r.media_id: r.phash for r in multimodal.phash_images(df).collect()}
    assert hashes[0] == hashes[1]
    assert hashes[0] != hashes[2]


def test_phash_near_pairs_finds_planted_and_skips_distinct(spark):
    base = _smooth(37.0, 7.0)
    near = bytearray(base)
    near[100] ^= 0xFF  # one perturbed byte → one pooled cell shifts a little
    distinct = _smooth(53.0, 11.0)
    df = _media(spark, [base, bytes(near), distinct])
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.phash_near_pairs(
            multimodal.phash_images(df), max_hamming=10
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 10
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_phash_band_join_complete_vs_bruteforce(spark):
    """Pigeonhole completeness: every pair within the hamming threshold
    via brute force must also come out of the band join."""
    import itertools

    base = _smooth(41.0, 9.0)
    variants = [base]
    for k in (3, 7, 11, 200):
        b = bytearray(base)
        b[k] ^= 0x55
        variants.append(bytes(b))
    df = _media(spark, variants)
    hashes = {r.media_id: r.phash for r in multimodal.phash_images(df).collect()}
    brute = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 6
    }
    joined = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.phash_near_pairs(
            multimodal.phash_images(df), max_hamming=6
        ).collect()
    }
    assert joined == brute


def test_phash_dedup_query_finds_all_planted_recrawl_dups(spark):
    from fordgobike_data_pipeline_spark.harness_scale import q_phash_dedup

    rows = q_phash_dedup(spark, SF_SMOKE).collect()
    from fordgobike_data_pipeline_spark.io import load_tables

    docs = load_tables(spark, SF_SMOKE, ("documents",))["documents"]
    expected = docs.filter(F.col("doc_id") % 20 == 0).count()
    planted = {
        (r.id_a, r.id_b)
        for r in rows
        if r.hamming == 0 and r.id_b - 1_000_000_000 == r.id_a
    }
    assert len(planted) == expected
