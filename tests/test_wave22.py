"""Wave-22 operators: calibration (ECE), CCNet perplexity buckets,
the analytic LSH S-curve, and T5-style span-corruption masks —
planted-value tests pinning hand-computed answers."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import curation, dedup, quality


def test_ece_calibration_hand_computed(spark):
    # bin 2: 4 rows at score .25, one positive  -> acc = conf = .25, gap 0
    # bin 9: 2 rows at score .95, no positives  -> acc 0, conf .95
    rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0), (0.95, 0), (0.95, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r.bin: r for r in quality.ece_calibration(df, "score", "label").collect()}
    assert set(out) == {2, 9}
    assert out[2].n_rows == 4 and out[2].n_pos == 1
    assert out[2].acc == 0.25 and out[2].conf == 0.25
    assert out[9].acc == 0.0 and out[9].conf == 0.95
    # ece = (|1e6*1 - 4*250000| + |0 - 2*950000|) / (6 * 1e6)
    want = 1_900_000 / 6_000_000
    assert out[2].ece == want and out[9].ece == want


def test_ece_score_one_lands_in_top_bin(spark):
    df = spark.createDataFrame([(1.0, 1)], "score double, label int")
    out = quality.ece_calibration(df, "score", "label").collect()
    assert len(out) == 1 and out[0].bin == 9
    assert out[0].ece == 0.0  # conf 1.0 == acc 1.0


def test_perplexity_buckets_thirds_and_ordering(spark):
    # 9 docs. Under the self-fit MLE bigram model, entropy comes from
    # a frequent first-word fanning out to MANY continuations: the
    # head docs' transitions are fully determined (ce 0), the middle
    # docs share 'm' across 9 different continuations (lp log2(1/9)),
    # the tail docs share 't' across 12 (log2(1/12)) at higher weight.
    rows = []
    for i in range(3):
        rows.append((i, "p q p q p q p q"))  # deterministic transitions
    for i in range(3, 6):
        rows.append((i, f"m a{i} m b{i} m c{i}"))
    for i in range(6, 9):
        rows.append((i, f"t d{i} t e{i} t f{i} t g{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.bucket: r for r in curation.perplexity_buckets(docs).collect()}
    assert set(out) == {"head", "middle", "tail"}
    assert sum(r.n_docs for r in out.values()) == 9
    assert out["head"].ce_hi <= out["middle"].ce_lo
    assert out["middle"].ce_hi <= out["tail"].ce_lo
    assert out["head"].n_docs >= 3  # ties bucket downward


def test_lsh_scurve_matches_python_chain_and_shape(spark):
    out = {r.s: r.p_candidate for r in dedup.lsh_scurve(spark, 4, 16, 20).collect()}
    assert len(out) == 19

    def chain(x, e):
        if e == 1:
            return x
        h = chain(x, e // 2)
        sq = h * h
        return sq * x if e % 2 else sq

    for i in (1, 10, 16, 19):
        s = i / 20.0
        want = 1.0 - chain(1.0 - chain(s, 4), 16)
        assert out[s] == want  # bit-identical, not approx
    # S-shape: negligible at low s, saturated at the 0.8 threshold
    assert out[0.25] < 0.07
    assert out[0.5] > 0.6
    assert out[0.8] > 0.999
    ss = sorted(out)
    assert all(out[a] <= out[b] for a, b in zip(ss, ss[1:]))


def _mask_positions(doc_id: int, n_tokens: int, pct: int = 15) -> set[int]:
    """The operator's md5 draw, recomputed independently."""
    masked = set()
    for pos in range(n_tokens):
        h = int(hashlib.md5(f"{doc_id}:{pos}".encode()).hexdigest()[:16], 16)
        if h >= 1 << 63:
            h -= 1 << 64  # signed 64-bit
        if h % 100 < pct if h >= 0 else ((h % 100) + 100) % 100 < pct:
            masked.add(pos)
    return masked


def test_span_corruption_spans_match_independent_hash(spark):
    n_tok = 200
    text = " ".join(f"t{i}" for i in range(n_tok))
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    out = curation.span_corruption_spans(docs).collect()
    want_masked = _mask_positions(7, n_tok)
    got_masked = set()
    for r in out:
        assert r.span_len == r.end_pos - r.start_pos + 1
        got_masked.update(range(r.start_pos, r.end_pos + 1))
    assert got_masked == want_masked
    # spans are maximal runs: neighbours of each span are unmasked
    for r in out:
        assert r.start_pos - 1 not in want_masked
        assert r.end_pos + 1 not in want_masked
    # sentinel ids are 1..k in start order
    sids = [r.sentinel_id for r in sorted(out, key=lambda r: r.start_pos)]
    assert sids == list(range(1, len(out) + 1))
    # ~15% mask rate, loosely
    assert 0.05 < len(want_masked) / n_tok < 0.30


def test_span_corruption_rejects_bad_rate(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError):
        curation.span_corruption_spans(docs, mask_pct=0)
