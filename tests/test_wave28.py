"""Wave-28 operators: DSIR weights, packing efficiency, stratified
sample, snapshot churn, signature resemblance, distinct-n, filter
interaction, l-diversity — planted-value tests."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import curation, dedup, quality, text


def _md5_long(s: str) -> int:
    """conv(substring(md5(x),1,16),16,-10) — first 8 md5 bytes as a
    SIGNED 64-bit int (the repo's surrogate-key construction)."""
    v = int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
    return v - (1 << 64) if v >= (1 << 63) else v


def _bucket(s: str, m: int) -> int:
    return _md5_long(s) % m  # python % is pmod for positive m


DOCS_SCHEMA = "doc_id long, text string, source string"


def test_dsir_weights_planted(spark):
    # target has only "a b"; raw doc 10 repeats it, doc 11 is novel
    target = spark.createDataFrame([(0, "a b", "t")], DOCS_SCHEMA)
    raw = spark.createDataFrame(
        [(10, "a b", "r"), (11, "c d", "r")], DOCS_SCHEMA
    )
    out = {r.doc_id: r for r in curation.dsir_weights(raw, target, n_buckets=4096).collect()}
    assert out[10].n_grams == 1 and out[11].n_grams == 1
    # expected per-bucket log-ratios, replicated exactly (T=1, R=2, B=4096)
    B = 4096

    def lr(tc, rc, T=1, R=2):
        return round(
            1e6 * (math.log(tc + 1) - math.log(T + B) - math.log(rc + 1) + math.log(R + B))
        )

    assert out[10].dsir_int == lr(1, 1)
    assert out[11].dsir_int == lr(0, 1)
    assert out[10].dsir_int > 0 > out[11].dsir_int
    assert abs(out[10].dsir_avg - out[10].dsir_int / 1e6) < 1e-12


def test_dsir_weights_short_docs_drop(spark):
    target = spark.createDataFrame([(0, "a b", "t")], DOCS_SCHEMA)
    raw = spark.createDataFrame([(1, "solo", "r"), (2, "a b", "r")], DOCS_SCHEMA)
    ids = {r.doc_id for r in curation.dsir_weights(raw, target).collect()}
    assert ids == {2}  # the 1-token doc has no bigrams


def test_packing_efficiency_single_stream(spark):
    # n_buckets=1 -> one stream; 7+5+4=16 tokens, seq_len 6 -> 3 seqs, 2 pad
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 7), "s"), (2, " ".join(["w"] * 5), "s"),
         (3, " ".join(["w"] * 4), "s")],
        DOCS_SCHEMA,
    )
    r = curation.packing_efficiency(docs, seq_len=6, n_buckets=1).collect()[0]
    assert (r.n_streams, r.n_sequences, r.n_tokens, r.n_padding) == (1, 3, 16, 2)
    assert abs(r.utilization - 16 / 18) < 1e-12


def test_packing_efficiency_rejects_bad_seq_len(spark):
    docs = spark.createDataFrame([(1, "a b", "s")], DOCS_SCHEMA)
    try:
        curation.packing_efficiency(docs, seq_len=0)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_stratified_sample_exact_allocation(spark):
    # stratum A: 10 docs -> ceil(10*10/100)=1 kept; B: 3 docs -> 1 kept
    rows = [(i, f"doc {i}", "A") for i in range(10)] + [
        (100 + i, f"doc {100+i}", "B") for i in range(3)
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = curation.stratified_sample(docs, pct=10, strata_col="source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert {s: len(v) for s, v in by_src.items()} == {"A": 1, "B": 1}
    # the kept doc is the min by (md5 hash, id) within its stratum
    exp_a = min(range(10), key=lambda i: (_md5_long(str(i)), i))
    exp_b = min(range(100, 103), key=lambda i: (_md5_long(str(i)), i))
    assert by_src["A"][0].doc_id == exp_a and by_src["A"][0].stratum_rank == 1
    assert by_src["B"][0].doc_id == exp_b


def test_snapshot_churn_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same", "s"), (2, "edited", "s"), (3, "gone", "s")], DOCS_SCHEMA
    )
    new = spark.createDataFrame(
        [(1, "same", "s"), (2, "edited v2", "s"), (4, "fresh", "s")], DOCS_SCHEMA
    )
    out = {r.status: r.n_docs for r in curation.snapshot_churn(old, new).collect()}
    assert out == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_signature_resemblance_identical_is_one(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta", "s") for i in range(4)], DOCS_SCHEMA
    )
    sh = dedup.token_shingles(docs, k=3)
    r = dedup.signature_resemblance(sh, sh, n_hashes=64).collect()[0]
    assert (r.n_hashes, r.n_agree, r.resemblance) == (64, 64, 1.0)


def test_signature_resemblance_matches_python_replica(spark):
    a = spark.createDataFrame(
        [(0, "a b c d", "s"), (1, "e f g h", "s")], DOCS_SCHEMA
    )
    b = spark.createDataFrame(
        [(2, "a b c d", "s"), (3, "x y z w", "s")], DOCS_SCHEMA
    )

    def shingles(texts):
        out = set()
        for t in texts:
            toks = t.split(" ")
            n = max(len(toks) - 3, 0) + 1
            for i in range(n):
                out.add(" ".join(toks[i : i + 3]))
        return out

    def mins(sh):
        # python % on a positive modulus == Spark pmod, and the signed
        # fold (v - 2^64) is a multiple of 2^32 away — same residue
        m = [None] * 8
        for s in sh:
            h1 = _md5_long(s) % (1 << 32)
            h2 = (int(hashlib.md5(s.encode()).hexdigest()[16:32], 16) % (1 << 32)) | 1
            for i in range(8):
                v = h1 + i * h2
                if m[i] is None or v < m[i]:
                    m[i] = v
        return m

    ma = mins(shingles(["a b c d", "e f g h"]))
    mb = mins(shingles(["a b c d", "x y z w"]))
    exp = sum(1 for x, y in zip(ma, mb) if x == y)
    sh_a = dedup.token_shingles(a, k=3)
    sh_b = dedup.token_shingles(b, k=3)
    r = dedup.signature_resemblance(sh_a, sh_b, n_hashes=8).collect()[0]
    assert r.n_agree == exp
    assert abs(r.resemblance - exp / 8) < 1e-12


def test_distinct_ngrams_planted(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "a b c a b c", "s1"), (3, "q r", "s2")],
        DOCS_SCHEMA,
    )
    out = {r.source: r for r in text.distinct_ngrams(docs, n=3, by="source").collect()}
    # s1: doc1 grams {a b c, b c d}; doc2 grams {a b c, b c a, c a b, a b c}
    assert out["s1"].n_grams == 6 and out["s1"].n_distinct == 4
    assert abs(out["s1"].distinct_ratio - 4 / 6) < 1e-12
    assert "s2" not in out  # < 3 tokens contributes nothing


def test_filter_interaction_cube_rows(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 60), "en"),   # 119 chars, 60 toks: f_long=0 f_en=1 f_tok=1
            (2, " ".join(["word"] * 50), "fr"),  # 249 chars, 50 toks: f_long=1 f_en=0 f_tok=1
        ],
        "doc_id long, text string, lang string",
    )
    rows = quality.filter_interaction(docs, min_chars=200, min_tokens=50).collect()
    # grouping-set row count: full 2 + three pairs 2+2+2 + singles
    # 2+2+1 (both docs share f_tok=1) + grand total 1
    assert len(rows) == 14
    # grand total row (all NULL flags)
    gt = [r for r in rows if r.f_long is None and r.f_en is None and r.f_tok is None]
    assert len(gt) == 1 and gt[0].n_docs == 2 and gt[0].n_tokens == 110
    # fully-specified rows: one per distinct flag tuple
    full = {(r.f_long, r.f_en, r.f_tok): r.n_docs
            for r in rows if None not in (r.f_long, r.f_en, r.f_tok)}
    assert full == {(0, 1, 1): 1, (1, 0, 1): 1}


def test_l_diversity_harness_rows_are_low_diversity(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    rows = qs["q_l_diversity"](spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        assert r.l_distinct < 3 and r.group_size >= 1
