"""Wave-42 operators: code-vs-prose routing profile and the
encoding-artifact census — planted-value tests pinning hand-computed
answers (the harness keys inject their artifact surfaces; here the
operators see pre-built planted docs)."""

from __future__ import annotations

from fordgobike_data_pipeline_spark.operators import quality, text


def test_code_profile_planted(spark):
    code = "x = 1\ndef f(a):\n    return a\n    import os"
    prose = "the class was long and the prose flowed"
    docs = spark.createDataFrame(
        [(1, code, "s1"), (2, prose, "s1"), (3, "plain words here", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in text.code_prose_profile(docs).collect()}
    # doc1: keywords def/return/import (3 >= 2) AND 2 indented lines
    assert out["s1"].n_docs == 2 and out["s1"].n_code == 1
    # doc2 mentions 'class' once — the structural AND must NOT flip it
    assert out["s2"].n_code == 0
    # doc1: 4 lines, 2 indented; doc2: 1 line, 0 indented -> mean 0.25
    assert abs(out["s1"].avg_indent_frac - 0.25) < 1e-6
    # prose has zero symbol chars from the {}();=<>[] class except doc1's
    # '=' '(' ')' ':' — spot the symbol ratio is positive for s1, 0 for s2
    assert out["s1"].avg_symbol_ratio > 0 and out["s2"].avg_symbol_ratio == 0.0


def test_code_profile_keyword_only_not_code(spark):
    # many keywords but NO indentation -> prose (e.g. a tutorial text)
    docs = spark.createDataFrame(
        [(1, "def return import class talk", "s1")],
        "doc_id long, text string, source string",
    )
    r = text.code_prose_profile(docs).collect()[0]
    assert r.n_code == 0


def test_encoding_census_planted(spark):
    clean = "plain ascii"
    mojibake = "bad �� decode"
    ctrl = "bell" + chr(7) + "here"
    accent = "café au lait"
    docs = spark.createDataFrame(
        [
            (1, clean, "s1"),
            (2, mojibake, "s1"),
            (3, ctrl, "s2"),
            (4, accent, "s2"),
            (5, "", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in quality.encoding_census(docs).collect()}
    assert out["s1"].n_docs == 2 and out["s1"].n_docs_repl == 1
    assert out["s1"].n_repl_chars == 2 and out["s1"].n_ctrl_chars == 0
    # U+FFFD is also non-ascii
    assert out["s1"].n_nonascii_chars == 2
    assert out["s2"].n_docs_ctrl == 1 and out["s2"].n_ctrl_chars == 1
    assert out["s2"].n_nonascii_chars == 1  # the e-acute
    # empty doc: counted, but excluded from the ascii-ratio mean
    assert out["s3"].n_docs == 1 and out["s3"].avg_ascii_ratio is None
    # s1 ratios: clean 1.0, mojibake 11/13 ("bad �� decode" = 13 chars)
    want = (1.0 + 11 / 13) / 2
    assert abs(out["s1"].avg_ascii_ratio - round(want, 6)) < 1e-9
