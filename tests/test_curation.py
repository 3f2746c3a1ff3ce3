"""Semantic tests for operators/curation.py — planted-input invariants
that the DuckDB oracle parity can't express (determinism under
repartitioning, packing contiguity, redaction on crafted PII)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pii_redact_masks_all_types(spark):
    df = _docs(
        spark,
        [(1, "mail a.b-c%d@sub.example.org now, host 192.168.001.7, "
             "call +44 20 7946 0958 ok", "s")],
    )
    out = df.select(curation.pii_redact(F.col("text")).alias("t")).first().t
    assert "[EMAIL]" in out and "[IP]" in out and "[PHONE]" in out
    assert "example" not in out and "192" not in out and "7946" not in out


def test_normalize_text_idempotent(spark):
    df = _docs(spark, [(1, "  A   B\tC  ", "s")])
    once = df.select(curation.normalize_text(F.col("text")).alias("t"))
    twice = once.select(curation.normalize_text(F.col("t")).alias("t"))
    assert once.first().t == "a b c"
    assert twice.first().t == once.first().t


def test_repetition_ratio_extremes(spark):
    df = _docs(
        spark,
        [(1, "spam spam spam spam spam spam spam spam", "s"),
         (2, "one two three four five six seven eight", "s")],
    )
    rows = {r.doc_id: r for r in curation.repetition_ratio(df, n=3).collect()}
    assert rows[1].repetition_ratio > 0.8  # 6 identical trigrams
    assert rows[2].repetition_ratio == 0.0  # all trigrams distinct


def test_per_domain_cap_bounds_and_order(spark):
    rows = [(i, "x " * (i % 7 + 1), f"src{i % 3}") for i in range(60)]
    df = _docs(spark, rows).withColumn("n_chars", F.length("text"))
    capped = curation.per_domain_cap(df, cap=5)
    counts = capped.groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in counts)
    # kept docs are the longest per domain (desc by n_chars)
    kept_min = capped.groupBy("source").agg(F.min("n_chars").alias("m"))
    dropped = df.join(capped.select("doc_id"), "doc_id", "left_anti")
    worst_kept = {r.source: r.m for r in kept_min.collect()}
    for r in dropped.collect():
        assert r.n_chars <= worst_kept[r.source]


def test_decontaminate_removes_planted_overlap(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon", "bench")])
    corpus = _docs(
        spark,
        [(1, "xx alpha beta gamma delta yy", "c"),     # shares a 4-gram
         (2, "totally unrelated words here now", "c")],
    )
    clean = curation.ngram_decontaminate(corpus, bench, n=4)
    ids = {r.doc_id for r in clean.collect()}
    assert ids == {2}


def test_train_split_fractions_and_repartition_stability(spark):
    df = _docs(spark, [(i, "t", "s") for i in range(5000)])
    split = curation.train_split(df, val_frac=0.1, test_frac=0.1)
    frac = {
        r.split: r["count"] / 5000
        for r in split.groupBy("split").count().collect()
    }
    assert 0.75 < frac["train"] < 0.85
    assert 0.07 < frac["val"] < 0.13 and 0.07 < frac["test"] < 0.13
    a = set(map(tuple, split.select("doc_id", "split").collect()))
    b = set(
        map(
            tuple,
            curation.train_split(df.repartition(13), val_frac=0.1, test_frac=0.1)
            .select("doc_id", "split")
            .collect(),
        )
    )
    assert a == b


def test_pack_sequences_contiguous_streams(spark):
    df = _docs(spark, [(i, "w " * (i % 9 + 1), "s") for i in range(300)])
    packed = curation.pack_sequences(df, seq_len=32, n_buckets=4).collect()
    assert all(0 <= r.seq_pos < 32 for r in packed)
    by_bucket: dict[int, list] = {}
    for r in packed:
        by_bucket.setdefault(r.pack_bucket, []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in rows:
            assert r.seq_idx == offset // 32 and r.seq_pos == offset % 32
            offset += r.n_tok


def test_chunk_documents_covers_every_token(spark):
    """Coverage + overlap invariants: chunk i starts at i*stride, all
    chunks except the tail hold exactly chunk_tokens tokens, every
    token index lands in >=1 chunk, and reassembling stride-aligned
    prefixes reproduces the doc."""
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, "solo")], "doc_id bigint, text string"
    )
    rows = curation.chunk_documents(docs, chunk_tokens=4, stride=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.start_tok for r in c1] == [0, 2, 4, 6]
    assert [r.n_tok for r in c1] == [4, 4, 4, 4]
    assert c1[0].chunk_text == "t0 t1 t2 t3"
    assert c1[-1].chunk_text == "t6 t7 t8 t9"
    covered = set()
    for r in c1:
        covered |= set(range(r.start_tok, r.start_tok + r.n_tok))
    assert covered == set(range(10))
    # short docs -> exactly one (short) chunk
    assert [(r.chunk_idx, r.n_tok, r.chunk_text) for r in by_doc[2]] == [(0, 2, "a b")]
    assert [(r.chunk_idx, r.n_tok, r.chunk_text) for r in by_doc[3]] == [(0, 1, "solo")]


def test_chunk_documents_validates_args(spark):
    import pytest

    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        curation.chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        curation.chunk_documents(docs, stride=-1)
    with pytest.raises(ValueError):
        curation.chunk_documents(docs, chunk_tokens=4, stride=8)


def test_negative_samples_deterministic_and_valid(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id bigint, text string"
    )
    neg = curation.negative_samples(docs, k=3, n_buckets=4)
    rows = {(r.anchor_id, r.probe): r.negative_id for r in neg.collect()}
    # no self-negatives, negative ids are real docs
    for (a, _p), n in rows.items():
        assert n != a and 0 <= n < 40
    # with B=4 buckets over 40 docs every bucket is populated -> k rows/anchor
    assert len(rows) == 40 * 3
    # pure function of ids: repartitioned rerun picks identical negatives
    again = {
        (r.anchor_id, r.probe): r.negative_id
        for r in curation.negative_samples(docs.repartition(7), k=3, n_buckets=4).collect()
    }
    assert again == rows
    # probes actually diversify: most anchors see >1 distinct negative
    from collections import defaultdict

    per_anchor = defaultdict(set)
    for (a, _p), n in rows.items():
        per_anchor[a].add(n)
    assert sum(1 for s in per_anchor.values() if len(s) > 1) > 20


def test_quality_percentile_is_domain_relative(spark):
    """A mediocre doc in a weak domain must outrank (in percentile) a
    better doc stuck in a strong domain — the property a global cutoff
    lacks; and percentiles span [0, 1] within every domain."""
    from fordgobike_data_pipeline_spark.operators import text

    rows = [
        # strong domain: qualities cluster high
        (1, "a", "one two three four five six seven eight nine ten " * 8),
        (2, "a", "alpha beta gamma delta epsilon zeta eta theta " * 9),
        (3, "a", "long form prose with many reasonable tokens here " * 10),
        # weak domain: short/junky docs, one mediocre standout
        (4, "b", "!!!"),
        (5, "b", "?? ?? ??"),
        (6, "b", "a plain middling sentence of ordinary words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    q = text.quality_score(docs)
    out = {
        r.doc_id: r
        for r in curation.quality_percentile_by_domain(docs, q).collect()
    }
    quals = {i: out[i].quality for i in out}
    # doc 6 is globally mediocre but tops its weak domain
    assert quals[6] < max(quals[1], quals[2], quals[3])
    assert out[6].quality_pctile == 1.0
    for dom in ("a", "b"):
        ps = [r.quality_pctile for r in out.values() if r.source == dom]
        assert min(ps) == 0.0 and max(ps) == 1.0


def test_remove_boilerplate_lines_planted(spark):
    """The cookie-banner line planted in every doc is stripped; unique
    content survives in original order; an all-boilerplate doc vanishes."""
    banner = "accept all cookies to continue"
    rows = [
        (1, f"{banner}. real content one. more real text"),
        (2, f"unique opener. {banner}. real content two"),
        (3, f"{banner}"),
        (4, f"standalone doc with its own words. {banner}. closing thought"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in curation.remove_boilerplate_lines(docs, max_line_freq=2).collect()}
    assert out[1].clean_text == "real content one. more real text"
    assert out[2].clean_text == "unique opener. real content two"
    assert 3 not in out  # all lines were boilerplate
    assert out[4].clean_text == "standalone doc with its own words. closing thought"
    assert out[4].n_lines_kept == 2
    # below the frequency bar nothing is touched
    untouched = {
        r.doc_id: r.clean_text
        for r in curation.remove_boilerplate_lines(docs, max_line_freq=10).collect()
    }
    assert untouched[1] == rows[0][1]


def test_quality_percentile_matches_sql_semantics_and_avoids_window_sort(spark):
    """(a) Tie-sharing percent_rank parity: the count-decomposed
    computation must equal percent_rank() OVER (PARTITION BY domain
    ORDER BY quality) computed independently; ties share a percentile.
    (b) Plan shape: no percent_rank / no corpus-row window sort — the
    only Window sits above the per-(domain, quality) aggregate, so a
    domain holding 50% of the corpus never serializes onto one task."""
    from fordgobike_data_pipeline_spark.operators import text

    rows = [
        (i, "big" if i % 10 else "small", f"some words repeated here {'x ' * (i % 7)}")
        for i in range(1, 101)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    q = text.quality_score(docs)
    out = curation.quality_percentile_by_domain(docs, q)
    got = {r.doc_id: (r.source, r.quality, r.quality_pctile) for r in out.collect()}

    # independent reference: python percent_rank with tie-sharing
    from collections import defaultdict

    by_dom = defaultdict(list)
    for _id, (dom, qual, _p) in got.items():
        by_dom[dom].append(qual)
    for _id, (dom, qual, p) in got.items():
        vals = by_dom[dom]
        n = len(vals)
        want = 0.0 if n == 1 else sum(1 for v in vals if v < qual) / (n - 1)
        assert abs(p - round(want, 6)) < 1e-9, (_id, p, want)
    # ties share the percentile
    tied = defaultdict(set)
    for _id, (dom, qual, p) in got.items():
        tied[(dom, qual)].add(p)
    assert all(len(ps) == 1 for ps in tied.values())

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percent_rank" not in plan, plan
    # the Window operator consumes the aggregate, not corpus rows:
    # its subtree must contain the (domain, quality) HashAggregate
    win_at = plan.find("Window")
    assert win_at != -1 and "HashAggregate" in plan[win_at:], plan


def test_remove_boilerplate_joins_on_hash_without_forced_broadcast(spark):
    """The hot-line anti-join must key on xxhash64(line) (8-byte keys,
    no line text through the shuffle) and must NOT carry a broadcast
    hint — the df>threshold line set grows with the corpus, so the
    plan has to let AQE decide (forced broadcast OOMs at 100x)."""
    docs = spark.createDataFrame(
        [(i, f"shared banner. unique line {i}") for i in range(1, 30)],
        "doc_id bigint, text string",
    )
    out = curation.remove_boilerplate_lines(docs, max_line_freq=2)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized, optimized
    assert "xxhash64" in optimized
    # the anti join's condition is on the hash column, not the line text
    import re

    anti = [ln for ln in optimized.splitlines() if "LeftAnti" in ln]
    assert anti and all(re.search(r"_lh#\d+L? = ", ln) for ln in anti), anti


def test_domain_mixture_sample_hits_target_mix(spark):
    """The binding domain (largest tokens/weight deficit) is kept
    whole; others downsample so realized token shares track the target
    weights; unlisted domains are dropped; selection is a pure function
    of ids (repartition-stable)."""
    import random

    rng = random.Random(7)
    rows = []
    # src a: ~10k tokens, b: ~10k, c: ~2k (c is binding for weight 0.5)
    for i in range(200):
        rows.append((i, "a", "tok " * rng.randint(30, 70)))
        rows.append((1000 + i, "b", "tok " * rng.randint(30, 70)))
    for i in range(40):
        rows.append((2000 + i, "c", "tok " * rng.randint(30, 70)))
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = curation.domain_mixture_sample(
        docs, {"a": 0.25, "b": 0.25, "c": 0.5}
    )
    sel = {r.doc_id: r.source for r in out.collect()}
    # c binds (2k tokens / 0.5 weight << 10k / 0.25): kept whole
    c_ids = {i for i in sel if sel[i] == "c"}
    assert len(c_ids) == 40
    # a and b downsample to ~ w*S/T = 0.25*4000/10000 = ~10% of docs
    n_a = sum(1 for s in sel.values() if s == "a")
    n_b = sum(1 for s in sel.values() if s == "b")
    assert 5 <= n_a <= 40 and 5 <= n_b <= 40  # ~20 each, loose hash bounds
    # realized token mix tracks the target: c has ~2x a's tokens
    toks = {
        r.source: r.t
        for r in docs.join(out.select("doc_id"), "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.expr("sum(size(split(text, ' ')))").alias("t"))
        .collect()
    }
    assert 1.2 < toks["c"] / toks["a"] < 3.5
    # unlisted domain dropped entirely
    out2 = curation.domain_mixture_sample(docs, {"a": 1.0})
    assert {r.source for r in out2.collect()} == {"a"}
    # deterministic under repartitioning
    again = {
        r.doc_id
        for r in curation.domain_mixture_sample(
            docs.repartition(13), {"a": 0.25, "b": 0.25, "c": 0.5}
        ).collect()
    }
    assert again == set(sel)


def test_canonical_url_rules(spark):
    """Each canonicalization rule, pinned: case, www., default vs
    non-default ports, fragments, tracking params, param order,
    trailing slashes — and what must NOT change (path case, real
    params, non-default ports)."""
    from fordgobike_data_pipeline_spark.operators.curation import canonical_url

    cases = [
        ("HTTPS://WWW.Example.COM:443/A/B/?b=2&utm_source=x&a=1#frag",
         "https://example.com/A/B?a=1&b=2"),
        ("http://example.com:80/", "http://example.com"),
        ("http://example.com:8080/path", "http://example.com:8080/path"),
        ("https://sub.www-site.org/Path/?ref=tw&gclid=123&fbclid=9",
         "https://sub.www-site.org/Path"),
        ("https://example.com/search?q=Hello&lang=en",
         "https://example.com/search?lang=en&q=Hello"),
        ("  https://example.com/x  ", "https://example.com/x"),
        # no scheme: pass through trimmed, never mangled into '://...'
        ("not a url at all", "not a url at all"),
        ("  /relative/path?x=1  ", "/relative/path?x=1"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], ["i", "url"])
    got = {r.i: r.c for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_url_dedup_collapses_variants(spark):
    """All surface variants of one logical page collapse to a single
    canonical survivor with the right copy count."""
    from fordgobike_data_pipeline_spark.operators.curation import url_dedup

    df = spark.createDataFrame(
        [
            (1, "https://www.shop.com/item/5?utm_campaign=x"),
            (2, "HTTPS://SHOP.COM:443/item/5/"),
            (3, "https://shop.com/item/5#reviews"),
            (4, "https://shop.com/item/6"),
        ],
        ["doc_id", "url"],
    )
    got = {r.canonical_url: (r.keep_id, r.n_copies) for r in url_dedup(df).collect()}
    assert got["https://shop.com/item/5"] == (1, 3)
    assert got["https://shop.com/item/6"] == (4, 1)


def test_strip_html_rules(spark):
    """Script/style CONTENT is dropped (not just the tags), comments
    and tags go, entities decode with &amp; last, whitespace collapses."""
    from fordgobike_data_pipeline_spark.operators.curation import strip_html

    cases = [
        ("<p>Hello <b>world</b></p>", "Hello world"),
        ("<script>var a = '<p>sneaky</p>';</script>after", "after"),
        ("<STYLE type='x'>p { color: red }</STYLE>text", "text"),
        ("<!-- secret -->visible", "visible"),
        ("a &amp;lt; b &lt; c &quot;d&quot; &#39;e&#39;&nbsp;f", "a &lt; b < c \"d\" 'e' f"),
        ("  lots\n\n of \t space  ", "lots of space"),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)], ["i", "html"])
    got = {r.i: r.c for r in df.select("i", strip_html(F.col("html")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_pack_token_ids_stream_continuity(spark):
    """Per bucket, concatenating the packed sequences in seq order
    must reproduce the bucket's doc-id-ordered token stream exactly;
    every sequence except the bucket's last is exactly seq_len; with
    pad_id the final sequence pads to seq_len while n_ids keeps the
    real count."""
    from fordgobike_data_pipeline_spark.operators.curation import (
        _hash_bucket, pack_token_ids,
    )

    docs = spark.createDataFrame(
        [(i, list(range(i * 100, i * 100 + 3 + (i % 4)))) for i in range(1, 40)],
        "doc_id LONG, token_ids ARRAY<INT>",
    )
    packed = pack_token_ids(docs, seq_len=7, n_buckets=4).collect()
    buckets = {r.doc_id: r.b for r in docs.select(
        "doc_id", _hash_bucket(F.col("doc_id"), 4).alias("b")).collect()}
    want_streams = {}
    for r in sorted(docs.collect(), key=lambda r: r.doc_id):
        want_streams.setdefault(buckets[r.doc_id], []).extend(r.token_ids)
    got_streams = {}
    by_bucket = {}
    for r in packed:
        by_bucket.setdefault(r.pack_bucket, []).append(r)
    for b, rows in by_bucket.items():
        rows.sort(key=lambda r: r.seq_idx)
        for i, r in enumerate(rows):
            assert r.n_ids == len(r.ids)
            if i < len(rows) - 1:
                assert r.n_ids == 7, r
        got_streams[b] = [x for r in rows for x in r.ids]
    assert got_streams == want_streams

    padded = pack_token_ids(docs, seq_len=7, n_buckets=4, pad_id=-1).collect()
    for r in padded:
        assert len(r.ids) == 7
        assert all(x == -1 for x in r.ids[r.n_ids:])

    # doc_starts: reconstruct boundaries from the per-bucket streams —
    # every doc's first token position within its sequence is listed,
    # sorted, nothing else
    starts_want = {}
    offsets = {}
    for r in sorted(docs.collect(), key=lambda r: r.doc_id):
        b = buckets[r.doc_id]
        off = offsets.get(b, 0)
        starts_want.setdefault((b, off // 7), []).append(off % 7)
        offsets[b] = off + len(r.token_ids)
    got_starts = {
        (r.pack_bucket, r.seq_idx): list(r.doc_starts) for r in packed
    }
    for key, want in starts_want.items():
        assert got_starts[key] == sorted(want), (key, got_starts[key], want)
    for key, got in got_starts.items():
        assert got == sorted(starts_want.get(key, [])), key


def test_flatten_conversations_ordering(spark):
    """Turns reassemble in (ts, id) order whatever the input order;
    ties on ts break by id; single-turn conversations pass through."""
    from datetime import datetime

    from fordgobike_data_pipeline_spark.operators.curation import flatten_conversations

    t = datetime(2024, 1, 1, 12, 0, 0)
    t2 = datetime(2024, 1, 1, 12, 5, 0)
    rows = [
        (1, t2, 3, "assistant: reply"),
        (1, t, 2, "user: question"),
        (1, t, 1, "system: setup"),   # same ts as id 2 — id breaks the tie
        (2, t, 9, "user: solo"),
    ]
    df = spark.createDataFrame(rows, "conv LONG, ts TIMESTAMP, turn_id LONG, line STRING")
    got = {
        r.conv_id: r
        for r in flatten_conversations(df, "conv", "ts", "line", "turn_id").collect()
    }
    assert got[1].n_turns == 3
    assert got[1].transcript == "system: setup\nuser: question\nassistant: reply"
    assert got[2].transcript == "user: solo"


def test_dup_weight_downweights_exact_groups(spark):
    from fordgobike_data_pipeline_spark.operators import dedup

    rows = [
        (1, "alpha beta"),
        (2, "alpha beta"),
        (3, "alpha beta"),
        (4, "unique text"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in dedup.dup_weight(df, ["text"]).collect()}
    assert len(out) == 4  # every row KEPT (weights, not drops)
    for i in (1, 2, 3):
        assert out[i]["n_copies"] == 3 and out[i]["weight"] == pytest.approx(1 / 3)
    assert out[4]["n_copies"] == 1 and out[4]["weight"] == 1.0
    # group weights sum to one doc's worth of gradient
    assert sum(out[i]["weight"] for i in (1, 2, 3)) == pytest.approx(1.0)


def test_dup_weight_multicolumn_separator(spark):
    from fordgobike_data_pipeline_spark.operators import dedup

    # ("ab","c") must not collide with ("a","bc")
    df = spark.createDataFrame(
        [(1, "ab", "c"), (2, "a", "bc")], "doc_id bigint, a string, b string"
    )
    out = dedup.dup_weight(df, ["a", "b"]).collect()
    assert all(r["n_copies"] == 1 for r in out)
