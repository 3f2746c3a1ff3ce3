"""Harness entries for the corpus-curation operators
(operators/curation.py): normalization, PII redaction, repetition
scoring, domain quotas, benchmark decontamination, deterministic
splits, and sequence packing — each a `queries()` key over the
documents table with a DuckDB oracle (all are SQL-expressible).

Type-pinning rule (driver value-hash is type-sensitive): every integer
column is cast to BIGINT on both sides; Spark `size`/`length` (INT)
are widened with .cast("long"), DuckDB `len()` is already BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .harness import query
from .io import load_tables
from .operators import bpe, curation, dedup

# The md5 hash-bucket in DuckDB terms (same construction as
# q_deterministic_sample / q_hash_key — bit-exact vs Spark's
# conv(substring(md5(x),1,16),16,-10) pmod M).
_DUCK_BUCKET = (
    "((CAST(CAST(from_hex(substr(md5(CAST({key} AS VARCHAR)), 1, 16)) AS BIT)"
    " AS BIGINT) % {m}) + {m}) % {m}"
)


@query(
    "q_normalize_text",
    """
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN upper(text)
                    ELSE text || '   padded  tail ' END AS messy
        FROM documents
    )
    SELECT doc_id, trim(regexp_replace(lower(messy), '\\s+', ' ', 'g')) AS norm_text
    FROM raw
    """,
)
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase + whitespace collapse +
    trim). The testdata is already clean, so the query deterministically
    mangles half the rows first to prove the normalization acts."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    messy = F.when(
        F.col("doc_id") % 2 == 0, F.upper(F.col("text"))
    ).otherwise(F.concat(F.col("text"), F.lit("   padded  tail ")))
    return docs.select(
        "doc_id", curation.normalize_text(messy).alias("norm_text")
    )


@query(
    "q_pii_redact",
    """
    WITH raw AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.7 tel +1 415 555 01' || CAST(doc_id % 10 AS VARCHAR)
                    || CAST(doc_id % 10 AS VARCHAR) AS t
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                   '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}', '[IP]', 'g'),
               '\\+\\d[\\d -]{7,}\\d', '[PHONE]', 'g') AS redacted
    FROM raw
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking (emails / IPv4 / intl phone → typed tokens). The
    corpus has no real PII, so each row gets a deterministic synthetic
    contact line appended — the redaction must strip all of it."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail.example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel +1 415 555 01"),
        (F.col("doc_id") % 10).cast("string"),
        (F.col("doc_id") % 10).cast("string"),
    )
    return docs.select("doc_id", curation.pii_redact(t).alias("redacted"))


@query(
    "q_repetition_ratio",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, greatest(len(w) - 2, 1)),
                   i -> array_to_string(w[i:i+2], ' ')
               ) AS grams
        FROM tok
    )
    SELECT doc_id,
           len(grams) AS n_grams,
           round(1 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 6)
               AS repetition_ratio
    FROM g
    """,
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-doc duplicated-trigram fraction — the boilerplate/spam
    quality signal. Pure array expressions, zero shuffles."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    rep = curation.repetition_ratio(docs, n=3)
    return rep.select(
        "doc_id", F.col("n_grams").cast("long").alias("n_grams"), "repetition_ratio"
    )


@query(
    "q_domain_cap",
    """
    WITH r AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, source, n_chars FROM r WHERE rn <= 10
    """,
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota: top-10 docs per source by length — corpus-mix
    control so no crawl domain dominates. One window on the domain key."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    capped = curation.per_domain_cap(docs, cap=10)
    return capped.select("doc_id", "source", "n_chars")


@query(
    "q_decontaminate",
    """
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT doc_id, source, array_to_string(w[i:i+3], ' ') AS g
        FROM tok, unnest(generate_series(1, greatest(len(w) - 3, 1))) AS t(i)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
    bad AS (
        SELECT DISTINCT doc_id FROM grams
        WHERE source <> 'src0' AND g IN (SELECT g FROM bench)
    )
    SELECT doc_id, source FROM documents
    WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM bad)
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop corpus docs sharing any token
    4-gram with the held-out set (source src0 stands in for the eval
    suite). Semi-join on the gram key + anti-join on contaminated ids —
    no all-pairs product."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    clean = curation.ngram_decontaminate(corpus, bench, n=4)
    return clean.select("doc_id", "source")


@query(
    "q_train_split",
    f"""
    WITH h AS (
        SELECT doc_id,
               {_DUCK_BUCKET.format(key="doc_id", m=1000000)} AS b
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN b < 100000 THEN 'test'
                WHEN b < 200000 THEN 'val'
                ELSE 'train' END AS split
    FROM h
    """,
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split — label is a pure
    function of the id hash, so any engine/partitioning reproduces it
    and incremental docs self-assign."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.train_split(docs, val_frac=0.1, test_frac=0.1).select(
        "doc_id", "split"
    )


@query(
    "q_remove_boilerplate",
    """
    WITH w AS (SELECT doc_id, string_split(text, '. ') AS ls FROM documents),
    lines AS (
        SELECT doc_id, generate_subscripts(ls, 1) - 1 AS pos, unnest(ls) AS ln
        FROM w
    ),
    hot AS (
        SELECT ln FROM lines GROUP BY ln HAVING count(DISTINCT doc_id) > 2
    ),
    kept AS (SELECT * FROM lines ANTI JOIN hot USING (ln))
    SELECT doc_id,
           string_agg(ln, '. ' ORDER BY pos) AS clean_text,
           count(*) AS n_lines_kept
    FROM kept GROUP BY doc_id
    """,
)
def q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate line removal: drop sentences occurring in
    >2 docs corpus-wide (broadcast anti-join of the hot-line set),
    rebuild docs in original order. Docs whose every line is
    boilerplate vanish from the output on both sides."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.remove_boilerplate_lines(docs, max_line_freq=2)


@query(
    "q_negative_samples",
    f"""
    WITH params AS (SELECT greatest(64, count(*) // 20) AS b FROM documents),
    cand AS (
        SELECT doc_id AS cand_id,
               {_DUCK_BUCKET.format(key="doc_id", m="(SELECT b FROM params)")} AS bucket
        FROM documents
    ),
    probes AS (
        SELECT doc_id AS anchor_id, i AS probe,
               {_DUCK_BUCKET.format(key="concat(doc_id, ':', i)", m="(SELECT b FROM params)")} AS bucket
        FROM documents, unnest(range(4)) AS t(i)
    ),
    j AS (
        SELECT anchor_id, probe, cand_id,
               md5(concat(anchor_id, '#', probe, '#', cand_id)) AS pick
        FROM probes JOIN cand USING (bucket)
        WHERE cand_id <> anchor_id
    )
    SELECT anchor_id, CAST(probe AS INT) AS probe,
           arg_min(cand_id, pick) AS negative_id
    FROM j GROUP BY anchor_id, probe
    """,
)
def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative mining: 4 pseudo-random
    negatives per anchor via md5 bucket probes + md5-argmin pick — a
    pure function of ids (no rand()), so the oracle reproduces the
    selection bit-exactly and the probe join stays bucket-bounded.

    The bucket count follows the operator's own scaling rule
    (B = |docs|/s with per-bucket size s=20, floored at 64): a fixed B
    makes the probe join's intermediate |docs|·k·(|docs|/B) —
    quadratic, the anti-pattern the docstring warns about. One cheap
    count() sizes it; the oracle derives the SAME B from count(*), so
    both engines select identically at every sf."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n = docs.count()
    return curation.negative_samples(docs, k=4, n_buckets=max(64, n // 20))


@query(
    "q_chunk_docs",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (
        SELECT doc_id, toks, len(toks) AS n,
               unnest(range(CAST(ceil(greatest(len(toks) - 128, 0) / 64.0) AS BIGINT) + 1)) AS i
        FROM w
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(i * 64 AS BIGINT) AS start_tok,
           CAST(least(128, n - i * 64) AS BIGINT) AS n_tok,
           array_to_string(toks[(i*64 + 1):(i*64 + 128)], ' ') AS chunk_text
    FROM c
    """,
)
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (128-token chunks, stride 64)
    — the RAG/embedding pre-vectorization step. Zero shuffles: split
    once per doc, one posexplode over the window starts; every token
    lands in ≥1 chunk, the tail chunk is short."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.chunk_documents(docs, chunk_tokens=128, stride=64)


@query(
    "q_pack_sequences",
    f"""
    WITH t AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               {_DUCK_BUCKET.format(key="doc_id", m=8)} AS pack_bucket
        FROM documents
    ),
    o AS (
        SELECT *,
               coalesce(sum(n_tok) OVER (
                   PARTITION BY pack_bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS start_offset
        FROM t
    )
    SELECT doc_id, pack_bucket, n_tok,
           CAST(floor(start_offset / 256.0) AS BIGINT) AS seq_idx,
           CAST(start_offset % 256 AS BIGINT) AS seq_pos
    FROM o
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-then-chunk sequence packing (seq_len=256, 8 hash
    streams): each doc's start offset within its stream → sequence
    index + position, docs straddling boundaries GPT-style. One window
    per hash bucket, no global sort."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    packed = curation.pack_sequences(docs, seq_len=256, n_buckets=8)
    return packed.select(
        "doc_id",
        "pack_bucket",
        F.col("n_tok").cast("long").alias("n_tok"),
        "seq_idx",
        "seq_pos",
    )


@query(
    "q_domain_mixture",
    f"""
    WITH w(source, wt) AS (
        VALUES ('src0', CAST(0.5 AS DOUBLE)),
               ('src1', CAST(0.3 AS DOUBLE)),
               ('src2', CAST(0.2 AS DOUBLE))
    ),
    td AS (
        SELECT d.source, wt,
               CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS T
        FROM documents d JOIN w USING (source)
        GROUP BY d.source, wt
    ),
    sc AS (SELECT min(T / wt) AS S FROM td),
    rates AS (SELECT source, wt * S / T AS rate FROM td CROSS JOIN sc),
    h AS (
        SELECT doc_id, d.source, rate,
               {_DUCK_BUCKET.format(key="doc_id", m=1000000)} AS b
        FROM documents d JOIN rates USING (source)
    )
    SELECT doc_id, source FROM h WHERE b < rate * 1000000
    """,
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture resampling toward a 50/30/20 token mix of
    three domains (others dropped): the binding domain is kept whole,
    the rest downsampled by md5 hash threshold — a pure function of
    ids, bit-reproduced by the oracle. The pretraining data-mix step
    between cleaning and packing."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.domain_mixture_sample(
        docs, {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    )


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library function (unregistered from ``queries()`` in r10,
    VERDICT r9 item 2): the iterative BPE fit is not SQL-expressible,
    so the adjudicated surface is the seeded twin ``q_bpe_seeded``;
    this path stays pinned by tests/test_bpe.py.

    Real BPE token budgeting: fit 100 merges on the corpus's own
    word-frequency table (distributed count → bounded driver head →
    Python merge loop), then count each doc's exact BPE tokens via the
    memoized Arrow-batched encoder. Deterministic end-to-end (ordered
    top-N vocab, rank/lexicographic merge tiebreaks), so re-runs hash
    identically; exactness vs an independent reference implementation
    is pinned in tests/test_bpe.py."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    merges = bpe.train_bpe(docs, n_merges=100, max_vocab_words=5000)
    return bpe.bpe_token_count(docs, merges)


@query(
    "q_bpe_seeded",
    r"""
    WITH w AS (
        SELECT doc_id,
               array_to_string(regexp_extract_all(text, '\w+|[^\w\s]'), '') AS raw,
               array_to_string(list_transform(
                   regexp_extract_all(text, '\w+|[^\w\s]'),
                   x -> replace(x, 'th', chr(1))), '') AS s
        FROM documents
    ),
    alpha AS (
        SELECT ch, CAST(row_number() OVER (ORDER BY ch) - 1 AS BIGINT) AS tid
        FROM (SELECT DISTINCT unnest(string_split(raw, '')) AS ch
              FROM w WHERE raw != '')
    ),
    nc AS (SELECT count(*) AS c FROM alpha),
    x AS (
        SELECT doc_id, chs[i + 1] AS ch, i
        FROM (SELECT doc_id, chs, unnest(range(len(chs))) AS i
              FROM (SELECT doc_id, string_split(s, '') AS chs
                    FROM w WHERE s != ''))
    ),
    ids AS (
        SELECT x.doc_id, x.i,
               CASE WHEN x.ch = chr(1) THEN (SELECT c FROM nc)
                    ELSE a.tid END AS tid
        FROM x LEFT JOIN alpha a ON x.ch = a.ch
    ),
    g AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ids,
               md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY i)) AS ids_md5
        FROM ids GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(coalesce(g.n_ids, 0) AS BIGINT) AS n_ids,
           coalesce(g.ids_md5, md5('')) AS ids_md5
    FROM documents d LEFT JOIN g USING (doc_id)
    """,
)
def q_bpe_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle twin of the BPE encode path with a SEEDED merge table
    (the q_ann_ivf_seeded trick): one frozen merge ('t','h') instead
    of corpus-trained ranks, so the id stream is SQL-constructible
    while the Spark side runs the IDENTICAL production path —
    bpe_vocab's distributed alphabet build, bpe_encode_ids' memoized
    Arrow-batched encoder with its rank-driven merge loop, and the
    symbol→id closure map. 'th' cannot self-overlap (t≠h), so the
    greedy leftmost-lowest-rank merge is bit-equal to per-word
    replace(word,'th',sentinel); the oracle maps the sentinel to id
    |alphabet| (= bpe_vocab's id for merge rank 0). Each doc is
    adjudicated by its id-array md5 + length (arrays stay atomic for
    the driver's hasher, same convention as q_pack_ids)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    merges = [("t", "h")]  # frozen seed — exercises a real merge
    vocab = bpe.bpe_vocab(docs, merges)
    enc = bpe.bpe_encode_ids(docs, merges, vocab)
    return enc.select(
        "doc_id",
        F.size("token_ids").cast("long").alias("n_ids"),
        F.md5(
            F.concat_ws(",", F.transform("token_ids", lambda x: x.cast("string")))
        ).alias("ids_md5"),
    )


@query(
    "q_url_dedup",
    """
    WITH raw AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
               || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
               || source || '.Example.COM'
               || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
               || '/Page/' || CAST(doc_id % 100 AS VARCHAR)
               || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
               || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1#frag'
                        ELSE '?a=1&b=2' END) AS url
        FROM documents
    ),
    parts AS (
        SELECT doc_id,
               lower(regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
               regexp_replace(regexp_replace(trim(url), '^[A-Za-z][A-Za-z0-9+.\\-]*://', ''),
                              '#.*$', '') AS rest
        FROM raw
    ),
    hp AS (
        SELECT *, lower(regexp_extract(rest, '^([^/?]+)', 1)) AS hostport FROM parts
    ),
    hh AS (
        SELECT *,
               regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''), '^www\\.', '') AS host,
               regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
               regexp_replace(rest, '^[^/?]+', '') AS pathq
        FROM hp
    ),
    pp AS (
        SELECT *,
               regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$', '') AS path,
               regexp_extract(pathq, '\\?(.*)$', 1) AS query
        FROM hh
    ),
    qn AS (
        SELECT *,
               array_to_string(list_sort(list_filter(string_split(query, '&'),
                   p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid|ref)='))),
                   '&') AS qnorm
        FROM pp
    ),
    canon AS (
        SELECT doc_id,
               scheme || '://' || host
               || (CASE WHEN port <> ''
                         AND NOT ((scheme = 'http' AND port = '80')
                                  OR (scheme = 'https' AND port = '443'))
                        THEN ':' || port ELSE '' END)
               || path
               || (CASE WHEN qnorm <> '' THEN '?' || qnorm ELSE '' END) AS canonical_url
        FROM qn
    )
    SELECT canonical_url, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM canon GROUP BY canonical_url
    """,
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl first-pass dedup on the canonical URL. The url column is
    synthesized deterministically from (source, doc_id) with the noise
    canonicalization must collapse — scheme/host case, www., default
    port, tracking params, param order, trailing slash, fragment — so
    the survivor groups are non-trivial (all variants of one
    (source, doc_id%100) page collapse to one canonical form)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    d = F.col("doc_id")
    with_url = docs.select(
        d,
        F.concat(
            F.when(d % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
            F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
            F.col("source"),
            F.lit(".Example.COM"),
            F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/Page/"),
            (d % 100).cast("string"),
            F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(d % 3 == 0, F.lit("?utm_source=feed&b=2&a=1#frag")).otherwise(
                F.lit("?a=1&b=2")
            ),
        ).alias("url"),
    )
    return curation.url_dedup(with_url)


@query(
    "q_strip_html",
    """
    WITH raw AS (
        SELECT doc_id,
               '<html><head><title>T</title>'
               || '<script type="text/javascript">var x = 1 < 2;</script>'
               || '<style>p { color: red; }</style></head>'
               || '<body><!-- a comment --><h1>Doc ' || CAST(doc_id AS VARCHAR)
               || '</h1><p class="body">' || text
               || '</p><div>&amp;lt; entity &quot;soup&quot; &#39;here&#39;&nbsp;&gt;</div>'
               || '</body></html>' AS html
        FROM documents
    ),
    s1 AS (SELECT doc_id, regexp_replace(html, '<script\\b[^>]*>.*?</script>', ' ', 'gis') AS t FROM raw),
    s2 AS (SELECT doc_id, regexp_replace(t, '<style\\b[^>]*>.*?</style>', ' ', 'gis') AS t FROM s1),
    s3 AS (SELECT doc_id, regexp_replace(t, '<!--.*?-->', ' ', 'gs') AS t FROM s2),
    s4 AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'gs') AS t FROM s3),
    ent AS (
        SELECT doc_id,
               replace(replace(replace(replace(replace(replace(t,
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                   '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t
        FROM s4
    )
    SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS clean_text
    FROM ent
    """,
)
def q_strip_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl text extraction: each doc is wrapped in a synthetic HTML
    shell (script/style blocks, comments, tags, entity soup — built
    identically on both engines) and stripped back to prose with the
    codegen regex chain. Pins the scale-relevant properties: script
    CONTENT dropped (not just tags), '&amp;lt;' decodes to a literal
    '&lt;', whitespace canonicalized."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    d = F.col("doc_id")
    html = F.concat(
        F.lit('<html><head><title>T</title>'
              '<script type="text/javascript">var x = 1 < 2;</script>'
              "<style>p { color: red; }</style></head>"
              "<body><!-- a comment --><h1>Doc "),
        d.cast("string"),
        F.lit('</h1><p class="body">'),
        F.col("text"),
        F.lit("</p><div>&amp;lt; entity &quot;soup&quot; &#39;here&#39;&nbsp;&gt;</div>"
              "</body></html>"),
    )
    return docs.select(
        d, curation.strip_html(html).alias("clean_text")
    )


@query(
    "q_pack_ids",
    f"""
    WITH d AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '), w -> CAST(length(w) AS INT)) AS ids
        FROM documents
    ),
    b AS (
        SELECT doc_id, ids, len(ids) AS n_tok,
               {_DUCK_BUCKET.format(key='doc_id', m=64)} AS pack_bucket
        FROM d
    ),
    o AS (
        SELECT doc_id, ids, pack_bucket,
               CAST(coalesce(sum(n_tok) OVER (
                   PARTITION BY pack_bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS start_offset
        FROM b
    ),
    e AS (
        SELECT pack_bucket, start_offset + i AS g, ids[i + 1] AS tid, i
        FROM (SELECT *, unnest(range(len(ids))) AS i FROM o)
    ),
    seqs AS (
        SELECT pack_bucket, CAST(g // 512 AS BIGINT) AS seq_idx,
               CAST(count(*) AS INT) AS n_ids,
               md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY g)) AS ids_md5
        FROM e GROUP BY pack_bucket, seq_idx
    ),
    st AS (
        SELECT pack_bucket, CAST(g // 512 AS BIGINT) AS seq_idx,
               md5(string_agg(CAST(g % 512 AS VARCHAR), ',' ORDER BY g)) AS starts_md5
        FROM e WHERE i = 0 GROUP BY pack_bucket, seq_idx
    )
    SELECT s.pack_bucket, s.seq_idx, s.n_ids, s.ids_md5,
           coalesce(st.starts_md5, md5('')) AS starts_md5
    FROM seqs s LEFT JOIN st USING (pack_bucket, seq_idx)
    """,
)
def q_pack_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length packing of ACTUAL token-id streams
    (curation.pack_token_ids, seq_len=512, 64 buckets): docs
    concatenate per hash-bucket stream and straddle sequence
    boundaries. Surrogate ids (per-token char lengths) keep the id
    stream SQL-constructible; each packed sequence is adjudicated by
    its md5-of-ids checksum + length + md5 of its doc-boundary
    positions (arrays stay atomic for the driver's hasher)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    with_ids = docs.select(
        "doc_id",
        F.transform(
            F.split(F.col("text"), " "), lambda w: F.length(w).cast("int")
        ).alias("token_ids"),
    )
    packed = curation.pack_token_ids(with_ids, seq_len=512, n_buckets=64)
    return packed.select(
        "pack_bucket",
        "seq_idx",
        F.col("n_ids").cast("int").alias("n_ids"),
        F.md5(
            F.concat_ws(",", F.transform("ids", lambda x: x.cast("string")))
        ).alias("ids_md5"),
        F.md5(
            F.concat_ws(",", F.transform("doc_starts", lambda x: x.cast("string")))
        ).alias("starts_md5"),
    )


@query(
    "q_chat_flatten",
    """
    WITH turns AS (
        SELECT user_id, ts, event_id,
               event_type || ': msg#' || CAST(event_id AS VARCHAR) AS line
        FROM events
    )
    SELECT user_id AS conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           md5(string_agg(line, chr(10) ORDER BY ts, event_id)) AS transcript_md5
    FROM turns GROUP BY user_id
    """,
)
def q_chat_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation flattening (curation.flatten_conversations): the
    events table read as chat turns (conversation = user, role = event
    type), reassembled into one newline-joined transcript per
    conversation in (ts, id) order. Adjudicated by per-transcript md5
    — ordering, separator placement, and turn count all pinned."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    turns = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.concat(
            F.col("event_type"), F.lit(": msg#"), F.col("event_id").cast("string")
        ).alias("line"),
    )
    out = curation.flatten_conversations(turns, "user_id", "ts", "line", "event_id")
    return out.select(
        F.col("conv_id"),
        F.col("n_turns"),
        F.md5("transcript").alias("transcript_md5"),
    )


@query(
    "q_setsim_prefix",
    r"""
    WITH tk AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\s+'),
                   x -> x <> '')) AS toks
        FROM documents
    ),
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.toks, b.toks)) AS INT) AS inter,
               CAST(len(a.toks) + len(b.toks)
                    - len(list_intersect(a.toks, b.toks)) AS INT) AS uni
        FROM tk a JOIN tk b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, inter, uni,
           round(CAST(inter AS DOUBLE) / uni, 9) AS jaccard
    FROM p WHERE inter * 2 >= uni * 1
    """,
)
def q_setsim_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered set-similarity self-join
    (dedup.setsim_join_prefix): token-set Jaccard ≥ 1/2 pairs found by
    indexing only each doc's rarity-ordered prefix (the PPJoin-family
    candidate generator — complete by the prefix pigeonhole, and the
    postings lists are the RARE tokens, inverting the hot-shingle skew
    of a full inverted index). The threshold is rational end-to-end
    (integer ceil for the prefix length, inter·den ≥ num·uni for the
    verify). The ORACLE is the independent quadratic all-pairs
    formulation, so the hash match certifies the filter misses no
    qualifying pair."""
    from .operators import dedup

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.setsim_join_prefix(docs, threshold_num=1, threshold_den=2)


@query(
    "q_badword_filter",
    r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(toks,
                    x -> x IN ('slow', 'big', 'the'))) AS BIGINT) AS n_bad
        FROM t
    )
    SELECT doc_id, n_tokens, n_bad,
           round(CAST(n_bad AS DOUBLE) / n_tokens, 9) AS bad_frac,
           n_bad * 10 < n_tokens AS keep
    FROM s
    """,
)
def q_badword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety-lexicon filter: per-doc blocked-token occurrence count
    and fraction against a broadcast-literal lexicon, keep = frac <
    10% decided as the EXACT integer comparison n_bad·10 < n_tokens
    (no float threshold flap). The standard toxicity/NSFW word-ratio
    gate of a curation pipeline; the lexicon here is three corpus
    words so the ratios are non-degenerate. One scan, all
    higher-order-function codegen, no join."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    bad = F.filter(toks, lambda x: x.isin("slow", "big", "the"))
    s = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(bad).cast("long").alias("n_bad"),
    )
    return s.select(
        "doc_id",
        "n_tokens",
        "n_bad",
        F.round(F.col("n_bad").cast("double") / F.col("n_tokens"), 9).alias(
            "bad_frac"
        ),
        (F.col("n_bad") * 10 < F.col("n_tokens")).alias("keep"),
    )


@query(
    "q_url_blocklist",
    """
    WITH raw AS (
        SELECT doc_id,
               'https://www.' || source || CAST(doc_id % 3 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               regexp_replace(lower(regexp_extract(url, '^https://([^/]+)', 1)),
                              '^www\\.', '') AS host
        FROM raw
    ),
    b AS (
        SELECT * FROM (VALUES
            ('src10.example.com'), ('src31.example.com'),
            ('src72.example.com')) AS t(domain)
    )
    SELECT coalesce(b.domain, 'allowed') AS verdict,
           count(*) AS n_urls, count(DISTINCT h.doc_id) AS n_docs
    FROM h LEFT JOIN b ON h.host = b.domain
    GROUP BY verdict
    """,
)
def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist audit: urls (synthesized deterministically per
    doc) resolved to registrable hosts and equi-joined against a
    BROADCAST blocklist table — the scalable shape (host equality on
    normalized keys, not per-row wildcard scans); per-verdict URL and
    doc counts. Crawl pipelines run this before any content work."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
    )
    h = docs.select(
        "doc_id",
        F.regexp_replace(
            F.lower(F.regexp_extract(url, r"^https://([^/]+)", 1)),
            r"^www\.",
            "",
        ).alias("host"),
    )
    b = docs.sparkSession.createDataFrame(
        [("src10.example.com",), ("src31.example.com",), ("src72.example.com",)],
        "domain STRING",
    )
    return (
        h.join(F.broadcast(b), h.host == b.domain, "left")
        .groupBy(F.coalesce(F.col("domain"), F.lit("allowed")).alias("verdict"))
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@query(
    "q_tokenizer_fertility",
    r"""
    WITH t AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS nc,
               CAST(len(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\s+'),
                   x -> x <> '')) AS BIGINT) AS nt
        FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(nc) AS BIGINT) AS total_chars,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           round(CAST(sum(nc) AS DOUBLE) / sum(nt), 9) AS chars_per_token
    FROM t GROUP BY lang
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: chars-per-token over the
    corpus (the budget planner's input — a language with 2× fertility
    costs 2× the tokens per char under a given tokenizer). Exact
    integer char/token sums, one division per language."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    t = docs.select(
        "lang",
        F.col("n_chars").cast("long").alias("nc"),
        F.size(toks).cast("long").alias("nt"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nc").alias("total_chars"),
        F.sum("nt").alias("total_tokens"),
        F.round(
            F.sum("nc").cast("double") / F.sum("nt"), 9
        ).alias("chars_per_token"),
    )


@query(
    "q_phrase_search",
    r"""
    WITH t AS (
        SELECT doc_id,
               array_to_string(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\s+'),
                   x -> x <> ''), ' ') AS s
        FROM documents
    ),
    c AS (
        SELECT doc_id,
               CAST((length(s) - length(replace(s, 'value table', '')))
                    / length('value table') AS BIGINT) AS n_occur
        FROM t
    )
    SELECT doc_id, n_occur FROM c WHERE n_occur > 0
    """,
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search ("value table" as ADJACENT tokens):
    the Spark side is the scalable POSITIONAL-INDEX shape — per-term
    postings (doc, pos) equi-joined on pos+1, never a string scan of
    every doc against every phrase — while the ORACLE counts the
    phrase by independent substring arithmetic on the
    canonical-spaced text (valid because the two phrase words are
    distinct, so occurrences can't overlap). The hash match certifies
    the adjacency join against plain string semantics."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    posting = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "t")
    )
    t1 = posting.filter(F.col("t") == "value").select(
        "doc_id", F.col("pos").alias("p1")
    )
    t2 = posting.filter(F.col("t") == "table").select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("p2")
    )
    hits = t1.join(
        t2,
        (t1.doc_id == t2.doc_id2) & (F.col("p2") == F.col("p1") + 1),
    )
    return hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_occur"))


@query(
    "q_corpus_report",
    r"""
    WITH base AS (
        SELECT source, lang, md5(text) AS h,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                           x -> x <> '') AS toks,
               text
        FROM documents
    ),
    per_doc AS (
        SELECT source, lang, h,
               CAST(len(toks) AS BIGINT) AS nt,
               CAST(len(list_filter(toks,
                    x -> x IN ('slow', 'big', 'the'))) AS BIGINT) AS nbad,
               CASE WHEN len(toks) >= 30
                     AND round(list_sum(list_transform(toks, x -> length(x)))
                               / len(toks), 6) BETWEEN 3.0 AND 10.0
                     AND CAST(len(list_intersect(list_distinct(toks),
                          ['the','a','value','table','row','key'])) AS INT) >= 2
                    THEN 1 ELSE 0 END AS gpass
        FROM base
    ),
    dedup AS (
        SELECT source, h, count(*) AS n_copies, min(nt) AS tok
        FROM per_doc GROUP BY source, h
    ),
    infl AS (
        SELECT source,
               sum(n_copies * tok) AS total_tokens,
               sum(tok) AS deduped_tokens
        FROM dedup GROUP BY source
    ),
    lang_counts AS (
        SELECT source, lang, count(*) AS c FROM per_doc GROUP BY source, lang
    ),
    major AS (
        SELECT source,
               max(struct_pack(c := c, lang := lang)).lang AS majority_lang,
               max(struct_pack(c := c, lang := lang)).c AS major_c
        FROM lang_counts GROUP BY source
    ),
    agg AS (
        SELECT source, count(*) AS n_docs,
               sum(nbad) AS n_bad, sum(nt) AS n_tok,
               sum(gpass) AS n_gpass
        FROM per_doc GROUP BY source
    )
    SELECT agg.source, n_docs,
           CAST(infl.total_tokens AS BIGINT) AS total_tokens,
           round(CAST(infl.total_tokens AS DOUBLE) / infl.deduped_tokens, 9)
               AS dup_inflation,
           round(CAST(n_bad AS DOUBLE) / n_tok, 9) AS bad_token_frac,
           round(CAST(n_gpass AS DOUBLE) / n_docs, 9) AS gopher_pass_frac,
           major.majority_lang,
           round(CAST(major.major_c AS DOUBLE) / n_docs, 9) AS lang_purity
    FROM agg
    JOIN infl ON infl.source = agg.source
    JOIN major ON major.source = agg.source
    """,
)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus dashboard row — the one table a curation
    review starts from: document and token volume, duplicate token
    inflation, safety-lexicon token fraction, Gopher pass rate,
    majority language and purity. Pure composition of the oracled
    signal family over a SINGLE pass of the corpus (one tokenize,
    shared by every signal) plus |sources|-sized rollups; every
    fraction one division of exact integers."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    mean_wl = F.round(
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / F.size(toks),
        6,
    )
    gpass = (
        (F.size(toks) >= 30)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & (
            F.size(
                F.array_intersect(
                    F.array_distinct(toks),
                    F.array(*[F.lit(w) for w in ("the", "a", "value", "table", "row", "key")]),
                )
            )
            >= 2
        )
    ).cast("long")
    per_doc = docs.select(
        "source",
        "lang",
        F.md5("text").alias("h"),
        F.size(toks).cast("long").alias("nt"),
        F.size(F.filter(toks, lambda x: x.isin("slow", "big", "the")))
        .cast("long")
        .alias("nbad"),
        gpass.alias("gpass"),
    )
    dedup_t = per_doc.groupBy("source", "h").agg(
        F.count(F.lit(1)).alias("n_copies"), F.min("nt").alias("tok")
    )
    infl = dedup_t.groupBy("source").agg(
        F.sum(F.col("n_copies") * F.col("tok")).alias("total_tokens"),
        F.sum("tok").alias("deduped_tokens"),
    )
    lang_counts = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    mstruct = F.max(F.struct(F.col("c"), F.col("lang")))
    major = lang_counts.groupBy("source").agg(
        mstruct["lang"].alias("majority_lang"), mstruct["c"].alias("major_c")
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nbad").alias("n_bad"),
        F.sum("nt").alias("n_tok"),
        F.sum("gpass").alias("n_gpass"),
    )
    return (
        agg.join(infl, "source")
        .join(major, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.round(
                F.col("total_tokens").cast("double") / F.col("deduped_tokens"),
                9,
            ).alias("dup_inflation"),
            F.round(F.col("n_bad").cast("double") / F.col("n_tok"), 9).alias(
                "bad_token_frac"
            ),
            F.round(
                F.col("n_gpass").cast("double") / F.col("n_docs"), 9
            ).alias("gopher_pass_frac"),
            "majority_lang",
            F.round(
                F.col("major_c").cast("double") / F.col("n_docs"), 9
            ).alias("lang_purity"),
        )
    )


@query(
    "q_tfidf_cosine_pairs",
    r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                                        '\s+'),
                      x -> x <> '')) AS t
        FROM documents
    ),
    tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
    dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    nn AS (SELECT count(DISTINCT doc_id) AS N FROM tf),
    w AS (
        SELECT tf.doc_id, tf.t,
               tf.tf * CAST(round(ln((N + 1.0) / (df + 1.0)) * 1000000)
                            AS BIGINT) AS w,
               df
        FROM tf JOIN dfreq USING (t) CROSS JOIN nn
    ),
    norms AS (
        SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS nrm
        FROM w GROUP BY doc_id
    ),
    rare AS (SELECT doc_id, t FROM w CROSS JOIN nn WHERE df * 10 <= N),
    cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM rare a JOIN rare b ON a.t = b.t AND a.doc_id < b.doc_id
    ),
    dots AS (
        SELECT cand.da, cand.db, sum(wa.w * wb.w) AS dot
        FROM cand
        JOIN w wa ON wa.doc_id = cand.da
        JOIN w wb ON wb.doc_id = cand.db AND wb.t = wa.t
        GROUP BY cand.da, cand.db
    )
    SELECT da AS doc_a, db AS doc_b,
           round(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = da
    JOIN norms nb ON nb.doc_id = db
    ORDER BY round(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6) DESC, da, db
    LIMIT 10
    """,
)
def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity — the third similarity geometry
    beside dense-vector ANN and set Jaccard: weights are
    tf · round(ln((N+1)/(df+1))·1e6) BIGINTs, so dots and norm² are
    EXACT integer sums (one sqrt + one division at render).
    Candidates come from the RARE-token inverted index (df·10 ≤ N —
    hot tokens generate no candidates, the same skew cap as the
    shingle index); the full dot then runs over ALL shared tokens of
    each candidate pair. The df cap is part of the query contract
    (pairs sharing only ubiquitous tokens score near 0 anyway).
    Top-10 by 6dp cosine with id tiebreaks."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("t"),
    )
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    nn = tf.agg(F.countDistinct("doc_id").alias("N"))
    w = (
        tf.join(dfreq, "t")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "t",
            (
                F.col("tf")
                * F.round(
                    F.log((F.col("N") + 1.0) / (F.col("df") + 1.0)) * 1000000
                ).cast("long")
            ).alias("w"),
            "df",
            "N",
        )
    ).localCheckpoint()
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nrm")
    )
    rare = w.filter(F.col("df") * 10 <= F.col("N")).select("doc_id", "t")
    cand = (
        rare.alias("a")
        .join(rare.alias("b"), "t")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    wa = w.select(F.col("doc_id").alias("da"), F.col("t").alias("ta"), F.col("w").alias("wa"))
    wb = w.select(F.col("doc_id").alias("db2"), F.col("t").alias("tb"), F.col("w").alias("wb"))
    dots = (
        cand.join(wa, "da")
        .join(wb, (F.col("db") == F.col("db2")) & (F.col("tb") == F.col("ta")))
        .groupBy("da", "db")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("da"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("db"), F.col("nrm").alias("nb"))
    out = (
        dots.join(na, "da")
        .join(nb, "db")
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.round(
                F.col("dot").cast("double") / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
    )
    return out.orderBy(
        F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(10)


@query(
    "q_dup_weight",
    """
    WITH crawl AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0
    ),
    g AS (
        SELECT md5(text) AS content_hash,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM crawl GROUP BY content_hash
    )
    SELECT c.doc_id, g.n_copies,
           1.0 / CAST(g.n_copies AS DOUBLE) AS weight
    FROM crawl c JOIN g ON g.content_hash = md5(c.text)
    """,
)
def q_dup_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware training weights (dedup.dup_weight) over a
    simulated re-crawl (every 20th doc fetched twice): each row kept
    with weight 1/n_copies of its exact-content group, so duplicated
    content contributes one doc's worth of loss gradient instead of
    n — the soft third strategy beside dropping (q_dedup_exact) and
    measuring (q_dup_inflation). One hash aggregation + one join;
    the weight is a single exact int/int division."""
    from .operators import dedup

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    recrawl = docs.filter(F.col("doc_id") % 20 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    crawl = docs.unionByName(recrawl)
    return dedup.dup_weight(crawl, ["text"])


@query(
    "q_span_corruption",
    """
    WITH tok AS (
        SELECT doc_id, CAST(unnest(range(len(string_split(text, ' '))))
                   AS BIGINT) AS pos
        FROM documents
    ),
    masked AS (
        SELECT doc_id, pos FROM tok
        WHERE ((CAST(CAST(from_hex(substr(md5(
                    CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)
                ), 1, 16)) AS BIT) AS BIGINT) % 100) + 100) % 100 < 15
    ),
    isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM masked
    ),
    sp AS (
        SELECT doc_id, island,
               min(pos) AS start_pos, max(pos) AS end_pos,
               count(*) AS span_len
        FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY start_pos) AS INT) AS sentinel_id,
           CAST(start_pos AS INT) AS start_pos,
           CAST(end_pos AS INT) AS end_pos,
           CAST(span_len AS INT) AS span_len
    FROM sp
    """,
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption mask generation
    (curation.span_corruption_spans): every token masked by a
    deterministic md5(doc_id:pos) mod 100 < 15 draw, adjacent masked
    tokens merged gaps-and-islands into sentinel spans — the
    reproducible-noise property a pretraining pipeline needs so any
    re-run (or the loss-masking twin in the trainer) corrupts
    identically. Integer-only end to end; windows partition per
    document."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.span_corruption_spans(docs, mask_pct=15)


@query(
    "q_perplexity_buckets",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
        SELECT doc_id, t[i+1] || ' ' || t[i+2] AS bg, t[i+1] AS w1
        FROM (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
              FROM w WHERE len(t) >= 2)
    ),
    c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    s AS (
        SELECT doc_id, log2(c2 / c1) AS lp
        FROM bg JOIN c2 USING (bg) JOIN c1 USING (w1)
    ),
    ce AS (
        SELECT doc_id, round(-avg(lp), 6) AS cross_entropy
        FROM s GROUP BY doc_id
    ),
    ranked AS (
        SELECT cross_entropy AS v,
               row_number() OVER (ORDER BY cross_entropy, doc_id) AS rn,
               count(*) OVER () AS n
        FROM ce
    ),
    cut AS (
        SELECT max(CASE WHEN rn = (n + 2) // 3 THEN v END) AS c1v,
               max(CASE WHEN rn = (2 * n + 2) // 3 THEN v END) AS c2v
        FROM ranked
    )
    SELECT CASE WHEN cross_entropy <= c1v THEN 'head'
                WHEN cross_entropy <= c2v THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(cross_entropy) AS ce_lo,
           max(cross_entropy) AS ce_hi
    FROM ce, cut
    GROUP BY 1
    """,
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (curation.perplexity_buckets):
    head/middle/tail thirds of the corpus by self-fit bigram
    cross-entropy — keep the head, sample the middle, audit the tail.
    The tercile cutoffs are exact order statistics found by
    quality.rank_select_kth's histogram-probe (no global sort); the
    oracle uses the independent global-sort row_number formulation,
    certifying the rank-selection machinery end-to-end on doubles."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.perplexity_buckets(docs)


# the two product trees, generated ONCE and shared verbatim by the
# Spark plan (dedup._pow_chain_col builds the same shape)
_SR4 = dedup._pow_chain_sql("s", 4)
_SCURVE_P = "1.0 - " + dedup._pow_chain_sql(f"(1.0 - {_SR4})", 16)


@query(
    "q_lsh_scurve",
    f"""
    WITH g AS (SELECT CAST(unnest(range(1, 20)) AS BIGINT) AS i),
    b AS (SELECT CAST(i AS DOUBLE) / CAST(20 AS DOUBLE) AS s FROM g)
    SELECT s, {_SCURVE_P} AS p_candidate
    FROM b
    """,
)
def q_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded-MinHash S-curve P(candidate | Jaccard=s) for the
    repo's 16x4 banding (dedup.lsh_scurve) — the design audit that
    justifies the (bands, rows) choice: crossover at s~=0.50, >0.99
    recall at the 0.8 dedup threshold. Both powers are fixed
    square-and-multiply product trees shared verbatim with the oracle
    (pow() is not correctly rounded everywhere; a pinned product tree
    of IEEE multiplications is bit-stable on any engine)."""
    return dedup.lsh_scurve(spark, rows_per_band=4, n_bands=16, grid=20)


@query(
    "q_epoch_shuffle",
    """
    WITH e AS (SELECT unnest(range(3)) AS epoch),
    keyed AS (
        SELECT CAST(epoch AS INT) AS epoch, doc_id,
               CAST(CAST(from_hex(substr(md5(
                   CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)
               ), 1, 16)) AS BIT) AS BIGINT) AS h
        FROM documents, e
    )
    SELECT epoch, doc_id,
           CAST(((h % 8) + 8) % 8 AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY epoch, ((h % 8) + 8) % 8
               ORDER BY h, doc_id) AS INT) AS shard_pos
    FROM keyed
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-epoch training order (curation.epoch_shuffle,
    3 epochs × 8 shards): per epoch a fresh md5(epoch:id) permutation —
    re-runs and replacement workers read identical orders, no two
    epochs share one (what SGD wants and ORDER BY rand() loses on
    every retry). The permutation is (shard, position) — ordering
    windows partition per (epoch, shard), never a global rank."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.epoch_shuffle(docs, n_epochs=3, n_shards=8)


# ---------------------------------------------------------------------------
# Wave 28 — DSIR importance weights, packing efficiency, stratified
# sample, snapshot churn
# ---------------------------------------------------------------------------

_DSIR_BUCKET = _DUCK_BUCKET.format(key="bg", m=4096)


@query(
    "q_dsir_weights",
    f"""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
    bg AS (
        SELECT doc_id, source, t[i+1] || ' ' || t[i+2] AS bg
        FROM (SELECT doc_id, source, t, unnest(range(len(t) - 1)) AS i
              FROM w WHERE len(t) >= 2)
    ),
    bk AS (SELECT doc_id, source, {_DSIR_BUCKET} AS b FROM bg),
    tc AS (SELECT b, count(*) AS tc FROM bk WHERE source = 'src0' GROUP BY b),
    rc AS (SELECT b, count(*) AS rc FROM bk WHERE source <> 'src0' GROUP BY b),
    tot AS (SELECT (SELECT sum(tc) FROM tc) AS T, (SELECT sum(rc) FROM rc) AS R),
    lr AS (
        SELECT rc.b,
               CAST(round_even(1000000.0 * (
                   ln(CAST(coalesce(tc.tc, 0) + 1 AS DOUBLE))
                   - ln(CAST(T + 4096 AS DOUBLE))
                   - ln(CAST(rc.rc + 1 AS DOUBLE))
                   + ln(CAST(R + 4096 AS DOUBLE))), 0) AS BIGINT) AS lr
        FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot
    ),
    sc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(lr) AS BIGINT) AS dsir_int
        FROM bk JOIN lr ON lr.b = bk.b
        WHERE source <> 'src0'
        GROUP BY doc_id
    )
    SELECT doc_id, n_grams, dsir_int,
           CAST(dsir_int AS DOUBLE) / (1000000.0 * CAST(n_grams AS DOUBLE))
               AS dsir_avg
    FROM sc
    """,
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (curation.dsir_weights): hashed-bigram
    log-likelihood ratio of each raw-pool doc under the TARGET domain
    (source src0) vs the raw pool — the classifier-free target-domain
    up-sampler. Per-bucket log-ratios quantize to 1e-6 integer units
    (the proven quantized-log idiom) so per-doc scores are
    order-independent BIGINT sums; the average divides once."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    target = docs.filter(F.col("source") == "src0")
    raw = docs.filter(F.col("source") != "src0")
    return curation.dsir_weights(raw, target, n_buckets=4096)


@query(
    "q_packing_efficiency",
    f"""
    WITH b AS (
        SELECT {_DUCK_BUCKET.format(key="doc_id", m=1024)} AS b,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS t
        FROM documents
    ),
    per AS (
        SELECT b, sum(t) AS tok, (sum(t) + 511) // 512 AS seq
        FROM b GROUP BY b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_streams,
           CAST(sum(seq) AS BIGINT) AS n_sequences,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           CAST(sum(seq) * 512 - sum(tok) AS BIGINT) AS n_padding,
           CAST(sum(tok) AS DOUBLE) / CAST(sum(seq) * 512 AS DOUBLE)
               AS utilization
    FROM per
    """,
)
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit (curation.packing_efficiency, seq_len
    512 over 1024 hash-bucket streams): sequences / tokens / padding /
    utilization for the concatenate-then-chunk layout — only each
    stream's LAST sequence is part-filled, so the padding tax is
    bounded by n_streams·seq_len. One bucket aggregate + a one-row
    rollup; utilization is one division of exact BIGINTs."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.packing_efficiency(docs, seq_len=512, n_buckets=1024)


@query(
    "q_stratified_sample",
    """
    WITH h AS (
        SELECT doc_id, source,
               CAST(CAST(from_hex(substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                    AS BIT) AS BIGINT) AS hv
        FROM documents
    ),
    r AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY hv, doc_id) AS INT)
                   AS stratum_rank,
               count(*) OVER (PARTITION BY source) AS n
        FROM h
    )
    SELECT doc_id, source, stratum_rank
    FROM r WHERE stratum_rank <= (n * 10 + 99) // 100
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% stratified sample (curation.stratified_sample)
    by source: rank within each stratum by the md5 surrogate hash, keep
    the first ceil(n·10/100) — every feed represented at the same rate
    (a global deterministic sample can starve small strata). Exact
    integer allocation; per-stratum windows, never a global rank."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.stratified_sample(docs, pct=10, strata_col="source")


@query(
    "q_snapshot_churn",
    """
    WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
    new AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS h
        FROM documents WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id + 10000000 AS doc_id, md5(text) AS h
        FROM documents WHERE doc_id % 11 = 0
    ),
    j AS (
        SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.h <> n.h THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old o FULL OUTER JOIN new n ON n.doc_id = o.doc_id
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n_docs FROM j GROUP BY status
    """,
)
def q_snapshot_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot churn report (curation.snapshot_churn): the corpus
    diffed against a deterministic synthetic re-crawl (docs at id%7=0
    dropped, id%5=0 edited, id%11=0 re-added under new ids) →
    added/removed/changed/unchanged counts. One full-outer id join
    with inline md5 content compare + a 4-row aggregate — the
    crawl-diff that decides incremental vs full re-process."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = docs.select("doc_id", "text")
    did = F.col("doc_id")
    new = base.filter(did % 7 != 0).withColumn(
        "text",
        F.when(did % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    ).unionByName(
        base.filter(did % 11 == 0).select(
            (did + 10_000_000).alias("doc_id"), "text"
        )
    )
    return curation.snapshot_churn(base, new)


@query(
    "q_budget_allocation",
    """
    WITH per AS (
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    o AS (
        SELECT source, n_tokens,
               CAST(row_number() OVER (ORDER BY n_tokens, source) - 1 AS BIGINT) AS i,
               CAST(coalesce(sum(n_tokens) OVER (
                   ORDER BY n_tokens, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS pre,
               CAST(count(*) OVER () AS BIGINT) AS k
        FROM per
    ),
    p AS (
        SELECT i AS pi, pre AS pp FROM o
        WHERE n_tokens * (k - i) >= 20000 - pre
        ORDER BY i LIMIT 1
    )
    SELECT source, n_tokens,
           CAST(CASE WHEN (SELECT count(*) FROM p) = 0
                       OR i < (SELECT pi FROM p) THEN n_tokens
                ELSE (20000 - (SELECT pp FROM p)) // (k - (SELECT pi FROM p))
                     + CASE WHEN i - (SELECT pi FROM p)
                                 < (20000 - (SELECT pp FROM p)) % (k - (SELECT pi FROM p))
                            THEN 1 ELSE 0 END
                END AS BIGINT) AS allocated
    FROM o
    """,
)
def q_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget water-filling across sources
    (curation.budget_allocation, budget 20k): every source keeps
    min(tokens, C) for the largest uniform cap C that fits, remainder
    spread one token each in (size, name) order — allocations sum
    EXACTLY to min(budget, total). One per-source aggregate; the
    pivot/cap arithmetic runs on the ≤|sources|-row control table."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.budget_allocation(docs, budget=20_000, by="source")


_SWEEP_CONFIGS = ((32, 2), (16, 4), (8, 8))
_SWEEP_SQL = "\n    UNION ALL\n".join(
    f"""    SELECT CAST({b} AS INT) AS n_bands, CAST({r} AS INT) AS rows_per_band,
           s, 1.0 - {dedup._pow_chain_sql("(1.0 - " + dedup._pow_chain_sql("s", r) + ")", b)} AS p_candidate
    FROM grid"""
    for b, r in _SWEEP_CONFIGS
)


@query(
    "q_lsh_design_sweep",
    f"""
    WITH g AS (SELECT CAST(unnest(range(1, 20)) AS BIGINT) AS i),
    grid AS (SELECT CAST(i AS DOUBLE) / CAST(20 AS DOUBLE) AS s FROM g)
{_SWEEP_SQL}
    """,
)
def q_lsh_design_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding design curves for three 64-hash configurations
    (dedup.lsh_design_sweep: 32×2 / 16×4 / 8×8) — the side-by-side
    audit behind the repo's 16×4 choice: candidate probability at
    every Jaccard level per config, all square-and-multiply product
    trees shared verbatim with the oracle (bit-identical doubles, no
    pow())."""
    return dedup.lsh_design_sweep(spark, configs=_SWEEP_CONFIGS, grid=20)


@query(
    "q_epoch_order_overlap",
    """
    WITH e AS (SELECT unnest(range(2)) AS epoch),
    keyed AS (
        SELECT CAST(epoch AS INT) AS epoch, doc_id,
               CAST(CAST(from_hex(substr(md5(
                   CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)
               ), 1, 16)) AS BIT) AS BIGINT) AS h
        FROM documents, e
    ),
    p AS (
        SELECT epoch, doc_id,
               CAST(((h % 8) + 8) % 8 AS INT) AS shard,
               CAST(row_number() OVER (
                   PARTITION BY epoch, ((h % 8) + 8) % 8
                   ORDER BY h, doc_id) AS INT) AS shard_pos
        FROM keyed
    ),
    j AS (
        SELECT count(*) AS n_same
        FROM (SELECT doc_id, shard, shard_pos FROM p WHERE epoch = 0) a
        JOIN (SELECT doc_id, shard, shard_pos FROM p WHERE epoch = 1) b
          ON a.doc_id = b.doc_id AND a.shard = b.shard
             AND a.shard_pos = b.shard_pos
    )
    SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
           CAST(n_same AS BIGINT) AS n_same_slot,
           CAST(n_same AS DOUBLE)
               / CAST((SELECT count(*) FROM documents) AS DOUBLE)
               AS overlap_rate
    FROM j
    """,
)
def q_epoch_order_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-order overlap audit over curation.epoch_shuffle: how many
    docs land in the SAME (shard, position) slot in two consecutive
    epochs — the check that the per-epoch permutations are actually
    independent (an accidental shared seed puts every doc in the same
    slot every epoch, and SGD sees one fixed order n_epochs times).
    Expected overlap under independence is ~1/|docs| per slot; a rate
    near 1.0 is the broken-seed signature. One self-join on the
    (doc, slot) key."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sh = curation.epoch_shuffle(docs, n_epochs=2, n_shards=8)
    a = sh.filter(F.col("epoch") == 0).select("doc_id", "shard", "shard_pos")
    b = sh.filter(F.col("epoch") == 1).select("doc_id", "shard", "shard_pos")
    n_same = a.join(b, ["doc_id", "shard", "shard_pos"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_same_slot")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return n_docs.crossJoin(n_same).select(
        "n_docs",
        "n_same_slot",
        (
            F.col("n_same_slot").cast("double") / F.col("n_docs").cast("double")
        ).alias("overlap_rate"),
    )


# ---------------------------------------------------------------------------
# Wave 33 — shard shipping manifest, seeded-DP histogram release
# ---------------------------------------------------------------------------


@query(
    "q_shard_manifest",
    """
    SELECT doc_id % 16 AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),
                                        1, 15)) AS BIGINT)) AS xor_fingerprint
    FROM documents
    GROUP BY 1
    """,
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard shipping manifest: per-shard row count, byte-ish size,
    and an ORDER-INDEPENDENT content fingerprint (XOR of each doc's
    60-bit md5(id|text) prefix) — the integrity check two pipelines
    run on opposite ends of a corpus transfer: counts catch dropped
    rows, the XOR catches any substituted/corrupted body without
    requiring either side to sort (XOR is commutative, so shard
    fingerprints combine map-side; a mismatch localizes to one shard
    of 16 instead of re-hashing the corpus). One hash aggregate;
    fingerprints are exact BIGINTs."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    fp = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.select((F.col("doc_id") % 16).alias("shard_id"), "text", fp.alias("_fp"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            F.expr("bit_xor(_fp)").alias("xor_fingerprint"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 34 — preference-pair mining, chat lint, curriculum phases
# ---------------------------------------------------------------------------

_QUALITY_CTE = r"""
    sq AS (
        SELECT doc_id, source, text,
               len(string_split(text, ' ')) AS n_tok,
               list_sum(list_transform(string_split(text, ' '),
                                       w -> length(w))) AS tok_chars,
               length(text) AS nc,
               length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                   AS n_punct
        FROM documents
    ),
    q AS (
        SELECT doc_id, source,
               round(0.4 * least(n_tok / 100.0, 1.0)
                   + 0.3 * (1.0 - least((n_punct / nc) * 5.0, 1.0))
                   + 0.3 * least((tok_chars / n_tok) / 10.0, 1.0), 6) AS quality
        FROM sq
    )
"""


@query(
    "q_preference_pairs",
    f"""
    WITH {_QUALITY_CTE},
    top AS (SELECT doc_id, source, quality,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY quality DESC, doc_id) AS r
            FROM q),
    bot AS (SELECT doc_id, source, quality,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY quality ASC, doc_id DESC) AS r
            FROM q),
    n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM q GROUP BY source)
    SELECT t.source, t.doc_id AS chosen_id, b.doc_id AS rejected_id,
           round(t.quality - b.quality, 6) AS margin
    FROM top t
    JOIN bot b ON b.source = t.source AND b.r = t.r
    JOIN n ON n.source = t.source
    WHERE t.r <= n_src // 2 AND round(t.quality - b.quality, 6) >= 0.2
    """,
)
def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining for DPO/RLHF-style training: within each
    source, the r-th best document (by the composite quality score)
    pairs with the r-th worst, kept only when the quality margin ≥ 0.2
    — the standard cheap construction of (chosen, rejected) pairs from
    a scored-but-unlabeled corpus, source-stratified so pairs compare
    like with like and margins mean the same thing in every stratum.
    Two per-source windows (partitioned — never global) + one
    broadcastable per-source count; ties break on doc_id so the
    pairing is deterministic."""
    from pyspark.sql import Window

    from .operators import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    q = text_ops.quality_score(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    w_top = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    w_bot = Window.partitionBy("source").orderBy(
        F.col("quality").asc(), F.col("doc_id").desc()
    )
    top = q.select(
        "doc_id", "source", "quality", F.row_number().over(w_top).alias("r")
    )
    bot = q.select(
        F.col("doc_id").alias("b_doc_id"),
        F.col("source").alias("b_source"),
        F.col("quality").alias("b_quality"),
        F.row_number().over(w_bot).alias("b_r"),
    )
    n = q.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_src"))
    margin = F.round(F.col("quality") - F.col("b_quality"), 6)
    return (
        top.join(
            bot,
            (F.col("b_source") == F.col("source")) & (F.col("b_r") == F.col("r")),
        )
        .join(F.broadcast(n), "source")
        .filter((F.col("r") <= F.expr("n_src div 2")) & (margin >= 0.2))
        .select(
            "source",
            F.col("doc_id").alias("chosen_id"),
            F.col("b_doc_id").alias("rejected_id"),
            margin.alias("margin"),
        )
    )


@query(
    "q_chat_lint",
    """
    WITH turns AS (
        SELECT user_id AS conv_id, ts, event_id, event_type AS role
        FROM events
    ),
    w AS (
        SELECT conv_id, role,
               lag(role) OVER (PARTITION BY conv_id
                               ORDER BY ts, event_id) AS prev_role,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY ts, event_id) AS rn
        FROM turns
    ),
    per AS (
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_same_adjacent,
               CAST(count(DISTINCT role) AS BIGINT) AS n_roles,
               min(CASE WHEN rn = 1 THEN role END) AS first_role
        FROM w GROUP BY conv_id
    )
    SELECT conv_id, n_turns, n_same_adjacent, n_roles, first_role
    FROM per
    WHERE n_same_adjacent * 4 >= n_turns OR n_roles = 1
    """,
)
def q_chat_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-format lint over the conversation view of events (same
    derivation as q_chat_flatten: conversation = user, role = event
    type): flags conversations where ≥¼ of turns repeat the previous
    role or only one role ever speaks — the malformed-transcript
    screen an SFT pipeline runs before chat-template rendering
    (consecutive same-role turns merge or break templates; single-role
    "conversations" are logs, not dialogs). One partitioned lag window
    + one aggregate; the integer n_same_adjacent·4 ≥ n_turns
    threshold avoids any float ratio. The ¼ threshold (ADVICE r9:
    was ⅓) is calibrated so the check is non-vacuous at every driver
    scale: 1 flagged conv at sf0.001, 21 at sf0.01, 218 at sf0.1."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    turns = ev.select(
        F.col("user_id").alias("conv_id"),
        "ts",
        "event_id",
        F.col("event_type").alias("role"),
    )
    per = (
        turns.select(
            "conv_id",
            "role",
            F.lag("role").over(w).alias("prev_role"),
            F.row_number().over(w).alias("rn"),
        )
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(
                F.when(F.col("role") == F.col("prev_role"), 1).otherwise(0)
            ).cast("long").alias("n_same_adjacent"),
            F.countDistinct("role").cast("long").alias("n_roles"),
            F.min(F.when(F.col("rn") == 1, F.col("role"))).alias("first_role"),
        )
    )
    return per.filter(
        (F.col("n_same_adjacent") * 4 >= F.col("n_turns")) | (F.col("n_roles") == 1)
    ).select("conv_id", "n_turns", "n_same_adjacent", "n_roles", "first_role")


@query(
    "q_curriculum_phases",
    f"""
    WITH {_QUALITY_CTE},
    g AS (SELECT doc_id, CAST(round(quality * 1e6) AS BIGINT) AS q6 FROM q),
    r AS (SELECT doc_id, q6,
                 row_number() OVER (ORDER BY q6, doc_id) AS rn,
                 count(*) OVER () AS n
          FROM g),
    p AS (SELECT doc_id, q6,
                 CASE WHEN rn <= (n + 2) // 3 THEN 2
                      WHEN rn <= (2 * n + 2) // 3 THEN 1
                      ELSE 0 END AS phase
          FROM r)
    SELECT CAST(phase AS INT) AS phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(q6) AS BIGINT) AS q6_min,
           CAST(max(q6) AS BIGINT) AS q6_max,
           bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT)) AS id_fingerprint
    FROM p GROUP BY phase
    """,
)
def q_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phase assignment: exact quality terciles — phase 0
    (cleanest third, trained first) through phase 2 (noisiest third,
    trained last) — certified per phase by count, score range, and an
    order-independent XOR id fingerprint. The cutoffs are EXACT order
    statistics by (score, doc_id) from quality.rank_select_kth's
    two-pass histogram probe, and membership compares the full
    (score, id) tuple against the returned (kth_value, kth_id), so
    boundary ties split exactly as the oracle's global-sort
    row_number does — equal tercile sizes, no global window anywhere
    on the Spark side (the oracle MAY sort; the engine must not).
    Within-phase ordering is epoch_shuffle's job."""
    from .operators import quality
    from .operators import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # five consumers (two passes per rank_select_kth × two cutoffs +
    # the phase aggregate) — checkpoint so the corpus is scored once
    g = text_ops.quality_score(docs).select(
        "doc_id", F.round(F.col("quality") * 1e6).cast("long").alias("q6")
    ).localCheckpoint()
    c1 = quality.rank_select_kth(g, "q6", "doc_id", k_expr="(n + 2) div 3").select(
        F.col("kth_value").alias("c1_v"), F.col("kth_id").alias("c1_id")
    )
    c2 = quality.rank_select_kth(
        g, "q6", "doc_id", k_expr="(2 * n + 2) div 3"
    ).select(F.col("kth_value").alias("c2_v"), F.col("kth_id").alias("c2_id"))
    j = g.crossJoin(F.broadcast(c1)).crossJoin(F.broadcast(c2))
    le_c1 = (F.col("q6") < F.col("c1_v")) | (
        (F.col("q6") == F.col("c1_v")) & (F.col("doc_id") <= F.col("c1_id"))
    )
    le_c2 = (F.col("q6") < F.col("c2_v")) | (
        (F.col("q6") == F.col("c2_v")) & (F.col("doc_id") <= F.col("c2_id"))
    )
    fp = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    return (
        j.select(
            F.when(le_c1, 2).when(le_c2, 1).otherwise(0).cast("int").alias("phase"),
            "q6",
            fp.alias("_fp"),
        )
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("q6").cast("long").alias("q6_min"),
            F.max("q6").cast("long").alias("q6_max"),
            F.expr("bit_xor(_fp)").alias("id_fingerprint"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 36 — leave-one-source-out valuation, CDC chunk dedup
# ---------------------------------------------------------------------------


@query(
    "q_source_loo_impact",
    """
    WITH hs AS (
        SELECT md5(text) AS h, source AS src,
               CAST(count(*) AS BIGINT) AS c_hs
        FROM documents GROUP BY 1, 2
    ),
    ph AS (SELECT h, CAST(sum(c_hs) AS BIGINT) AS c_h FROM hs GROUP BY h),
    excl AS (
        SELECT src, CAST(count(*) AS BIGINT) AS n_excl
        FROM hs JOIN ph USING (h) WHERE c_hs = c_h GROUP BY src
    ),
    ps AS (
        SELECT source AS src, CAST(count(*) AS BIGINT) AS n_s,
               CAST(sum(n_chars) AS BIGINT) AS chars_s
        FROM documents GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n_s) AS BIGINT) AS big_n,
               CAST(sum(chars_s) AS BIGINT) AS big_s,
               (SELECT CAST(count(*) AS BIGINT) FROM ph) AS big_h
        FROM ps
    )
    SELECT src AS source, n_s AS n_docs,
           CASE WHEN big_n - n_s > 0 THEN
             round(CAST(big_s - chars_s AS DOUBLE) / (big_n - n_s), 9)
           END AS mean_chars_loo,
           CASE WHEN big_n - n_s > 0 THEN
             round(CAST(big_s - chars_s AS DOUBLE) / (big_n - n_s)
                   - CAST(big_s AS DOUBLE) / big_n, 9)
           END AS delta_mean_chars,
           CASE WHEN big_n - n_s > 0 THEN
             round(CAST((big_n - n_s) - (big_h - coalesce(n_excl, 0))
                        AS DOUBLE) / (big_n - n_s), 9)
           END AS dup_rate_loo,
           CASE WHEN big_n - n_s > 0 THEN
             round(CAST((big_n - n_s) - (big_h - coalesce(n_excl, 0))
                        AS DOUBLE) / (big_n - n_s)
                   - CAST(big_n - big_h AS DOUBLE) / big_n, 9)
           END AS delta_dup_rate
    FROM ps LEFT JOIN excl USING (src), tot
    """,
)
def q_source_loo_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out corpus valuation
    (curation.source_loo_impact): for every source, the corpus mean
    doc length and exact-duplicate rate WITHOUT that source, plus the
    deltas vs the full mixture — Shapley-lite source attribution
    computed for all sources in ONE pass via per-hash exclusive
    bookkeeping (a hash survives source removal iff a copy exists
    outside it), so there is no per-source re-scan or anti-join.
    Exact BIGINT counters; divides guarded on an empty remainder."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.source_loo_impact(docs)


@query(
    "q_cdc_chunks",
    """
    WITH toks AS (
        SELECT doc_id AS id, w, pos - 1 AS pos
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w,
                   generate_subscripts(
                       string_split_regex(lower(trim(text)), '\\s+'), 1
                   ) AS pos
            FROM documents
        ) WHERE w != ''
    ),
    ld AS (
        SELECT id, pos, w,
               lead(w, 1) OVER (PARTITION BY id ORDER BY pos) AS w1,
               lead(w, 2) OVER (PARTITION BY id ORDER BY pos) AS w2
        FROM toks
    ),
    bnd AS (
        SELECT id, pos, w,
               CASE WHEN pos = 0 OR (w1 IS NOT NULL AND w2 IS NOT NULL
                         AND CAST(('0x' || substr(
                                 md5(w || ' ' || w1 || ' ' || w2), 1, 15))
                             AS BIGINT) % 8 = 0)
                    THEN 1 ELSE 0 END AS boundary
        FROM ld
    ),
    chunked AS (
        SELECT id, pos, w,
               sum(boundary) OVER (PARTITION BY id ORDER BY pos
                                   ROWS UNBOUNDED PRECEDING) AS chunk
        FROM bnd
    ),
    chunks AS (
        SELECT id, chunk,
               md5(string_agg(w, ' ' ORDER BY pos)) AS ch,
               CAST(count(*) AS BIGINT) AS nw
        FROM chunked GROUP BY id, chunk
    ),
    per_hash AS (
        SELECT ch, CAST(count(*) AS BIGINT) AS cnt, min(nw) AS nw
        FROM chunks GROUP BY ch
    )
    SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_distinct_chunks,
           CAST(sum(cnt) - count(*) AS BIGINT) AS dup_chunks,
           round(CAST(sum(cnt * nw) AS DOUBLE) / sum(cnt), 9)
               AS avg_chunk_words,
           CAST(sum((cnt - 1) * nw) AS BIGINT) AS dedup_savings_words
    FROM per_hash
    """,
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup census (dedup.cdc_chunk_stats):
    rolling-hash word-3-gram boundaries (md5-derived, expected chunk
    8 words), chunk identity by content hash, corpus-level dup/savings
    stats. The storage-dedup CDC idea applied to text: boundaries
    depend only on LOCAL content, so an insertion re-chunks one chunk
    instead of shifting every later chunk — the property that makes
    chunk-level dedup catch lightly-edited recrawls whole-doc hashing
    misses (unit test plants exactly that edit). Windows are
    partitioned per document; the census shuffle carries 16-byte
    chunk hashes."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.cdc_chunk_stats(docs)


@query(
    "q_source_set_cover",
    """
    WITH tt AS (
        SELECT source AS src,
               string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents
    ),
    g AS (
        SELECT DISTINCT src, md5(gram) AS gh
        FROM (SELECT src,
                     array_to_string(toks[(i+1):(i+3)], ' ') AS gram
              FROM (SELECT src, toks,
                           unnest(range(greatest(len(toks) - 3, 0) + 1)) AS i
                    FROM tt))
        WHERE gram != ''
    ),
    u AS (SELECT CAST(count(DISTINCT gh) AS BIGINT) AS universe FROM g),
    cnt1 AS (SELECT src, CAST(count(*) AS BIGINT) AS gain FROM g GROUP BY src),
    s1 AS (SELECT src, gain FROM cnt1 ORDER BY gain DESC, src ASC LIMIT 1),
    cov1 AS (SELECT gh FROM g WHERE src = (SELECT src FROM s1)),
    r2 AS (SELECT g.src, g.gh FROM g
           WHERE g.src != (SELECT src FROM s1)
             AND NOT EXISTS (SELECT 1 FROM cov1 WHERE cov1.gh = g.gh)),
    srcs AS (SELECT DISTINCT source AS src FROM documents),
    cnt2 AS (SELECT s.src, CAST(coalesce(c.gain, 0) AS BIGINT) AS gain
             FROM (SELECT src FROM srcs
                   WHERE src != (SELECT src FROM s1)) s
             LEFT JOIN (SELECT src, count(*) AS gain
                        FROM r2 GROUP BY src) c USING (src)),
    s2 AS (SELECT src, gain FROM cnt2 ORDER BY gain DESC, src ASC LIMIT 1),
    cov2 AS (SELECT gh FROM cov1
             UNION SELECT gh FROM g WHERE src = (SELECT src FROM s2)),
    r3 AS (SELECT g.src, g.gh FROM g
           WHERE g.src != (SELECT src FROM s1)
             AND g.src != (SELECT src FROM s2)
             AND NOT EXISTS (SELECT 1 FROM cov2 WHERE cov2.gh = g.gh)),
    cnt3 AS (SELECT s.src, CAST(coalesce(c.gain, 0) AS BIGINT) AS gain
             FROM (SELECT src FROM srcs
                   WHERE src != (SELECT src FROM s1)
                     AND src != (SELECT src FROM s2)) s
             LEFT JOIN (SELECT src, count(*) AS gain
                        FROM r3 GROUP BY src) c USING (src)),
    s3 AS (SELECT src, gain FROM cnt3 ORDER BY gain DESC, src ASC LIMIT 1)
    SELECT CAST(1 AS INT) AS step, (SELECT src FROM s1) AS source,
           (SELECT gain FROM s1) AS marginal_gain,
           round(CAST((SELECT gain FROM s1) AS DOUBLE) / universe, 9)
               AS cum_coverage
    FROM u
    UNION ALL
    SELECT 2, (SELECT src FROM s2), (SELECT gain FROM s2),
           round(CAST((SELECT gain FROM s1) + (SELECT gain FROM s2)
                      AS DOUBLE) / universe, 9)
    FROM u
    UNION ALL
    SELECT 3, (SELECT src FROM s3), (SELECT gain FROM s3),
           round(CAST((SELECT gain FROM s1) + (SELECT gain FROM s2)
                      + (SELECT gain FROM s3) AS DOUBLE) / universe, 9)
    FROM u
    """,
)
def q_source_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy coverage-maximizing source selection
    (curation.source_set_cover, 3 steps): data mixing as SET COVER —
    the source order that maximizes marginal distinct-3-gram
    coverage, i.e. which feeds actually add linguistic material. One
    anti-join + argmax per step (never pairwise sources), md5 gram
    keys, 1-row bounded winner collects; the oracle unrolls the same
    greedy rounds."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.source_set_cover(docs, steps=3)


# ---------------------------------------------------------------------------
# Round-12 wave 41: contamination-rate audit + context-length sizing.
# ---------------------------------------------------------------------------


@query(
    "q_contam_overlap",
    """
    WITH tok AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, source, array_to_string(w[i:i+3], ' ') AS g
        FROM tok, unnest(generate_series(1, greatest(len(w) - 3, 1))) AS t(i)
    ),
    train AS (SELECT DISTINCT g FROM grams WHERE source <> 'src0'),
    bench AS (SELECT doc_id, g FROM grams WHERE source = 'src0'),
    tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        FROM bench GROUP BY doc_id
    ),
    hit AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
        FROM bench WHERE g IN (SELECT g FROM train)
        GROUP BY doc_id
    )
    SELECT tot.doc_id, n_grams,
           CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
           round(CAST(coalesce(n_hit, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
               AS overlap_frac
    FROM tot LEFT JOIN hit USING (doc_id)
    """,
)
def q_contam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-benchmark-doc 4-gram contamination RATE
    (curation.contamination_overlap) — the audit twin of
    q_decontaminate's binary drop: source src0 stands in for the eval
    suite, and each of its docs reports what fraction of its distinct
    token 4-grams leaks from the training split. Distinct'd gram sets
    + a semi-join on the gram key — no all-pairs product."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return curation.contamination_overlap(corpus, bench, n=4)


@query(
    "q_truncation_loss",
    """
    WITH d AS (SELECT len(string_split(text, ' ')) AS n_tok FROM documents),
    f AS (
        SELECT t.L AS max_len, n_tok
        FROM d CROSS JOIN (SELECT unnest([64, 128, 256]) AS L) t
    )
    SELECT CAST(max_len AS INT) AS max_len,
           CAST(sum(CASE WHEN n_tok > max_len THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_truncated,
           CAST(sum(greatest(n_tok - max_len, 0)) AS BIGINT) AS lost_tokens,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(CAST(sum(greatest(n_tok - max_len, 0)) AS DOUBLE)
                 / CAST(sum(n_tok) AS DOUBLE), 6) AS loss_frac
    FROM f GROUP BY max_len
    """,
)
def q_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length sizing audit (curation.truncation_loss): for
    max_seq_len ∈ {64, 128, 256}, the docs truncated and the fraction
    of corpus tokens lost past the cut — the table that picks sequence
    length before a training run. Exact integer sums, one division at
    render, one scan."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.truncation_loss(docs, (64, 128, 256))
