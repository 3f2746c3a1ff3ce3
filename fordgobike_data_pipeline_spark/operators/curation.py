"""Corpus-curation operators — the document-level cleanup / selection
steps a large-scale training-data pipeline runs between raw scrape and
tokenization (BASELINE.json north star; complements operators/dedup.py
and operators/text.py).

All pure Catalyst column expressions and window/join compositions — no
Python in the hot path, every step either shuffle-free (per-row
normalization, hash splits) or a single hash-partitioned shuffle on a
bounded key (domain, n-gram, hash bucket). Every operator is a pure
function of row content, so re-runs, repartitioning, and engine swaps
reproduce the same output (the same property the oracle SQL relies on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_M = 1_000_000


def _hash_bucket(key: Column, modulus: int = _M) -> Column:
    """md5-based uniform bucket (same construction as sampling._bucket /
    the surrogate keys, so DuckDB reproduces the selection bit-exactly:
    CAST(CAST(from_hex(substr(md5(x),1,16)) AS BIT) AS BIGINT) pmod M)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 16), 16, -10).cast("long")
    return F.pmod(h, F.lit(modulus))


# ---------------------------------------------------------------------------
# Text normalization & PII redaction — per-row, shuffle-free, codegen'd
# ---------------------------------------------------------------------------


def normalize_text(text: Column) -> Column:
    """Canonical text form: lowercase, collapse whitespace runs, trim.
    The standard pre-dedup normalization (exact dedup over normalized
    text catches case/spacing-only dups)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


# Deliberately simple, auditable patterns: the operator contract is
# "replace every match of pattern_i with token_i, in order" — the
# pattern inventory is config, the chained-global-replace shape is
# what scales (still one projection, no shuffle).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "[IP]"),
    (r"\+\d[\d -]{7,}\d", "[PHONE]"),
)


def pii_redact(text: Column) -> Column:
    """Mask emails / IPv4s / international phone numbers with typed
    placeholder tokens. Order matters (emails contain dots that the IP
    pattern must not see first), so patterns apply in inventory order."""
    out = text
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


# ---------------------------------------------------------------------------
# Intra-document repetition — the boilerplate / spam quality signal
# ---------------------------------------------------------------------------


def repetition_ratio(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fraction of duplicated token n-grams inside each doc
    (1 − distinct/total): near 0 for natural text, near 1 for
    template/boilerplate spam. Pure array expressions — zero shuffles,
    embarrassingly parallel at any scale. Tokens are materialized in
    their own projection first (same O(n²)-inlining trap as
    dedup.token_shingles — a split() inside the lambda re-runs per
    gram)."""
    tokd = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
    toks = F.col("_toks")
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    gramd = tokd.select(
        F.col(id_col),
        F.transform(
            starts, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
        ).alias("_grams"),
    )
    grams = F.col("_grams")
    return gramd.select(
        F.col(id_col),
        F.size(grams).alias("n_grams"),
        F.round(
            1 - F.size(F.array_distinct(grams)) / F.size(grams), 6
        ).alias("repetition_ratio"),
    )


# ---------------------------------------------------------------------------
# Per-domain quota — corpus-mix control
# ---------------------------------------------------------------------------


def per_domain_cap(
    docs: DataFrame,
    cap: int,
    domain_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top-``cap`` docs per domain (by ``order_col`` desc,
    id asc tiebreak) — the standard guard against one crawl domain
    dominating the training mix. One hash-partitioned window on the
    domain key; per-domain groups are bounded by the crawl frontier so
    no global sort. For pathologically hot domains pre-filter with an
    approximate per-domain count and salt, same as the top-k harness."""
    w = Window.partitionBy(domain_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination — n-gram overlap removal
# ---------------------------------------------------------------------------


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every corpus doc sharing at least one token n-gram with the
    benchmark set (the eval-leakage guard every LLM pretraining corpus
    runs). Returns the surviving corpus rows.

    Shape at 100 TB: benchmark n-grams are distinct'd (eval suites are
    tiny relative to the corpus — low millions of grams), then the
    corpus's exploded grams LEFT SEMI join them on the gram key to find
    contaminated ids, and the corpus anti-joins those ids. Both joins
    hash-partition on bounded keys; with a small benchmark Spark's AQE
    broadcasts the gram table and the scan stays one pass. No
    all-pairs product anywhere.
    """
    from .dedup import token_shingles

    bench_grams = (
        token_shingles(benchmark, text_col=text_col, id_col=id_col, k=n)
        .select("shingle")
        .distinct()
    )
    corpus_grams = token_shingles(corpus, text_col=text_col, id_col=id_col, k=n)
    contaminated = (
        corpus_grams.join(bench_grams, "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def near_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 64,
    n_bands: int = 16,
    threshold: float = 0.8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """NEAR-duplicate decontamination: drop corpus docs whose MinHash
    Jaccard vs ANY benchmark doc is ≥ ``threshold`` — catches the
    paraphrased / lightly-edited eval leakage that exact n-gram
    matching (:func:`ngram_decontaminate`) misses. Returns surviving
    corpus rows. Ids must be globally unique across both sets (the
    verify step unions shingle tables keyed by id).

    Shape at 100 TB: the benchmark's LSH band-bucket index is built
    once (eval suites are tiny), then the corpus probes it exactly like
    a daily batch probes the archive index (dedup.incremental_
    minhash_pairs) — candidate generation is a bucket equi-join, exact
    Jaccard verifies candidates only, and the final anti-join is on
    the bounded contaminated-id set. No all-pairs product, and the
    benchmark side is broadcast-sized for AQE."""
    from .dedup import incremental_minhash_pairs, minhash_band_index

    index = minhash_band_index(
        benchmark, text_col, id_col, k, n_hashes, n_bands, hash_fn
    )
    pairs = incremental_minhash_pairs(
        corpus, index, benchmark, text_col, id_col,
        k, n_hashes, n_bands, threshold, hash_fn,
    )
    contaminated = pairs.select(F.col("id_a").alias(id_col)).distinct()
    return corpus.join(contaminated, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------


def train_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """Assign each doc a split label as a pure function of its id hash:
    stable across runs, engines and partitionings, and new docs assign
    themselves on incremental ingest. Shuffle-free projection."""
    if val_frac + test_frac >= 1.0:
        raise ValueError("val_frac + test_frac must be < 1")
    b = _hash_bucket(F.col(id_col))
    test_hi = int(test_frac * _M)
    val_hi = test_hi + int(val_frac * _M)
    return docs.withColumn(
        "split",
        F.when(b < test_hi, F.lit("test"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("train")),
    )


# ---------------------------------------------------------------------------
# Sequence packing — concatenate-then-chunk token layout
# ---------------------------------------------------------------------------


def remove_boilerplate_lines(
    docs: DataFrame,
    max_line_freq: int = 2,
    sep: str = ". ",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style boilerplate removal: drop every line/sentence that
    occurs in more than ``max_line_freq`` documents corpus-wide (cookie
    banners, nav text, legal footers — the highest-frequency lines are
    almost never content), then reconstruct each doc from its surviving
    lines in original order.

    Shape: posexplode the line split → line document-frequency on
    xxhash64(line) (one map-side-combinable agg over 8-byte keys, not
    line text) → ANTI-join the hot hashes. NO broadcast hint: unlike
    the hot-shingle cap (df>50 — genuinely rare keys), the df>2 line
    set GROWS with the corpus (billions of near-boilerplate lines at
    web scale), so forcing a broadcast OOMs at 100×; a shuffle
    anti-join on the 8-byte hash is scale-safe and AQE still picks
    broadcast whenever the hot set actually fits. Hashing costs a
    2^-64/pair collision false-drop — noise against the df-threshold
    heuristic itself. Then groupBy doc, array_sort on (pos, line),
    concat back. Three shuffles total (line df + anti-join + doc
    rebuild); the corpus text is scanned once."""
    import re

    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep), -1)).alias("pos", "line"),
    ).withColumn("_lh", F.xxhash64("line"))
    df_ = lines.groupBy("_lh").agg(F.countDistinct(id_col).alias("df"))
    hot = df_.filter(F.col("df") > max_line_freq).select("_lh")
    kept = lines.join(hot, "_lh", "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("pl")
        )
        .select(
            id_col,
            F.concat_ws(sep, F.transform("pl", lambda s: s["line"])).alias("clean_text"),
            F.size("pl").cast("long").alias("n_lines_kept"),
        )
    )
    return rebuilt


def quality_percentile_by_domain(
    docs: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Per-domain quality percentile: percent_rank of each doc's
    quality score WITHIN its domain — the calibration step behind
    domain-balanced filtering ("keep every domain's top 30%" instead of
    a global cutoff that one high-scoring domain would monopolize; the
    same failure mode per_domain_cap guards by count, handled here by
    score distribution).

    NOT a per-domain window over the corpus rows: a window partition is
    one task, and real corpora routinely put 30-50% of rows in one
    domain — that sort serializes onto a single executor and spills.
    Standard SQL percent_rank ties share a rank (rank−1 = count of
    STRICTLY smaller values), so the whole computation decomposes into
    per-(domain, quality-value) counts: one map-side-combinable agg, a
    running sum over each domain's distinct VALUE rows (quality is
    rounded to 6dp in [0,1], so ≤1e6+1 rows per domain — bounded by the
    value space, not the corpus), and a hash-join of the cutpoint table
    back to the rows. Deterministic by construction (no tiebreak
    needed — ties get equal percentiles), exact, and every stage is
    partition-parallel at any skew."""
    joined = docs.select(id_col, domain_col).join(quality, id_col)
    vc = joined.groupBy(domain_col, "quality").agg(F.count("*").alias("_c"))
    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.col("quality").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cut = (
        vc.withColumn("_less", F.coalesce(F.sum("_c").over(w), F.lit(0)))
        .withColumn("_n", F.sum("_c").over(Window.partitionBy(domain_col)))
        .select(
            domain_col,
            "quality",
            F.when(F.col("_n") == 1, F.lit(0.0))
            .otherwise(F.col("_less") / (F.col("_n") - 1))
            .alias("_pr"),
        )
    )
    return joined.join(cut, [domain_col, "quality"]).select(
        id_col,
        domain_col,
        "quality",
        F.round("_pr", 6).alias("quality_pctile"),
    )


def negative_samples(
    docs: DataFrame,
    k: int = 4,
    n_buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic pseudo-random negative sampling: for each anchor
    doc, ``k`` other docs drawn without replacement-by-construction —
    the contrastive-training pair-mining step (one negative per probe).

    Construction: every doc hashes to one of ``n_buckets`` candidate
    buckets; probe i of anchor a targets bucket md5(a‖':'‖i) mod B and
    takes the candidate minimizing md5(a‖'#'‖i‖'#'‖cand) — a pure
    function of ids, so re-runs, repartitioning, and the SQL oracle
    reproduce the selection bit-exactly (no rand(), which is
    seed+partitioning dependent).

    Scale: the probe join materializes |docs|·k·(|docs|/B) candidate
    rows, so ``n_buckets`` MUST scale with the corpus: pick a constant
    per-bucket size s (≈100 is ample — empty-bucket odds are already
    negligible at s≈20) and set B = |docs|/s, making the intermediate
    |docs|·k·s — linear, with B-way parallelism (verified: the 20×
    stress with FIXED B went superlinear exactly as this predicts;
    scaled B restores linearity). The default 64 suits test-sized
    corpora only. Anchors whose target bucket is empty (or holds only
    themselves) emit no row for that probe.
    """
    if k <= 0 or n_buckets <= 0:
        raise ValueError(f"k and n_buckets must be positive, got {k}, {n_buckets}")
    cand = docs.select(
        F.col(id_col).alias("cand_id"),
        _hash_bucket(F.col(id_col), n_buckets).alias("bucket"),
    )
    probes = docs.select(
        F.col(id_col).alias("anchor_id"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("probe"),
    ).withColumn(
        "bucket",
        _hash_bucket(
            F.concat_ws(
                ":", F.col("anchor_id").cast("string"), F.col("probe").cast("string")
            ),
            n_buckets,
        ),
    )
    pick = F.md5(
        F.concat_ws(
            "#",
            F.col("anchor_id").cast("string"),
            F.col("probe").cast("string"),
            F.col("cand_id").cast("string"),
        )
    )
    return (
        probes.join(cand, "bucket")
        .filter(F.col("cand_id") != F.col("anchor_id"))
        .groupBy("anchor_id", "probe")
        .agg(F.min_by("cand_id", pick).alias("negative_id"))
        .select(
            "anchor_id", F.col("probe").cast("int").alias("probe"), "negative_id"
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each doc into overlapping fixed-size token windows — the
    retrieval/embedding chunking step (RAG indexing, long-doc
    embedding) that precedes vectorization.

    Chunk i covers tokens [i·stride, i·stride + chunk_tokens); windows
    start while any token remains, so the tail is a short final chunk
    and every token appears in ≥1 chunk. Pure per-row array work
    (split once, sequence of starts, slice per start) — zero shuffles,
    embarrassingly parallel, linear in corpus size; output fan-out is
    ≈ n_tokens/stride rows per doc. The token array is materialized in
    its own projection first (higher-order-function re-evaluation trap,
    see token_shingles)."""
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError(
            f"chunk_tokens and stride must be positive, got {chunk_tokens}, {stride}"
        )
    if stride > chunk_tokens:
        # stride beyond the window skips tokens entirely and emits
        # empty trailing chunks — it contradicts the every-token-covered
        # contract (found by the hypothesis coverage property)
        raise ValueError(
            f"stride ({stride}) must not exceed chunk_tokens ({chunk_tokens}); "
            "a larger stride leaves tokens uncovered"
        )
    tokd = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
    toks = F.col("_toks")
    n_chunks = F.ceil(F.greatest(F.size(toks) - chunk_tokens, F.lit(0)) / stride) + 1
    starts = F.sequence(F.lit(0), (n_chunks - 1).cast("int") * stride, F.lit(stride))
    return tokd.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
        F.size(toks).alias("_n"),
        toks.alias("_t"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("start_tok"))
        .cast("long")
        .alias("n_tok"),
        F.concat_ws(" ", F.slice(F.col("_t"), F.col("start_tok") + 1, chunk_tokens)).alias(
            "chunk_text"
        ),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concatenate-then-chunk packing: the layout step that turns a doc
    corpus into fixed-length training sequences. Docs are hash-assigned
    to ``n_buckets`` independent streams; within a stream (ordered by
    id) each doc starts at the running token offset, so sequence index
    = offset // seq_len and position = offset % seq_len. Docs straddle
    sequence boundaries exactly as GPT-style pretraining packs them.

    Scale: one window per hash bucket — ``n_buckets`` independent
    partitions, each a linear scan; no global sort, no driver state.
    Size n_buckets ≈ cluster cores × a few so streams stay cache-sized.
    Deterministic: bucket and order are pure functions of the id.
    """
    toks = F.size(F.split(F.col(text_col), " "))
    bucket = _hash_bucket(F.col(id_col), n_buckets)
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(F.col(id_col), toks.alias("n_tok"), bucket.alias("pack_bucket"))
        .withColumn("start_offset", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .select(
            id_col,
            "pack_bucket",
            "n_tok",
            F.floor(F.col("start_offset") / seq_len).cast("long").alias("seq_idx"),
            F.pmod(F.col("start_offset"), F.lit(seq_len)).cast("long").alias("seq_pos"),
        )
    )


def domain_mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic mixture resampling: subsample each domain so the
    selected corpus's TOKEN mass approaches the target mixture
    ``weights`` — the pretraining data-mix step ("40% web, 30% code,
    30% books") run after cleaning and before packing.

    The binding domain (smallest available-tokens/weight ratio) is
    kept whole and every other domain downsampled proportionally:
    S = min_dom(T_dom / w_dom), keep-rate_dom = w_dom · S / T_dom ≤ 1,
    so realized token shares match the weights exactly in expectation
    while never oversampling (no replacement). Domains absent from
    ``weights`` are dropped (weight 0).

    Selection is the md5 hash-threshold (bucket < rate · M) — a pure
    function of the doc id, so re-runs, repartitionings, and the SQL
    oracle reproduce the exact row set, and incremental batches
    self-select consistently. Shape at 100 TB: per-domain token totals
    are one map-side-combinable agg (|domains| rows — control data),
    S is a scalar agg over them, rates join back on the domain key,
    and the filter is a shuffle-free projection. One corpus scan for
    totals, one for selection."""
    if not weights:
        raise ValueError("weights must be a non-empty mapping")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    w_expr = F.lit(None).cast("double")
    for dom, w in weights.items():
        w_expr = F.when(F.col(domain_col) == dom, F.lit(float(w))).otherwise(w_expr)
    n_tok = F.size(F.split(F.col(text_col), " "))
    td = (
        docs.select(F.col(domain_col), w_expr.alias("_w"), n_tok.alias("_t"))
        .filter(F.col("_w").isNotNull())
        .groupBy(domain_col, "_w")
        .agg(F.sum("_t").cast("double").alias("_T"))
    )
    scale = td.agg(F.min(F.col("_T") / F.col("_w")).alias("_S"))
    rates = td.crossJoin(F.broadcast(scale)).select(
        domain_col, (F.col("_w") * F.col("_S") / F.col("_T")).alias("_rate")
    )
    bucket = _hash_bucket(F.col(id_col))
    return (
        docs.join(rates, domain_col)
        .filter(bucket < F.col("_rate") * _M)
        .select(id_col, domain_col)
    )


# ---------------------------------------------------------------------------
# URL canonicalization & dedup — the crawl-side first-pass dedup key
# ---------------------------------------------------------------------------

_TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)="


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute URL, as one codegen'd expression:

    * scheme and host lowercased (path/query case is significant);
    * fragment dropped;
    * ``www.`` prefix and default ports (http:80, https:443) stripped;
    * tracking params (``utm_*``, ``gclid``, ``fbclid``, ``ref``)
      removed and the remaining query params SORTED (param order is
      transport noise, not identity);
    * trailing path slashes stripped.

    Per-row, shuffle-free, regex+array builtins only — the same chain
    is expressible in any SQL engine (the oracle mirrors it), and at
    crawl scale it runs inside whole-stage codegen on the scan.

    Inputs without a ``scheme://`` prefix (relative URLs, garbage)
    pass through trimmed-but-unchanged rather than being silently
    mangled into ``://…`` — they keep their own dedup identity and a
    downstream validity filter can count them."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", ""), r"#.*$", ""
    )
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":\d+$", ""), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (port != F.lit("")) & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    qnorm = F.concat_ws("&", F.array_sort(params))
    assembled = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(assembled)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """First-pass crawl dedup on the canonical URL: one survivor (min
    id) per canonical form plus the collapse count. Identical shape to
    exact_dedup — a single hash-partitioned aggregation, linear at any
    corpus size (the canonicalization itself is map-side)."""
    return (
        df.select(canonical_url(F.col(url_col)).alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def strip_html(text: Column) -> Column:
    """Plain text from raw HTML markup — the crawl-side text-extraction
    step that precedes every quality/dedup stage. One codegen'd
    regex-replacement chain (no UDF, fuses into the scan):

    1. drop <script>/<style> blocks wholesale (their content is code,
       not prose) — (?is) dotall so multi-line blocks match;
    2. drop comments and every remaining tag;
    3. decode the common entities (&lt; &gt; &quot; &#39; &nbsp;, then
       &amp; LAST so '&amp;lt;' decodes to the literal '&lt;' the
       author wrote, not a phantom '<');
    4. collapse whitespace runs and trim.

    Regex-based extraction is the scale tool (a DOM parse per doc is a
    Python UDF and 100x the cost); for layout-aware extraction plug a
    mapInPandas stage instead. Patterns stay inside the RE2 subset (no
    backreferences) so any SQL engine reproduces the chain verbatim."""
    t = F.regexp_replace(text, r"(?is)<script\b[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def pack_token_ids(
    docs: DataFrame,
    seq_len: int,
    n_buckets: int = 1024,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    pad_id: int | None = None,
) -> DataFrame:
    """Pack ACTUAL token-id streams into fixed-length training
    sequences (the materializing sibling of :func:`pack_sequences`,
    which only lays out counts): docs hash-route to ``n_buckets``
    independent streams, concatenate in id order, and every
    ``seq_len``-token window becomes one (pack_bucket, seq_idx, ids)
    row — docs straddle sequence boundaries exactly as GPT-style
    pretraining packs them.

    Two shuffles: the per-bucket running-offset window (n_buckets
    independent linear scans — no global sort), then the regroup onto
    (bucket, seq_idx), whose collect_list is bounded by ``seq_len``
    elements per group whatever the corpus size. ``pad_id`` pads each
    bucket's final partial sequence up to ``seq_len`` (id-only padding;
    emit the loss mask from ``n_ids`` downstream). ``doc_starts`` lists
    the in-sequence positions where a NEW document begins (sorted;
    empty when one doc spans the whole sequence) — what attention-mask
    / loss-boundary generation consumes. Deterministic: bucket, order,
    and packing are pure functions of the doc id."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n_tok = F.size(F.col(ids_col))
    bucket = _hash_bucket(F.col(id_col), n_buckets)
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        docs.select(F.col(id_col), F.col(ids_col), n_tok.alias("n_tok"), bucket.alias("pack_bucket"))
        .withColumn(
            "start_offset",
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long"),
        )
    )
    elems = offsets.select(
        "pack_bucket",
        F.col("start_offset"),
        F.posexplode(ids_col).alias("pos", "tid"),
    ).select(
        "pack_bucket",
        (F.col("start_offset") + F.col("pos")).alias("g"),
        "tid",
        (F.col("pos") == 0).alias("is_start"),
    )
    sorted_structs = F.array_sort(
        F.collect_list(F.struct(F.col("g"), F.col("tid"), F.col("is_start")))
    )
    seqs = (
        elems.groupBy(
            "pack_bucket", F.floor(F.col("g") / seq_len).cast("long").alias("seq_idx")
        )
        .agg(
            F.transform(sorted_structs, lambda s: s["tid"]).alias("ids"),
            F.transform(
                F.filter(sorted_structs, lambda s: s["is_start"]),
                lambda s: F.pmod(s["g"], F.lit(seq_len)).cast("int"),
            ).alias("doc_starts"),
        )
    )
    if pad_id is not None:
        seqs = seqs.select(
            "pack_bucket",
            "seq_idx",
            F.size("ids").alias("n_ids"),
            F.concat(
                "ids", F.array_repeat(F.lit(pad_id), seq_len - F.size("ids"))
            ).alias("ids"),
            "doc_starts",
        )
    else:
        seqs = seqs.select(
            "pack_bucket", "seq_idx", F.size("ids").alias("n_ids"), "ids", "doc_starts"
        )
    return seqs


def flatten_conversations(
    df: DataFrame,
    conv_col: str,
    ts_col: str,
    line_col: str,
    id_col: str,
) -> DataFrame:
    """Assemble per-conversation transcripts from a turns table — the
    SFT-data prep step that turns event-shaped rows into one ordered
    training document per conversation: (conv_id, n_turns, transcript)
    with turns joined by newlines in (ts, id) order.

    The caller renders each turn into ``line_col`` (role tags,
    templating — pure projection); this operator only owns the
    deterministic ordered reassembly. One groupBy(conversation);
    the collect_list is bounded by conversation length (chat data is
    thousands of turns at most, never corpus-scale per key), and the
    array_sort-struct ordering avoids any window/sort stage."""
    entry = F.struct(F.col(ts_col), F.col(id_col), F.col(line_col).alias("line"))
    return df.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.count("*").alias("n_turns"),
        F.concat_ws(
            "\n",
            F.transform(F.array_sort(F.collect_list(entry)), lambda s: s["line"]),
        ).alias("transcript"),
    )


def perplexity_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing: rank every document by its
    LM cross-entropy (here the self-fit bigram model — swap in any
    scorer) and split the corpus into head / middle / tail thirds.
    The standard curation move when hard-filtering on LM score throws
    away too much: keep the head outright, sample the middle, audit
    the tail — so the report carries each bucket's mass and score
    range.

    Scale shape: the two tercile cutoffs are exact order statistics
    found with :func:`..quality.rank_select_kth` (histogram probe +
    one-bucket rank — no global sort); bucketing is then a per-row
    comparison against two broadcast scalars. Ties at a cutoff value
    bucket DOWNWARD on value comparison — deterministic on both
    engines because the per-doc score is the repo-standard 6dp-rounded
    mean (text.bigram_cross_entropy's oracle-green contract).

    Returns one row per non-empty bucket: (bucket, n_docs, ce_lo,
    ce_hi)."""
    from . import quality as quality_ops
    from . import text as text_ops

    # The per-doc score table feeds FIVE consumers (each rank_select_kth
    # reads it twice — stats agg + bucketed pass — and the final bucket
    # aggregate once); without a cut the whole bigram-LM join chain
    # (two count aggregates + a three-way join per evaluation) re-runs
    # per consumer — measured as a 128-Exchange / 54-scan plan at sf0.1.
    # Eager localCheckpoint scores the corpus once; the |docs|-row
    # (id, score) table is the only thing materialized.
    ce = text_ops.bigram_cross_entropy(docs, text_col, id_col).localCheckpoint(
        eager=True
    )
    c1 = quality_ops.rank_select_kth(
        ce, "cross_entropy", id_col, k_expr="(n + 2) div 3"
    ).select(F.col("kth_value").alias("_c1"))
    c2 = quality_ops.rank_select_kth(
        ce, "cross_entropy", id_col, k_expr="(2*n + 2) div 3"
    ).select(F.col("kth_value").alias("_c2"))
    bucket = (
        F.when(F.col("cross_entropy") <= F.col("_c1"), F.lit("head"))
        .when(F.col("cross_entropy") <= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        ce.crossJoin(F.broadcast(c1))
        .crossJoin(F.broadcast(c2))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("cross_entropy").alias("ce_lo"),
            F.max("cross_entropy").alias("ce_hi"),
        )
    )


def span_corruption_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_pct: int = 15,
) -> DataFrame:
    """T5-style span-corruption mask generation: each whitespace token
    is masked with probability ``mask_pct``% by a DETERMINISTIC hash
    of (doc_id, position) — reproducible noise, the property a
    pretraining pipeline needs so a re-run (or the loss-masking twin
    on another system) corrupts identically — and adjacent masked
    tokens merge into sentinel spans (gaps-and-islands), matching how
    T5 replaces each contiguous masked run with ONE sentinel token.

    The mask hash is the md5 64-bit half (the repo's cross-engine
    surrogate-key construction) mod 100 — integer-only, so every span
    boundary is exact on any engine. Windows partition by document
    (per-doc work, embarrassingly parallel at corpus scale).

    Returns one row per span: (doc_id, sentinel_id — 1-based per doc —
    start_pos, end_pos, span_len), positions 0-based token indices."""
    from pyspark.sql import Window

    if not 0 < mask_pct < 100:
        raise ValueError(f"mask_pct must be in (0, 100), got {mask_pct}")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "_tok"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.col("pos").cast("string"))),
            1,
            16,
        ),
        16,
        -10,
    ).cast("long")
    masked = toks.filter(F.pmod(h, F.lit(100)) < mask_pct).select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = masked.withColumn(
        "_island", F.col("pos") - F.row_number().over(w)
    )
    spans = islands.groupBy(id_col, "_island").agg(
        F.min("pos").alias("start_pos"),
        F.max("pos").alias("end_pos"),
        F.count(F.lit(1)).alias("span_len"),
    )
    ws = Window.partitionBy(id_col).orderBy("start_pos")
    return spans.select(
        id_col,
        F.row_number().over(ws).cast("int").alias("sentinel_id"),
        F.col("start_pos").cast("int").alias("start_pos"),
        F.col("end_pos").cast("int").alias("end_pos"),
        F.col("span_len").cast("int").alias("span_len"),
    )


def leakage_safe_split(
    docs: DataFrame,
    near_dup_pairs: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = (90, 5, 5),
) -> DataFrame:
    """Near-dup-aware train/val/test split: connected components over
    the near-duplicate pair graph are assigned to splits AS A UNIT (by
    an md5 bucket of the component representative), so two
    near-duplicate documents can never straddle train and eval — the
    leakage a doc-level random split silently commits, inflating eval
    scores on anything with a template/mirror twin in train.

    Components come from :func:`..dedup.connected_components`
    (min-label propagation over pairs); singleton docs are their own
    component. The bucket is the repo's md5 surrogate construction, so
    the assignment is reproducible in any engine AND stable under
    corpus growth (a component keeps its split as long as its min-id
    member survives).

    Returns (doc_id, component, split) for every input doc."""
    from . import dedup as dedup_ops

    if len(weights) != 3 or any(w <= 0 for w in weights) or sum(weights) != 100:
        raise ValueError(f"weights must be 3 positive ints summing to 100, got {weights}")
    comp = dedup_ops.connected_components(near_dup_pairs).select(
        F.col("node").alias("_n"), F.col("component").alias("_comp")
    )
    base = docs.select(F.col(id_col))
    with_comp = base.join(comp, base[id_col] == comp["_n"], "left").select(
        id_col, F.coalesce(F.col("_comp"), F.col(id_col)).alias("component")
    )
    b = _hash_bucket(F.col("component"), 100)
    t, v, _ = weights
    return with_comp.select(
        id_col,
        "component",
        F.when(b < t, F.lit("train"))
        .when(b < t + v, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def epoch_shuffle(
    docs: DataFrame,
    n_epochs: int = 3,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic multi-epoch training order: for each epoch, a
    FRESH pseudo-random permutation of the corpus — keyed by
    md5(epoch:id), so run N and its re-run (or the elastic worker that
    replaces a failed one) read the examples in the identical order,
    while no two epochs share an order (the property SGD wants and
    ad-hoc `ORDER BY rand()` loses on every retry).

    Scale shape: the permutation is (shard, position-within-shard),
    NOT a global rank — shard = hash mod n_shards spreads the corpus,
    and the ordering window partitions per (epoch, shard) (≈|docs|/
    n_shards rows each, the same bound the shard writer uses). A
    trainer reads shards in index order, rows in shard_pos order.

    Returns one row per (epoch, doc): (epoch, doc_id, shard,
    shard_pos) with shard_pos 1-based."""
    from pyspark.sql import Window

    if n_epochs < 1 or n_shards < 1:
        raise ValueError(
            f"n_epochs and n_shards must be >= 1, got {n_epochs}, {n_shards}"
        )
    epochs = docs.sparkSession.range(n_epochs).select(
        F.col("id").cast("int").alias("epoch")
    )
    keyed = docs.select(id_col).crossJoin(F.broadcast(epochs)).select(
        "epoch",
        F.col(id_col),
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("epoch").cast("string"), F.col(id_col).cast("string")
                    )
                ),
                1,
                16,
            ),
            16,
            -10,
        )
        .cast("long")
        .alias("_h"),
    )
    w = Window.partitionBy("epoch", F.pmod(F.col("_h"), F.lit(n_shards))).orderBy(
        "_h", id_col
    )
    return keyed.select(
        "epoch",
        id_col,
        F.pmod(F.col("_h"), F.lit(n_shards)).cast("int").alias("shard"),
        F.row_number().over(w).cast("int").alias("shard_pos"),
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each raw
    doc by how much more likely its hashed-bigram profile is under the
    TARGET domain than under the raw pool — the cheap, classifier-free
    way to up-sample target-like data (resample raw docs with
    probability ∝ exp(score)).

    Features are token bigrams hashed into ``n_buckets`` buckets (the
    md5 surrogate construction, so the oracle reproduces the bucketing
    bit-exactly). Each bucket's add-1-smoothed log-ratio
    log((t_c+1)/(T+B)) − log((r_c+1)/(R+B)) is computed ONCE on exact
    integer inputs and snapped to 1e-6 integer units (the proven
    quantized-log idiom: ln is not correctly-rounded across engines,
    but a rint at 1e-6 of the same exact-integer expression is
    engine-stable), so every per-doc score is an order-independent
    BIGINT sum; the average divides once at render.

    Scale: two bucket-count aggregates (map-side combinable, output ≤
    n_buckets rows), the log-ratio table broadcasts, scoring is one
    hash join + one per-doc agg. Docs with < 2 tokens have no bigrams
    and drop out (mirrored by the oracle).

    Returns (doc_id, n_grams, dsir_int, dsir_avg) — dsir_avg in nats
    per bigram, positive = target-like."""

    def grams(df: DataFrame) -> DataFrame:
        from ..functions.skew import fan_out

        t = F.split(F.col(text_col), " ")
        n = F.size(t)
        bg = F.zip_with(
            F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        # fan_out: the bigram build + hash runs in the scan stage (§2.5)
        return fan_out(df).select(F.col(id_col), F.explode(bg).alias("_bg")).select(
            F.col(id_col), _hash_bucket(F.col("_bg"), n_buckets).alias("_b")
        )

    # deliberately NOT checkpointed despite two consumers (bucket counts
    # + scoring join): the recompute is one narrow fanned tokenize pass
    # and the interleaved A/B showed the blocking materialization LOSES
    # (orig 1.65 / fan_out 1.48 / fan_out+checkpoint 1.66)
    raw_g = grams(docs)
    tgt_c = grams(target).groupBy("_b").agg(F.count(F.lit(1)).alias("_tc"))
    raw_c = raw_g.groupBy("_b").agg(F.count(F.lit(1)).alias("_rc"))
    totals = tgt_c.agg(F.sum("_tc").alias("_T")).crossJoin(
        raw_c.agg(F.sum("_rc").alias("_R"))
    )
    # ln terms associate left-to-right, mirrored exactly in the oracle
    lr = (
        raw_c.join(tgt_c, "_b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.rint(
                F.lit(1e6)
                * (
                    F.log(F.coalesce(F.col("_tc"), F.lit(0)) + F.lit(1).cast("double"))
                    - F.log((F.col("_T") + F.lit(n_buckets)).cast("double"))
                    - F.log((F.col("_rc") + F.lit(1)).cast("double"))
                    + F.log((F.col("_R") + F.lit(n_buckets)).cast("double"))
                )
            )
            .cast("long")
            .alias("_lr"),
        )
    )
    return (
        raw_g.join(F.broadcast(lr), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("_lr").cast("long").alias("dsir_int"),
        )
        .select(
            id_col,
            "n_grams",
            "dsir_int",
            (
                F.col("dsir_int").cast("double")
                / (F.lit(1e6) * F.col("n_grams").cast("double"))
            ).alias("dsir_avg"),
        )
    )


def packing_efficiency(
    docs: DataFrame,
    seq_len: int,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Packing-efficiency audit for the concatenate-then-chunk layout
    (:func:`pack_sequences`): per hash-bucket stream only its LAST
    sequence is partially filled, so n_sequences = ceil(stream_tokens /
    seq_len) and the padding is n_sequences·seq_len − stream_tokens.
    The one-row report a packing job emits to prove the layout wastes
    <1/n_buckets·seq_len per stream — raise n_buckets for parallelism,
    pay a bounded padding tax.

    One token-count aggregate per bucket (map-side combinable,
    ≤ n_buckets rows) then a one-row rollup; utilization is ONE
    division of exact BIGINTs. Returns (n_streams, n_sequences,
    n_tokens, n_padding, utilization)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    per = (
        docs.select(_hash_bucket(F.col(id_col), n_buckets).alias("_b"), toks.alias("_t"))
        .groupBy("_b")
        .agg(F.sum("_t").alias("_tok"))
        .select(
            "_b", "_tok", F.expr(f"(_tok + {seq_len} - 1) div {seq_len}").alias("_seq")
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_streams"),
        F.sum("_seq").cast("long").alias("n_sequences"),
        F.sum("_tok").cast("long").alias("n_tokens"),
        (F.sum("_seq") * seq_len - F.sum("_tok")).cast("long").alias("n_padding"),
    ).select(
        "n_streams",
        "n_sequences",
        "n_tokens",
        "n_padding",
        (
            F.col("n_tokens").cast("double")
            / (F.col("n_sequences") * F.lit(seq_len)).cast("double")
        ).alias("utilization"),
    )


def stratified_sample(
    docs: DataFrame,
    pct: int = 10,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: within each stratum, rank rows
    by the md5 surrogate hash of their id (a fixed pseudo-random
    order) and keep the first ceil(n_stratum · pct / 100) — every
    stratum is represented at the same rate, unlike a global
    deterministic sample that can starve small strata. The
    mixture-preserving eval-slice / debug-slice cut.

    ``pct`` is an INTEGER percent so the allocation ceil((n·pct+99)
    div 100) is exact integer arithmetic on both engines. The ranking
    window partitions per stratum (bounded by the largest stratum —
    at corpus scale sub-stratify a giant source by hash prefix first);
    stratum sizes ride the same window as a count.

    Returns the sampled rows: (doc_id, <strata_col>, stratum_rank)."""
    if not (0 < pct <= 100):
        raise ValueError(f"pct must be in (0, 100], got {pct}")
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 16), 16, -10
    ).cast("long")
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    wn = Window.partitionBy(strata_col)
    ranked = docs.select(
        F.col(id_col),
        F.col(strata_col),
        F.row_number().over(w).alias("stratum_rank"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    return ranked.filter(
        F.col("stratum_rank") <= F.expr(f"(_n * {pct} + 99) div 100")
    ).select(id_col, strata_col, F.col("stratum_rank").cast("int").alias("stratum_rank"))


def snapshot_churn(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-to-snapshot corpus churn: full-outer match on id with
    an md5 content compare — added / removed / changed / unchanged
    counts, the crawl-diff report that decides whether an incremental
    re-process (or a full re-embed) is warranted and catches a feed
    that silently truncated.

    One full-outer join on the id (content hashes computed inline —
    never ships text through the shuffle twice) and a 4-row aggregate.

    Returns (status, n_docs) for status ∈ {added, removed, changed,
    unchanged}."""
    a = old.select(F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_ha"))
    b = new.select(F.col(id_col).alias("_id2"), F.md5(F.col(text_col)).alias("_hb"))
    j = a.join(b, a._id == b._id2, "full_outer")
    status = (
        F.when(F.col("_id").isNull(), F.lit("added"))
        .when(F.col("_id2").isNull(), F.lit("removed"))
        .when(F.col("_ha") != F.col("_hb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def budget_allocation(
    docs: DataFrame,
    budget: int,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget water-filling across domains: allocate ``budget``
    tokens over sources under a UNIFORM CAP — every source keeps
    min(its tokens, C) where C is the largest cap that fits the
    budget, with the integer remainder spread one token each to the
    first capped sources in (size, name) order. The equal-opportunity
    mixture allocation (small feeds keep everything, giants get
    truncated at the same ceiling) — the closed-form alternative to
    tuning per-domain quotas by hand.

    One per-source token aggregate; everything after runs on the
    ≤|sources|-row control table (the rank_select_kth bounded-window
    pattern): sort by size, prefix-sum, pick the pivot = first
    position where capping the remaining sources fits the residual
    budget, then exact integer div/mod. Allocations sum EXACTLY to
    min(budget, total).

    Returns (<by>, n_tokens, allocated)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    per = docs.groupBy(by).agg(
        F.sum(F.size(F.split(F.col(text_col), " ")).cast("long"))
        .cast("long")
        .alias("n_tokens")
    )
    w_ord = Window.orderBy(F.col("n_tokens").asc(), F.col(by).asc())
    k = per.agg(F.count(F.lit(1)).cast("long").alias("_k"))
    o = (
        per.select(
            by,
            "n_tokens",
            (F.row_number().over(w_ord) - 1).cast("long").alias("_i"),
            F.coalesce(
                F.sum("n_tokens").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("_prefix"),
        )
        .crossJoin(F.broadcast(k))
    )
    # pivot: first position where capping positions i..k-1 fits the
    # residual budget (empty ⇔ budget ≥ total ⇒ nobody is capped)
    pivot = (
        o.filter(
            F.col("n_tokens") * (F.col("_k") - F.col("_i"))
            >= F.lit(budget) - F.col("_prefix")
        )
        .agg(F.min(F.struct("_i", "_prefix")).alias("_pv"))
        .select(
            F.col("_pv._i").alias("_pi"), F.col("_pv._prefix").alias("_pp")
        )
    )
    rem = F.lit(budget) - F.col("_pp")
    m = F.col("_k") - F.col("_pi")
    allocated = (
        F.when(F.col("_pi").isNull() | (F.col("_i") < F.col("_pi")), F.col("n_tokens"))
        .otherwise(
            F.expr(f"({budget} - _pp) div (_k - _pi)")
            + ((F.col("_i") - F.col("_pi")) < F.pmod(rem, m)).cast("long")
        )
        .cast("long")
    )
    return o.crossJoin(F.broadcast(pivot)).select(
        by, "n_tokens", allocated.alias("allocated")
    )


def source_loo_impact(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    size_col: str = "n_chars",
) -> DataFrame:
    """Leave-one-source-out corpus valuation — the cheap end of the
    data-attribution spectrum (Shapley-style source valuation without
    retraining): for every source, what the corpus composition
    metrics become if that source is DROPPED, computed for all
    sources in one pass rather than |sources| re-scans. A mixture
    owner reads the deltas directly: "removing src2 raises mean doc
    length by 40 chars and cuts the exact-dup rate by 2 points" is an
    actionable acquisition/retirement signal.

    The trick is per-hash bookkeeping: the corpus-minus-s distinct
    count is H − |hashes exclusive to s| (a hash survives removal of
    s iff some copy lives outside s), so one md5-level aggregate with
    per-source counts answers every leave-one-out question at once —
    no per-source anti-join, no re-scan. All counters are exact
    BIGINT sums; the only float ops are the final mean/rate divides,
    guarded against an empty remainder.

    Scale: one exact-dedup-shaped hash aggregate (shuffle carries
    16-byte keys), one (hash, source) pre-aggregate, and source-level
    joins over the bounded source dimension. Returns one row per
    source: (source, n_docs, mean_chars_loo, delta_mean_chars,
    dup_rate_loo, delta_dup_rate)."""
    h = F.md5(F.col(text_col)).alias("h")
    per_hs = docs.select(h, F.col(source_col).alias("src")).groupBy(
        "h", "src"
    ).agg(F.count(F.lit(1)).cast("long").alias("c_hs"))
    per_h = per_hs.groupBy("h").agg(F.sum("c_hs").cast("long").alias("c_h"))
    # hashes exclusive to a source: every copy lives in that source
    excl = (
        per_hs.join(per_h, "h")
        .filter(F.col("c_hs") == F.col("c_h"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("n_excl"))
    )
    per_src = docs.groupBy(F.col(source_col).alias("src")).agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum(size_col).cast("long").alias("chars_s"),
    )
    tot = per_src.agg(
        F.sum("n_s").cast("long").alias("big_n"),
        F.sum("chars_s").cast("long").alias("big_s"),
    ).crossJoin(
        F.broadcast(per_h.agg(F.count(F.lit(1)).cast("long").alias("big_h")))
    )
    j = (
        per_src.join(excl, "src", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "src",
            "n_s",
            "chars_s",
            F.coalesce(F.col("n_excl"), F.lit(0)).alias("n_excl"),
            "big_n",
            "big_s",
            "big_h",
        )
    )
    n_loo = F.col("big_n") - F.col("n_s")
    mean_loo = (F.col("big_s") - F.col("chars_s")).cast("double") / n_loo.cast(
        "double"
    )
    mean_full = F.col("big_s").cast("double") / F.col("big_n").cast("double")
    distinct_loo = F.col("big_h") - F.col("n_excl")
    dup_loo = (n_loo - distinct_loo).cast("double") / n_loo.cast("double")
    dup_full = (F.col("big_n") - F.col("big_h")).cast("double") / F.col(
        "big_n"
    ).cast("double")
    return j.select(
        F.col("src").alias("source"),
        F.col("n_s").alias("n_docs"),
        F.when(n_loo > 0, F.round(mean_loo, 9)).alias("mean_chars_loo"),
        F.when(n_loo > 0, F.round(mean_loo - mean_full, 9)).alias(
            "delta_mean_chars"
        ),
        F.when(n_loo > 0, F.round(dup_loo, 9)).alias("dup_rate_loo"),
        F.when(n_loo > 0, F.round(dup_loo - dup_full, 9)).alias(
            "delta_dup_rate"
        ),
    )


def source_set_cover(
    docs: DataFrame,
    steps: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Greedy coverage-maximizing source selection — data mixing as
    SET COVER: pick the source sequence that maximizes marginal
    distinct 3-gram coverage of the whole corpus, the "which feeds
    actually add linguistic material" question a mixture owner asks
    before buying/weighting sources (greedy is the classic (1−1/e)
    approximation, and its SELECTION ORDER is the deliverable).

    Each step is one anti-join of the (source, gram) distinct table
    against the grams already covered, then an argmax — no pairwise
    source comparisons. Gram keys are md5-hashed so the shuffles
    carry 16-byte keys. The per-step winner is a 1-row bounded
    collect (driver control data, like k-means centroids); ties
    break on ascending source name. ``steps`` is fixed, so the
    oracle unrolls the same greedy rounds.

    Returns one row per step: (step, source, marginal_gain,
    cum_coverage) — always exactly ``steps`` rows; when the corpus
    has fewer distinct sources than steps, the surplus steps carry
    NULL source/gain/coverage (matching the oracle's empty scalar
    subqueries)."""
    # Tokenize in its own projection: Catalyst re-evaluates non-lambda
    # subtrees inside a higher-order function once PER ELEMENT, so
    # inlining split() into the gram lambda re-splits the text once per
    # gram — O(tokens²) per doc (the token_shingles trap). The alias is
    # referenced twice (size + slice), so CollapseProject leaves it.
    # fan_out: the tokenize+gram+md5 map work runs in the scan stage —
    # single-core on a single-file corpus without the rebalance (§2.5;
    # no-op when the scan has splits).
    from ..functions.skew import fan_out

    g = (
        fan_out(docs).select(
            F.col(source_col).alias("src"),
            F.expr(f"split(lower(trim({text_col})), '\\\\s+')").alias("_toks"),
        )
        .select(
            "src",
            F.explode(
                F.expr(
                    "transform(sequence(0, greatest(size(_toks) - 3, 0)), "
                    "i -> array_join(slice(_toks, i + 1, 3), ' '))"
                )
            ).alias("gram"),
        )
        .filter(F.col("gram") != "")
        .select("src", F.md5("gram").alias("gh"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    universe = g.select("gh").distinct().count()
    srcs = docs.select(
        F.col(source_col).alias("src")
    ).distinct().localCheckpoint(eager=True)
    remaining = g
    covered = None
    picked: list[str] = []
    out = []
    for step in range(1, steps + 1):
        # zero-gain sources still compete (alphabetical tiebreak), so
        # every step emits a row even once coverage is exhausted —
        # keeps the step count fixed for the unrolled oracle
        pool = srcs.filter(~F.col("src").isin(picked)) if picked else srcs
        gains = pool.join(
            remaining.groupBy("src").agg(
                F.count(F.lit(1)).cast("long").alias("gain")
            ),
            "src",
            "left",
        ).select("src", F.coalesce(F.col("gain"), F.lit(0)).cast("long").alias("gain"))
        top = gains.orderBy(F.col("gain").desc(), F.col("src").asc()).limit(
            1
        ).collect()
        if not top:
            # fewer distinct sources than steps: the step count stays
            # fixed — emit the remaining steps with NULL source/gain,
            # matching the oracle's empty scalar subqueries.
            out.extend((s, None, None) for s in range(step, steps + 1))
            break
        src, gain = top[0]["src"], int(top[0]["gain"])
        picked.append(src)
        out.append((step, src, gain))
        won = g.filter(F.col("src") == src).select("gh")
        covered = won if covered is None else covered.unionByName(won).distinct()
        remaining = remaining.filter(F.col("src") != src).join(
            covered, "gh", "left_anti"
        )
    from pyspark.sql import Window

    sel = docs.sparkSession.createDataFrame(
        out, "step int, source string, marginal_gain long"
    )
    w_cum = Window.orderBy("step").rowsBetween(Window.unboundedPreceding, 0)
    # cum_coverage rounded ENGINE-side (F.round half-up matches the
    # oracle's SQL round — python's round() is half-even and diverges)
    # padded NULL-source rows get NULL cum_coverage too (the oracle's
    # NULL gain poisons its cumulative sum; Spark's SUM skips NULLs,
    # so gate on source IS NOT NULL explicitly)
    return sel.select(
        "step",
        "source",
        "marginal_gain",
        F.when(
            F.lit(universe > 0) & F.col("source").isNotNull(),
            F.round(
                F.sum("marginal_gain").over(w_cum).cast("double")
                / F.lit(float(universe or 1)),
                9,
            ),
        ).alias("cum_coverage"),
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-benchmark-doc n-gram contamination RATE — the audit twin of
    :func:`ngram_decontaminate`'s binary drop. For every benchmark doc,
    the fraction of its DISTINCT token n-grams that appear anywhere in
    the training corpus (the GPT-3 appendix-C style overlap measure):
    1.0 means the doc is fully recoverable from training text, 0.0
    means no n-gram leaks. Returns (id, n_grams, n_hit, overlap_frac).

    Shape at 100 TB: the corpus gram set is distinct'd once
    (hash-partitioned on the gram), the benchmark's per-doc distinct
    grams LEFT SEMI join it on the gram key, and the per-doc counts are
    two map-side-combinable aggregates — the benchmark side is eval-
    suite-sized, so the join is broadcast-friendly under AQE. Exact
    integer counts, one division at render."""
    from .dedup import token_shingles

    corpus_grams = (
        token_shingles(corpus, text_col=text_col, id_col=id_col, k=n)
        .select("shingle")
        .distinct()
    )
    bench_grams = token_shingles(benchmark, text_col=text_col, id_col=id_col, k=n)
    totals = bench_grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    hits = (
        bench_grams.join(corpus_grams, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0).cast("long"))
    return (
        totals.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            "n_grams",
            n_hit.alias("n_hit"),
            F.round(
                n_hit.cast("double") / F.col("n_grams").cast("double"), 6
            ).alias("overlap_frac"),
        )
    )


def truncation_loss(
    docs: DataFrame,
    lengths: tuple[int, ...] = (64, 128, 256),
    text_col: str = "text",
) -> DataFrame:
    """Context-length sizing audit: for each candidate max sequence
    length, how many docs would be truncated and what fraction of all
    corpus tokens falls past the cut — the table that picks max_seq_len
    before a training run (too short wastes text, too long wastes
    compute on padding). Token count is the whitespace-split length
    (the dl convention shared with bm25/query-likelihood).

    Shape at 100 TB: one scan computes per-doc token counts, a literal
    explode fans each count to the |lengths| budget rows (narrow
    integers, map-side combined), and the aggregate is |lengths| rows
    of exact integer sums with one division at render — no shuffle of
    document text, no window."""
    if not lengths:
        raise ValueError("lengths must be non-empty")
    counts = docs.select(
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tok")
    )
    fanned = counts.select(
        F.explode(F.array(*[F.lit(int(l)) for l in lengths])).alias("max_len"),
        "n_tok",
    )
    lost = F.greatest(F.col("n_tok") - F.col("max_len"), F.lit(0).cast("long"))
    agg = fanned.groupBy("max_len").agg(
        F.sum((F.col("n_tok") > F.col("max_len")).cast("long"))
        .cast("long")
        .alias("n_docs_truncated"),
        F.sum(lost).cast("long").alias("lost_tokens"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )
    return agg.select(
        F.col("max_len").cast("int").alias("max_len"),
        "n_docs_truncated",
        "lost_tokens",
        "total_tokens",
        F.round(
            F.col("lost_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
            6,
        ).alias("loss_frac"),
    )
