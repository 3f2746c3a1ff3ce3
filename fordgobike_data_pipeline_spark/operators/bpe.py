"""Byte-pair encoding — honest BPE training + distributed encoding.

Replaces the regex token-count proxy (text.token_count_bpe_ish) with a
real BPE when exact token budgeting matters. The split of work follows
how BPE actually scales:

- **Training needs only the word-frequency table**, not the corpus:
  the classic trainer's sufficient statistic is ``{word: count}``.
  Spark computes that table distributed (regexp pre-tokenize → explode
  → groupBy — one shuffle on the word key, map-side combinable), takes
  the top ``max_vocab_words`` by count (TakeOrdered — no global sort
  materialization), and ships that *bounded* table to the driver where
  a plain-Python merge loop runs. At 100 TB the word table is
  Heaps-law-bounded (millions), the top-N cap makes it constant.
- **Encoding is embarrassingly parallel**: an Arrow-batched
  ``pandas_udf`` applies the learned merge ranks per word, memoized
  per distinct word per batch (natural-language batches repeat words
  heavily, so the merge loop runs once per distinct word, not once per
  token). The merge table rides the closure — bounded control data,
  the same broadcast shape as the IVF centroid matrix.

Determinism: merge selection tie-breaks by (count desc, pair lexic.
asc); encoding is a pure function of (text, merges). Re-runs and
repartitionings reproduce byte-identical output.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .text import TOKEN_RE

_MAX_DRIVER_WORDS = 2_000_000  # hard guard on driver-side control data


def word_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distributed (word, count) table under the BPE pre-tokenizer
    regex (words ∪ single punctuation marks). One map-side-combinable
    shuffle on the word key."""
    return (
        docs.select(
            F.explode(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def learn_bpe_merges(
    wc: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE trainer over a word-frequency dict (driver-side,
    pure Python — the input is vocabulary-sized control data, not the
    corpus). Deterministic: each round merges the (count desc, pair
    asc) best adjacent symbol pair; stops early when no pair repeats."""
    words: list[tuple[list[str], int]] = [(list(w), c) for w, c in sorted(wc.items())]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for syms, _c in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    max_vocab_words: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Fit BPE merges on a corpus: distributed word counts → bounded
    top-``max_vocab_words`` table to the driver → Python merge loop.
    ``max_vocab_words`` caps driver memory; the dropped tail is
    low-count words that barely influence pair statistics (the same
    truncation every practical BPE trainer applies)."""
    if max_vocab_words > _MAX_DRIVER_WORDS:
        raise ValueError(
            f"max_vocab_words={max_vocab_words} exceeds the driver-side "
            f"control-data guard ({_MAX_DRIVER_WORDS}); BPE training only "
            "needs the head of the word-frequency table"
        )
    top = (
        word_counts(docs, text_col=text_col)
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_vocab_words)
        .collect()
    )
    return learn_bpe_merges({r.word: r["count"] for r in top}, n_merges)


def merges_table(docs_or_spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned merges as a (rank, left, right) DataFrame — the
    auditable artifact a pipeline persists next to the tokenized
    corpus."""
    spark = getattr(docs_or_spark, "sparkSession", docs_or_spark)
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string",
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact BPE token count per doc under the learned merges — the
    honest replacement for the regex proxy when budgeting tokens.
    Arrow-batched; the merge loop runs once per *distinct* word per
    batch (memoized), then counts aggregate via a vectorized map."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    tok_re = re.compile(TOKEN_RE)

    @pandas_udf("int")
    def n_bpe(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def count_one(t: str) -> int:
            total = 0
            for w in tok_re.findall(t or ""):
                n = memo.get(w)
                if n is None:
                    n = len(_encode_word(w, ranks))
                    memo[w] = n
                total += n
            return total

        return texts.map(count_one).astype("int32")

    return docs.select(F.col(id_col), n_bpe(F.col(text_col)).alias("n_bpe_tokens"))


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full BPE tokenization: (id, array<string> tokens). Same batched
    + memoized shape as :func:`bpe_token_count`; kept separate so the
    count-only path never materializes token arrays."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    tok_re = re.compile(TOKEN_RE)

    @pandas_udf("array<string>")
    def toks(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def encode_one(t: str) -> list[str]:
            out: list[str] = []
            for w in tok_re.findall(t or ""):
                enc = memo.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    memo[w] = enc
                out.extend(enc)
            return out

        return texts.map(encode_one)

    return docs.select(F.col(id_col), toks(F.col(text_col)).alias("bpe_tokens"))


def bpe_vocab(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """The (token_id, symbol) vocabulary table — the persisted artifact
    a tokenized corpus ships with.

    ids 0..C-1 are the corpus's distinct base characters under the
    pre-tokenizer (computed distributed, sorted for determinism);
    C+rank is the symbol produced by merge ``rank``. Every symbol
    :func:`bpe_encode` can emit is therefore covered: unmergeable
    symbols are base characters, merged symbols appear in rank order.
    Two merges can concatenate to the same string (('a','bc') and
    ('ab','c') both yield 'abc'); the table keeps one row per symbol —
    the LOWEST token_id — so downstream symbol→id maps are
    order-independent. Bounded control data (≤ |alphabet| + n_merges
    rows)."""
    chars = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
            ).alias("word")
        )
        .select(F.explode(F.split(F.col("word"), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .distinct()
        .orderBy("ch")
        .collect()
    )  # alphabet-sized control data, not corpus data
    spark = docs.sparkSession
    base = [(i, r.ch) for i, r in enumerate(chars)]
    merged = [
        (len(base) + rank, left + right) for rank, (left, right) in enumerate(merges)
    ]
    seen: dict[str, int] = {}
    for tid, sym in base + merged:  # ascending id → first wins = min id
        seen.setdefault(sym, tid)
    rows = sorted((tid, sym) for sym, tid in seen.items())
    return spark.createDataFrame(rows, "token_id int, symbol string")


def bpe_encode_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize to integer ids: (id, array<int> token_ids) — what the
    training-shard writer consumes. Same memoized Arrow batch shape as
    bpe_encode; the symbol→id map rides the closure (bounded control
    data, like the merge ranks). A symbol outside the vocab (possible
    only when the vocab was fitted on a DIFFERENT corpus) maps to -1
    rather than raising mid-job — count them downstream to decide
    whether the vocab needs refitting."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    sym_id: dict[str, int] = {}
    for r in vocab.collect():  # min-id wins, whatever the row order
        if r.symbol not in sym_id or r.token_id < sym_id[r.symbol]:
            sym_id[r.symbol] = r.token_id
    tok_re = re.compile(TOKEN_RE)

    @pandas_udf("array<int>")
    def ids(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[int]] = {}

        def encode_one(t: str) -> list[int]:
            out: list[int] = []
            for w in tok_re.findall(t or ""):
                enc = memo.get(w)
                if enc is None:
                    enc = [sym_id.get(s, -1) for s in _encode_word(w, ranks)]
                    memo[w] = enc
                out.extend(enc)
            return out

        return texts.map(encode_one)

    return docs.select(F.col(id_col), ids(F.col(text_col)).alias("token_ids"))
