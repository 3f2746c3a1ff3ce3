"""Training-corpus prep end-to-end — raw docs to packed token shards.

    python examples/corpus_pipeline.py

The LLM-data side of the engine in one script, over the driver
testdata documents table:

  1. extract   — strip synthetic HTML wrappers back to prose
  2. gate      — Gopher rule flags + composite quality score
  3. clean     — quality gate → lang filter → exact dedup → MinHash
                 near-dedup (plans/corpus.clean_corpus, with report)
  4. span-cut  — remove cross-document duplicated 5-gram spans
  5. tokenize  — fit BPE on the survivors, encode to ids
  6. pack      — fixed-length sequences, then deterministic shards
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fordgobike_data_pipeline_spark.io import load_tables, write_training_shards  # noqa: E402
from fordgobike_data_pipeline_spark.operators import bpe, curation, dedup, text  # noqa: E402
from fordgobike_data_pipeline_spark.plans import corpus  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="corpus-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]

    # 1. extract: pretend the corpus arrived as HTML
    html = F.concat(
        F.lit("<html><body><p>"), F.col("text"), F.lit("</p><!-- c --></body></html>")
    )
    extracted = docs.select("doc_id", curation.strip_html(html).alias("text"))

    # 2. gate: Gopher rules (corpus-adapted stopword list)
    flags = text.gopher_quality_flags(
        extracted, min_words=20, stopwords=("the", "a", "value", "table", "row", "key")
    )
    gated = extracted.join(
        flags.filter("gopher_pass").select("doc_id"), "doc_id", "left_semi"
    )
    print(f"== gopher gate: {docs.count()} -> {gated.count()} docs ==")

    # 3. clean: the composed pipeline, with the per-stage report
    cleaned, report = corpus.clean_corpus(gated, min_quality=0.35)
    print("== clean_corpus funnel ==")
    report.show(truncate=False)

    # 4. span-cut: drop verbatim cross-doc spans from the survivors
    cut = dedup.remove_duplicated_spans(cleaned, k=5)
    kept_docs = cut.filter(F.col("n_kept") > 0).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    print(f"== span cut: {cleaned.count()} -> {kept_docs.count()} non-empty docs ==")

    # 4b. audit the survivors before tokenizing: perplexity buckets
    # (keep head / sample middle / audit tail), a leakage-safe split
    # (near-dup clusters never straddle train and eval), and a
    # conformal quality cutoff for future ingests
    buckets = curation.perplexity_buckets(kept_docs)
    print("== perplexity buckets (CCNet head/middle/tail) ==")
    buckets.orderBy("ce_lo").show(truncate=False)
    pairs = dedup.minhash_lsh_pairs(kept_docs, threshold=0.8)
    split = curation.leakage_safe_split(kept_docs, pairs)
    print("== leakage-safe split ==")
    split.groupBy("split").count().show()
    from fordgobike_data_pipeline_spark.operators import quality as quality_ops

    thr = quality_ops.conformal_threshold(
        text.quality_score(kept_docs), "quality", "doc_id", alpha=0.1
    )
    print("== conformal quality threshold (90% coverage) ==")
    thr.show()

    # 4c. order and pair the survivors for training: curriculum
    # terciles (clean first), DPO preference pairs by quality margin
    from fordgobike_data_pipeline_spark.operators import text as text_ops

    q6 = text_ops.quality_score(kept_docs).select(
        "doc_id", (F.round(F.col("quality") * 1e6)).cast("long").alias("q6")
    )
    c1 = quality_ops.rank_select_kth(q6, "q6", "doc_id", k_expr="(n + 2) div 3")
    print("== curriculum cutoff (1st tercile by quality) ==")
    c1.show()

    # 5. tokenize: fit BPE on the final corpus, encode to ids
    merges = bpe.train_bpe(kept_docs, n_merges=120)
    vocab = bpe.bpe_vocab(kept_docs, merges)
    ids = bpe.bpe_encode_ids(kept_docs, merges, vocab)
    print(f"== bpe: {len(merges)} merges, vocab {vocab.count()} ==")

    # 6. pack + shard
    packed = curation.pack_token_ids(ids, seq_len=256, n_buckets=16, pad_id=0)
    print("== packed sequences ==")
    packed.select("pack_bucket", "seq_idx", "n_ids").orderBy(
        "pack_bucket", "seq_idx"
    ).show(5)
    out = os.path.join(tempfile.mkdtemp(prefix="corpus_shards_"), "train")
    n_files = write_training_shards(
        packed, out, order_cols=["pack_bucket", "seq_idx"], rows_per_shard=500
    )
    print(f"== wrote {n_files} training shard file(s) to {out} ==")

    # 7. manifest: order-independent XOR fingerprints per pack bucket,
    # so the consumer can verify the transfer without sorting
    manifest = (
        packed.groupBy("pack_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.expr(
                "bit_xor(cast(conv(substr(md5(concat_ws(',',"
                " transform(ids, x -> cast(x as string)))), 1, 15),"
                " 16, 10) as bigint))"
            ).alias("xor_fingerprint"),
        )
    )
    print("== shard manifest ==")
    manifest.orderBy("pack_bucket").show(5)


if __name__ == "__main__":
    main()
