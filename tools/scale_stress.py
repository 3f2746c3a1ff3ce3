"""Stress the scale operators beyond the provided scale factors by
replicating the sf0.1 corpus N× (id-offset copies — deliberately
creates cross-copy exact/near duplicates, which is exactly the dedup
workload). Prints per-operator wall times.

    python tools/scale_stress.py [replication]

Interpretation note: on this workload every doc has N-1 identical
copies, so EXACT pairwise metrics (containment_pairs, and
exact_jaccard at lower thresholds) emit Θ(docs·N²) true pairs — their
wall time tracks output mass, not wasted candidates (measured: 250k
true pairs at 10×). That output-size blowup, not candidate
generation, is why the sketch paths (minhash/simhash/LSH/SemDeDup)
are the 100 TB route: they return the same duplicate structure in
candidate-bounded time, and dedup_clusters collapses it to one
survivor per group without materializing all pairs."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fordgobike_data_pipeline_spark.operators import dedup, similarity, text  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, id_col, n):
    copies = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000)) for i in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def timed(name, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {name:<24} {time.perf_counter() - t0:>7.2f}s")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs = replicate(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text"),
        "doc_id",
        n,
    )
    emb = replicate(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding"),
        "vec_id",
        n,
    )
    n_docs, n_vecs = docs.count(), emb.count()
    print(f"stress at {n}x sf0.1: {n_docs} docs, {n_vecs} vectors")
    timed("exact_dedup", dedup.exact_dedup(docs, ["text"]))
    timed("minhash_lsh_pairs", dedup.minhash_lsh_pairs(docs, threshold=0.8))
    timed("simhash_pairs", dedup.simhash_pairs(docs, max_hamming=3))
    timed("winnow(xxhash64)", text.winnowing_fingerprints(docs))
    timed("tfidf_top_terms", text.tf_idf_top_terms(docs))
    timed("cosine_pairs_lsh", similarity.cosine_pairs_lsh(emb, threshold=0.9, n_planes=10))
    queries = emb.filter(F.col("vec_id") < 5)
    timed("lsh_ann_topk(mp=1)", similarity.lsh_ann_topk(emb, queries, n_planes=8, multiprobe=1))
    # round-3 operators
    from fordgobike_data_pipeline_spark.operators import curation  # noqa: E402

    sh = dedup.token_shingles(docs, k=3)
    timed("containment_pairs", dedup.containment_pairs(sh, threshold=0.9, max_shingle_freq=50 * n))
    timed("top_ngrams", text.top_ngrams(docs, n=2, k=20))
    timed(
        "semantic_dedup_pairs",
        similarity.semantic_dedup_pairs(emb, threshold=0.95, centroid_mod=200),
    )
    timed("chunk_documents", curation.chunk_documents(docs, chunk_tokens=128, stride=64))
    # scale B with the corpus (constant per-bucket size) — the sizing
    # rule negative_samples documents; fixed B goes quadratic
    timed("negative_samples", curation.negative_samples(docs, k=4, n_buckets=256 * n))
    # round-4 operators: span dedup is Θ(tokens) whatever the dup rate
    # (replication multiplies FLAGGED tokens, not candidate pairs); PQ
    # encode is one einsum pass; ADC joins 8-byte codes against a
    # bounded LUT; URL dedup is one hash agg
    timed("dup_span_stats", dedup.duplicated_span_stats(docs, k=5))
    timed("remove_dup_spans", dedup.remove_duplicated_spans(docs, k=5))
    cb = similarity.pq_codebooks(emb, dim=64, n_subspaces=4, seed_mod=40 * n, n_iter=1)
    timed("pq_encode(einsum)", similarity.pq_encode(emb, cb, dim=64))
    codes = similarity.pq_encode(emb, cb, dim=64).localCheckpoint(eager=True)
    timed("pq_adc_topk", similarity.pq_adc_topk(codes, queries, cb, k=10, dim=64))
    with_url = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://www.site"), (F.col("doc_id") % 1000).cast("string"),
            F.lit(".example.com/p/"), (F.col("doc_id") % 5000).cast("string"),
            F.lit("?utm_source=x&id=1"),
        ).alias("url"),
    )
    timed("url_dedup", curation.url_dedup(with_url))
    timed("bigram_cross_entropy", text.bigram_cross_entropy(docs))
    timed("gopher_quality_flags", text.gopher_quality_flags(docs))


if __name__ == "__main__":
    main()
