"""Quickstart — the engine end-to-end in one script.

    python examples/quickstart.py

Runs the medallion pipeline on a small synthetic FordGoBike batch,
registers the warehouse in the catalog, queries it with plain SQL,
and demos the training-data operators on the driver testdata.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import functions as F  # noqa: E402

from fordgobike_data_pipeline_spark import sql as engine_sql  # noqa: E402
from fordgobike_data_pipeline_spark.io import load_tables  # noqa: E402
from fordgobike_data_pipeline_spark.operators import dedup, similarity  # noqa: E402
from fordgobike_data_pipeline_spark.plans import runner  # noqa: E402
from fordgobike_data_pipeline_spark.plans.runner import Warehouse  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    import fixtures  # FordGoBike-shaped synthetic batch (tests/fixtures.py)

    spark = get_spark(app_name="quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. medallion pipeline: bronze → silver star schema → gold marts
    wh = Warehouse(tempfile.mkdtemp(prefix="quickstart_"))
    runner.run_pipeline(
        spark, wh, fixtures.trips_df(spark), fixtures.locations_df(spark), batch_id=1
    )

    # 2. the reference user's SQL, verbatim, via the catalog
    engine_sql.register_warehouse(spark, wh.root)
    print("== station popularity (SQL) ==")
    engine_sql.sql(
        spark,
        """SELECT station_name, total_trips_started, total_trips_ended, net_flow
           FROM gold.dm_station_popularity ORDER BY total_trips DESC""",
    ).show(truncate=False)

    # 3. training-data operators on the testdata corpus
    sf = "/root/testdata/sf0.001"
    docs = load_tables(spark, sf, ("documents",))["documents"]
    emb = load_tables(spark, sf, ("embeddings",))["embeddings"]

    print("== near-duplicate documents (MinHash-LSH, Jaccard ≥ 0.8) ==")
    dedup.minhash_lsh_pairs(docs, threshold=0.8).show(5)

    print("== nearest neighbours of vector 0 (exact cosine top-5) ==")
    similarity.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=5).show()

    # 4. round-3 additions: curation, chunking, semantic dedup, layout
    from fordgobike_data_pipeline_spark.io import publish_zordered  # noqa: E402
    from fordgobike_data_pipeline_spark.operators import curation, text  # noqa: E402

    print("== corpus-wide top-10 bigrams (boilerplate heavy hitters) ==")
    text.top_ngrams(docs, n=2, k=10).show(truncate=False)

    print("== RAG chunking: 32-token windows, stride 16 (first doc) ==")
    curation.chunk_documents(docs, chunk_tokens=32, stride=16).filter(
        F.col("doc_id") == 0
    ).show(truncate=60)

    print("== contrastive negatives (2 per anchor, first 5 anchors) ==")
    curation.negative_samples(docs, k=2, n_buckets=8).filter(
        F.col("anchor_id") < 5
    ).show()

    print("== SemDeDup pairs (k-means cells, within-cluster cosine) ==")
    similarity.semantic_dedup_pairs(emb, threshold=0.3, centroid_mod=50).show(5)

    # Z-order clustered publish: tight per-file (user_id, ts) bounding
    # boxes → parquet footer pruning on either predicate
    ev = load_tables(spark, sf, ("events",))["events"]
    zdir = tempfile.mkdtemp(prefix="quickstart_z_") + "/events_z"
    publish_zordered(ev, zdir, ["user_id", "ts"], n_files=4)
    print(f"== z-ordered publish: {zdir} ==")
    spark.read.parquet(zdir).filter(F.col("user_id") == 3).count()


if __name__ == "__main__":
    main()
