"""Footer harvest correctness and small-file compaction behavior."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import warehouse
from fordgobike_data_pipeline_spark.sources import parquet_meta


def test_harvest_footers_counts_match_data(spark, tmp_path):
    root = str(tmp_path / "t")
    spark.range(1000).withColumn("k", F.col("id") % 7).repartition(8).write.parquet(
        root
    )
    paths = parquet_meta.list_parquet_files(root)
    assert len(paths) == 8
    rows = parquet_meta.harvest_footers(spark, paths).collect()
    assert len(rows) == 8
    assert sum(r.n_rows for r in rows) == 1000
    assert all(r.n_row_groups >= 1 and r.n_byte_size > 0 for r in rows)
    assert {r.file_name for r in rows} == {os.path.basename(p) for p in paths}


def test_compact_small_files_merges_and_preserves_data(spark, tmp_path):
    root = str(tmp_path / "frag")
    spark.range(500).withColumn("v", F.col("id") * 3).repartition(20).write.parquet(
        root
    )
    assert len(parquet_meta.list_parquet_files(root)) == 20
    stats = warehouse.compact_small_files(spark, root, target_file_bytes=1 << 30)
    assert stats["n_files_before"] == 20
    assert stats["n_files_after"] == 1
    back = spark.read.parquet(root)
    assert back.count() == 500
    assert back.agg(F.sum("v")).first()[0] == sum(i * 3 for i in range(500))


def test_compact_partitioned_one_file_per_partition(spark, tmp_path):
    root = str(tmp_path / "part")
    df = spark.range(300).withColumn("p", (F.col("id") % 3).cast("string"))
    # fragment: several files per partition dir
    df.repartition(10).write.partitionBy("p").parquet(root)
    assert len(parquet_meta.list_parquet_files(root)) > 3
    warehouse.compact_small_files(
        spark, root, target_file_bytes=1 << 30, partition_by=["p"]
    )
    files = parquet_meta.list_parquet_files(root)
    # hash-repartitioned on p: each partition dir collapses to one file
    by_dir = {}
    for f in files:
        by_dir.setdefault(os.path.dirname(f), []).append(f)
    assert set(len(v) for v in by_dir.values()) == {1}
    assert len(by_dir) == 3
    assert spark.read.parquet(root).count() == 300


def test_compact_sorted_clusters_ranges(spark, tmp_path):
    root = str(tmp_path / "sorted")
    spark.range(1000).withColumn(
        "k", (F.col("id") * 37) % 1000
    ).repartition(16).write.parquet(root)
    warehouse.compact_small_files(
        spark, root, target_file_bytes=1, sort_cols=["k"]
    )
    # target 1 byte forces n_out > 1; range partitioning means file
    # min/max ranges must not overlap
    paths = parquet_meta.list_parquet_files(root)
    assert len(paths) > 1
    spans = []
    for p in paths:
        import pyarrow.parquet as pq

        t = pq.read_table(p, columns=["k"])["k"].to_pylist()
        if t:
            spans.append((min(t), max(t)))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo

