"""Distributed parquet FOOTER harvest — table statistics without
scanning data.

File-level min/max/row-count statistics are what data skipping, small-
file detection, and compaction planning run on; at 100 TB you cannot
afford a data scan just to learn the layout. Footers are O(KB) per
file regardless of file size, so the harvest reads metadata only:
the driver lists paths (file discovery is driver-side protocol, same
as sources/csv_source.py), and the footer READS are distributed — a
``mapInPandas`` over the path list, each task opening only its files'
footers with pyarrow. A million-file lake harvests with a thousand
parallel footer readers and zero data I/O.

Reference capability analogue: the reference trusts Postgres system
catalogs (pg_class.reltuples) for table stats; a lake engine has to
assemble the same view from file metadata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FOOTER_SCHEMA = (
    "path STRING, file_name STRING, n_row_groups INT, "
    "n_rows BIGINT, n_byte_size BIGINT"
)


def list_parquet_files(root: str) -> list[str]:
    """Recursive listing of parquet data files under ``root`` (sorted
    for determinism; `_`/`.`-prefixed bookkeeping files skipped)."""
    out: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def harvest_footers(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One row per parquet file, from FOOTER METADATA ONLY: row-group
    count, metadata row count, and total compressed byte size of the
    column chunks. No data pages are read.

    The path list is parallelized across the cluster and each task
    opens its own files' footers (Arrow ``ParquetFile.metadata``), so
    harvest cost scales with |files|/parallelism, not with data size.
    """
    n_slices = max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    pdf = spark.createDataFrame([(p,) for p in paths], "path STRING").repartition(
        n_slices
    )

    def _read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            rows = []
            for p in b["path"]:
                md = pq.ParquetFile(p).metadata
                total_bytes = sum(
                    md.row_group(i).total_byte_size for i in range(md.num_row_groups)
                )
                rows.append(
                    (p, os.path.basename(p), md.num_row_groups, md.num_rows, total_bytes)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "file_name",
                    "n_row_groups",
                    "n_rows",
                    "n_byte_size",
                ],
            )

    return pdf.mapInPandas(_read_footers, FOOTER_SCHEMA)
