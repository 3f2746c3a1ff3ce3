"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM training-data pipelines actually speak (raw crawl shards, curated
corpora, SFT conversations all ship as ``*.jsonl[.gz|.zst]``).

Schema-EXPLICIT on read: ``spark.read.json`` without a schema runs a
whole extra inference pass over the data (a second full scan at 100 TB)
and silently widens/nulls mismatched fields. Here the caller always
supplies the schema; malformed lines go to a quarantine column instead
of killing the job (PERMISSIVE + ``columnNameOfCorruptRecord``), so one
bad shard out of thousands degrades to a filterable row, not a failed
stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write one JSON object per line (Spark's json sink is JSONL by
    construction — one object per row, newline-separated, one file per
    partition). ``compression``: any codec the build's text sink
    supports (gzip/lz4/snappy/bzip2/deflate here; zstd where the
    hadoop native codec is present — prefer it for corpus shards when
    available). Text content is JSON-escaped, so embedded
    newlines/quotes/unicode round-trip exactly."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-explicit JSONL scan; malformed lines never fail the task.

    Default: DROPMALFORMED — bad lines vanish at parse time, no
    synthetic column in the result (a PERMISSIVE scan filtered on the
    corrupt column would break under aggressive column pruning:
    Spark disallows raw-JSON queries whose only referenced column is
    ``_corrupt_record``, which is exactly what ``count()`` prunes such
    a plan to). ``keep_corrupt=True``: PERMISSIVE with the quarantine
    column exposed, for routing rejects to a dead-letter sink.
    Compression is inferred per file from the extension, so mixed
    .jsonl/.jsonl.gz shards read in one pass."""
    if keep_corrupt:
        full = (
            schema.add(CORRUPT_COL, T.StringType())
            if CORRUPT_COL not in schema.names
            else schema
        )
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
