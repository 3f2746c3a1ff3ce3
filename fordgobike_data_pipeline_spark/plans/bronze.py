"""Bronze layer — raw trip ingestion.

Replaces the reference's subprocess pipeline (dags/Bronze_dag.py →
get_data.py download/unzip → load_bronze.py per-file COPY): file
discovery/unzip stays driver-side (sources/csv_source.py); the load is
one declarative CSV scan appended to a parquet table partitioned by
``_batch_id`` so downstream incremental reads are partition-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import TRIPS_RAW


def with_ingest_metadata(trips: DataFrame, batch_id: int) -> DataFrame:
    """Audit + incremental columns.

    * ``created_at`` — CURRENT_TIMESTAMP default (init_db.py:86).
    * ``_batch_id`` — replaces the loaded_to_silver row flag
      (init_db.py:87) with a partition key (SURVEY §2.10 D3).
    * ``trip_id`` — the reference's IDENTITY pk (init_db.py:68) becomes a
      deterministic content hash: distributed, re-run-stable, no global
      counter bottleneck.
    """
    natural_cols = [f.name for f in TRIPS_RAW.fields]
    present = [c for c in natural_cols if c in trips.columns]
    return (
        trips.withColumn("trip_id", F.xxhash64(*present))
        .withColumn("created_at", F.current_timestamp())
        .withColumn("_batch_id", F.lit(batch_id))
    )
