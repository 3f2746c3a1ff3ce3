"""SparkSession factory.

Local dev runs ``local[$SPARK_GRAFT_CPUS]`` (default 32) in one JVM; the
same configuration is designed to hold on a multi-executor cluster:

* AQE on — runtime join-strategy switches, skew-join splitting and
  partition coalescing replace hand-tuned physical plans at 100 TB.
* ``spark.sql.shuffle.partitions`` starts small for local scale factors;
  AQE coalescing makes the number a ceiling, not a constant.
* Arrow enabled — every pandas_udf / toPandas crossing is batched.
* Session timezone pinned to UTC so date-part extraction is
  deterministic and matches the DuckDB oracle regardless of host tz.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "fordgobike-spark",
    shuffle_partitions: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with scale-aware defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # INT96 (the historical default) carries no parquet min/max
        # statistics, so timestamp predicates can never skip files or
        # row groups; INT64 micros is the modern lakehouse encoding
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def pin_session_conf(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable conf on a session we did not create.

    The correctness driver passes in its own SparkSession; date-part
    functions (year/hour/…) are timezone-sensitive, so pin UTC to match
    the oracle. All keys here are runtime-mutable.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # events.parquet carries TIMESTAMP(NANOS) — read as long, convert in io
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    return spark
