"""Driver contract for the spark-graft builder (PySpark target).

Delegates to fordgobike_data_pipeline_spark.harness, where every
SURVEY.md §2 operator is registered as a (PySpark query, DuckDB oracle
SQL) pair. See that module for determinism/parity rules.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fordgobike_data_pipeline_spark import harness  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (gold daily-summary shape, SURVEY §2.4 A1) on
    sf0.001; driver checks rows>0."""
    return harness.all_queries()["q_agg_daily_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return harness.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return harness.all_oracle_sql()
