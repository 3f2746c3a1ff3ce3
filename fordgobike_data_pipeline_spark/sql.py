"""SQL front-door — the engine as a SQL surface.

The reference's entire analytical interface is SQL (Postgres views and
marts queried by Power BI, README.md:59-81); Spark *is* a SQL engine,
so parity is registration, not translation:

* ``register_testdata`` — the driver tables as temp views for ad-hoc
  ``spark.sql`` over any scale factor.
* ``register_warehouse`` — the published medallion tables as catalog
  tables ``bronze.* / silver.* / gold.*`` (plans/ddl), the direct
  equivalent of connecting to the reference's Postgres schemas.

A reference user's query like
``SELECT * FROM gold.dm_station_popularity ORDER BY total_trips DESC``
runs verbatim after ``register_warehouse``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import load_tables
from .plans.ddl import register_warehouse_tables
from .plans.runner import Warehouse
from .schemas import TESTDATA_TABLES


def register_testdata(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    load_tables(spark, sf_dir, names, register_views=True)


def register_warehouse(spark: SparkSession, warehouse_root: str) -> list[str]:
    return register_warehouse_tables(spark, Warehouse(warehouse_root))


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run a SQL query against whatever has been registered — thin
    alias kept so the public API reads engine-first."""
    return spark.sql(query)
