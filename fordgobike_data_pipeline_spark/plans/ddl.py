"""Catalog DDL — the three medallion namespaces as Spark databases.

Replaces the reference's idempotent DDL layer (SURVEY §2.10 D1:
``CREATE SCHEMA/TABLE IF NOT EXISTS`` in include/sql/bronze/init_db.py
:65-104 and silver_ddl.sql:1-75, orchestrated by dags/ddl_dag.py).
Fact-FK indexes (silver_ddl.sql:70-75) have no Spark equivalent — the
levers are parquet min/max pruning and the partition layout chosen at
write time (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .runner import Warehouse

LAYERS = ("bronze", "silver", "gold")


def ensure_namespaces(spark: SparkSession, layers: tuple[str, ...] = LAYERS) -> None:
    """Idempotent database creation (mirrors init_db.py:65: CREATE
    SCHEMA IF NOT EXISTS per layer)."""
    for layer in layers:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {layer}")


def register_warehouse_tables(spark: SparkSession, wh: Warehouse) -> list[str]:
    """Register every published parquet table as an external catalog
    table ``<layer>.<name>`` so downstream consumers address tables by
    name (``spark.table('gold.dm_popular_routes')``), not path."""
    import os

    ensure_namespaces(spark)
    registered = []
    for layer in LAYERS:
        layer_dir = os.path.join(wh.root, layer)
        if not os.path.isdir(layer_dir):
            continue
        for table in sorted(os.listdir(layer_dir)):
            path = os.path.join(layer_dir, table)
            if not os.path.isdir(path):
                continue
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS {layer}.{table} "
                f"USING PARQUET LOCATION '{path}'"
            )
            # partitioned layouts (p_year=.../) read as EMPTY until their
            # partitions are recovered; refresh also invalidates any
            # cached file index after an atomic re-publish
            if any("=" in d for d in os.listdir(path) if os.path.isdir(os.path.join(path, d))):
                spark.sql(f"ALTER TABLE {layer}.{table} RECOVER PARTITIONS")
            spark.sql(f"REFRESH TABLE {layer}.{table}")
            registered.append(f"{layer}.{table}")
    return registered
