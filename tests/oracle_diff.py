"""Local mirror of the driver's DuckDB oracle-differential comparison.

Runs a harness query's Spark DataFrame and its oracle SQL on the same
parquet tables, normalizes both to order-insensitive multisets of
stringified rows (columns sorted by name, floats rounded, midnight
timestamps collapsed to dates), and diffs them.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from fordgobike_data_pipeline_spark.schemas import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, datetime):
        if v.time() == datetime.min.time():
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    try:
        import numpy as np

        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, (np.floating,)):
            return _norm_cell(float(v))
        if isinstance(v, np.bool_):
            return str(bool(v))
        if isinstance(v, np.datetime64):
            import pandas as pd

            return _norm_cell(pd.Timestamp(v).to_pydatetime())
    except ImportError:
        pass
    return str(v)


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    """Return (match, message)."""
    con = duckdb_con(sf_dir)
    cur = con.execute(sql)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(spark_cols) != sorted(oracle_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    if len(spark_rows) != len(oracle_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"

    s = _rows_to_multiset(spark_cols, spark_rows)
    o = _rows_to_multiset(oracle_cols, oracle_rows)
    if s != o:
        diff_s = [r for r in s if r not in set(o)][:5]
        diff_o = [r for r in o if r not in set(s)][:5]
        return False, f"value mismatch:\n  spark-only={diff_s}\n  oracle-only={diff_o}"
    return True, f"ok ({len(s)} rows)"
