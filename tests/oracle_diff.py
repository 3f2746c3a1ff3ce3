"""Local mirror of the driver's DuckDB oracle-differential comparison.

Runs a harness query's Spark DataFrame and its oracle SQL on the same
parquet tables and diffs them at DRIVER strength. Round-6 lesson: the
driver's hash is dtype-sensitive — an oracle whose final projection
leaves a bare ``sum(<integer>)`` comes back from DuckDB as HUGEINT
(Arrow decimal128(38,0)) while Spark emits int64, and the driver
red-flags it even though every value is bit-identical. The original
mirror stringified cells (floats re-rounded to 6dp, ints type-erased)
and could never see that class, so six red rows shipped under an
"ALL PASS" banner. This version therefore:

  * fetches the oracle result as Arrow and FAILS on any
    decimal128/256 column (the known driver-hash killer),
  * compares type KINDS (int/float/bool/string/date/timestamp)
    between the Spark schema and the oracle Arrow schema — width
    differences (int32 vs int64) are tolerated, kind flips are not,
  * compares floats at FULL precision (shortest-roundtrip repr, no
    rounding, no int-collapsing) so ulp-level drift is visible.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import pyarrow as pa

from fordgobike_data_pipeline_spark.schemas import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def type_kind(t) -> str:
    """Collapse an Arrow / Spark type (or its string form) to a
    comparable kind tag. Widths collapse (int32 == int64); kinds
    (int vs float vs string vs date vs timestamp) do not."""
    s = str(t).lower()
    if "decimal" in s:
        return "decimal"
    if "bool" in s:
        return "bool"
    if any(k in s for k in ("int", "long", "short", "byte")):
        return "int"
    if any(k in s for k in ("float", "double", "halffloat")):
        return "float"
    if "timestamp" in s:
        return "timestamp"
    if "date" in s:
        return "date"
    if any(k in s for k in ("string", "utf8", "varchar", "char")):
        return "string"
    return s


def _norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return repr(v)
    if isinstance(v, datetime):
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
    tbl = con.execute(sql).arrow()

    dec = [f"{f.name}:{f.type}" for f in tbl.schema if pa.types.is_decimal(f.type)]
    if dec:
        return False, (
            "oracle emits decimal (driver hash-FAIL even when values "
            f"match): {dec} — CAST the aggregate to BIGINT"
        )

    oracle_cols = list(tbl.schema.names)
    oracle_rows = [tuple(d[c] for c in oracle_cols) for d in tbl.to_pylist()]

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(spark_cols) != sorted(oracle_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"

    spark_kinds = {f.name: type_kind(f.dataType.simpleString()) for f in spark_df.schema.fields}
    oracle_kinds = {f.name: type_kind(f.type) for f in tbl.schema}
    kind_diffs = [
        f"{c}: spark={spark_kinds[c]} oracle={oracle_kinds[c]}"
        for c in spark_kinds
        if spark_kinds[c] != oracle_kinds[c]
    ]
    if kind_diffs:
        return False, f"dtype-kind mismatch (driver hash hazard): {'; '.join(kind_diffs)}"

    if len(spark_rows) != len(oracle_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"

    s = _rows_to_multiset(spark_cols, spark_rows)
    o = _rows_to_multiset(oracle_cols, oracle_rows)
    if s != o:
        diff_s = [r for r in s if r not in set(o)][:5]
        diff_o = [r for r in o if r not in set(s)][:5]
        return False, f"value mismatch:\n  spark-only={diff_s}\n  oracle-only={diff_o}"
    return True, f"ok ({len(s)} rows)"
