"""Permanent gate for the round-6 oracle-dtype foot-gun.

The round driver hashes results dtype-sensitively: DuckDB types a bare
``sum(<integer>)`` as HUGEINT, whose Arrow rendering is
decimal128(38,0), while Spark emits int64 — the driver red-flags the
query even though every value is bit-identical (r6: 6 official FAILs,
29 more mined in the queue, all this one class). This test runs EVERY
registered oracle through DuckDB's Arrow output at sf0.001 and fails
on any decimal column, so the class can never ship again. It also
rejects other Arrow types Spark never emits from these queries
(large_string aside, which duckdb doesn't produce here).
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest

from fordgobike_data_pipeline_spark import harness
from tests.oracle_diff import duckdb_con

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    return duckdb_con(SF_DIR)


def _oracle_items():
    return sorted(harness.all_oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_schema_is_driver_hashable(name: str, sql: str, con) -> None:
    tbl = con.execute(sql).arrow()
    bad = [f"{f.name}:{f.type}" for f in tbl.schema if pa.types.is_decimal(f.type)]
    assert not bad, (
        f"{name}: oracle emits decimal column(s) {bad} — DuckDB HUGEINT/"
        "DECIMAL breaks the driver's dtype-sensitive hash even when values "
        "match Spark's. CAST the offending aggregate to BIGINT (or DOUBLE) "
        "in the oracle's final projection."
    )
