"""Self-tests for the hardened oracle-differential comparator.

The mirror IS the round's correctness instrument — round 6 shipped six
official failures precisely because the old comparator stringified
cells and re-rounded floats, hiding dtype- and ulp-level mismatches.
These tests pin the hardened behaviors so the mirror can never
silently regress back: decimal detection, type-kind comparison, and
full-precision float comparison."""

from __future__ import annotations

import pytest

from tests.oracle_diff import compare, duckdb_con, type_kind

SF = "/root/testdata/sf0.001"


def test_type_kind_collapse():
    assert type_kind("bigint") == type_kind("int32") == "int"
    assert type_kind("double") == type_kind("float") == "float"
    assert type_kind("decimal128(38, 0)") == "decimal"
    assert type_kind("timestamp[us]") == "timestamp"
    assert type_kind("date32[day]") == "date"
    assert type_kind("string") == type_kind("varchar") == "string"
    # bool must not be swallowed by other branches
    assert type_kind("bool") == "bool"


def test_compare_flags_decimal_oracle(spark):
    sdf = spark.sql("SELECT CAST(10 AS BIGINT) AS s")
    # DuckDB types sum(INTEGER) as HUGEINT -> Arrow decimal128
    ok, msg = compare(sdf, "SELECT sum(x) AS s FROM (VALUES (4), (6)) t(x)", SF)
    assert not ok and "decimal" in msg


def test_compare_flags_kind_mismatch_int_vs_float(spark):
    sdf = spark.sql("SELECT CAST(10 AS DOUBLE) AS s")
    ok, msg = compare(sdf, "SELECT CAST(10 AS BIGINT) AS s", SF)
    assert not ok and "dtype-kind" in msg


def test_compare_full_precision_floats(spark):
    # differ only in the 15th significant digit — the old 6dp mirror
    # called this a match; the driver-strength mirror must not
    sdf = spark.sql("SELECT CAST(252159.777321785 AS DOUBLE) AS v")
    ok, msg = compare(sdf, "SELECT CAST(252159.777321786 AS DOUBLE) AS v", SF)
    assert not ok and "value mismatch" in msg
    ok, _ = compare(sdf, "SELECT CAST(252159.777321785 AS DOUBLE) AS v", SF)
    assert ok


def test_compare_passes_equal_result(spark):
    sdf = spark.sql("SELECT 'a' AS k, CAST(1 AS BIGINT) AS n")
    ok, msg = compare(sdf, "SELECT 'a' AS k, CAST(1 AS BIGINT) AS n", SF)
    assert ok, msg


def test_duckdb_con_registers_all_views():
    con = duckdb_con(SF)
    n = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert n > 0
