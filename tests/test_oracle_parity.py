"""Oracle-differential tests: every harness query with an oracle must
match DuckDB on sf0.001 (fast local gate; the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from fordgobike_data_pipeline_spark import harness

from .conftest import SF_SMOKE
from .oracle_diff import compare

ORACLE_KEYS = sorted(harness.all_oracle_sql())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, name):
    fn = harness.all_queries()[name]
    sql = harness.all_oracle_sql()[name]
    ok, msg = compare(fn(spark, SF_SMOKE), sql, SF_SMOKE)
    assert ok, f"{name}: {msg}"


def test_all_queries_run_and_nonempty(spark):
    """Queries without an oracle still must run; rows>=0 with stable schema."""
    for name, fn in harness.all_queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())
