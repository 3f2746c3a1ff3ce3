"""Data-quality operator tests against the notebook's known audits."""

from __future__ import annotations

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.io import load_tables
from fordgobike_data_pipeline_spark.operators import quality

from . import fixtures
from .conftest import SF_SMOKE


def test_null_census_matches_manual(spark):
    trips = fixtures.trips_df(spark)
    out = {r.column: r.n_null for r in quality.null_census(
        trips, ["member_birth_year", "member_gender", "start_station_name"]
    ).collect()}
    rows = fixtures.make_trips()
    assert out["member_birth_year"] == sum(1 for t in rows if t["member_birth_year"] is None)
    assert out["member_gender"] == sum(1 for t in rows if t["member_gender"] is None)
    assert out["start_station_name"] == sum(1 for t in rows if t["start_station_name"] is None)


def test_fk_integrity(spark):
    t = load_tables(spark, SF_SMOKE, ("orders", "customer"))
    ok = quality.fk_integrity(t["orders"], t["customer"], "o_custkey", "c_custkey").first()
    assert ok.ok and ok.n_orphans == 0
    # break it: drop half the dim
    broken = quality.fk_integrity(
        t["orders"], t["customer"].filter(F.col("c_custkey") < 50), "o_custkey", "c_custkey"
    ).first()
    assert not broken.ok and broken.n_orphans > 0
    assert broken.n_checked == t["orders"].count()


def test_range_check(spark):
    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    r = quality.range_check(ev, "value", 0.0, 1e6).first()
    assert r.ok
    r2 = quality.range_check(ev, "value", 0.0, 5.0).first()
    assert not r2.ok and r2.n_out_of_range > 0


def test_expect_unique(spark):
    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    assert quality.expect_unique(ev, ["event_id"]).first().ok
    dup = ev.unionByName(ev.limit(5))
    r = quality.expect_unique(dup, ["event_id"]).first()
    assert not r.ok and r.n_duplicate_keys == 5 and r.n_rows_in_duplicates == 10
