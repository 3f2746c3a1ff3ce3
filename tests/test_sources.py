"""Source tests: CSV landing-dir scan with filename-derived period
(S4), idempotent discover/extract (S2/S3), and the rate-limited
geocode enrichment topology (S8/J9)."""

from __future__ import annotations

import csv
import os
import zipfile

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.sources import csv_source, geocode

from . import fixtures

CSV_COLS = [
    "duration_sec", "start_time", "end_time", "start_station_id",
    "start_station_name", "start_station_latitude", "start_station_longitude",
    "end_station_id", "end_station_name", "end_station_latitude",
    "end_station_longitude", "bike_id", "user_type", "member_birth_year",
    "member_gender", "bike_share_for_all_trip",
]


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(CSV_COLS)
        for t in rows:
            w.writerow([t[c] if t[c] is not None else "" for c in CSV_COLS])


def test_read_trips_csv_period_from_filename(spark, tmp_path):
    rows = fixtures.make_trips(n=20)
    extracted = tmp_path / "extracted"
    extracted.mkdir()
    _write_csv(extracted / "201801-fordgobike-tripdata.csv", rows[:10])
    _write_csv(extracted / "2017-fordgobike-tripdata.csv", rows[10:])
    df = csv_source.read_trips_csv(spark, str(extracted))
    assert df.count() == 20
    periods = {r.period for r in df.select("period").distinct().collect()}
    assert periods == {"201801", "2017"}
    # explicit schema applied (no inference)
    assert dict(df.dtypes)["duration_sec"] == "int"
    assert dict(df.dtypes)["start_station_latitude"] == "double"
    assert df.filter(F.col("start_time").isNull()).count() == 0


def test_read_trips_csv_fraction_widths(spark, tmp_path):
    """Raw FordGoBike files carry 4-digit subseconds; other exports use
    6 or none — all must parse (a fixed-width pattern NULLs silently)."""
    extracted = tmp_path / "ex"
    extracted.mkdir()
    rows = fixtures.make_trips(n=3)
    rows[0]["start_time"] = "2017-12-31 16:57:39.6540"
    rows[1]["start_time"] = "2018-01-05 06:34:12.654321"
    rows[2]["start_time"] = "2018-01-05 06:34:12"
    _write_csv(extracted / "2017-data.csv", rows)
    df = csv_source.read_trips_csv(spark, str(extracted))
    got = sorted(r.start_time for r in df.select("start_time").collect())
    assert all(t is not None for t in got)
    assert got[0].microsecond == 654000  # 4-digit fraction → 0.654 s


def test_discover_and_extract_idempotent(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    _write_csv(raw / "201802-data.csv", fixtures.make_trips(n=3))
    with zipfile.ZipFile(raw / "201803-data.zip", "w") as zf:
        zf.writestr("201803-data.csv", "a,b\n1,2\n")
    extracted, archive = str(tmp_path / "ex"), str(tmp_path / "ar")
    done = csv_source.discover_and_extract(str(raw), extracted, archive)
    assert sorted(done) == ["201802-data.csv", "201803-data.zip"]
    assert sorted(os.listdir(extracted)) == ["201802-data.csv", "201803-data.csv"]
    # raw emptied into archive; second run is a no-op
    assert os.listdir(str(raw)) == []
    _write_csv(raw / "201802-data.csv", fixtures.make_trips(n=3))
    assert csv_source.discover_and_extract(str(raw), extracted, archive) == []


def test_geocode_enrichment_topology(spark):
    trips = fixtures.trips_df(spark)
    # already-enriched: first station → must be skipped by the anti-join
    enriched = fixtures.locations_df(spark).limit(1)
    cand = geocode.candidate_coordinates(trips, enriched)
    coords = {(round(r.latitude, 4), round(r.longitude, 4)) for r in cand.collect()}
    assert (0.0, 0.0) not in coords  # sentinel excluded
    assert (37.7766, -122.4174) not in coords  # anti-joined away
    assert len(coords) == 4  # 5 stations - 1 enriched (incl. non-CA)

    def fake_geocode(lat, lon):
        # runs in executor workers — observable only through the output
        return dict(
            location_id=f"p_{lat}_{lon}", latitude=lat, longitude=lon,
            highway=None, road="R", neighbourhood=None, suburb=None,
            city="C", state="California", postcode="9", country="US",
            display_name="D",
        )

    out = geocode.enrich_locations(cand, fake_geocode, min_interval=0.0)
    got = out.collect()
    assert len(got) == 4  # exactly one geocode call per candidate key
    assert len({r.location_id for r in got}) == 4
    assert {(round(r.latitude, 4), round(r.longitude, 4)) for r in got} == coords


def test_list_bucket_keys_parses_s3_xml():
    xml = b"""<?xml version="1.0"?>
    <ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
      <Contents><Key>201801-fordgobike-tripdata.csv.zip</Key></Contents>
      <Contents><Key>2017-fordgobike-tripdata.csv</Key></Contents>
      <Contents><Key>index.html</Key></Contents>
    </ListBucketResult>"""
    urls = csv_source.list_bucket_keys(lambda url: xml, "https://bucket/")
    assert urls == [
        "https://bucket/201801-fordgobike-tripdata.csv.zip",
        "https://bucket/2017-fordgobike-tripdata.csv",
    ]


def test_geocode_error_rows_dropped(spark):
    trips = fixtures.trips_df(spark)
    cand = geocode.candidate_coordinates(trips, None)

    def flaky(lat, lon):
        if lat > 38:
            return {"error": "timeout", "lat": lat, "lon": lon}
        return dict(
            location_id="p", latitude=lat, longitude=lon, highway=None,
            road=None, neighbourhood=None, suburb=None, city=None,
            state="California", postcode=None, country=None, display_name=None,
        )

    got = geocode.enrich_locations(cand, flaky, min_interval=0.0).collect()
    assert all(r.latitude < 38 for r in got)
