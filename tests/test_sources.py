"""Source tests: CSV landing-dir scan with filename-derived period
(S4), idempotent discover/extract (S2/S3), and the rate-limited
geocode enrichment topology (S8/J9)."""

from __future__ import annotations

import csv
import os
import zipfile

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.sources import csv_source, email_sink, geocode

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


# ---------------------------------------------------------------------------
# S8 — concrete HTTP reverse-geocode client (recorded fixture, no network)
# ---------------------------------------------------------------------------

# A recorded nominatim-style response (the shape get_locations.py:70-86
# extracts from), trimmed to the consumed fields.
_GEOCODE_FIXTURE = {
    "place_id": 143081086,
    "display_name": "Market Street, San Francisco, California, USA",
    "address": {
        "road": "Market Street",
        "neighbourhood": "Financial District",
        "suburb": "SoMa",
        "city": "San Francisco",
        "state": "California",
        "postcode": "94105",
        "country": "United States",
    },
}


def _recording_transport(calls, payload=_GEOCODE_FIXTURE):
    def http_get(url, params, headers, timeout):
        calls.append({"url": url, "params": params, "headers": headers,
                      "timeout": timeout})
        return payload

    return http_get


def test_http_geocode_client_extracts_twelve_fields():
    calls = []
    client = geocode.HttpReverseGeocodeClient(
        url="https://geocoder.example/reverse", host="geocoder.example",
        api_keys=["k1"], min_interval=0.0, http_get=_recording_transport(calls),
    )
    out = client(37.7766, -122.4174)
    assert out == {
        "location_id": "143081086", "latitude": 37.7766, "longitude": -122.4174,
        "display_name": "Market Street, San Francisco, California, USA",
        "highway": None, "road": "Market Street",
        "neighbourhood": "Financial District", "suburb": "SoMa",
        "city": "San Francisco", "state": "California",
        "postcode": "94105", "country": "United States",
    }
    # querystring + header shape matches get_locations.py:53-65
    (call,) = calls
    assert call["params"] == {
        "lat": "37.7766", "lon": "-122.4174", "format": "json",
        "addressdetails": "1", "accept-language": "en", "namedetails": "0",
    }
    assert call["headers"] == {
        "x-rapidapi-host": "geocoder.example", "x-rapidapi-key": "k1",
    }
    assert call["timeout"] == 10.0


def test_http_geocode_client_rotates_keys_per_request():
    calls = []
    client = geocode.HttpReverseGeocodeClient(
        url="u", host="h", api_keys=["k1", "k2", "k3"],
        min_interval=0.0, http_get=_recording_transport(calls),
    )
    for _ in range(5):
        client(1.0, 2.0)
    used = [c["headers"]["x-rapidapi-key"] for c in calls]
    assert used == ["k1", "k2", "k3", "k1", "k2"]  # get_locations.py:120


def test_http_geocode_client_enforces_min_interval():
    import time as _t

    client = geocode.HttpReverseGeocodeClient(
        url="u", host="h", api_keys=["k"], min_interval=0.05,
        http_get=_recording_transport([]),
    )
    t0 = _t.time()
    client(1.0, 2.0)
    client(1.0, 2.0)
    client(1.0, 2.0)
    assert _t.time() - t0 >= 0.10  # ≥min_interval between requests (:46-51)


def test_http_geocode_client_maps_transport_failure_to_error_row():
    def broken(url, params, headers, timeout):
        raise OSError("connection refused")

    client = geocode.HttpReverseGeocodeClient(
        url="u", host="h", api_keys=["k"], min_interval=0.0, http_get=broken,
    )
    out = client(3.0, 4.0)
    assert out == {"error": "connection refused", "lat": 3.0, "lon": 4.0}


def test_http_geocode_client_from_env(monkeypatch):
    monkeypatch.setenv("REVERSE_GEOCODE_API_URL", "https://geo.example/r")
    monkeypatch.setenv("GEOCODE_API_HOST", "geo.example")
    monkeypatch.setenv("GEOCODE_KEY_COUNT", "2")
    monkeypatch.setenv("GEOCODE_API_KEY1", "a")
    monkeypatch.setenv("GEOCODE_API_KEY2", "b")
    client = geocode.HttpReverseGeocodeClient.from_env(
        min_interval=0.0, http_get=_recording_transport([])
    )
    assert client.url == "https://geo.example/r"
    assert client.host == "geo.example"
    assert client.api_keys == ["a", "b"]


def test_http_geocode_client_through_enrich_locations(spark):
    """S8 end-to-end: the REAL client class (canned transport) rides
    the mapInPandas enrichment; rows come back with fixture fields and
    the error-row filter still applies."""
    trips = fixtures.trips_df(spark)
    cand = geocode.candidate_coordinates(trips, None)
    client = geocode.HttpReverseGeocodeClient(
        url="u", host="h", api_keys=["k1", "k2"], min_interval=0.0,
        http_get=_recording_transport([]),
    )
    got = geocode.enrich_locations(cand, client, min_interval=0.0).collect()
    assert len(got) == cand.count()
    assert all(r.city == "San Francisco" for r in got)
    assert all(r.location_id == "143081086" for r in got)


# ---------------------------------------------------------------------------
# S1/S2 — bucket listing + download to landing (canned transport)
# ---------------------------------------------------------------------------


def _bucket_fixture(tmp_path):
    """A canned two-object bucket: one zip (containing a csv), one csv."""
    inner = tmp_path / "inner-201802-data.csv"
    _write_csv(inner, fixtures.make_trips(n=2))
    zip_bytes_path = tmp_path / "payload.zip"
    with zipfile.ZipFile(zip_bytes_path, "w") as zf:
        zf.write(inner, arcname="201802-data.csv")
    csv_path = tmp_path / "201803-data.csv"
    _write_csv(csv_path, fixtures.make_trips(n=2))
    listing = b"""<?xml version="1.0"?>
    <ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
      <Contents><Key>201802-data.csv.zip</Key></Contents>
      <Contents><Key>201803-data.csv</Key></Contents>
      <Contents><Key>index.html</Key></Contents>
    </ListBucketResult>"""
    objects = {
        "https://bucket/": listing,
        "https://bucket/201802-data.csv.zip": zip_bytes_path.read_bytes(),
        "https://bucket/201803-data.csv": csv_path.read_bytes(),
    }
    return objects


def test_download_and_extract_end_to_end(tmp_path):
    objects = _bucket_fixture(tmp_path)
    fetches = []

    def fetch(url):
        fetches.append(url)
        return objects[url]

    raw = str(tmp_path / "raw")
    extracted = str(tmp_path / "extracted")
    archive = str(tmp_path / "archive")
    processed = csv_source.download_and_extract(
        raw, extracted, archive, "https://bucket/", fetch_fn=fetch
    )
    assert sorted(processed) == ["201802-data.csv.zip", "201803-data.csv"]
    assert sorted(os.listdir(extracted)) == ["201802-data.csv", "201803-data.csv"]
    # both objects archived, landing dir drained
    assert sorted(os.listdir(archive)) == ["201802-data.csv.zip", "201803-data.csv"]
    assert os.listdir(raw) == []
    # idempotent: the archive is the download ledger (get_data.py:50-51)
    n_fetches = len(fetches)
    assert csv_source.download_and_extract(
        raw, extracted, archive, "https://bucket/", fetch_fn=fetch
    ) == []
    assert len(fetches) == n_fetches + 1  # only the listing re-fetched


def test_download_and_extract_skips_failed_download(tmp_path):
    objects = _bucket_fixture(tmp_path)

    def fetch(url):
        if url.endswith(".zip"):
            raise OSError("503")
        return objects[url]

    processed = csv_source.download_and_extract(
        str(tmp_path / "raw"), str(tmp_path / "x"), str(tmp_path / "a"),
        "https://bucket/", fetch_fn=fetch,
    )
    assert processed == ["201803-data.csv"]  # bad object skipped (:58-60)


# ---------------------------------------------------------------------------
# S9 — report email sink (fake webhook transport)
# ---------------------------------------------------------------------------


def test_send_report_posts_one_payload_per_receiver():
    posts = []

    def fake_post(url, payload, timeout):
        posts.append((url, payload, timeout))
        return {"status": "sent"}

    results = email_sink.send_report_via_api(
        "the report", "http://mailer/send",
        receiver_emails=["a@x.test", "b@x.test"],
        sender_email="pipeline@x.test", sender_name="Pipeline",
        subject="Run report", http_post=fake_post,
    )
    assert results == [
        ("a@x.test", True, "{'status': 'sent'}"),
        ("b@x.test", True, "{'status': 'sent'}"),
    ]
    assert [p[1]["receiver_email"] for p in posts] == ["a@x.test", "b@x.test"]
    # payload shape matches sender.py:23-29
    assert posts[0][1] == {
        "name": "Pipeline", "email": "pipeline@x.test", "subject": "Run report",
        "message": "the report", "receiver_email": "a@x.test",
    }
    assert posts[0][2] == 10.0


def test_send_report_failure_does_not_stop_remaining_receivers():
    def flaky_post(url, payload, timeout):
        if payload["receiver_email"] == "bad@x.test":
            raise OSError("mailer down")
        return {"ok": True}

    results = email_sink.send_report_via_api(
        "r", "http://mailer/send",
        receiver_emails=["bad@x.test", "good@x.test"], http_post=flaky_post,
    )
    assert [(r[0], r[1]) for r in results] == [
        ("bad@x.test", False), ("good@x.test", True),
    ]
    assert "mailer down" in results[0][2]


def test_send_report_from_env(monkeypatch):
    monkeypatch.setenv("RECEIVER_EMAILS", " a@x.test, , b@x.test ")
    monkeypatch.setenv("SENDER_EMAIL", "s@x.test")
    monkeypatch.setenv("EMAIL_NAME", "Bot")
    monkeypatch.setenv("EMAIL_SUBJ", "Daily")
    posts = []

    def fake_post(url, payload, timeout):
        posts.append(payload)
        return {}

    results = email_sink.send_report_from_env("m", "http://m/send", http_post=fake_post)
    assert [r[0] for r in results] == ["a@x.test", "b@x.test"]  # blanks dropped
    assert posts[0]["name"] == "Bot" and posts[0]["subject"] == "Daily"


# ---------------------------------------------------------------------------
# JSONL source/sink (sources/jsonl.py)
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip_preserves_hostile_text(spark, tmp_path):
    """Embedded newlines, quotes, tabs, unicode, and NULLs must survive
    the JSON escape/unescape cycle byte-exactly."""
    from pyspark.sql import types as T

    from fordgobike_data_pipeline_spark.sources import jsonl

    rows = [
        (1, 'line1\nline2\t"quoted" \\backslash\\', "en"),
        (2, "ünïcødé — 中文 🚲", "zh"),
        (3, None, None),  # null text and metadata
        (4, "", "en"),  # empty string is NOT null
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "shards")
    jsonl.write_jsonl(df, path, compression="gzip")
    back = {r.doc_id: (r.text, r.lang) for r in jsonl.read_jsonl(spark, path, schema).collect()}
    want = {i: (t, l) for i, t, l in rows}
    # Spark's json sink omits null fields; they read back as null —
    # but an empty string must stay an empty string
    assert back == want
    assert back[4][0] == ""


def test_jsonl_corrupt_lines_quarantine_not_fail(spark, tmp_path):
    """A malformed line degrades to a quarantine row (keep_corrupt) or
    is dropped (default); it never fails the scan."""
    from pyspark.sql import types as T

    from fordgobike_data_pipeline_spark.sources import jsonl

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    clean = jsonl.read_jsonl(spark, str(p), schema)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    kept = jsonl.read_jsonl(spark, str(p), schema, keep_corrupt=True)
    corrupt = [r for r in kept.collect() if r[jsonl.CORRUPT_COL] is not None]
    assert len(corrupt) == 1 and "not json" in corrupt[0][jsonl.CORRUPT_COL]


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    """The ORC read surface matches parquet's: predicate pushdown and
    column pruning must reach the scan."""
    from fordgobike_data_pipeline_spark.io import load_tables

    from .conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ("documents",))["documents"].select(
        "doc_id", "text", "lang", "source"
    )
    path = str(tmp_path / "orc")
    docs.write.mode("overwrite").orc(path)
    q = spark.read.orc(path).filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters")[1][:200]
    rs = plan.split("ReadSchema")[1][:200]
    assert "text" not in rs  # pruned
    assert q.count() == docs.filter(F.col("lang") == "en").count()
