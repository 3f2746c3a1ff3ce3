"""Live-socket integration tests for the three side-effect channels
(SURVEY §2.1 S1/S2, S8, S9): a real in-process HTTP server on a
loopback socket, driven through the PRODUCTION transports
(requests-backed `_default_fetch` / `_http_get_json` /
`_http_post_json`) — no fakes in the transport path. This closes the
"tests only exercise injected fakes" gap: the bucket listing XML
parse, zip download+extract+archive idempotence, the rate-limited
reverse-geocode client (header shape, key rotation, error mapping),
and the per-receiver mailer POST all run over a real socket."""

from __future__ import annotations

import io
import json
import os
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from fordgobike_data_pipeline_spark.sources import csv_source, email_sink, geocode

_CSV = "ride_id,duration\nr1,60\nr2,120\n"


def _zip_bytes() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("201801-trips.csv", _CSV)
    return buf.getvalue()


_LISTING = """<?xml version="1.0" encoding="UTF-8"?>
<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
  <Name>tripdata</Name>
  <Contents><Key>201801-trips.zip</Key></Contents>
  <Contents><Key>readme.txt</Key></Contents>
  <Contents><Key>201802-trips.csv</Key></Contents>
</ListBucketResult>"""


class _State:
    """Recorded requests, shared between handler threads and the test."""

    def __init__(self):
        self.lock = threading.Lock()
        self.geo_headers: list[dict] = []
        self.mail_payloads: list[dict] = []


class _Handler(BaseHTTPRequestHandler):
    state: _State = None  # set per-server

    def log_message(self, *args):  # silence
        pass

    def _send(self, code: int, body: bytes, ctype: str = "application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        u = urlparse(self.path)
        if u.path == "/bucket/":
            self._send(200, _LISTING.encode(), "application/xml")
        elif u.path == "/bucket/201801-trips.zip":
            self._send(200, _zip_bytes(), "application/zip")
        elif u.path == "/bucket/201802-trips.csv":
            self._send(200, _CSV.encode(), "text/csv")
        elif u.path == "/reverse":
            q = parse_qs(u.query)
            lat, lon = float(q["lat"][0]), float(q["lon"][0])
            if lat > 90:  # out-of-range probe → server error
                self._send(500, b"boom")
                return
            with self.state.lock:
                self.state.geo_headers.append(
                    {
                        "host": self.headers.get("x-rapidapi-host"),
                        "key": self.headers.get("x-rapidapi-key"),
                    }
                )
            payload = {
                "place_id": int(lat * 100) * 1000 + int(lon * 100),
                "display_name": f"Station {lat:.2f}/{lon:.2f}",
                "address": {"city": "Springfield", "country": "US", "road": "Main St"},
            }
            self._send(200, json.dumps(payload).encode())
        else:
            self._send(404, b"{}")

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length", "0")))
        payload = json.loads(body or b"{}")
        if self.path == "/mailer":
            if payload.get("receiver_email") == "dead@example.com":
                self._send(502, b'{"error": "mailbox down"}')
                return
            with self.state.lock:
                self.state.mail_payloads.append(payload)
            self._send(200, b'{"status": "sent"}')
        else:
            self._send(404, b"{}")


@pytest.fixture()
def live_server():
    state = _State()
    handler = type("H", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", state
    finally:
        srv.shutdown()


def test_s3_listing_download_extract_idempotent_over_real_http(live_server, tmp_path):
    base, _ = live_server
    raw, ext, arch = str(tmp_path / "raw"), str(tmp_path / "ext"), str(tmp_path / "arch")
    processed = csv_source.download_and_extract(raw, ext, arch, f"{base}/bucket/")
    # the .txt key is filtered by the listing scan; zip + csv arrive
    assert sorted(processed) == sorted(["201801-trips.zip", "201802-trips.csv"])
    assert (tmp_path / "ext" / "201801-trips.csv").read_text() == _CSV
    assert (tmp_path / "ext" / "201802-trips.csv").read_text() == _CSV
    assert os.path.exists(tmp_path / "arch" / "201801-trips.zip")
    # idempotence: the archive is the ledger — a re-run downloads nothing
    assert csv_source.download_and_extract(raw, ext, arch, f"{base}/bucket/") == []


def test_geocode_client_over_real_http_rotates_keys_and_maps_errors(live_server):
    base, state = live_server
    client = geocode.HttpReverseGeocodeClient(
        url=f"{base}/reverse",
        host="local-test",
        api_keys=["k1", "k2"],
        min_interval=0.0,
    )
    a = client(37.77, -122.41)
    b = client(37.80, -122.27)
    assert a["display_name"].startswith("Station 37.77")
    assert a["city"] == "Springfield" and a["country"] == "US"
    assert a["location_id"] is not None
    # HTTP 500 maps to the reference's error row, not an exception
    err = client(99.0, 0.0)
    assert "error" in err and err["lat"] == 99.0
    keys = [h["key"] for h in state.geo_headers]
    assert keys == ["k1", "k2"]  # round-robin rotation, real headers
    assert all(h["host"] == "local-test" for h in state.geo_headers)


def test_geocode_enrichment_end_to_end_over_real_http(spark, live_server):
    """The full S8 path: coords DataFrame → mapInPandas with the real
    client (pickled to executor workers) → real HTTP GETs against the
    loopback server → LOCATIONS_GEO rows."""
    base, _ = live_server
    client = geocode.HttpReverseGeocodeClient(
        url=f"{base}/reverse", host="local-test", api_keys=["k1"], min_interval=0.0
    )
    coords = spark.createDataFrame(
        [(37.77, -122.41), (37.80, -122.27), (99.0, 0.0)],
        "latitude double, longitude double",
    )
    out = geocode.enrich_locations(coords, client, min_interval=0.0).collect()
    # the 500-backed coordinate is conflict-skipped; the others enrich
    assert len(out) == 2
    assert {r.city for r in out} == {"Springfield"}


def test_email_report_over_real_http_continues_past_dead_receiver(live_server):
    base, state = live_server
    results = email_sink.send_report_via_api(
        "pipeline ok: 42 rows",
        f"{base}/mailer",
        ["ops@example.com", "dead@example.com", "eng@example.com"],
        sender_email="noreply@example.com",
        subject="run report",
    )
    by_receiver = {r[0]: r[1] for r in results}
    assert by_receiver == {
        "ops@example.com": True,
        "dead@example.com": False,
        "eng@example.com": True,
    }
    assert [p["receiver_email"] for p in state.mail_payloads] == [
        "ops@example.com",
        "eng@example.com",
    ]
    assert all(p["message"] == "pipeline ok: 42 rows" for p in state.mail_payloads)
