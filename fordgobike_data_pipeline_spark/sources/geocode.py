"""Rate-limited reverse-geocode enrichment (SURVEY §2.1 S8).

Reproduces include/modules/get_locations.py:44-122 as an engine
component: the *topology* (dedup → sentinel filter → anti-join against
already-enriched keys → rate-limited per-key REST call → conflict-skip
append) is preserved exactly; the HTTP call itself is injected so tests
use a deterministic fake and production wires a real client.

The side-effecting call sits behind a materialization boundary —
Catalyst cannot reorder across mapInPandas, and the anti-join runs
*before* it, mirroring the reference's cheapest-first ordering
(SURVEY §4: dedup before expensive per-row enrichment).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import LOCATIONS_GEO

GeocodeFn = Callable[[float, float], dict]


def default_geocode_fn(lat: float, lon: float) -> dict:
    """Default slot when no client is configured: fail loudly instead
    of silently geocoding nothing. Wire :class:`HttpReverseGeocodeClient`
    (or any ``geocode_fn(lat, lon) -> dict``) for a live run."""
    raise NotImplementedError(
        "inject a geocode_fn(lat, lon) -> address dict — e.g. "
        "HttpReverseGeocodeClient.from_env(); the reference used a "
        "rate-limited REST geocoder (get_locations.py:68)"
    )


def _http_get_json(url: str, params: dict, headers: dict, timeout: float) -> dict:
    """Default transport: one GET, raise on HTTP error, parse JSON.
    Module-level so client instances stay picklable into mapInPandas
    closures. Swapped out in tests for a canned-response transport."""
    import requests

    response = requests.get(url, headers=headers, params=params, timeout=timeout)
    response.raise_for_status()
    return response.json()


class HttpReverseGeocodeClient:
    """Concrete reverse-geocode client matching the reference's
    behavior (get_locations.py:44-91,115-122): ≥``min_interval`` s
    between requests (:46-51), round-robin API-key rotation per request
    (:115,120), the exact querystring/header shape (:53-65), and the
    12-field address extraction (:70-86). Request failures map to
    ``{"error": ...}`` (:88-89), which :func:`enrich_locations` then
    skips — the conflict-skip row never reaches the sink.

    The HTTP transport is injectable (``http_get``) so unit tests run
    against recorded fixtures with zero network; production uses the
    default ``requests``-backed transport. Instances are picklable
    (plain attributes + module-level transport), so a client can ride a
    mapInPandas closure — each executor task then holds its own rate
    bucket, giving a global rate of parallelism/min_interval exactly as
    documented on enrich_locations."""

    _FIELDS = (
        "highway", "road", "neighbourhood", "suburb",
        "city", "state", "postcode", "country",
    )

    def __init__(
        self,
        url: str,
        host: str,
        api_keys: list[str],
        min_interval: float = 0.05,
        timeout: float = 10.0,
        http_get: Callable[[str, dict, dict, float], dict] = _http_get_json,
    ):
        if not api_keys:
            raise ValueError("api_keys must be non-empty (key rotation needs ≥1)")
        self.url = url
        self.host = host
        self.api_keys = list(api_keys)
        self.timeout = timeout
        self._http_get = http_get
        self._bucket = TokenBucket(min_interval)
        self._n_requests = 0

    @classmethod
    def from_env(cls, **kwargs) -> "HttpReverseGeocodeClient":
        """Build from the reference's env contract (get_locations.py:52,
        62,115): REVERSE_GEOCODE_API_URL, GEOCODE_API_HOST, and
        GEOCODE_API_KEY1..GEOCODE_KEY_COUNT."""
        import os

        n = int(os.environ.get("GEOCODE_KEY_COUNT", "0"))
        keys = [
            k for k in (os.environ.get(f"GEOCODE_API_KEY{i}") for i in range(1, n + 1))
            if k
        ]
        return cls(
            url=os.environ["REVERSE_GEOCODE_API_URL"],
            host=os.environ.get("GEOCODE_API_HOST", ""),
            api_keys=keys,
            **kwargs,
        )

    def __call__(self, lat: float, lon: float) -> dict:
        self._bucket.wait()
        key = self.api_keys[self._n_requests % len(self.api_keys)]
        self._n_requests += 1
        params = {
            "lat": str(lat),
            "lon": str(lon),
            "format": "json",
            "addressdetails": "1",
            "accept-language": "en",
            "namedetails": "0",
        }
        headers = {"x-rapidapi-host": self.host, "x-rapidapi-key": key}
        try:
            payload = self._http_get(self.url, params, headers, self.timeout)
        except Exception as exc:  # noqa: BLE001 — reference maps ALL
            # request failures to an error row (get_locations.py:88-89)
            return {"error": str(exc), "lat": lat, "lon": lon}
        address = payload.get("address") or {}
        place_id = payload.get("place_id")
        out = {
            # JSON place_id is numeric; LOCATIONS_GEO keys it as string
            "location_id": None if place_id is None else str(place_id),
            "latitude": lat,
            "longitude": lon,
            "display_name": payload.get("display_name"),
        }
        for f in self._FIELDS:
            out[f] = address.get(f)
        return out


class TokenBucket:
    """Min-interval limiter (get_locations.py:46-51: ≥0.05 s between
    requests ⇒ ≤20 req/s), one bucket per executor task."""

    def __init__(self, min_interval: float):
        self.min_interval = min_interval
        self._last = 0.0

    def wait(self) -> None:
        now = time.time()
        elapsed = now - self._last
        if elapsed < self.min_interval:
            time.sleep(self.min_interval - elapsed)
        self._last = time.time()


def candidate_coordinates(trips: DataFrame, enriched: DataFrame | None) -> DataFrame:
    """Distinct (lat,long) from start∪end (get_locations.py:16-29),
    minus the (0,0) sentinel (:118), minus already-enriched keys (:119
    — the implicit anti-join)."""
    start = trips.select(
        F.col("start_station_latitude").alias("latitude"),
        F.col("start_station_longitude").alias("longitude"),
    )
    end = trips.select(
        F.col("end_station_latitude").alias("latitude"),
        F.col("end_station_longitude").alias("longitude"),
    )
    coords = start.union(end).distinct()
    # int-cast truncation (toward zero) matches the reference's
    # ``int(lat) == 0 and int(long) == 0`` exactly — floor() would
    # differ for negative near-zero coordinates
    coords = coords.filter(
        ~(
            (F.col("latitude").cast("int") == 0)
            & (F.col("longitude").cast("int") == 0)
        )
    )
    if enriched is not None:
        coords = coords.join(
            enriched.select("latitude", "longitude"), ["latitude", "longitude"], "left_anti"
        )
    return coords


def enrich_locations(
    coords: DataFrame,
    geocode_fn: GeocodeFn = default_geocode_fn,
    min_interval: float = 0.05,
    parallelism: int = 1,
) -> DataFrame:
    """Rate-limited enrichment over the deduped key set via mapInPandas.

    ``parallelism`` caps concurrent API streams (the reference is
    single-threaded; rotating keys would justify >1). The global rate is
    ``parallelism / min_interval`` requests/sec.
    """
    import pandas as pd

    schema = LOCATIONS_GEO

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(min_interval)
        names = [f.name for f in schema.fields]
        for pdf in batches:
            rows = []
            for lat, lon in zip(pdf["latitude"], pdf["longitude"]):
                bucket.wait()
                out = geocode_fn(float(lat), float(lon))
                if "error" in out:
                    continue
                rows.append([out.get(n) for n in names])
            yield pd.DataFrame(rows, columns=names)

    return coords.repartition(parallelism).mapInPandas(run, schema=schema)
