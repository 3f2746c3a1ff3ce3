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
    """Production slot for the real reverse-geocode client
    (get_locations.py:44-91 calls a RapidAPI geocoder with rotating
    keys). No network access here — inject a real client to use."""
    raise NotImplementedError(
        "inject a geocode_fn(lat, lon) -> address dict; the reference "
        "used a rate-limited REST geocoder (get_locations.py:68)"
    )


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
