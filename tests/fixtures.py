"""Deterministic FordGoBike-shaped fixture (FIXTURES.md §1) for the
end-to-end pipeline test. Exercises every reference data quirk: 'NULL'
string sentinels, (0,0) coordinate sentinels, null genders/birth
years/bike_share, birth-year age outliers, non-California geocodes,
duplicate (lat,long) with differing station names, midnight-crossing
trips."""

from __future__ import annotations

import datetime as dt
import random

# station catalog: (name, lat, lon) — CA unless noted
STATIONS = [
    ("Market St at 10th St", 37.7766, -122.4174),
    ("San Jose Diridon", 37.3297, -121.9026),
    ("Oakland 19th St", 37.8081, -122.2686),
    ("Emeryville Town Hall", 37.8312, -122.2852),
    ("Reno Test Depot", 39.5296, -119.8138),  # non-CA geocode
]


def make_trips(n: int = 240, seed: int = 7, start_day: int = 0) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    base = dt.datetime(2018, 1, 5, 6, 0, 0)
    for i in range(n):
        s = rng.randrange(len(STATIONS))
        e = rng.randrange(len(STATIONS))
        name_s, lat_s, lon_s = STATIONS[s]
        name_e, lat_e, lon_e = STATIONS[e]
        start = base + dt.timedelta(
            days=start_day + rng.randrange(4), minutes=rng.randrange(1000), seconds=rng.randrange(60)
        )
        duration = rng.choice([90, 125, 300, 660, 1234, 86369])
        # data quirks
        if i % 37 == 0:
            lat_s, lon_s, name_s = 0.0, 0.0, None  # (0,0) sentinel
        if i % 23 == 0:
            name_e = "NULL"  # literal string sentinel
        birth = rng.choice([None, 1878, 1985, 1992, 2001, 2017])  # outliers incl.
        gender = rng.choice([None, "Male", "Female", "Other"])
        share = rng.choice([None, "Yes", "No"])
        rows.append(
            dict(
                duration_sec=duration,
                start_time=start,
                end_time=start + dt.timedelta(seconds=duration),
                start_station_id=str(float(s + 10)),
                start_station_name=name_s,
                start_station_latitude=lat_s,
                start_station_longitude=lon_s,
                end_station_id=str(float(e + 10)),
                end_station_name=name_e,
                end_station_latitude=lat_e,
                end_station_longitude=lon_e,
                bike_id=str(rng.randrange(10, 700)),
                user_type=rng.choice(["Customer", "Subscriber"]),
                member_birth_year=birth,
                member_gender=gender,
                bike_share_for_all_trip=share,
                period="201801",
            )
        )
    return rows


def make_locations_geo() -> list[dict]:
    """Geocode rows for the station coordinates (plus the non-CA one);
    one CA city deliberately NULL to exercise the Emeryville default."""
    rows = []
    for i, (name, lat, lon) in enumerate(STATIONS):
        state = "California" if i != 4 else "Nevada"
        city = None if i == 3 else f"City{i}"
        rows.append(
            dict(
                location_id=f"place_{i}",
                latitude=lat,
                longitude=lon,
                highway=None,
                road=f"Road {i}",
                neighbourhood=None,
                suburb=None,
                city=city,
                state=state,
                postcode=f"9{i:04d}",
                country="United States",
                display_name=f"{name}, {city or 'Emeryville'}, {state}",
            )
        )
    return rows


def trips_df(spark, rows=None):
    from fordgobike_data_pipeline_spark.schemas import TRIPS_RAW

    return spark.createDataFrame(rows or make_trips(), TRIPS_RAW)


def locations_df(spark):
    from fordgobike_data_pipeline_spark.schemas import LOCATIONS_GEO

    return spark.createDataFrame(make_locations_geo(), LOCATIONS_GEO)
