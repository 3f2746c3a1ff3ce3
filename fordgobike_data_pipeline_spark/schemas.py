"""Explicit schemas (schema-on-write — no inferSchema in production paths).

Mirrors the reference's fixed DDL approach (`include/sql/bronze/init_db.py:64-106`,
`include/sql/silver/silver_ddl.sql:1-67`) — see SURVEY.md §1.2/§1.3 for the
Postgres→Spark type mapping. Two groups:

1. FordGoBike domain schemas (bronze raw trips + geocoded locations) for
   the end-to-end pipeline (plans/).
2. The driver-provided testdata tables (TESTDATA.md) used by the
   oracle-differential harness.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. FordGoBike domain (reference: include/sql/bronze/init_db.py:67-88)
# ---------------------------------------------------------------------------

# Raw trip rows as landed from CSV. station ids are float-like strings in the
# raw files (e.g. "74.0") — kept as strings in bronze, cleaned in silver,
# matching the reference's VARCHAR(50) columns (init_db.py:72-73,80-81).
TRIPS_RAW = T.StructType(
    [
        T.StructField("duration_sec", T.IntegerType()),
        T.StructField("start_time", T.TimestampType()),
        T.StructField("end_time", T.TimestampType()),
        T.StructField("start_station_id", T.StringType()),
        T.StructField("start_station_name", T.StringType()),
        T.StructField("start_station_latitude", T.DoubleType()),
        T.StructField("start_station_longitude", T.DoubleType()),
        T.StructField("end_station_id", T.StringType()),
        T.StructField("end_station_name", T.StringType()),
        T.StructField("end_station_latitude", T.DoubleType()),
        T.StructField("end_station_longitude", T.DoubleType()),
        T.StructField("bike_id", T.StringType()),
        T.StructField("user_type", T.StringType()),
        T.StructField("member_birth_year", T.IntegerType()),
        T.StructField("member_gender", T.StringType()),
        T.StructField("bike_share_for_all_trip", T.StringType()),
        # injected at load time from the filename prefix
        # (reference: include/sql/bronze/load_bronze.py:48-71)
        T.StructField("period", T.StringType()),
    ]
)

# Reverse-geocoded location lookup, unique on (latitude, longitude)
# (reference: include/sql/bronze/init_db.py:90-104; fields extracted at
# include/modules/get_locations.py:71-87).
LOCATIONS_GEO = T.StructType(
    [
        T.StructField("location_id", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("highway", T.StringType()),
        T.StructField("road", T.StringType()),
        T.StructField("neighbourhood", T.StringType()),
        T.StructField("suburb", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("postcode", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("display_name", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# 2. Driver testdata tables (TESTDATA.md; verified against the sf0.001 files)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
