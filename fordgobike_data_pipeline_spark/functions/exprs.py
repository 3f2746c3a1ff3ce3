"""Scalar expression library — SURVEY.md §2.6 (F1–F19).

Every helper returns a Column built from pyspark.sql.functions built-ins,
so all of it stays JVM-side inside whole-stage codegen — no Python UDFs in
the hot path. Reference citations point into /root/reference.

Semantics deliberately pinned (SURVEY.md §7 hard parts):
* PG ``EXTRACT(DOW)`` is 0=Sun..6=Sat; Spark ``dayofweek`` is 1=Sun..7=Sat —
  weekend is ``isin(1,7)`` here, ``IN (0,6)`` in Postgres/DuckDB.
* PG ``'x'||substr(md5(..),1,16))::bit(64)::bigint`` two's-complement key is
  reproduced bit-exactly with ``conv(hex,16,-10)`` (negative radix = signed).
* ``ROUND`` half-up matches PG half-away-from-zero for positive inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F1/F2 — hash surrogate keys
# ---------------------------------------------------------------------------


def surrogate_key_md5(*cols: Column | str, sep: str = "|") -> Column:
    """Signed-64 surrogate key, bit-parity with the reference's
    ``('x' || substr(md5(expr),1,16))::bit(64)::bigint``
    (include/sql/silver/silver_load.sql:48,114-119,248-253).

    ``conv(..., 16, -10)`` interprets the 16 hex chars as a signed 64-bit
    value (two's complement), exactly like the PG bit(64)::bigint cast.
    DuckDB oracle equivalent:
    ``cast(cast(from_hex(substr(md5(x),1,16)) as bit) as bigint)``.
    """
    concat = F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])
    return F.conv(F.substring(F.md5(concat), 1, 16), 16, -10).cast("long")


def surrogate_key_xxhash(*cols: Column | str) -> Column:
    """Idiomatic-Spark alternative key: xxhash64 (one JVM op, no md5+string
    round-trip). Preferred for new tables; md5 variant kept for parity."""
    return F.xxhash64(*cols)


# ---------------------------------------------------------------------------
# F4/F5/F6 — cleaning expressions
# ---------------------------------------------------------------------------


def coalesce_default(col: Column | str, default) -> Column:
    """COALESCE with a literal default (silver_load.sql:55,216-217;
    gold_ddl.sql:73,79-84)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def nullif_sentinel(col: Column | str, sentinel: str = "NULL") -> Column:
    """Literal-string sentinel → real NULL (silver_load.sql:60,199,202)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(sentinel))


def age_cleaned_birth_year(
    birth_year: Column | str,
    event_year: Column | str,
    min_age: int = 18,
    max_age: int = 100,
) -> Column:
    """Birth year → NULL when implied age is outside [min_age, max_age]
    at event time (silver_load.sql:209-215)."""
    by = F.col(birth_year) if isinstance(birth_year, str) else birth_year
    ey = F.col(event_year) if isinstance(event_year, str) else event_year
    age = ey - by
    return F.when((age < min_age) | (age > max_age), F.lit(None)).otherwise(by)


# ---------------------------------------------------------------------------
# F7–F11 — date/time expressions
# ---------------------------------------------------------------------------


def weekend_flag(date_col: Column | str) -> Column:
    """Weekend flag. PG: ``EXTRACT(DOW) IN (0,6)`` (silver_load.sql:175-178);
    Spark dayofweek is 1=Sunday..7=Saturday → isin(1,7)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.dayofweek(c).isin(1, 7)


def date_parts(date_col: Column | str) -> dict[str, Column]:
    """EXTRACT(YEAR/MONTH/DAY/QUARTER/DOW) bundle (silver_load.sql:165-173).
    ``dow`` is returned PG-style (0=Sun..6=Sat) = Spark dayofweek - 1."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        "year": F.year(c),
        "month": F.month(c),
        "day": F.dayofmonth(c),
        "quarter": F.quarter(c),
        "dow": F.dayofweek(c) - 1,
    }


def month_name(date_col: Column | str) -> Column:
    """``TO_CHAR(d,'Month')`` + TRIM (silver_load.sql:170) → 'January'."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.date_format(c, "MMMM")


def day_name(date_col: Column | str) -> Column:
    """``TO_CHAR(d,'Day')`` + TRIM (silver_load.sql:174) → 'Monday'."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.date_format(c, "EEEE")


def smart_date_key(date_col: Column | str) -> Column:
    """Smart integer date key yyyymmdd, e.g. 20180101
    (silver_load.sql:165-167,238-245)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def key_to_date(key_col: Column | str) -> Column:
    """Reverse of smart_date_key: ``TO_DATE(date_id::TEXT,'YYYYMMDD')``
    (gold_ddl.sql:14)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.to_date(c.cast("string"), "yyyyMMdd")


def least_greatest_bounds(a: Column | str, b: Column | str) -> tuple[Column, Column]:
    """(LEAST(a,b), GREATEST(a,b)) pair for global bound aggregation
    (silver_load.sql:155-156)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.least(ca, cb), F.greatest(ca, cb)


# ---------------------------------------------------------------------------
# F15/F19 — arithmetic
# ---------------------------------------------------------------------------


def round_minutes(seconds_col: Column | str) -> Column:
    """``ROUND(duration_sec/60.0)::INT`` half-up (silver_load.sql:196).
    Spark HALF_UP == PG half-away-from-zero for positive durations."""
    c = F.col(seconds_col) if isinstance(seconds_col, str) else seconds_col
    return F.round(c / 60.0, 0).cast("int")


def squared_euclid(lat1, lon1, lat2, lon2) -> Column:
    """Squared-Euclidean distance used by the notebook's nearest_station
    (notebooks/data_exploration.ipynb cell 12)."""
    as_col = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    lat1, lon1, lat2, lon2 = map(as_col, (lat1, lon1, lat2, lon2))
    return F.pow(lat1 - lat2, 2) + F.pow(lon1 - lon2, 2)


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km — native-expression upgrade of the
    notebook's squared-Euclid; stays in codegen (no UDF)."""
    as_col = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    lat1, lon1, lat2, lon2 = map(as_col, (lat1, lon1, lat2, lon2))
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return 2 * 6371.0088 * F.asin(F.sqrt(a))
