"""Declared vectorized-UDF surface (SURVEY §2.9).

The reference has no SQL-level UDFs; its UDF-shaped code is driver-side
Python (reverse_geocode, nearest_station). The engine's contract is:
UDFs are the slow path — everything in functions/exprs.py is native.
This module holds the one sanctioned escape hatch, an Arrow-batched
pandas_udf, as the template for semantics the expression language
genuinely cannot reach. haversine_km_udf deliberately duplicates the
native exprs.haversine_km so tests can assert the two agree — proving
the batch plumbing without paying it anywhere in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

EARTH_RADIUS_KM = 6371.0088


@pandas_udf(DoubleType())
def haversine_km_udf(
    lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
) -> pd.Series:
    """Vectorized great-circle distance (km): one numpy evaluation per
    Arrow batch, no per-row Python."""
    rlat1, rlat2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1) / 2.0
    dlon = np.radians(lon2 - lon1) / 2.0
    a = np.sin(dlat) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))
