"""CSV landing-directory source.

Replaces the reference's ingest chain (include/modules/get_data.py +
include/sql/bronze/load_bronze.py):

* S1/S2/S3 — bucket listing, download, unzip (get_data.py:29-90) stay
  driver-side helpers (``discover_and_extract``): idempotent via the
  landing/archive directory protocol (skip if archived).
* S4 — the per-file pandas-style rewrite that appends a ``period``
  column (load_bronze.py:48-71) becomes a single declarative scan:
  ``period`` is derived from the *filename* with input_file_name(), so
  one job reads every file — no per-file driver loop, which is the
  difference between 3 files and 30,000 files at 100 TB.
* header-driven column matching (load_bronze.py:77-87) maps to
  header=True + explicit schema (names matched, order-independent).
"""

from __future__ import annotations

import os
import shutil
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TRIPS_RAW


def list_bucket_keys(
    fetch_fn,
    base_url: str = "",
    suffixes: tuple[str, ...] = (".zip", ".csv"),
) -> list[str]:
    """S1 — bucket-listing scan (get_data.py:29-38): fetch the bucket
    index XML, keep ``<Key>`` entries with data suffixes, return full
    URLs. ``fetch_fn(url) -> bytes`` is injected (no network in tests;
    production passes an HTTP client). Parsing is namespace-tolerant —
    S3 listings carry a default xmlns."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(fetch_fn(base_url))
    keys = [el.text for el in root.iter() if el.tag.endswith("Key") and el.text]
    return [base_url + k for k in keys if k.endswith(suffixes)]


def _default_fetch(url: str) -> bytes:
    """Default HTTP transport for bucket listing + file download
    (get_data.py:30,53-55: plain GET, raise on HTTP error). Module-level
    and injectable everywhere it's used, so tests run canned bytes."""
    import requests

    r = requests.get(url, timeout=30)
    r.raise_for_status()
    return r.content


def download_and_extract(
    raw_dir: str,
    extracted_dir: str,
    archive_dir: str,
    base_url: str,
    fetch_fn=None,
) -> list[str]:
    """S1+S2 end-to-end (get_data.py:40-90): list the bucket's data
    keys, download each file whose name is NOT already in the archive
    into ``raw_dir``, then run the idempotent extract→archive protocol
    (:func:`discover_and_extract`). Returns the names processed this
    run; a re-run after success downloads and processes nothing — the
    archive directory IS the download ledger, exactly the reference's
    idempotence contract (get_data.py:50-51).

    ``fetch_fn(url) -> bytes`` is injected for tests (canned XML + file
    payloads, no network); production uses the requests-backed default.
    A failed download skips that file and continues (get_data.py:58-60)
    so one bad object can't wedge the whole ingest."""
    fetch = fetch_fn or _default_fetch
    os.makedirs(raw_dir, exist_ok=True)
    os.makedirs(archive_dir, exist_ok=True)
    for url in list_bucket_keys(fetch, base_url):
        filename = url.split("/")[-1]
        if os.path.exists(os.path.join(archive_dir, filename)):
            continue
        try:
            content = fetch(url)
        except Exception:  # noqa: BLE001 — skip-and-continue (:58-60)
            continue
        with open(os.path.join(raw_dir, filename), "wb") as f:
            f.write(content)
    return discover_and_extract(raw_dir, extracted_dir, archive_dir)


def discover_and_extract(raw_dir: str, extracted_dir: str, archive_dir: str) -> list[str]:
    """Driver-side idempotent unzip/copy (get_data.py:40-90): files in
    ``raw_dir`` are extracted/copied into ``extracted_dir`` then moved to
    ``archive_dir``; already-archived names are skipped."""
    os.makedirs(extracted_dir, exist_ok=True)
    os.makedirs(archive_dir, exist_ok=True)
    processed = []
    for path in sorted(Path(raw_dir).glob("*")):
        name = path.name
        if os.path.exists(os.path.join(archive_dir, name)):
            continue
        if name.endswith(".csv"):
            shutil.copyfile(path, os.path.join(extracted_dir, name))
        elif name.endswith(".zip"):
            with zipfile.ZipFile(path) as zf:
                zf.extractall(extracted_dir)
        else:
            continue
        shutil.move(str(path), os.path.join(archive_dir, name))
        processed.append(name)
    return processed


def read_trips_csv(spark: SparkSession, extracted_dir: str) -> DataFrame:
    """One declarative scan over every landed CSV with the explicit
    bronze schema; ``period`` = filename prefix before the first '-'
    (load_bronze.py:71: ``file_path.name.split("-")[0]``)."""
    from pyspark.sql.types import StructType

    fields = [f for f in TRIPS_RAW.fields if f.name != "period"]
    df = spark.read.csv(
        os.path.join(extracted_dir, "*.csv"),
        header=True,
        schema=StructType(fields),
        # fraction is width-lenient up to 6 digits: handles the raw
        # files' 4-digit subseconds ('...39.6540'), full microseconds,
        # and no fraction at all — 4-digit-only patterns silently NULL
        # 6-digit inputs under PERMISSIVE mode
        timestampFormat="yyyy-MM-dd HH:mm:ss[.SSSSSS]",
        mode="PERMISSIVE",
    )
    filename = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return df.withColumn("period", F.element_at(F.split(filename, "-"), 1))
