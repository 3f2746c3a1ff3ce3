"""Pipeline runner — the DAG chain as one driver program.

Replaces the reference's five Airflow DAGs (ddl → bronze → silver →
gold → report, SURVEY §2.10 D6): each stage is a function over
DataFrames; tables publish atomically (io.publish_overwrite) so a
failed run leaves the previous version intact — the stand-in for the
reference's single Postgres transaction (silver_load.sql:285-308).
The run report (S10: Airflow REST scrape → email) becomes a metrics
table the runner appends to.

Incrementality: bronze is partitioned by ``_batch_id``; silver reads
only batches above its high-water mark (partition-pruned scan), then
advances the mark — replacing the UPDATE-every-row flag
(silver_load.sql:273-275), which would rewrite the fact table each run
at 100 TB.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import HighWaterMark, append, publish_overwrite
from . import bronze as bronze_mod
from . import gold as gold_mod
from . import silver as silver_mod


def with_retries(fn, retries: int = 2, delay_sec: float = 1.0):
    """Stage-level retry (replaces the Airflow retry policy, SURVEY
    §2.10 D5: retries=2 across all DAGs). Spark task-level retries are
    built in; this guards whole-stage failures (e.g. a flaky source)."""
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — mirror Airflow catch-all
            last = exc
            if attempt < retries:
                time.sleep(delay_sec)
    raise last


def format_run_report(spark: SparkSession, wh: "Warehouse") -> str:
    """Fixed-width run report from the metrics table (replaces the
    Airflow-REST-scrape → email report, sender.py:39-76)."""
    rows = (
        wh.read(spark, "_state", "run_metrics")
        .orderBy("batch_id", "stage")
        .collect()
    )
    lines = [f"{'batch':>6} | {'stage':<12} | {'wall_sec':>8}", "-" * 32]
    for r in rows:
        lines.append(f"{r.batch_id:>6} | {r.stage:<12} | {r.wall_sec:>8.3f}")
    return "\n".join(lines)


class Warehouse:
    """Path layout for the three medallion namespaces."""

    def __init__(self, root: str):
        self.root = root

    def path(self, layer: str, table: str) -> str:
        return os.path.join(self.root, layer, table)

    def exists(self, layer: str, table: str) -> bool:
        return os.path.exists(self.path(layer, table))

    def read(self, spark: SparkSession, layer: str, table: str) -> DataFrame:
        return spark.read.parquet(self.path(layer, table))


def ingest_bronze(
    spark: SparkSession, wh: Warehouse, trips_raw: DataFrame, batch_id: int
) -> None:
    """Append one batch of raw trips (entry point 1, SURVEY §3)."""
    df = bronze_mod.with_ingest_metadata(trips_raw, batch_id)
    append(df, wh.path("bronze", "bike_trips"), partition_by=["_batch_id"])


def load_locations(spark: SparkSession, wh: Warehouse, locations_geo: DataFrame) -> None:
    """Publish the geocoded lookup (bronze.locations), conflict-skip on
    (latitude, longitude) against any existing rows."""
    path = wh.path("bronze", "locations")
    existing = wh.read(spark, "bronze", "locations") if wh.exists("bronze", "locations") else None
    merged = silver_mod.upsert_skip_conflict(existing, locations_geo, ["latitude", "longitude"])
    publish_overwrite(merged, path)


def build_silver(spark: SparkSession, wh: Warehouse) -> dict[str, int]:
    """Entry point 2 (SURVEY §3): the five-step silver ETL, incremental
    over un-consumed bronze batches."""
    hwm = HighWaterMark(os.path.join(wh.root, "_state"))
    mark = hwm.get("silver")
    all_trips = wh.read(spark, "bronze", "bike_trips")
    new_trips = all_trips.filter(F.col("_batch_id") > mark)
    if new_trips.isEmpty():
        return {"consumed_batches": 0}
    geo = wh.read(spark, "bronze", "locations")

    def merge(table: str, new: DataFrame, keys: list[str]) -> DataFrame:
        existing = wh.read(spark, "silver", table) if wh.exists("silver", table) else None
        return silver_mod.upsert_skip_conflict(existing, new, keys)

    dim_locations = merge(
        "dim_locations", silver_mod.build_dim_locations(new_trips, geo), ["location_id"]
    )
    publish_overwrite(dim_locations, wh.path("silver", "dim_locations"))

    dim_user_types = merge(
        "dim_user_types", silver_mod.build_dim_user_types(new_trips), ["user_type_id"]
    )
    publish_overwrite(dim_user_types, wh.path("silver", "dim_user_types"))

    dim_date = merge("dim_date", silver_mod.build_dim_date(new_trips), ["date_id"])
    publish_overwrite(dim_date, wh.path("silver", "dim_date"))

    dim_loc_published = wh.read(spark, "silver", "dim_locations")
    new_facts = silver_mod.build_fact_trips(new_trips, dim_loc_published)
    # fact is append-only per batch, partitioned by start-date year for
    # downstream partition pruning at scale
    fact = new_facts.withColumn("p_year", (F.col("start_date_id") / 10000).cast("int"))
    existing_fact = (
        wh.read(spark, "silver", "fact_trips") if wh.exists("silver", "fact_trips") else None
    )
    merged_fact = fact if existing_fact is None else existing_fact.unionByName(fact)
    publish_overwrite(merged_fact, wh.path("silver", "fact_trips"), partition_by=["p_year"])

    max_batch = all_trips.agg(F.max("_batch_id")).first()[0]
    hwm.set("silver", int(max_batch))
    return {"consumed_batches": 1}


def build_gold(spark: SparkSession, wh: Warehouse) -> None:
    """Entry point 3 (SURVEY §3): recompute the four marts (independent
    jobs) + the renaming views."""
    fact = wh.read(spark, "silver", "fact_trips")
    dim_locations = wh.read(spark, "silver", "dim_locations")
    dim_user_types = wh.read(spark, "silver", "dim_user_types")
    dim_date = wh.read(spark, "silver", "dim_date")

    marts = {
        "dm_daily_trip_summary": gold_mod.dm_daily_trip_summary(fact, dim_date),
        "dm_station_popularity": gold_mod.dm_station_popularity(fact, dim_locations),
        "dm_popular_routes": gold_mod.dm_popular_routes(fact, dim_locations),
        "dm_user_behavior_summary": gold_mod.dm_user_behavior_summary(
            fact, dim_user_types, dim_date
        ),
        "dim_locations_view": gold_mod.dim_locations_view(dim_locations),
        "dim_user_types_view": gold_mod.dim_user_types_view(dim_user_types),
        "dim_date_view": gold_mod.dim_date_view(dim_date),
        "fact_trips_view": gold_mod.fact_trips_view(fact),
    }
    # the marts are independent jobs — submit concurrently so the Spark
    # scheduler interleaves their stages (the reference fans out its four
    # MV refreshes the same way, dags/gold_dag.py:70)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        futures = {
            name: pool.submit(publish_overwrite, df, wh.path("gold", name))
            for name, df in marts.items()
        }
        for name, fut in futures.items():
            fut.result()  # surface the first failure


def _null_safe_cond(left: DataFrame, right: DataFrame, keys: list[str]):
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else cond & c
    return cond


def _splice_publish(
    spark: SparkSession,
    wh: Warehouse,
    table: str,
    recomputed: DataFrame,
    affected_keys: DataFrame,
    key_cols: list[str],
) -> None:
    """Replace exactly the affected key groups of a published mart:
    existing ⟕̸(null-safe) affected ∪ recomputed, then atomic publish.
    Null-safe matching so NULL-valued group keys (e.g. unknown age)
    splice correctly instead of duplicating."""
    path = wh.path("gold", table)
    if os.path.exists(path):
        existing = wh.read(spark, "gold", table)
        untouched = existing.join(
            F.broadcast(affected_keys),
            _null_safe_cond(existing, affected_keys, key_cols),
            "left_anti",
        ).select(*recomputed.columns)
        merged = untouched.unionByName(recomputed)
    else:
        merged = recomputed
    publish_overwrite(merged, path)


def refresh_daily_summary_incremental(
    spark: SparkSession, wh: Warehouse, new_batch_min: int
) -> None:
    """Back-compat wrapper: incremental refresh of the daily mart only."""
    build_gold_incremental(spark, wh, new_batch_min, marts=("dm_daily_trip_summary",))


def build_gold_incremental(
    spark: SparkSession,
    wh: Warehouse,
    new_batch_min: int,
    marts: tuple[str, ...] = (
        "dm_daily_trip_summary",
        "dm_station_popularity",
        "dm_popular_routes",
        "dm_user_behavior_summary",
    ),
) -> None:
    """Incremental maintenance for the gold marts.

    The reference re-runs each whole MV per refresh (gold_ddl.sql:
    201-244) — a full fact scan every time. Every mart groups by keys a
    new batch can only partially touch, so: derive the affected group
    keys from the batch's fact slice (``_batch_id`` column carried
    through silver), recompute exactly those groups from the
    (semi-join-pruned) fact, and splice them over the published mart.
    At 100 TB this turns refresh-everything into scan-what-changed.

    Correctness per mart: the recompute slice contains *every* fact row
    belonging to an affected group (group membership is a function of
    the group key we semi-join on), so recomputed groups are complete;
    station popularity additionally restricts its output to affected
    stations because a trip belongs to two station groups at once.
    """
    from ..functions import exprs as E

    fact = wh.read(spark, "silver", "fact_trips")
    dim_locations = wh.read(spark, "silver", "dim_locations")
    dim_user_types = wh.read(spark, "silver", "dim_user_types")
    dim_date = wh.read(spark, "silver", "dim_date")
    new_fact = fact.filter(F.col("_batch_id") >= new_batch_min)

    if "dm_daily_trip_summary" in marts:
        affected = new_fact.select("start_date_id").distinct()
        fact_slice = fact.join(F.broadcast(affected), "start_date_id", "left_semi")
        rec = gold_mod.dm_daily_trip_summary(fact_slice, dim_date)
        keys = affected.select(E.key_to_date("start_date_id").alias("date"))
        _splice_publish(spark, wh, "dm_daily_trip_summary", rec, keys, ["date"])

    if "dm_station_popularity" in marts:
        names = dim_locations.select("location_id", "station_name")
        touched = (
            new_fact.join(
                F.broadcast(names), new_fact.start_location_id == names.location_id
            )
            .select("station_name")
            .union(
                new_fact.join(
                    F.broadcast(names), new_fact.end_location_id == names.location_id
                ).select("station_name")
            )
            .filter(F.col("station_name").isNotNull())
            .distinct()
        )
        ids = names.join(F.broadcast(touched), "station_name", "left_semi").select(
            "location_id"
        )
        s_side = fact.join(
            F.broadcast(ids), fact.start_location_id == ids.location_id, "left_semi"
        )
        e_side = fact.join(
            F.broadcast(ids), fact.end_location_id == ids.location_id, "left_semi"
        )
        fact_slice = s_side.unionByName(e_side).dropDuplicates(["trip_id"])
        rec = gold_mod.dm_station_popularity(fact_slice, dim_locations).join(
            F.broadcast(touched), "station_name", "left_semi"
        )
        _splice_publish(spark, wh, "dm_station_popularity", rec, touched, ["station_name"])

    if "dm_popular_routes" in marts:
        pairs = (
            new_fact.select("start_location_id", "end_location_id").distinct().na.drop()
        )
        fact_slice = fact.join(
            F.broadcast(pairs), ["start_location_id", "end_location_id"], "left_semi"
        )
        rec = gold_mod.dm_popular_routes(fact_slice, dim_locations)
        _splice_publish(
            spark, wh, "dm_popular_routes", rec, pairs,
            ["start_location_id", "end_location_id"],
        )

    if "dm_user_behavior_summary" in marts:
        def keyed(f: DataFrame) -> DataFrame:
            return (
                f.join(F.broadcast(dim_user_types), "user_type_id")
                .join(F.broadcast(dim_date), f.start_date_id == dim_date.date_id)
                .withColumn("age", F.col("year") - F.col("member_birth_year"))
            )

        key_cols = ["user_type", "member_gender", "bike_share_for_all_trip", "age"]
        affected = keyed(new_fact).select(*key_cols).distinct()
        enriched = keyed(fact)
        fact_slice = enriched.join(
            F.broadcast(affected),
            _null_safe_cond(enriched, affected, key_cols),
            "left_semi",
        ).select(*fact.columns)
        rec = gold_mod.dm_user_behavior_summary(fact_slice, dim_user_types, dim_date)
        _splice_publish(spark, wh, "dm_user_behavior_summary", rec, affected, key_cols)


def run_pipeline(
    spark: SparkSession,
    wh: Warehouse,
    trips_raw: DataFrame,
    locations_geo: DataFrame,
    batch_id: int,
) -> dict:
    """bronze → silver → gold for one batch, with a metrics row appended
    per stage (replaces the email run-report, SURVEY §2.1 S9/S10)."""
    metrics = []
    for stage, fn in (
        ("bronze", lambda: ingest_bronze(spark, wh, trips_raw, batch_id)),
        ("locations", lambda: load_locations(spark, wh, locations_geo)),
        ("silver", lambda: build_silver(spark, wh)),
        ("gold", lambda: build_gold(spark, wh)),
    ):
        t0 = time.perf_counter()
        with_retries(fn, retries=2, delay_sec=1.0)
        metrics.append((batch_id, stage, round(time.perf_counter() - t0, 3)))
    mdf = spark.createDataFrame(metrics, "batch_id INT, stage STRING, wall_sec DOUBLE")
    append(mdf, wh.path("_state", "run_metrics"))
    return {"batch_id": batch_id, "stages": [m[1] for m in metrics]}


def next_daily_fire_time(now_epoch: float) -> float:
    """Epoch seconds of the next UTC midnight strictly after
    ``now_epoch`` — the reference's ``schedule="@daily"`` cadence
    (Bronze_dag.py:32): Airflow fires a daily DAG at 00:00 for the
    data interval that just closed."""
    day = 86400.0
    return (now_epoch // day + 1) * day


def run_on_schedule(
    run_fn,
    max_runs: int,
    clock=None,
    sleep_fn=None,
    interval_sec: float | None = None,
) -> list:
    """Recurrence hook owning WHEN the pipeline runs — the stand-in
    for the reference's scheduler layer (``@daily`` cron on the bronze
    DAG, Bronze_dag.py:32, with silver/gold/report chained via
    TriggerDagRunOperator rather than their own schedules,
    Bronze_dag.py:48). Everything else in this module owns WHAT runs;
    this loop owns the cadence:

      * daily anchor by default (next UTC midnight, catchup=False —
        a missed window is skipped, never backfilled, matching the
        reference's ``catchup=False``), or a fixed ``interval_sec``;
      * each firing calls ``run_fn(batch_id)`` — normally a closure
        over :func:`run_pipeline`, which already retries per stage
        and chains bronze → silver → gold → report in-driver;
      * a failed firing is recorded and the loop keeps its cadence
        (the reference alerts per-task and lets the next DagRun fire).

    ``clock``/``sleep_fn`` are injectable (tests drive a fake clock;
    production defaults to time.time/time.sleep). ``max_runs`` bounds
    the loop — a long-running deployment passes a large count or
    wraps this in its own supervisor; tests pass 2-3."""
    clock = clock or time.time
    sleep_fn = sleep_fn or time.sleep
    outcomes = []
    for batch_id in range(max_runs):
        now = clock()
        fire_at = (
            now + interval_sec if interval_sec is not None
            else next_daily_fire_time(now)
        )
        wait = fire_at - now
        if wait > 0:
            sleep_fn(wait)
        try:
            outcomes.append(("ok", batch_id, run_fn(batch_id)))
        except Exception as exc:  # noqa: BLE001 — keep cadence, record failure
            outcomes.append(("err", batch_id, str(exc)))
    return outcomes
