"""Query harness — every SURVEY.md §2 operator as a (PySpark, oracle-SQL) pair.

Each entry re-expresses one reference operator pattern on the driver's
TPC-H-ish testdata (FIXTURES.md §2) so the DuckDB oracle can verify it:
the Spark side is the engine implementation, the SQL side is independent
ANSI SQL. Column names/aliases are kept identical on both sides (the
driver sorts columns by name before value-hashing).

Determinism & parity rules applied throughout (SURVEY.md §7):
* every nondeterministic reference construct (DISTINCT ON, first())
  gets an explicit tiebreak mirrored in the oracle;
* double aggregates are rounded on both sides (sum order differs);
* casts pin integer widths where Spark/DuckDB defaults diverge;
* Spark ``dayofweek`` (1=Sun..7=Sat) vs DuckDB/PG dow (0=Sun..6=Sat)
  handled per-site.

Scale notes: dims and derived lookups are broadcast; aggregates are
partial-agg friendly (plain groupBy on natural keys); no driver-side
collects anywhere; row-returning queries are bounded (orders/events-sized,
never unaggregated lineitem).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import exprs as E
from .io import load_tables
from .session import pin_session_conf

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a harness query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_session_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        if name in _QUERIES:
            # a silent overwrite swaps an adjudicated key's
            # implementation and shrinks the surface by one (r9: two
            # wave-29 names collided with existing queries) — fail loud
            raise ValueError(f"duplicate query registration: {name!r}")
        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLE[name] = oracle
        return wrapped

    return deco


def _ensure_extensions_loaded() -> None:
    from . import (  # noqa: F401  (register queries)
        harness_analytics,
        harness_curation,
        harness_features,
        harness_governance,
        harness_quality,
        harness_retrieval,
        harness_scale,
        harness_tpch,
        harness_warehouse,
    )


# The correctness driver adjudicates queries in dict order and records a
# bounded window of them per round (round 1: exactly the first 50 of 79,
# leaving every harness_scale entry unchecked — VERDICT.md "What's
# missing" #1). Registration order is therefore a verification-coverage
# knob: names listed here are emitted FIRST, so the driver's window
# lands on the queries that most need a fresh adjudication row; the
# rest follow in registration order and rotate into later rounds.
#
# Round-10 priority (VERDICT r9 "Next round" item 1, which amends the r8
# staleness rule): NEVER-CHECKED BEFORE STALE — a key with no official
# CORRECTNESS row ever outranks a key whose green row is merely old.
# This is the standing rule for every future round: each round's window
# = all never-officially-checked keys first (registration order), then
# the stalest officially-green keys (oldest official row first, ties
# alphabetical) up to the 50-slot window.
#
# History: the r10 window was the 35 round-9 additions (waves 28-35,
# first official rows) + the alphabetically-first 15 r3-era keys —
# CORRECTNESS_r10.json recorded all 50 green.
#
# The r12 window (first 50), per the standing never-checked-first rule
# and the rotation pre-declared in round 11:
#   [1-9]   the 9 round-11 additions (waves 39-40) with no official
#           row yet — judge mirror 9/9 green in r11,
#   [10-40] the 31 remaining r4-era keys (newest official row is
#           eight rounds old),
#   [41-50] the 10 alphabetically-first r5-era keys (all 50 r5 keys
#           tie on age, so ties break alphabetical per the rule).
# After this window drains, no registered key's newest official row is
# older than r5 — the registry is sub-4-rounds fresh for the first time.
# r13 window (never-checked first, then stalest), pre-declared at r12
# close with the exact membership: the 8 round-12 additions
# (wave 41: q_unpivot, q_stopword_profile, q_query_likelihood,
# q_contam_overlap, q_truncation_loss, q_pq_recall; wave 42:
# q_code_detect, q_encoding_census — registration order), then the 40
# remaining r5-era keys (q_distinct_on ... q_zorder, alphabetical),
# then the 2 alphabetically-first r6-era keys (q_ann_multiprobe,
# q_anomaly_zscore). At ~387 queries / 50 slots the full surface
# re-verifies every ~8 rounds.
#
# History: the r10 window was the 35 round-9 additions (waves 28-35) +
# the alphabetically-first 15 r3-era keys — CORRECTNESS_r10.json 50/50
# green. The r11 window was the 15 wave-36-38 additions + the 16
# remaining r3-era keys + the 19 alphabetically-first r4 keys —
# CORRECTNESS_r11.json 50/50 green.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # [1-9] waves 39-40 — first official rows (registration order)
    "q_bloom_design",
    "q_quality_anova",
    "q_ngram_entropy_rate",
    "q_jm_smoothing_sweep",
    "q_dup_source_matrix",
    "q_dup_transitivity",
    "q_sentence_stats",
    "q_idf_drift",
    "q_dedup_bias",
    # [10-40] staleness: the 31 remaining r4-era keys (alphabetical)
    "q_embed_pairs_lsh",
    "q_expect_unique",
    "q_fk_integrity",
    "q_gopher_rules",
    "q_grouping_sets",
    "q_having",
    "q_join_left_composite",
    "q_lm_cross_entropy",
    "q_negative_samples",
    "q_ngram_jaccard",
    "q_null_census",
    "q_outlier_iqr",
    "q_pack_ids",
    "q_percentiles",
    "q_pivot",
    "q_pq_adc",
    "q_pq_encode",
    "q_quality_percentile",
    "q_range_check",
    "q_remove_boilerplate",
    "q_remove_dup_spans",
    "q_rollup",
    "q_salted_join",
    "q_semantic_dedup",
    "q_semantic_keep",
    "q_set_ops",
    "q_skew_count",
    "q_source_drift",
    "q_strip_html",
    "q_url_dedup",
    "q_window_lag_cumsum",
    # [41-50] staleness: alphabetically-first 10 of the 50 r5-era keys
    "q_ann_recall",
    "q_ann_topk",
    "q_anti_join",
    "q_bloom_join",
    "q_bpe_seeded",
    "q_cdc_apply",
    "q_decontaminate",
    "q_decontaminate_near",
    "q_dedup_exact",
    "q_dedup_incremental",
)


def _priority_order(d: dict) -> dict:
    head = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def all_queries() -> dict[str, QueryFn]:
    _ensure_extensions_loaded()
    return _priority_order(_QUERIES)


def all_oracle_sql() -> dict[str, str]:
    _ensure_extensions_loaded()
    return _priority_order(_ORACLE)


# ---------------------------------------------------------------------------
# A1 — flagship: multi-key groupBy + count/sum/avg/countDistinct
# (reference gold daily-summary mart, gold_ddl.sql:11-26)
# ---------------------------------------------------------------------------


@query(
    "q_agg_daily_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           count(*) AS trip_count,
           round(sum(l_extendedprice), 2) AS sum_price,
           round(avg(l_extendedprice), 2) AS avg_price,
           count(DISTINCT l_suppkey) AS distinct_suppliers
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus, ship_year
    """,
)
def q_agg_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold 'daily summary' shape (gold_ddl.sql:11-26): grouped
    count/sum/avg + COUNT(DISTINCT). Partial aggregation map-side; the
    countDistinct triggers the expand+two-phase plan Catalyst picks."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy(
        "l_returnflag",
        "l_linestatus",
        F.year("l_shipdate").alias("ship_year"),
    ).agg(
        F.count("*").alias("trip_count"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
    )


# ---------------------------------------------------------------------------
# P1–P6 — projections & filters
# ---------------------------------------------------------------------------


@query(
    "q_project_rename",
    """
    SELECT p_partkey AS part_id, p_name AS part_name, p_brand AS brand,
           p_type AS part_type, p_size AS size_units,
           p_retailprice AS retail_price
    FROM part
    """,
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold renaming views (gold_ddl.sql:135-193): pure projection+alias."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return part.select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("part_type"),
        F.col("p_size").alias("size_units"),
        F.col("p_retailprice").alias("retail_price"),
    )


@query(
    "q_filter_eq",
    "SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'click'",
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String equality filter (silver_load.sql:45 `state = 'California'`).
    Pushed to the parquet scan (PushedFilters in explain)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "q_filter_flag",
    """
    SELECT event_id, event_type, value
    FROM (SELECT *, value > 50 AS consumed FROM events)
    WHERE NOT consumed
    """,
)
def q_filter_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-flag incremental filter (silver_load.sql:219
    `WHERE NOT loaded_to_silver`) as a derived-flag predicate."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    flagged = ev.withColumn("consumed", F.col("value") > 50)
    return flagged.filter(~F.col("consumed")).select("event_id", "event_type", "value")


@query(
    "q_filter_notnull",
    "SELECT event_id, props FROM events WHERE props IS NOT NULL",
)
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NOT NULL predicate (gold_ddl.sql:65,91,108)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.filter(F.col("props").isNotNull()).select("event_id", "props")


@query(
    "q_filter_compound",
    """
    SELECT event_id, user_id, value FROM events
    WHERE NOT (floor(value) = 0 AND user_id % 10 = 0)
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-island sentinel exclusion (get_locations.py:118; notebook
    cells 21-26): NOT (int(lat)==0 AND int(long)==0). floor() on both
    sides — Spark int-cast truncates while DuckDB's rounds."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    sentinel = (F.floor("value") == 0) & (F.col("user_id") % 10 == 0)
    return ev.filter(~sentinel).select("event_id", "user_id", "value")


# ---------------------------------------------------------------------------
# J1–J9 — joins
# ---------------------------------------------------------------------------


@query(
    "q_join_left_composite",
    """
    WITH lookup AS (
        SELECT DISTINCT l_partkey, l_suppkey, 'hot' AS tag
        FROM lineitem WHERE l_quantity > 45
    )
    SELECT t.tag, count(*) AS cnt, round(sum(l.l_quantity), 2) AS sum_qty
    FROM lineitem l
    LEFT JOIN lookup t ON l.l_partkey = t.l_partkey AND l.l_suppkey = t.l_suppkey
    GROUP BY t.tag
    """,
)
def q_join_left_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join on a 2-col composite key (silver_load.sql:42-44:
    locations ⟕ stations ON lat AND long). Lookup side is derived+distinct
    → broadcast."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    lookup = (
        li.filter(F.col("l_quantity") > 45)
        .select("l_partkey", "l_suppkey")
        .distinct()
        .withColumn("tag", F.lit("hot"))
    )
    return (
        li.join(F.broadcast(lookup), ["l_partkey", "l_suppkey"], "left")
        .groupBy("tag")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "q_join_role_playing",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           count(*) AS cnt, round(sum(l.l_quantity), 2) AS sum_qty
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    GROUP BY cust_nation, supp_nation
    """,
)
def q_join_role_playing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-playing dim joined twice under different aliases
    (silver_load.sql:255-260: dim_locations as start & end). nation is
    aliased twice and broadcast both times."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "supplier", "nation"))
    cust_nation = t["nation"].alias("cn")
    supp_nation = t["nation"].alias("sn")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .groupBy(
            F.col("cn.n_name").alias("cust_nation"),
            F.col("sn.n_name").alias("supp_nation"),
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "q_join_inner",
    """
    SELECT c.c_mktsegment AS mktsegment, count(*) AS cnt,
           round(sum(l.l_extendedprice), 2) AS sum_price
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim inner joins (gold_ddl.sql:24,38,49,126-127)."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_join_full_outer",
    """
    WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(n_cust, 0) AS n_customers,
           coalesce(n_supp, 0) AS n_suppliers,
           coalesce(n_cust, 0) - coalesce(n_supp, 0) AS net_flow,
           coalesce(n_cust, 0) + coalesce(n_supp, 0) AS total
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Station-popularity mart shape (gold_ddl.sql:28-91): two grouped
    branches FULL OUTER JOINed, COALESCE key resolution, zero defaults,
    net_flow/total arithmetic (F17)."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = (
        t["customer"]
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        t["supplier"]
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    n_cust = F.coalesce("n_cust", F.lit(0))
    n_supp = F.coalesce("n_supp", F.lit(0))
    # join on the column name: Spark coalesces the key automatically (J4)
    return c.join(s, "nationkey", "full_outer").select(
        "nationkey",
        n_cust.alias("n_customers"),
        n_supp.alias("n_suppliers"),
        (n_cust - n_supp).alias("net_flow"),
        (n_cust + n_supp).alias("total"),
    )


@query(
    "q_cross_join",
    """
    SELECT ut.user_type, g.gender, b.bike_share, s.o_orderstatus
    FROM (VALUES ('Customer'), ('Subscriber')) ut(user_type)
    CROSS JOIN (VALUES ('Male'), ('Female'), ('Other')) g(gender)
    CROSS JOIN (VALUES ('Yes'), ('No')) b(bike_share)
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way cross join of small enumerations (silver_load.sql:96-107
    `all_combinations`), literals via explode(array(...)) = unnest (F13)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    one = spark.range(1)
    lit_dim = lambda name, *vals: one.select(  # noqa: E731
        F.explode(F.array(*[F.lit(v) for v in vals])).alias(name)
    )
    ut = lit_dim("user_type", "Customer", "Subscriber")
    g = lit_dim("gender", "Male", "Female", "Other")
    b = lit_dim("bike_share", "Yes", "No")
    status = orders.select("o_orderstatus").distinct()
    return ut.crossJoin(g).crossJoin(b).crossJoin(status)


@query(
    "q_nearest_neighbor",
    """
    SELECT s_suppkey, c_custkey AS nearest_custkey, dist
    FROM (
        SELECT s.s_suppkey, c.c_custkey,
               (s.s_acctbal - c.c_acctbal) * (s.s_acctbal - c.c_acctbal) AS dist,
               row_number() OVER (
                   PARTITION BY s.s_suppkey
                   ORDER BY (s.s_acctbal - c.c_acctbal) * (s.s_acctbal - c.c_acctbal),
                            c.c_custkey
               ) AS rn
        FROM supplier s CROSS JOIN customer c
    ) WHERE rn = 1
    """,
)
def q_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor argmin (notebook cell 12 nearest_station).

    Instead of window-ranking the full cross join (shuffles |S|×|C| rows),
    take min(struct(dist, custkey)) per supplier: lexicographic struct
    ordering = argmin with deterministic tiebreak, and the aggregation is
    map-side combinable — the cross-joined rows never hit a shuffle. The
    100 TB path for high-dim data is the LSH-bucketed ANN in
    operators/similarity.py."""
    t = load_tables(spark, sf_dir, ("supplier", "customer"))
    diff = F.col("s_acctbal") - F.col("c_acctbal")
    # the stream side arrives as one small parquet file = one partition;
    # spread it so the nested-loop join fans out across all cores
    stream = t["supplier"].repartition(spark.sparkContext.defaultParallelism)
    return (
        stream
        .crossJoin(F.broadcast(t["customer"]))
        .select("s_suppkey", "c_custkey", (diff * diff).alias("dist"))
        .groupBy("s_suppkey")
        .agg(F.min(F.struct("dist", "c_custkey")).alias("m"))
        .select(
            "s_suppkey",
            F.col("m.c_custkey").alias("nearest_custkey"),
            F.col("m.dist").alias("dist"),
        )
    )


@query(
    "q_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (get_locations.py:119: skip already-enriched keys)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# O1–O3 — set ops & dedup
# ---------------------------------------------------------------------------


@query(
    "q_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG UNION dedups (silver_load.sql:24-36); Spark union is UNION ALL
    so pair it with .distinct() (SURVEY §7)."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "q_union_all_null",
    """
    SELECT DISTINCT o_orderpriority AS priority FROM orders
    UNION ALL
    SELECT NULL AS priority
    """,
)
def q_union_all_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL appending an explicit NULL row (silver_load.sql:90-95
    birth_years series ∪ ALL SELECT NULL)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    pri = orders.select(F.col("o_orderpriority").alias("priority")).distinct()
    null_row = pri.sparkSession.range(1).select(
        F.lit(None).cast("string").alias("priority")
    )
    return pri.union(null_row)


@query(
    "q_distinct_on",
    """
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON (silver_load.sql:38-41) — first row per key. The
    reference has no ORDER BY (nondeterministic pick); we pin a
    deterministic tiebreak (earliest order, then lowest key), mirrored in
    the oracle (SURVEY §7)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# A3–A8 — aggregation family
# ---------------------------------------------------------------------------


@query(
    "q_agg_max_dedup",
    """
    SELECT c_mktsegment, max(c_acctbal) AS max_acctbal, max(c_name) AS max_name
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_max_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX-dedup to force one row per key (gold_ddl.sql:55-67
    station_details)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.groupBy("c_mktsegment").agg(
        F.max("c_acctbal").alias("max_acctbal"),
        F.max("c_name").alias("max_name"),
    )


@query(
    "q_agg_routes",
    """
    SELECT cn.n_name || ' -> ' || sn.n_name AS route_id,
           count(*) AS trip_count, round(avg(l.l_quantity), 4) AS avg_qty
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    GROUP BY route_id
    """,
)
def q_agg_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routes mart (gold_ddl.sql:94-113): computed `a -> b` route id (F3,
    NULL-propagating ||) + count/avg."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "supplier", "nation"))
    cn = t["nation"].alias("cn")
    sn = t["nation"].alias("sn")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .groupBy(
            F.concat(F.col("cn.n_name"), F.lit(" -> "), F.col("sn.n_name")).alias("route_id")
        )
        .agg(
            F.count("*").alias("trip_count"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


@query(
    "q_agg_expr_key",
    """
    SELECT o_orderpriority,
           CAST(year(o.o_orderdate) - c.c_nationkey AS INT) AS expr_key,
           count(*) AS cnt
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o_orderpriority, expr_key
    """,
)
def q_agg_expr_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY with an expression key (gold_ddl.sql:116-132: derived
    rider age)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "o_orderpriority",
            (F.year("o_orderdate") - F.col("c_nationkey")).cast("int").alias("expr_key"),
        )
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q_agg_minmax_bounds",
    """
    SELECT CAST(min(least(o.o_orderdate, l.l_shipdate)) AS DATE) AS min_date,
           CAST(max(greatest(o.o_orderdate, l.l_shipdate)) AS DATE) AS max_date
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def q_agg_minmax_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global MIN/MAX over LEAST/GREATEST of two columns
    (silver_load.sql:153-158 date-dim bounds)."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    lo, hi = E.least_greatest_bounds("o_orderdate", "l_shipdate")
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(
            F.min(lo).cast("date").alias("min_date"),
            F.max(hi).cast("date").alias("max_date"),
        )
    )


@query(
    "q_agg_null_audit",
    """
    SELECT event_type, count(*) AS cnt,
           count(*) FILTER (WHERE props IS NULL) AS n_null_props,
           count(*) FILTER (WHERE value IS NULL) AS n_null_value
    FROM events GROUP BY event_type
    """,
)
def q_agg_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group null census (notebook cells 7-9 missing-value audit)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("n_null_props"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
    )


@query(
    "q_agg_first",
    """
    SELECT o_custkey, o_orderstatus AS first_status
    FROM (
        SELECT o_custkey, o_orderstatus,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def q_agg_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic `first` (notebook cell 10 groupby-first is
    nondeterministic — SURVEY §7): min_by over a (date, key) tiebreak
    struct. Single shuffle, no window needed."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return orders.groupBy("o_custkey").agg(
        F.min_by("o_orderstatus", F.struct("o_orderdate", "o_orderkey")).alias(
            "first_status"
        )
    )


# ---------------------------------------------------------------------------
# F1–F15 — scalar function queries
# ---------------------------------------------------------------------------


@query(
    "q_hash_key",
    """
    SELECT c_custkey,
           CAST(CAST(from_hex(substr(md5(c_name || '|' || c_mktsegment), 1, 16)) AS BIT) AS BIGINT)
               AS surrogate_key
    FROM customer
    """,
)
def q_hash_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-exact PG hash surrogate key (silver_load.sql:48,114-119):
    ('x'||substr(md5(x),1,16))::bit(64)::bigint == conv(hex,16,-10)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.select(
        "c_custkey",
        E.surrogate_key_md5("c_name", "c_mktsegment").alias("surrogate_key"),
    )


@query(
    "q_string_concat",
    """
    SELECT p_partkey,
           p_brand || ' -> ' || (CASE WHEN p_size > 40 THEN NULL ELSE p_type END)
               AS route_id
    FROM part
    """,
)
def q_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-propagating || concat building route ids (gold_ddl.sql:96).
    The CASE injects NULLs to prove propagation (PG `||` == Spark
    concat(); PG CONCAT() would skip — SURVEY §7)."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    nullable_type = F.when(F.col("p_size") > 40, F.lit(None)).otherwise(F.col("p_type"))
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit(" -> "), nullable_type).alias("route_id"),
    )


@query(
    "q_coalesce_defaults",
    """
    SELECT event_id,
           coalesce(props, '{}') AS props_filled,
           coalesce(nullif(event_type, 'error'), 'Unknown') AS type_filled
    FROM events
    """,
)
def q_coalesce_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE defaults (silver_load.sql:216-217 gender→'Unknown',
    bike_share→'No'; gold_ddl.sql:79-84 counts→0)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.select(
        "event_id",
        E.coalesce_default("props", "{}").alias("props_filled"),
        F.coalesce(E.nullif_sentinel("event_type", "error"), F.lit("Unknown")).alias(
            "type_filled"
        ),
    )


@query(
    "q_nullif_sentinel",
    """
    SELECT nullif(event_type, 'error') AS event_type_clean, count(*) AS cnt
    FROM events GROUP BY event_type_clean
    """,
)
def q_nullif_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLIF sentinel→NULL cleanup (silver_load.sql:60,199,202)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy(
        E.nullif_sentinel("event_type", "error").alias("event_type_clean")
    ).agg(F.count("*").alias("cnt"))


@query(
    "q_case_age_clean",
    """
    SELECT o_orderkey,
           CAST(1900 + o_custkey % 120 AS INT) AS birth_year,
           CASE WHEN year(o_orderdate) - (1900 + o_custkey % 120) < 18
                  OR year(o_orderdate) - (1900 + o_custkey % 120) > 100
                THEN NULL ELSE CAST(1900 + o_custkey % 120 AS INT) END AS birth_year_clean
    FROM orders
    """,
)
def q_case_age_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN range-null cleaning (silver_load.sql:209-215: birth_year
    → NULL when implied age <18 or >100). Synthetic birth_year derived
    from o_custkey."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    by = (F.lit(1900) + F.col("o_custkey") % 120).cast("int")
    df = o.select("o_orderkey", by.alias("birth_year"), F.year("o_orderdate").alias("_y"))
    return df.select(
        "o_orderkey",
        "birth_year",
        E.age_cleaned_birth_year("birth_year", "_y").alias("birth_year_clean"),
    )


@query(
    "q_weekend_flag",
    """
    SELECT o_orderkey, dayofweek(o_orderdate) IN (0, 6) AS is_weekend
    FROM orders
    """,
)
def q_weekend_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend flag (silver_load.sql:175-178). PG/DuckDB dow 0=Sun..6=Sat
    vs Spark dayofweek 1=Sun..7=Sat — the classic off-by-one (SURVEY §7)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.select("o_orderkey", E.weekend_flag("o_orderdate").alias("is_weekend"))


@query(
    "q_date_parts",
    """
    SELECT event_id,
           CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS month,
           CAST(day(ts) AS INT) AS day, CAST(quarter(ts) AS INT) AS quarter,
           CAST(dayofweek(ts) AS INT) AS dow, CAST(hour(ts) AS INT) AS hour
    FROM events
    """,
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT(YEAR/MONTH/DAY/QUARTER/DOW/HOUR) (silver_load.sql:165-173;
    gold_ddl.sql:13). dow returned PG-style 0..6."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    parts = E.date_parts("ts")
    return ev.select(
        "event_id",
        parts["year"].alias("year"),
        parts["month"].alias("month"),
        parts["day"].alias("day"),
        parts["quarter"].alias("quarter"),
        parts["dow"].alias("dow"),
        F.hour("ts").alias("hour"),
    )


@query(
    "q_date_names",
    """
    SELECT o_orderkey, monthname(o_orderdate) AS month_name,
           dayname(o_orderdate) AS day_name
    FROM orders
    """,
)
def q_date_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TO_CHAR(d,'Month'/'Day')+TRIM (silver_load.sql:170,174) →
    date_format MMMM/EEEE (locale-pinned English)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.select(
        "o_orderkey",
        E.month_name("o_orderdate").alias("month_name"),
        E.day_name("o_orderdate").alias("day_name"),
    )


@query(
    "q_smart_date_key",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100 + day(o_orderdate) AS INT)
               AS date_id
    FROM orders
    """,
)
def q_smart_date_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smart yyyymmdd integer date key (silver_load.sql:165-167,238-245)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.select("o_orderkey", E.smart_date_key("o_orderdate").alias("date_id"))


@query(
    "q_key_to_date",
    """
    SELECT date_id, strptime(CAST(date_id AS VARCHAR), '%Y%m%d')::DATE AS date_value
    FROM (
        SELECT DISTINCT CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS INT)
            AS date_id
        FROM orders
    )
    """,
)
def q_key_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse smart key → DATE (gold_ddl.sql:14:
    TO_DATE(date_id::TEXT,'YYYYMMDD'))."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    keys = o.select(E.smart_date_key("o_orderdate").alias("date_id")).distinct()
    return keys.select("date_id", E.key_to_date("date_id").alias("date_value"))


@query(
    "q_generate_series",
    """
    SELECT unnest(generate_series(
        (SELECT min(CAST(o_orderdate AS DATE)) FROM orders),
        (SELECT max(CAST(o_orderdate AS DATE)) FROM orders),
        INTERVAL 1 DAY))::DATE AS d
    """,
)
def q_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate_series of dates (silver_load.sql:161 date-dim spine) →
    sequence() + explode."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    return bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )


@query(
    "q_round_minutes",
    """
    SELECT event_id,
           CAST(round(value, 0) AS INT) AS value_round,
           CAST(round(value * 100 / 60.0, 0) AS INT) AS minutes
    FROM events
    """,
)
def q_round_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUND(x/60.0)::INT half-up minutes (silver_load.sql:196); PG
    half-away-from-zero == Spark HALF_UP == DuckDB for positives."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.select(
        "event_id",
        F.round(F.col("value"), 0).cast("int").alias("value_round"),
        E.round_minutes(F.col("value") * 100).alias("minutes"),
    )


# ---------------------------------------------------------------------------
# §2.7 windows / top-k, S4 scan pattern, S7 upsert, streaming-shaped bucket
# ---------------------------------------------------------------------------


@query(
    "q_window_rownum",
    """
    SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn
    FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (SURVEY §2.7): first 3 orders per customer."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_topk_routes",
    """
    SELECT route_id, trip_count FROM (
        SELECT cn.n_name || ' -> ' || sn.n_name AS route_id, count(*) AS trip_count
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
        GROUP BY route_id
    ) ORDER BY trip_count DESC, route_id LIMIT 10
    """,
)
def q_topk_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k popular routes (dashboard top-N, README.md:59-81):
    orderBy+limit compiles to TakeOrderedAndProject — no global sort at
    scale. Deterministic tiebreak on route_id."""
    routes = q_agg_routes(spark, sf_dir).select("route_id", "trip_count")
    return routes.orderBy(F.desc("trip_count"), F.asc("route_id")).limit(10)


@query(
    "q_upsert_skip_conflict",
    """
    WITH existing AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         incoming AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT nationkey, 'existing' AS src FROM existing
    UNION ALL
    SELECT i.nationkey, 'inserted' AS src
    FROM incoming i WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.nationkey = i.nationkey)
    """,
)
def q_upsert_skip_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT ... ON CONFLICT DO NOTHING (get_locations.py:93-107;
    silver_load.sql:62,129,180) = existing ∪ (incoming ⟕̸ existing)
    left-anti append."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    existing = t["customer"].select(F.col("c_nationkey").alias("nationkey")).distinct()
    incoming = t["supplier"].select(F.col("s_nationkey").alias("nationkey")).distinct()
    inserted = incoming.join(existing, "nationkey", "left_anti")
    return existing.withColumn("src", F.lit("existing")).union(
        inserted.withColumn("src", F.lit("inserted"))
    )


@query(
    "q_scan_csv_literal",
    "SELECT p_partkey, p_name, '2018' AS period FROM part",
)
def q_scan_csv_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + injected literal column (load_bronze.py:48-71: `period`
    from the filename prefix) — pattern proved on the parquet scan; the
    real CSV source lives in sources/csv_source.py."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    return p.select("p_partkey", "p_name", F.lit("2018").alias("period"))


@query(
    "q_string_funcs",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_name) AS name_lower,
           substr(p_type, 1, 6) AS type_prefix,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           translate(p_brand, '#', '-') AS brand_dashed,
           CAST(levenshtein(p_brand, substr(p_type, 1, 8)) AS INT) AS edit_dist,
           CAST(length(trim(p_name)) AS INT) AS name_len
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function library breadth: case, substr, pad, translate,
    Levenshtein edit distance (the string-similarity primitive), trim."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_name").alias("name_lower"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.levenshtein("p_brand", F.substring("p_type", 1, 8)).alias("edit_dist"),
        F.length(F.trim("p_name")).alias("name_len"),
    )


@query(
    "q_date_arith",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
           date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since_2024,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(o_orderdate AS DATE) - INTERVAL 1 WEEK AS week_before
    FROM orders
    """,
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-arithmetic breadth: add/sub intervals, day diffs, month
    truncation and end-of-month."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).cast("long").alias(
            "days_since_2024"
        ),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_sub(d, 7).cast("timestamp").alias("week_before"),
    )


@query(
    "q_json_extract",
    """
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + aggregation. The reference parses its
    JSON (geocode responses) in driver Python (get_locations.py:71-87);
    the engine-native mapping is from_json/get_json_object (SURVEY
    §1.2), keeping parse inside codegen."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q_pivot",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (status columns per priority) — dashboard-shaped output;
    fixed pivot values so the plan stays a single pass (dynamic pivot
    would need a values scan first)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_finished"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


@query(
    "q_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95
    FROM events GROUP BY event_type
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (describe()-adjacent,
    SURVEY A9 extension). At 100 TB swap percentile → approx_percentile
    (t-digest, partial-aggregatable) — flagged engine deviation."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
    )


@query(
    "q_rollup",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals — absent from the reference (SURVEY
    §2.4 notes it comes free in Spark); exposed as engine capability."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "q_set_ops",
    """
    WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT nationkey, 'both' AS src FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
    UNION ALL
    SELECT nationkey, 'cust_only' AS src FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT — absent from the reference (SURVEY §2.5),
    free in Spark; exposed as engine capability."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey")).distinct()
    return c.intersect(s).withColumn("src", F.lit("both")).union(
        c.exceptAll(s).distinct().withColumn("src", F.lit("cust_only"))
    )


@query(
    "q_having",
    """
    SELECT o_custkey, count(*) AS n_orders FROM orders
    GROUP BY o_custkey HAVING count(*) >= 15
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — absent from the reference (SURVEY §2.4); post-aggregation
    filter."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "q_window_lag_cumsum",
    """
    SELECT o_custkey, o_orderkey,
           round(lag(o_totalprice) OVER w, 2) AS prev_price,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING), 2) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + running-sum analytics windows (SURVEY §2.7 extension):
    both windows share one (custkey, date) sort."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_total"),
    )


@query(
    "q_rolling_range",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER w, 2) AS rolling_7d_total,
           CAST(count(*) OVER w AS BIGINT) AS rolling_7d_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling window (SURVEY §2.7 extension): per-customer
    trailing-7-day order total/count. RANGE (not ROWS) frames are
    tie-insensitive — every row with the same timestamp shares one
    frame, so no tiebreak column is needed for determinism. Ordering is
    epoch seconds on both engines (Spark's interval range frames want a
    numeric sort key)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_7d_total"),
        F.count("*").over(w).alias("rolling_7d_orders"),
    )


@query(
    "q_ntile",
    """
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS price_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics windows: quartile bucket, percent_rank,
    cume_dist over the global price order (unique-key tiebreak pins
    every rank). The single unpartitioned window is the one inherently
    serial operator here — at 100 TB the same statistics come from
    approx_percentile buckets (q_percentiles documents the swap); this
    entry pins the exact semantics."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_funnel",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     ELSE 1 END AS INT) AS stage_reached
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = c.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel (view → click-after-view →
    purchase-after-click) per user: three min-aggregations chained by
    strictly-later joins — each stage is one partial-agg-friendly
    groupBy plus an equi-join on the shrinking survivor set, no window
    over full event history. The product-analytics query every events
    table eventually gets asked."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .otherwise(1)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            stage.cast("int").alias("stage_reached"),
        )
    )


@query(
    "q_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS cnt
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping combinations in one pass (completes the
    rollup/grouping-sets family)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))


@query(
    "q_grouping_sets",
    """
    SELECT event_type, CAST(year(ts) AS INT) AS y, count(*) AS cnt
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(year(ts) AS INT)), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup's hierarchy): per-type,
    per-year, and grand-total groups in one pass."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ev.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type, CAST(year(ts) AS INT) AS y, count(*) AS cnt
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (CAST(year(ts) AS INT)), ())
        """
    )


@query(
    "q_approx_sketches",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact_users,
           true AS hll_ok,
           true AS p50_ok
    FROM events GROUP BY event_type
    """,
)
def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketches that replace exact distinct/percentile at 100 TB:
    approx_count_distinct (HyperLogLog++, mergeable partial state) and
    approx_percentile (t-digest).

    Sketch values are engine-specific, so the driver-checkable contract
    is the ERROR BOUND as data: the Spark side computes the sketches AND
    their exact twins, then emits per-group booleans — HLL within 15%
    (3× its 5% default rsd; observed 6.7% at sf0.1) and approx-p50
    inside the exact p45..p55 band (t-digest rank error ≤1/accuracy).
    The oracle emits the exact counts plus literal TRUE columns, so a
    sketch drifting out of bounds is a driver hash mismatch, not an
    untested claim. Tighter accuracy assertions live in
    tests/test_scale_ops.py."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact_users"),
        F.approx_count_distinct("user_id").alias("_hll"),
        F.percentile("value", F.lit(0.45)).alias("_p45"),
        F.percentile("value", F.lit(0.55)).alias("_p55"),
        F.percentile_approx("value", 0.5, 1000).alias("_ap50"),
    )
    return agg.select(
        "event_type",
        "n_exact_users",
        (
            F.abs(F.col("_hll") - F.col("n_exact_users"))
            <= 0.15 * F.col("n_exact_users")
        ).alias("hll_ok"),
        (
            (F.col("_ap50") >= F.col("_p45")) & (F.col("_ap50") <= F.col("_p55"))
        ).alias("p50_ok"),
    )


@query(
    "q_window_time_bucket",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
           count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM events GROUP BY bucket_start
    """,
)
def q_window_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregation — the batch twin of the
    Structured Streaming path (streaming/incremental.py); F.window works
    identically on bounded input."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("bucket_start"), "cnt", "sum_value")
    )


@query(
    "q_window_hopping",
    """
    SELECT CAST(floor(epoch(ts) / 1800) * 1800 - i * 1800 AS BIGINT) AS bucket_epoch,
           count(*) AS cnt,
           round(sum(value), 2) AS sum_value
    FROM events, unnest(range(2)) AS t(i)
    WHERE epoch(ts) >= floor(epoch(ts) / 1800) * 1800 - i * 1800
      AND epoch(ts) <  floor(epoch(ts) / 1800) * 1800 - i * 1800 + 3600
    GROUP BY bucket_epoch
    """,
)
def q_window_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time windows: 1-hour windows every 30
    minutes — each event lands in size/slide = 2 windows. F.window's
    third arg is the slide; physically one Expand (2 rows per event)
    feeding a partial-aggregated groupBy, the same shape the oracle
    mirrors with a 2-element range join. Output key is the window
    start as epoch seconds (engine-neutral — avoids tz-typed
    timestamp comparison)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_epoch"),
            "cnt",
            "sum_value",
        )
    )


@query(
    "q_agg_breadth",
    """
    WITH o AS (
        SELECT o_orderpriority, o_orderkey, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS pc
        FROM orders
    )
    SELECT o_orderpriority,
           max_by(o_orderkey, pc * 10000000 + o_orderkey) AS biggest_order,
           min_by(o_orderkey, pc * 10000000 + o_orderkey) AS cheapest_order,
           CAST(count_if(pc > 5000000) AS BIGINT) AS n_big,
           bool_and(o_orderstatus IN ('F', 'O', 'P')) AS all_status_known,
           bool_or(o_orderstatus = 'F') AS any_fulfilled
    FROM o GROUP BY o_orderpriority
    """,
)
def q_agg_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-function breadth: max_by/min_by (argmax/argmin),
    count_if, bool_and/bool_or — the modern aggregate surface beyond
    SUM/COUNT, one shuffle. Determinism: max_by ties are broken by
    folding the row id into the ordering key (price_cents·1e7 +
    orderkey — exact BIGINT, unique per row; widen the multiplier with
    the key domain at larger scale), so the argmax is a total order,
    never engine-arbitrary."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    o = orders.select(
        "o_orderpriority",
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
    )
    key = F.col("pc") * 10000000 + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("biggest_order"),
        F.min_by("o_orderkey", key).alias("cheapest_order"),
        F.count_if(F.col("pc") > 5000000).alias("n_big"),
        F.bool_and(F.col("o_orderstatus").isin("F", "O", "P")).alias("all_status_known"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_fulfilled"),
    )


@query(
    "q_try_funcs",
    """
    SELECT c_custkey,
           TRY_CAST(right(c_name, 3) AS INT) AS name_suffix_num,
           TRY_CAST(c_mktsegment AS INT) AS segment_as_num,
           round(CASE WHEN c_custkey % 7 = 0 THEN NULL
                      ELSE CAST(round(c_acctbal * 100) AS BIGINT)
                           / CAST(c_custkey % 7 AS DOUBLE) END, 6) AS safe_ratio,
           string_split(c_name, '#')[3] AS missing_part
    FROM customer
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safety function breadth — the error-absorbing variants a
    pipeline uses so one malformed row can't fail a 100 TB job:
    try_cast on digits (parses) and on a non-numeric string (NULL,
    not an exception), try_divide with a zero divisor (NULL), and
    try_element_at past the end of an array (NULL). The oracle mirrors
    each as DuckDB's TRY_CAST / CASE-guarded division / out-of-range
    list index."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return cust.select(
        "c_custkey",
        F.expr("try_cast(right(c_name, 3) AS INT)").alias("name_suffix_num"),
        F.expr("try_cast(c_mktsegment AS INT)").alias("segment_as_num"),
        F.round(
            F.try_divide(cents, (F.col("c_custkey") % 7).cast("double")), 6
        ).alias("safe_ratio"),
        F.try_element_at(F.split(F.col("c_name"), "#"), F.lit(3)).alias("missing_part"),
    )
