"""Classic TPC-H-shaped multi-join analytics (Q3 / Q5 / Q10 shapes)
over the testdata warehouse tables — the standard decision-support
probes a general analytics engine must run well, expressed as
idiomatic DataFrame plans (dimension filters pushed into scans,
bounded sides broadcast, top-k as TakeOrderedAndProject).

Revenue parity: Σ l_extendedprice·(1−l_discount) is an
order-dependent double sum, so both engines compute
``rc = Σ price_cents · (100 − discount_pct)`` in exact BIGINT
(unit: cent·percent) and divide by 10 000 once at the end — the same
fixed-point discipline as operators/graph.py pagerank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .harness import query
from .io import load_tables

# exact integer revenue contribution per lineitem row
_REV_CENTS_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def _rev_cents() -> F.Column:
    return F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )


@query(
    "q_tpch_q3",
    f"""
    SELECT l_orderkey,
           round(CAST(sum({_REV_CENTS_SQL}) AS DOUBLE) / 10000.0, 9) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
      AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
    ORDER BY sum({_REV_CENTS_SQL}) DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 unshipped BUILDING-segment
    orders by revenue as of the pivot date. Segment and date filters
    reach the scans; the customer side (segment-filtered) joins
    orders then lineitem; the final top-10 is a sort-limit
    (TakeOrderedAndProject), never a global sort. Exact-integer
    tiebreak: revenue cents desc, orderdate, orderkey."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = (
        t["orders"]
        .withColumn("o_orderdate", F.to_date("o_orderdate"))
        .filter(F.col("o_orderdate") < F.lit("1998-06-01").cast("date"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        t["lineitem"]
        .filter(F.to_date("l_shipdate") > F.lit("1998-06-01").cast("date"))
        .select("l_orderkey", _rev_cents().alias("rc"))
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum("rc").alias("rc"))
        .orderBy(F.desc("rc"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("rc").cast("double") / 10000.0, 9).alias("revenue"),
            "o_orderdate",
        )
    )


@query(
    "q_tpch_q5",
    f"""
    SELECT n_name,
           round(CAST(sum({_REV_CENTS_SQL}) AS DOUBLE) / 10000.0, 9) AS revenue
    FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 1997 revenue where customer
    and supplier share an ASIA nation, per nation. nation⋈region
    prune to a handful of rows and BROADCAST into supplier and
    customer; the only large-large joins are the
    customer⋈orders⋈lineitem chain on their keys. The
    same-nation predicate rides the supplier join condition — no
    post-join filter on a wider product."""
    t = load_tables(
        spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    asia_nations = (
        t["nation"]
        .join(
            t["region"].filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = t["supplier"].join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = t["customer"].select("c_custkey", "c_nationkey")
    orders = (
        t["orders"]
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = t["lineitem"].select("l_orderkey", "l_suppkey", _rev_cents().alias("rc"))
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum("rc").alias("rc"))
        .select(
            "n_name",
            F.round(F.col("rc").cast("double") / 10000.0, 9).alias("revenue"),
        )
    )


@query(
    "q_tpch_q10",
    f"""
    SELECT c_custkey, c_name,
           round(CAST(sum({_REV_CENTS_SQL}) AS DOUBLE) / 10000.0, 9) AS revenue,
           c_acctbal, n_name
    FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1997-10-01'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY sum({_REV_CENTS_SQL}) DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): top-20 customers by Q4-1997
    returned-lineitem revenue. The quarter filter prunes orders at
    the scan, the returnflag filter prunes lineitem; nation (25
    rows) broadcasts onto the result; top-20 with an exact-integer
    revenue key and custkey tiebreak."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    orders = (
        t["orders"]
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1997-10-01").cast("date"))
            & (F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", _rev_cents().alias("rc"))
    )
    cust = t["customer"].select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nat = t["nation"].select("n_nationkey", "n_name")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rc").alias("rc"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .orderBy(F.desc("rc"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("rc").cast("double") / 10000.0, 9).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )
