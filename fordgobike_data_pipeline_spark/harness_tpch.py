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


# ---------------------------------------------------------------------------
# Round-6 wave 13: the rest of the TPC-H family expressible on the
# testdata schema (no partsupp / l_commitdate / l_receiptdate /
# l_shipmode / p_container / c_phone columns exist, so Q4, Q17, Q19
# and Q22 substitute an equivalent predicate on an available column —
# each adaptation is documented in its docstring; the PLAN SHAPE the
# original query exists to exercise is preserved exactly).
# ---------------------------------------------------------------------------

# exact integer charge per row: cents x (100-disc) x (100+tax)
_CHARGE_SQL = (
    f"{_REV_CENTS_SQL} * (100 + CAST(round(l_tax * 100) AS BIGINT))"
)

_QTY_SQL = "CAST(round(l_quantity) AS BIGINT)"
_DISC_PCT_SQL = "CAST(round(l_discount * 100) AS BIGINT)"
_PRICE_CENTS_SQL = "CAST(round(l_extendedprice * 100) AS BIGINT)"


def _qty() -> F.Column:
    return F.round(F.col("l_quantity")).cast("long")


def _disc_pct() -> F.Column:
    return F.round(F.col("l_discount") * 100).cast("long")


def _price_cents() -> F.Column:
    return F.round(F.col("l_extendedprice") * 100).cast("long")


@query(
    "q_tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum({_QTY_SQL}) AS BIGINT) AS sum_qty,
           round(CAST(sum({_PRICE_CENTS_SQL}) AS DOUBLE) / 100.0, 9) AS sum_base_price,
           round(CAST(sum({_REV_CENTS_SQL}) AS DOUBLE) / 10000.0, 9) AS sum_disc_price,
           round(CAST(sum({_CHARGE_SQL}) AS DOUBLE) / 1000000.0, 9) AS sum_charge,
           round(CAST(sum({_QTY_SQL}) AS DOUBLE) / count(*), 9) AS avg_qty,
           round(CAST(sum({_PRICE_CENTS_SQL}) AS DOUBLE) / (100.0 * count(*)), 9) AS avg_price,
           round(CAST(sum({_DISC_PCT_SQL}) AS DOUBLE) / (100.0 * count(*)), 9) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-08-06'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): the canonical full-scan
    aggregate — one pass over lineitem, map-side partial aggregation
    into 6 groups, no join, no shuffle beyond the 6-row exchange.
    Every money metric is an exact BIGINT sum (cents, cent-percent,
    cent-percent-percent) divided ONCE at render; the averages divide
    two exact integers, so both engines perform the same single
    correctly-rounded IEEE division."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].filter(
        F.to_date("l_shipdate") <= F.lit("2001-08-06").cast("date")
    )
    charge = _rev_cents() * (100 + F.round(F.col("l_tax") * 100).cast("long"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_qty()).alias("sq"),
        F.sum(_price_cents()).alias("sp"),
        F.sum(_rev_cents()).alias("sd"),
        F.sum(charge).alias("sc"),
        F.sum(_disc_pct()).alias("sdisc"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").alias("sum_qty"),
        F.round(F.col("sp").cast("double") / 100.0, 9).alias("sum_base_price"),
        F.round(F.col("sd").cast("double") / 10000.0, 9).alias("sum_disc_price"),
        F.round(F.col("sc").cast("double") / 1000000.0, 9).alias("sum_charge"),
        F.round(F.col("sq").cast("double") / F.col("cnt"), 9).alias("avg_qty"),
        F.round(F.col("sp").cast("double") / (100.0 * F.col("cnt")), 9).alias("avg_price"),
        F.round(F.col("sdisc").cast("double") / (100.0 * F.col("cnt")), 9).alias("avg_disc"),
        F.col("cnt").alias("count_order"),
    )


@query(
    "q_tpch_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-07-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: the testdata has
    no l_commitdate/l_receiptdate, so "a lineitem arrived late"
    becomes "a lineitem shipped more than 60 days after the order
    date" — same EXISTS-correlated-subquery shape, realized as a
    LEFT SEMI join (each order counted once no matter how many late
    lines), quarter filter pushed into the orders scan."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    orders = (
        t["orders"]
        .withColumn("o_orderdate", F.to_date("o_orderdate"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-07-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-10-01").cast("date"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = t["lineitem"].select("l_orderkey", F.to_date("l_shipdate").alias("l_shipdate"))
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q_tpch_q6",
    f"""
    SELECT round(CAST(sum({_PRICE_CENTS_SQL} * {_DISC_PCT_SQL}) AS DOUBLE) / 10000.0, 9)
           AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-sum —
    the query whose entire cost is how fast the engine scans
    lineitem with every predicate pushed to the parquet reader and
    zero joins. Revenue = Σ price_cents · disc_pct in exact BIGINT,
    one division at render."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
        & _disc_pct().between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum(_price_cents() * _disc_pct()).cast("double") / 10000.0, 9
        ).alias("revenue")
    )


@query(
    "q_tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(rc) AS DOUBLE) / 10000.0, 9) AS revenue
    FROM (
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
             {_REV_CENTS_SQL} AS rc
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
          OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue flowing between two
    nations in either direction, by year. The nation dimension is
    filtered to the two names FIRST and broadcast into supplier and
    customer (role-playing: the same 25-row table joins twice under
    different aliases), so the big chain only carries rows that can
    still satisfy the either-direction pair predicate."""
    t = load_tables(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    nat = t["nation"].filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = t["supplier"].join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("snk"),
    ).select("s_suppkey", "supp_nation")
    cust = t["customer"].join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cnk"),
    ).select("c_custkey", "cust_nation")
    li = (
        t["lineitem"]
        .filter(
            F.to_date("l_shipdate").between(
                F.lit("1996-01-01").cast("date"), F.lit("1997-12-31").cast("date")
            )
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.year(F.to_date("l_shipdate")).cast("int").alias("l_year"),
            _rev_cents().alias("rc"),
        )
    )
    joined = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"].select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rc").alias("rc"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round(F.col("rc").cast("double") / 10000.0, 9).alias("revenue"),
        )
    )


@query(
    "q_tpch_q8",
    f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rc ELSE 0 END) AS DOUBLE)
                 / CAST(sum(rc) AS DOUBLE), 9) AS mkt_share
    FROM (
      SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
             {_REV_CENTS_SQL} AS rc, sn.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
           JOIN region ON cn.n_regionkey = r_regionkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) all_nations
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of AMERICA
    ECONOMY-part revenue by order year. Share = exact-BIGINT
    numerator / exact-BIGINT denominator in one division. part is
    type-filtered then broadcast into lineitem (the most selective
    predicate drives the probe side); nation⋈region prunes customers
    to one region before the big joins."""
    t = load_tables(
        spark,
        sf_dir,
        ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    )
    parts = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    amer_nat = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cnk"))
    )
    cust = t["customer"].join(
        F.broadcast(amer_nat), F.col("c_nationkey") == F.col("cnk")
    ).select("c_custkey")
    supp = t["supplier"].join(
        F.broadcast(t["nation"].select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("snk"),
    ).select("s_suppkey", "supp_nation")
    orders = (
        t["orders"]
        .filter(
            F.to_date("o_orderdate").between(
                F.lit("1996-01-01").cast("date"), F.lit("1997-12-31").cast("date")
            )
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.year(F.to_date("o_orderdate")).cast("int").alias("o_year"),
        )
    )
    li = t["lineitem"].select("l_orderkey", "l_partkey", "l_suppkey", _rev_cents().alias("rc"))
    joined = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    nation_rc = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("rc")).otherwise(F.lit(0)))
    return (
        joined.groupBy("o_year")
        .agg(nation_rc.alias("nrc"), F.sum("rc").alias("trc"))
        .select(
            "o_year",
            F.round(F.col("nrc").cast("double") / F.col("trc").cast("double"), 9).alias(
                "mkt_share"
            ),
        )
    )


@query(
    "q_tpch_q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed
    exactly k orders, INCLUDING k=0 — the double-aggregation shape
    (per-customer count, then histogram of counts) with a left outer
    join so order-less customers survive. The o_comment NOT LIKE
    filter of the original is dropped (no comment column in the
    testdata); the plan shape — outer join feeding two cascaded
    aggregations, the second over a tiny domain — is unchanged."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(
            t["orders"].select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_tpch_q14",
    f"""
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_CENTS_SQL} ELSE 0 END) AS DOUBLE)
                 / CAST(sum({_REV_CENTS_SQL}) AS DOUBLE), 9) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO-typed parts' share of one
    month's revenue — runs verbatim on the testdata (p_type carries a
    PROMO value). The month filter prunes lineitem at the scan; part
    (2k rows) broadcasts; numerator and denominator are exact BIGINTs
    and the percentage is one double division."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = (
        t["lineitem"]
        .filter(
            (F.to_date("l_shipdate") >= F.lit("1997-09-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-10-01").cast("date"))
        )
        .select("l_partkey", _rev_cents().alias("rc"))
    )
    joined = li.join(
        F.broadcast(t["part"].select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rc")).otherwise(F.lit(0)))
    return joined.agg(
        F.round(
            F.lit(100.0) * promo.cast("double") / F.sum("rc").cast("double"), 9
        ).alias("promo_revenue")
    )


@query(
    "q_tpch_q15",
    f"""
    WITH rev AS (
      SELECT l_suppkey, sum({_REV_CENTS_SQL}) AS rc
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(CAST(rc AS DOUBLE) / 10000.0, 9) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE rc = (SELECT max(rc) FROM rev)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) achieving the maximum
    quarterly revenue — the view-plus-scalar-subquery shape. The
    per-supplier revenue aggregate is computed ONCE and reused for
    both the max and the final filter (same DataFrame lineage); the
    1-row max broadcasts back. Revenue in exact cents·pct, so ties
    and the max are exact — no double-compare flakiness."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    rev = (
        t["lineitem"]
        .filter(
            (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_cents()).alias("rc"))
    )
    mx = rev.agg(F.max("rc").alias("max_rc"))
    return (
        rev.join(F.broadcast(mx), F.col("rc") == F.col("max_rc"))
        .join(
            t["supplier"].select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rc").cast("double") / 10000.0, 9).alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q17",
    f"""
    SELECT round(CAST(sum({_PRICE_CENTS_SQL}) AS DOUBLE) / 700.0, 9) AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN (
        SELECT l_partkey AS agg_pk, count(*) AS cnt,
               sum({_QTY_SQL}) AS sq
        FROM lineitem
        GROUP BY l_partkey
      ) agg ON agg_pk = l_partkey
    WHERE p_brand = 'Brand#2'
      AND 5 * {_QTY_SQL} * cnt < sq
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted: no
    p_container column, so the brand predicate alone selects the
    part family. The correlated "l_quantity < 0.2 * avg(l_quantity)
    per part" becomes the exact integer cross-multiply
    5·qty·cnt < Σqty — identical semantics with zero float rounding.
    The per-part aggregate is computed only over lineitems of
    Brand#2 parts (95 parts broadcast-semi-joined BEFORE the
    groupBy), not over all 2000 parts — at 100 TB that's the
    difference between aggregating 1/20th of lineitem and all of it."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    li = (
        t["lineitem"]
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_partkey", _qty().alias("qty"), _price_cents().alias("pc"))
    )
    per_part = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("qty").alias("sq")
    )
    return (
        li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("agg_pk"))
        .filter(F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sq"))
        .agg(F.round(F.sum("pc").cast("double") / 700.0, 9).alias("avg_yearly"))
    )


@query(
    "q_tpch_q18",
    f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
           CAST(sum({_QTY_SQL}) AS BIGINT) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum({_QTY_SQL}) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 300 units, with their customers, top-100 by order value.
    The IN-subquery collapses into computing the per-order quantity
    sum ONCE, filtering it (HAVING), and joining the survivors back
    to orders/customer — the qualifying set is tiny, so both joins
    after the HAVING are broadcasts. Quantity sums are exact BIGINTs;
    the top-100 is a TakeOrderedAndProject with an orderkey tiebreak."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(_qty()).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(
            t["orders"].select(
                "o_orderkey",
                "o_custkey",
                F.to_date("o_orderdate").alias("o_orderdate"),
                "o_totalprice",
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            t["customer"].select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@query(
    "q_tpch_q19",
    f"""
    SELECT round(CAST(sum({_REV_CENTS_SQL}) AS DOUBLE) / 10000.0, 9) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted: p_container/shipmode
    don't exist, so each disjunct pairs a brand with a size range and
    a quantity range — preserving what Q19 exercises: a join whose
    residual predicate is an OR of conjunctions spanning BOTH sides.
    The join stays a single broadcast hash join on p_partkey with the
    OR evaluated as a residual filter — not three separate joins
    unioned (which would scan lineitem three times)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].select("l_partkey", "l_quantity", _rev_cents().alias("rc"))
    joined = li.join(
        F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return joined.filter(cond).agg(
        F.round(F.sum("rc").cast("double") / 10000.0, 9).alias("revenue")
    )


@query(
    "q_tpch_q22",
    """
    WITH pool AS (
      SELECT right(c_name, 1) AS cntrycode, c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
      WHERE right(c_name, 1) IN ('1', '3', '5', '7', '9')
    ),
    pos AS (
      SELECT count(*) AS pos_cnt, sum(bal_cents) AS pos_sum
      FROM pool WHERE bal_cents > 0
    )
    SELECT cntrycode, count(*) AS numcust,
           round(CAST(sum(bal_cents) AS DOUBLE) / 100.0, 9) AS totacctbal
    FROM pool, pos
    WHERE bal_cents * pos_cnt > pos_sum
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND CAST(o_orderdate AS DATE) >= DATE '2000-07-01'
      )
    GROUP BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted twice: no c_phone
    column, so the country code is the last digit of c_name; and this
    testdata has no order-less customers at all, so "never ordered"
    becomes "dormant since 2000-07" (every customer has orders — the
    verbatim anti-join would be structurally empty and prove nothing).
    Preserves all three Q22 mechanics: a scalar subquery (average
    positive balance — realized as an exact integer cross-multiply
    bal·cnt > Σbal so no float average exists), a NOT EXISTS
    anti-join against (recent) orders, and the final small-domain
    rollup. The 1-row scalar broadcasts; the anti-join is the only
    shuffle."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    pool = (
        t["customer"]
        .filter(F.expr("right(c_name, 1)").isin("1", "3", "5", "7", "9"))
        .select(
            F.expr("right(c_name, 1)").alias("cntrycode"),
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        )
    )
    pos = pool.filter(F.col("bal_cents") > 0).agg(
        F.count(F.lit(1)).alias("pos_cnt"), F.sum("bal_cents").alias("pos_sum")
    )
    rich = pool.crossJoin(F.broadcast(pos)).filter(
        F.col("bal_cents") * F.col("pos_cnt") > F.col("pos_sum")
    )
    recent = (
        t["orders"]
        .filter(F.to_date("o_orderdate") >= F.lit("2000-07-01").cast("date"))
        .select("o_custkey")
    )
    no_orders = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return no_orders.groupBy("cntrycode").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("bal_cents").cast("double") / 100.0, 9).alias("totacctbal"),
    )


@query(
    "q_tpch_q9",
    f"""
    SELECT n_name AS nation,
           CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
           CAST(sum({_REV_CENTS_SQL}) AS DOUBLE) / 10000.0 AS sum_profit
    FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(year(CAST(o_orderdate AS DATE)) AS INT)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: no partsupp table, so
    profit has no ps_supplycost·qty term — it degrades to discounted
    revenue, keeping Q9's defining shape: a part-NAME substring filter
    (un-pushable LIKE '%red%' evaluated on the 2000-row dimension,
    broadcast-semi into lineitem), a five-table join, and a
    nation × order-year rollup over every year in the data."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation", "orders"))
    red = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey")
    supp = t["supplier"].join(
        F.broadcast(t["nation"].select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    orders = t["orders"].select(
        "o_orderkey", F.year(F.to_date("o_orderdate")).cast("int").alias("o_year")
    )
    li = t["lineitem"].select("l_orderkey", "l_partkey", "l_suppkey", _rev_cents().alias("rc"))
    return (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg(F.sum("rc").alias("rc"))
        .select(
            "nation",
            "o_year",
            # bare single division — a round(x, 9) here re-rounds a
            # ~17-significant-digit double and Spark's BigDecimal
            # HALF_UP vs DuckDB's ×1e9-rint disagree on boundary
            # values; the raw correctly-rounded quotient of the exact
            # integer cents sum is bit-identical on both engines
            (F.col("rc").cast("double") / 10000.0).alias("sum_profit"),
        )
    )


# ---------------------------------------------------------------------------
# Round-6 wave 17: the remaining six TPC-H queries (Q2, Q11, Q12, Q16,
# Q20, Q21) — each needs a column the testdata lacks (partsupp,
# l_shipmode, l_commitdate/receiptdate, p_container, s_comment), so the
# supply relation derives from lineitem, "late" = shipped >60 days
# after ordering, and the complaint list = at-risk account balances.
# With these, the engine runs the COMPLETE 22-query TPC-H family.
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q2",
    """
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eur AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name,
               CAST(round(s_acctbal * 100) AS BIGINT) AS cost_cents
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name, cost_cents
        FROM part JOIN supply ON p_partkey = l_partkey
                  JOIN eur ON l_suppkey = s_suppkey
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
    ),
    mn AS (SELECT p_partkey AS mpk, min(cost_cents) AS mc FROM cand GROUP BY p_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM cand JOIN mn ON p_partkey = mpk AND cost_cents = mc
    ORDER BY cost_cents DESC, p_partkey, s_suppkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: no partsupp, so the
    supply relation is the DISTINCT (part, supplier) pairs observed in
    lineitem and supply cost is the supplier's account balance. Keeps
    Q2's defining shape — a correlated MIN subquery per part over a
    region-pruned supplier set — realized as a per-part min aggregate
    joined back on (part, cost=min), ties kept like the original.
    nation⋈region prune and broadcast into supplier; the top-100 is
    an exact-integer-keyed TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation", "region"))
    supply = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    eur_nat = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    eur = t["supplier"].join(
        F.broadcast(eur_nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        "n_name",
        F.round(F.col("s_acctbal") * 100).cast("long").alias("cost_cents"),
    )
    parts = t["part"].filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    cand = (
        supply.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    mn = cand.groupBy(F.col("p_partkey").alias("mpk")).agg(F.min("cost_cents").alias("mc"))
    return (
        cand.join(
            F.broadcast(mn),
            (F.col("p_partkey") == F.col("mpk")) & (F.col("cost_cents") == F.col("mc")),
        )
        .orderBy(F.desc("cost_cents"), F.asc("p_partkey"), F.asc("s_suppkey"))
        .limit(100)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
    )


@query(
    "q_tpch_q11",
    f"""
    WITH v AS (
        SELECT l_partkey, sum({_REV_CENTS_SQL}) AS val
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    ),
    t AS (SELECT sum(val) AS tv FROM v)
    SELECT l_partkey, round(CAST(val AS DOUBLE) / 10000.0, 9) AS value
    FROM v, t
    WHERE val * 500 > tv
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: no
    partsupp availqty·supplycost, so a part's "stock value" is its
    revenue through NATION_3 suppliers. Keeps Q11's defining shape —
    a grouped aggregate HAVING-filtered against a scalar-subquery
    fraction of the global total — with the fraction as the exact
    integer cross-multiply val·500 > Σval (no float threshold
    exists). The 1-row total broadcasts back onto the per-part
    aggregate."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    n3 = t["nation"].filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    supp = t["supplier"].join(
        F.broadcast(n3), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    v = (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_rev_cents()).alias("val"))
    )
    tv = v.agg(F.sum("val").alias("tv"))
    return (
        v.crossJoin(F.broadcast(tv))
        .filter(F.col("val") * 500 > F.col("tv"))
        .select(
            "l_partkey", F.round(F.col("val").cast("double") / 10000.0, 9).alias("value")
        )
    )


@query(
    "q_tpch_q12",
    """
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
      AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), adapted: no
    l_shipmode column, so lines class by l_returnflag, and "arrived
    late" (commit < receipt) becomes shipped >60 days after ordering.
    Keeps Q12's defining shape: a fact-fact join filtered by a
    cross-table date predicate feeding a conditional two-way
    priority count — the CASE pivot inside one aggregation, not two
    scans."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    orders = t["orders"].select(
        "o_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_orderpriority"
    )
    li = (
        t["lineitem"]
        .withColumn("l_shipdate", F.to_date("l_shipdate"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .select("l_orderkey", "l_shipdate", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q16",
    """
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM supply JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (5, 10, 15, 20, 25, 30)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: the supply
    relation derives from lineitem and the complaint exclusion list
    (s_comment LIKE '%Customer%Complaints%') becomes at-risk account
    balances (< $2000). Keeps Q16's defining shape: a NOT IN
    subquery (anti-join against the exclusion list, BEFORE the
    aggregate so excluded suppliers never count), a negated brand
    predicate and an IN-list size filter on the part dim, and a
    COUNT(DISTINCT) per attribute combination."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    supply = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    bad = t["supplier"].filter(F.col("s_acctbal") < 2000).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        supply.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20",
    f"""
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
    ps AS (
        SELECT l_partkey, l_suppkey,
               sum(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
                         AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
                        THEN {_QTY_SQL} ELSE 0 END) AS q97,
               sum({_QTY_SQL}) AS qt
        FROM lineitem SEMI JOIN red ON l_partkey = p_partkey
        GROUP BY l_partkey, l_suppkey
    ),
    hot AS (SELECT DISTINCT l_suppkey FROM ps WHERE 2 * q97 > qt)
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  SEMI JOIN hot ON s_suppkey = l_suppkey
    WHERE n_name = 'NATION_3'
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: no partsupp
    availqty, so the correlated "availqty > 0.5 × year's shipped
    quantity" becomes "1997 shipped over half of all-time shipped"
    per (red part, supplier) — the exact cross-multiply 2·q97 > qt.
    Keeps Q20's defining shape: NESTED semi-join reduction (name-
    filtered parts → correlated quantity threshold per part-supplier
    → distinct suppliers → nation filter), every stage shrinking the
    candidate set before the next."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation"))
    red = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey")
    in97 = F.to_date("l_shipdate").between(
        F.lit("1997-01-01").cast("date"), F.lit("1997-12-31").cast("date")
    )
    ps = (
        t["lineitem"]
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in97, _qty()).otherwise(F.lit(0))).alias("q97"),
            F.sum(_qty()).alias("qt"),
        )
    )
    hot = ps.filter(2 * F.col("q97") > F.col("qt")).select("l_suppkey").distinct()
    n3 = t["nation"].filter(F.col("n_name") == "NATION_3").select("n_nationkey", "n_name")
    return (
        t["supplier"]
        .join(F.broadcast(n3), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(hot), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "q_tpch_q21",
    """
    WITH l AS (
        SELECT l_orderkey AS ok, l_suppkey AS sk, CAST(l_shipdate AS DATE) AS sd
        FROM lineitem
    ),
    od AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate
        FROM orders WHERE o_orderstatus = 'F'
    ),
    marked AS (
        SELECT ok, sk, CASE WHEN sd > odate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late
        FROM l JOIN od ON o_orderkey = ok
    ),
    per_order AS (
        SELECT ok, count(DISTINCT sk) AS n_supp,
               count(DISTINCT CASE WHEN late = 1 THEN sk END) AS n_late_supp
        FROM marked GROUP BY ok
    ),
    waiting AS (
        SELECT m.sk, count(*) AS numwait
        FROM marked m JOIN per_order p ON m.ok = p.ok
        WHERE m.late = 1 AND p.n_supp >= 2 AND p.n_late_supp = 1
        GROUP BY m.sk
    )
    SELECT s_name, numwait
    FROM waiting JOIN supplier ON sk = s_suppkey
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late"
    is shipped >60 days after ordering (no commit/receipt dates).
    Keeps Q21's defining shape — the double-correlated EXISTS/NOT
    EXISTS ("another supplier on the order; no OTHER supplier was
    late") — decorrelated into ONE per-order aggregate (distinct
    suppliers, distinct late suppliers) joined back: n_supp ≥ 2 ∧
    n_late_supp = 1 ⇔ the original pair of correlated subqueries,
    with one shuffle instead of two self-joins. Top-20 by exact
    integer numwait with a name tiebreak."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier"))
    l = t["lineitem"].select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("sk"),
        F.to_date("l_shipdate").alias("sd"),
    )
    od = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", F.to_date("o_orderdate").alias("odate"))
    )
    marked = l.join(od, F.col("o_orderkey") == F.col("ok")).select(
        "ok",
        "sk",
        F.when(F.col("sd") > F.date_add(F.col("odate"), 60), 1).otherwise(0).alias("late"),
    )
    per_order = marked.groupBy("ok").agg(
        F.countDistinct("sk").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("sk"))).alias("n_late_supp"),
    )
    waiting = (
        marked.filter(F.col("late") == 1)
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)).select("ok"),
            "ok",
            "left_semi",
        )
        .groupBy("sk")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        waiting.join(
            t["supplier"].select("s_suppkey", "s_name"), F.col("sk") == F.col("s_suppkey")
        )
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
        .select("s_name", "numwait")
    )
