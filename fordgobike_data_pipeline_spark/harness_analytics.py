"""Harness entries for the behavioral-analytics operators
(operators/analytics.py): cohort retention, Markov transitions,
last-touch attribution, rolling medians, RFM segmentation — the
notebook-exploration shapes of the reference (EDA.ipynb usage-over-
time / member-mix cells) generalized to the events table, each with a
DuckDB oracle twin.

Parity rules: week bucketing is integer day-arithmetic from a fixed
epoch Monday (no engine WEEK() semantics); every probability/share is
one double division of exact integers; list medians index 1-based
sorted arrays with explicit floor() in the SQL (DuckDB CAST double→int
rounds-to-nearest while Spark truncates — floor removes the
difference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .harness import query
from .io import load_tables
from .operators import analytics


@query(
    "q_cohort_retention",
    """
    WITH fd AS (
        SELECT user_id AS u, min(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY u
    ),
    co AS (
        SELECT u,
               DATE '2000-01-03' + CAST(
                   7 * floor(date_diff('day', DATE '2000-01-03', first_day) / 7)
                   AS INT) AS cohort_week
        FROM fd
    ),
    act AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
    cells AS (
        SELECT cohort_week,
               CAST(floor(date_diff('day', cohort_week, day) / 7) AS INT)
                   AS week_offset,
               count(DISTINCT act.u) AS n_active
        FROM act JOIN co ON co.u = act.u
        GROUP BY cohort_week, week_offset
    ),
    sz AS (SELECT cohort_week, count(*) AS cohort_size FROM co GROUP BY cohort_week)
    SELECT cells.cohort_week, week_offset, n_active, cohort_size,
           CAST(n_active AS DOUBLE) / cohort_size AS retention_frac
    FROM cells JOIN sz ON sz.cohort_week = cells.cohort_week
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (analytics.cohort_retention):
    users bucketed by first-event week, activity counted per
    (cohort, week-offset) cell, retention as the fraction of the
    cohort still active. Week = floor(days-since-epoch-Monday / 7) —
    pure integer arithmetic identical on both engines."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return analytics.cohort_retention(ev)


@query(
    "q_markov_transitions",
    """
    WITH p AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type,
               event_type AS next_type
        FROM events
    ),
    c AS (
        SELECT prev_type, next_type, count(*) AS n_trans
        FROM p WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type
    ),
    t AS (SELECT prev_type, sum(n_trans) AS tot FROM c GROUP BY prev_type)
    SELECT c.prev_type, c.next_type, n_trans,
           CAST(n_trans AS DOUBLE) / CAST(tot AS DOUBLE) AS p_trans
    FROM c JOIN t ON t.prev_type = c.prev_type
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (analytics.markov_transitions): one lag() window, one
    |types|²-bounded count aggregation, broadcast row-normalization.
    The transition probability is one division of exact BIGINTs."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return analytics.markov_transitions(ev)


@query(
    "q_attribution",
    """
    WITH s AS (
        SELECT event_type,
               epoch_us(ts) AS us,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN epoch_us(ts) END IGNORE NULLS)
                   OVER w AS tus,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS)
                   OVER w AS ttype,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT coalesce(CASE WHEN us - tus <= 604800000000 THEN ttype END,
                    'unattributed') AS channel,
           count(*) AS n_conversions,
           CAST(sum(cents) AS DOUBLE) / 100.0 AS credited_value
    FROM s WHERE event_type = 'purchase'
    GROUP BY channel
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution (analytics.attribute_last_touch):
    each purchase credited to the latest preceding click/view within 7
    days, else 'unattributed' — ONE carry-forward window pass, no
    inequality join (the classic conversions×touches formulation is
    quadratic per user). Value credit sums integer cents."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return analytics.attribute_last_touch(
        ev, conversion_type="purchase", touch_types=("click", "view"), window_days=7
    )


@query(
    "q_rolling_median",
    """
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY event_type, day
    ),
    r AS (
        SELECT event_type, day, n_events,
               list_sort(list(n_events) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        FROM d
    )
    SELECT event_type, day, n_events,
           (arr[CAST(floor((len(arr) + 1) / 2) AS INT)]
            + arr[CAST(floor(len(arr) / 2) AS INT) + 1]) / 2.0
               AS rolling_median
    FROM r
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling median of daily event counts per type
    (analytics.rolling_median) — the robust smoother a rolling mean
    isn't. Spark has no median window function; this composes one from
    a BOUNDED collect_list window + sort_array + exact middle
    indexing, mirrored index-for-index in the oracle."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return analytics.rolling_median(daily, "event_type", "day", "n_events", n_rows=7)


@query(
    "q_rfm",
    """
    WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS ad FROM events),
    pu AS (
        SELECT user_id AS u, max(CAST(ts AS DATE)) AS last_day,
               count(*) AS frequency,
               sum(CAST(floor(value * 100) AS BIGINT)) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY u
    ),
    m AS (
        SELECT u, CAST(date_diff('day', last_day, ad) AS INT) AS recency_days,
               frequency, CAST(cents AS DOUBLE) / 100.0 AS monetary
        FROM pu, anchor
    ),
    s AS (
        SELECT u AS user_id, recency_days, frequency, monetary,
               CAST(ntile(4) OVER (ORDER BY recency_days, u) AS INT) AS r_score,
               CAST(ntile(4) OVER (ORDER BY frequency DESC, u) AS INT) AS f_score,
               CAST(ntile(4) OVER (ORDER BY monetary DESC, u) AS INT) AS m_score
        FROM m
    )
    SELECT user_id, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           concat(r_score, f_score, m_score) AS segment
    FROM s
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (analytics.rfm_segments): per-user recency /
    frequency / monetary from the purchase subset, each ntile(4)-scored
    with a user-id tiebreak (1 = best), concatenated into the segment
    label. Exact equal-count quartiles — the unpartitioned windows run
    over the |users|-sized aggregate, with the approx_percentile swap
    documented for 100 TB (same trade as q_ntile)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return analytics.rfm_segments(ev, purchase_type="purchase", n_tiles=4)


# ---------------------------------------------------------------------------
# Relational generality: decorrelated-subquery shapes (TPC-H Q17/Q11/
# Q4/Q22 analogues). The reference's SQL stays join+aggregate-shaped;
# these pin that the engine also handles the correlated/scalar
# subquery patterns an analyst would write against the same marts —
# each decorrelated into the plan Catalyst should produce (aggregate
# join for the correlation, 1-row broadcast for the scalar).
# ---------------------------------------------------------------------------


@query(
    "q_subquery_avg_filter",
    """
    WITH pa AS (
        SELECT l_partkey, sum(l_quantity) AS sq, count(*) AS nq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 700.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.2 * (sq / nq)
    """,
)
def q_subquery_avg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate self-join: small-order
    lineitems (qty < 20% of the part's average) for one brand, summed
    into the yearly-average metric. The per-part averages are an
    aggregate of the SAME relation, joined back on the part key; the
    brand dimension join is broadcast-sized. Quantities are integral
    doubles so sum/count is exact and the 0.2× threshold is the same
    IEEE double on both engines; the final sum is integer cents with
    ONE division at the end (no round())."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li, part = t["lineitem"], t["part"]
    pa = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sq"), F.count(F.lit(1)).alias("nq")
    )
    brand = part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    return (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * (F.col("sq") / F.col("nq")))
        .agg(
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).cast(
                    "double"
                )
                / F.lit(700.0)
            ).alias("avg_yearly")
        )
    )


@query(
    "q_scalar_share",
    """
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                   AS rc
        FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT sum(rc) AS t FROM rev)
    SELECT l_suppkey, CAST(rc AS DOUBLE) / 100.0 AS revenue
    FROM rev, tot
    WHERE CAST(rc AS DOUBLE) > 0.002 * CAST(t AS DOUBLE)
    """,
)
def q_scalar_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — a scalar subquery (global revenue total)
    gating a grouped aggregate: suppliers whose discounted revenue
    exceeds 0.2% of the total. The scalar decorrelates into a 1-row
    aggregate cross-joined as a broadcast (control data, not a
    shuffle); revenue is exact integer cents so the share comparison
    is the same double on both engines."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("rc"))
    tot = rev.agg(F.sum("rc").alias("t"))
    return (
        rev.crossJoin(F.broadcast(tot))
        .filter(F.col("rc").cast("double") > 0.002 * F.col("t").cast("double"))
        .select(
            "l_suppkey", (F.col("rc").cast("double") / F.lit(100.0)).alias("revenue")
        )
    )


@query(
    "q_exists_returned",
    """
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    GROUP BY o.o_orderpriority
    """,
)
def q_exists_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS decorrelated to a LEFT SEMI join:
    orders with at least one returned lineitem, counted per priority.
    The semi join deduplicates by construction (no DISTINCT pass) and
    shuffles on the join key only; the filter on the probe side is
    pushed to the lineitem scan."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o, li = t["orders"], t["lineitem"]
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q_anti_scalar",
    """
    WITH avg_bal AS (
        SELECT sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS sc,
               count(*) AS nc
        FROM customer WHERE c_acctbal > 0
    ),
    fcust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT c.c_mktsegment, count(*) AS n_custs,
           CAST(sum(CAST(floor(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_bal
    FROM customer c, avg_bal
    WHERE CAST(floor(c.c_acctbal * 100) AS BIGINT) * nc > sc
      AND NOT EXISTS (SELECT 1 FROM fcust f WHERE f.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
)
def q_anti_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — NOT EXISTS + scalar-average subquery:
    above-average-balance customers with no completed ('F') order,
    profiled by market segment. NOT EXISTS decorrelates to a LEFT
    ANTI join; the average decorrelates to a 1-row broadcast, and the
    comparison is cross-multiplied into pure integers
    (cents·count > sum_cents) so NO division appears in the predicate
    at all — bit-exact on any engine, no epsilon."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    c, o = t["customer"], t["orders"]
    cents = F.floor(F.col("c_acctbal") * 100).cast("long")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("sc"), F.count(F.lit(1)).alias("nc")
    )
    fcust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        c.join(fcust, c.c_custkey == fcust.o_custkey, "left_anti")
        .crossJoin(F.broadcast(avg_bal))
        .filter(cents * F.col("nc") > F.col("sc"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Data-engineering ops: sketch-based frequency estimation, snapshot
# reconciliation, graph cohesion, boolean retrieval, robust outliers.
# ---------------------------------------------------------------------------


@query(
    "q_count_min",
    r"""
    WITH tok AS (
        SELECT t FROM (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
            FROM documents
        ) WHERE t != ''
    ),
    exact AS (
        SELECT t AS term, count(*) AS n_exact FROM tok
        GROUP BY t ORDER BY n_exact DESC, term LIMIT 15
    ),
    rows_ AS (SELECT unnest([0, 1, 2, 3]) AS row),
    cells AS (
        SELECT row,
               CAST(((CAST(CAST(from_hex(substr(md5('cms' || row || '|' || t), 1, 16))
                     AS BIT) AS BIGINT) % 256 + 256) % 256) AS INT) AS col,
               count(*) AS cnt
        FROM tok, rows_
        GROUP BY row, col
    ),
    est AS (
        SELECT term, min(cnt) AS est_count
        FROM exact e, rows_ r
        JOIN cells c
          ON c.row = r.row
         AND c.col = CAST(((CAST(CAST(from_hex(substr(md5('cms' || r.row || '|' || e.term), 1, 16))
                        AS BIT) AS BIGINT) % 256 + 256) % 256) AS INT)
        GROUP BY term
    )
    SELECT e.term, n_exact, est_count, est_count - n_exact AS overcount
    FROM exact e JOIN est ON est.term = e.term
    """,
)
def q_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min sketch frequency estimation (operators/sketches.py):
    a 4×256 counter grid built in one pass over the corpus tokens
    (output ≤ d·w rows whatever the input size — mergeable by cell
    addition), then the exact top-15 words estimated back through it.
    overcount ≥ 0 always (CMS over-estimates only); the oracle rebuilds
    the same grid with the bit-exact md5 hash family."""
    from .operators import sketches

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    exact_top = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("term").asc())
        .limit(15)
    )
    sketch = sketches.count_min_build(tok, depth=4, width=256)
    est = sketches.count_min_estimate(
        sketch, exact_top.select("term"), depth=4, width=256
    )
    return exact_top.join(est, "term").select(
        "term",
        "n_exact",
        "est_count",
        (F.col("est_count") - F.col("n_exact")).alias("overcount"),
    )


@query(
    "q_table_diff",
    """
    WITH a AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < DATE '1998-01-01'
    ),
    b AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE o_orderdate < DATE '1999-01-01' AND o_orderkey % 101 != 0
    ),
    j AS (
        SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN a.o_orderkey IS NULL THEN 'added'
                    WHEN b.o_orderkey IS NULL THEN 'removed'
                    WHEN (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
                      OR (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
                        THEN 'changed'
                    ELSE 'unchanged' END AS diff_status,
               CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                    THEN CAST(a.o_orderstatus IS DISTINCT FROM b.o_orderstatus AS INT)
                       + CAST(a.o_totalprice IS DISTINCT FROM b.o_totalprice AS INT)
               END AS n_cols_changed
        FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey
    )
    SELECT * FROM j WHERE diff_status != 'unchanged'
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (warehouse.table_diff): two derived
    versions of the orders table (the later one adds a year of orders,
    drops every 101st key, bumps every 13th price) diffed into
    added/removed/changed rows with per-key changed-column counts —
    ONE full-outer join on the key, null-safe per-column equality in
    codegen, no row hash."""
    from .operators import warehouse

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    snap_a = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("date")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap_b = (
        o.filter(
            (F.col("o_orderdate") < F.lit("1999-01-01").cast("date"))
            & (F.col("o_orderkey") % 101 != 0)
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        )
    )
    return warehouse.table_diff(
        snap_a, snap_b, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    ).filter(F.col("diff_status") != "unchanged")


@query(
    "q_triangle_count",
    """
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e0 AS (
        SELECT DISTINCT x.p AS u, y.p AS v
        FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
    ),
    bi AS (SELECT u AS n, v AS m FROM e0 UNION ALL SELECT v, u FROM e0),
    deg AS (SELECT n, count(*) AS d FROM bi GROUP BY n),
    orient AS (
        SELECT b.n AS src, b.m AS dst
        FROM bi b
        JOIN deg dn ON dn.n = b.n
        JOIN deg dm ON dm.n = b.m
        WHERE dn.d < dm.d OR (dn.d = dm.d AND b.n < b.m)
    ),
    wedges AS (
        SELECT o1.src, o1.dst AS x, o2.dst AS y
        FROM orient o1 JOIN orient o2 ON o1.src = o2.src AND o1.dst < o2.dst
    ),
    closing AS (
        SELECT least(src, dst) AS x, greatest(src, dst) AS y FROM orient
    ),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM wedges w SEMI JOIN closing c ON w.x = c.x AND w.y = c.y
    )
    SELECT (SELECT count(*) FROM e0) AS n_edges,
           (SELECT count(*) FROM wedges) AS n_wedges,
           n_triangles
    FROM tri
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph (graph.triangle_count):
    parts are linked when they appear in the same order; triangles via
    degree-ordered edge orientation (out-degree O(√E), wedge count
    Σ outdeg² instead of Σ deg² — the hub-proof MapReduce-era
    formulation), each triangle counted once from its smallest
    vertex."""
    from .operators import graph

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    op = li.select("l_orderkey", "l_partkey").distinct()
    x = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    y = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    pairs = x.join(y, "o").filter(F.col("a") < F.col("b")).select("a", "b")
    return graph.triangle_count(pairs, "a", "b")


@query(
    "q_keyword_search",
    r"""
    WITH tok AS (
        SELECT doc_id, t FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
            FROM documents
        )
    ),
    f AS (SELECT doc_id, t FROM tok WHERE t IN ('join', 'hash', 'scan')),
    s AS (
        SELECT doc_id, count(DISTINCT t) AS nm, count(*) AS score
        FROM f GROUP BY doc_id
    )
    SELECT doc_id, score FROM s WHERE nm = 3
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def q_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search (retrieval.keyword_search): top-20
    documents containing ALL of {join, hash, scan} ranked by summed
    term frequency, doc-id tiebreak — the boolean-retrieval
    complement to q_bm25; the IN-filter prunes the posting build
    before any aggregation and the top-k is TakeOrderedAndProject."""
    from .operators import retrieval

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return retrieval.keyword_search(docs, ["join", "hash", "scan"], k=20)


@query(
    "q_mad_outliers",
    """
    WITH med AS (
        SELECT source AS grp,
               quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS median
        FROM documents GROUP BY source
    ),
    ad AS (
        SELECT d.source AS grp, m.median,
               abs(CAST(d.n_chars AS DOUBLE) - m.median) AS adv
        FROM documents d JOIN med m ON m.grp = d.source
    ),
    st AS (
        SELECT grp, count(*) AS n, min(median) AS median,
               quantile_cont(adv, 0.5) AS mad
        FROM ad GROUP BY grp
    )
    SELECT st.grp, st.n, st.median, st.mad,
           sum(CAST(ad.adv > 3.0 * st.mad AS INT)) AS n_outliers
    FROM ad JOIN st ON st.grp = ad.grp
    GROUP BY st.grp, st.n, st.median, st.mad
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust outlier census via Median Absolute Deviation
    (quality.mad_outlier_census) — 50% breakdown point vs IQR's 25%,
    the monitor of choice for heavy-tailed columns. Two exact-
    percentile passes; all comparisons on .5-exact doubles (integer
    inputs interpolate to at most halves — exact in binary)."""
    from .operators import quality

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return quality.mad_outlier_census(docs, "source", "n_chars", k=3.0)
