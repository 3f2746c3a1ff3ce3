"""Harness entries for the ML feature-prep operators
(operators/features.py) and the time-series probes added alongside
them (operators/temporal.py acf_daily / cusum_changepoint /
seasonal_profile_dow) — the tabular-feature-engineering surface a
training-data pipeline runs before any model sees the data, each with
a DuckDB oracle twin.

Parity rules (repo-wide discipline): continuous targets are summed as
fixed-point BIGINT cents; every emitted fraction is one double
division of exact integers (or integer products); hash buckets use
the md5 signed-64 idiom from functions/exprs.py; DOW is pinned to
DuckDB's 0=Sunday via Spark ``dayofweek() − 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .harness import query
from .io import load_tables
from .operators import features, temporal


@query(
    "q_target_encode_loo",
    """
    WITH t AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    g AS (
        SELECT o_orderpriority, sum(cents) AS sum_cat, count(*) AS cnt_cat
        FROM t GROUP BY o_orderpriority
    ),
    a AS (SELECT sum(cents) AS total, count(*) AS n FROM t)
    SELECT t.o_orderkey, t.o_orderpriority,
           CAST(round(CASE WHEN cnt_cat > 1
                      THEN CAST((sum_cat - cents) * 10000 AS DOUBLE)
                           / CAST(cnt_cat - 1 AS DOUBLE)
                      ELSE CAST((total - cents) * 10000 AS DOUBLE)
                           / CAST(n - 1 AS DOUBLE)
                 END) AS BIGINT) / 1000000.0 AS te_loo
    FROM t JOIN g USING (o_orderpriority) CROSS JOIN a
    """,
)
def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (features.target_encode_loo) of
    order priority against order value: each order's category encodes
    to the mean total of the OTHER orders sharing its priority —
    CV-safe (no self-leak), exact (cents fixed-point sums, one final
    division), and broadcast-join shaped (category stats are 5 rows)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    t = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return features.target_encode_loo(t, "o_orderpriority", "cents").select(
        "o_orderkey", "o_orderpriority", "te_loo"
    )


@query(
    "q_feature_hash",
    """
    WITH u AS (
        SELECT 'p_brand' AS feature, 'p_brand=' || p_brand AS s FROM part
        UNION ALL
        SELECT 'p_type', 'p_type=' || p_type FROM part
    ),
    h AS (
        SELECT feature,
               ((CAST(CAST(from_hex(substr(md5(s), 1, 16)) AS BIT) AS BIGINT)
                 % 64) + 64) % 64 AS bucket,
               CASE WHEN substr(md5(s), 32, 1)
                         IN ('0','2','4','6','8','a','c','e')
                    THEN 1 ELSE -1 END AS sign
        FROM u
    )
    SELECT feature, bucket, count(*) AS n,
           CAST(sum(sign) AS BIGINT) AS signed_sum
    FROM h GROUP BY feature, bucket
    """,
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing trick (features.feature_hash): part brand and
    type hashed into 64 signed buckets (md5 parity idiom shared
    bit-exactly with the oracle), pooled to a per-(feature, bucket)
    histogram — stateless, vocabulary-free categorical encoding, all
    codegen expressions plus one map-side-combined groupBy."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return features.feature_hash(part, ["p_brand", "p_type"], n_buckets=64)


@query(
    "q_onehot_topk",
    """
    WITH c AS (SELECT p_brand, count(*) AS n FROM part GROUP BY p_brand),
    top AS (
        SELECT p_brand AS topcat,
               CAST(row_number() OVER (ORDER BY n DESC, p_brand) AS INT) AS rk
        FROM c QUALIFY rk <= 5
    )
    SELECT p_partkey, p_brand,
           CASE WHEN rk IS NOT NULL THEN p_brand ELSE 'OTHER' END AS mapped,
           CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INT) AS oh_1,
           CAST(CASE WHEN rk = 2 THEN 1 ELSE 0 END AS INT) AS oh_2,
           CAST(CASE WHEN rk = 3 THEN 1 ELSE 0 END AS INT) AS oh_3,
           CAST(CASE WHEN rk = 4 THEN 1 ELSE 0 END AS INT) AS oh_4,
           CAST(CASE WHEN rk = 5 THEN 1 ELSE 0 END AS INT) AS oh_5
    FROM part LEFT JOIN top ON p_brand = topcat
    """,
)
def q_onehot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k one-hot encoding (features.onehot_topk): the 5 most
    frequent part brands (count desc, name asc) keep identity columns
    oh_1..oh_5, the tail maps to OTHER — the k-row top table
    broadcasts back and the encode is a codegen CASE chain."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    enc = features.onehot_topk(
        part.select("p_partkey", "p_brand"), "p_brand", k=5
    )
    return enc.select(
        "p_partkey", "p_brand", "mapped", "oh_1", "oh_2", "oh_3", "oh_4", "oh_5"
    )


@query(
    "q_minmax_scale",
    """
    WITH s AS (
        SELECT p_type, min(p_retailprice) AS lo, max(p_retailprice) AS hi
        FROM part GROUP BY p_type
    )
    SELECT p_partkey, part.p_type, p_retailprice,
           round(CASE WHEN hi = lo THEN 0.0
                      ELSE (p_retailprice - lo) / (hi - lo) END, 9) AS scaled
    FROM part JOIN s ON part.p_type = s.p_type
    """,
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max scaling (features.minmax_scale) of retail
    price within part type: min/max are order-independent (unlike
    sums) and the scale is one division, so no fixed-point needed;
    the |groups|-sized stats broadcast back onto the rows."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return features.minmax_scale(
        part.select("p_partkey", "p_type", "p_retailprice"),
        "p_retailprice",
        "p_type",
    ).select("p_partkey", "p_type", "p_retailprice", "scaled")


@query(
    "q_acf",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY day
    ),
    b AS (SELECT min(day) AS d0 FROM d),
    i AS (
        SELECT date_diff('day', d0, day) AS i, CAST(c AS BIGINT) AS c
        FROM d CROSS JOIN b
    ),
    l AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) AS t(lag)),
    x AS (SELECT lag, i + lag AS j, c AS x FROM i CROSS JOIN l),
    y AS (SELECT i AS j, c AS y FROM i),
    p AS (SELECT lag, x, y FROM x JOIN y USING (j)),
    s AS (
        SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM p GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, n AS n_pairs,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 9) AS acf
    FROM s
    """,
)
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..7
    (temporal.acf_daily): Pearson r from exact BIGINT sufficient
    statistics — the weekly-seasonality probe; the events table is
    scanned once, everything after is |days|-sized."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.acf_daily(events, max_lag=7)


@query(
    "q_cusum_changepoint",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS v
        FROM events GROUP BY day
    ),
    t AS (SELECT sum(v) AS t_all, count(*) AS n_days FROM d),
    c AS (
        SELECT day, n_days, t_all,
               n_days * sum(v) OVER (ORDER BY day)
                   - row_number() OVER (ORDER BY day) * t_all AS ns
        FROM d CROSS JOIN t
    )
    SELECT day AS changepoint_day, n_days,
           CAST(abs(ns) AS BIGINT) AS abs_ns,
           round(CAST(abs(ns) AS DOUBLE)
                 / CAST(n_days * abs(t_all) AS DOUBLE), 9) AS cusum_frac
    FROM c ORDER BY abs(ns) DESC, day ASC LIMIT 1
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection (temporal.cusum_changepoint) over
    daily event value: changepoint = argmax |cumulative deviation from
    mean|, computed in the integer closed form n·S_t = n·P_t − t·T so
    the argmax is exact; ties break to the earliest day."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.cusum_changepoint(events)


@query(
    "q_seasonal_dow",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY day
    ),
    bd AS (
        SELECT dayofweek(day) AS dow, sum(c) AS sum_d, count(*) AS days_d
        FROM d GROUP BY dow
    ),
    t AS (SELECT sum(c) AS sum_all, count(*) AS days_all FROM d)
    SELECT CAST(dow AS INT) AS dow, days_d,
           CAST(sum_d AS BIGINT) AS sum_d,
           round(CAST(sum_d * days_all AS DOUBLE)
                 / CAST(days_d * sum_all AS DOUBLE), 9) AS seasonal_index
    FROM bd CROSS JOIN t
    """,
)
def q_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index (temporal.seasonal_profile_dow):
    mean daily count per DOW over the overall mean, one division of
    integer products; DOW pinned to DuckDB 0=Sunday."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.seasonal_profile_dow(events)


@query(
    "q_mixture_temperature",
    """
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    t AS (SELECT sum(n) AS total FROM c),
    p AS (
        SELECT source, n, CAST(n AS DOUBLE) / total AS p,
               sqrt(CAST(n AS DOUBLE) / total) AS w_raw
        FROM c CROSS JOIN t
    ),
    z AS (SELECT sum(w_raw) AS z FROM p)
    SELECT source, n AS n_docs, round(p, 9) AS p,
           round(w_raw / z, 9) AS w_temp,
           round((w_raw / z) / p, 9) AS upsample_factor
    FROM p CROSS JOIN z
    """,
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted domain mixture (τ = 0.5): sampling
    weights w_i ∝ p_i^τ flatten the source distribution — the
    standard low-resource-upweighting scheme for multi-source
    training corpora. τ pinned to 0.5 so the power is sqrt (IEEE
    correctly-rounded, unlike pow — parity-safe); the normalizer sums
    |sources| doubles, rounded at 9 dp. Emits per-source p, w, and
    the upsample factor w/p."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    p = c.crossJoin(F.broadcast(t)).select(
        "source",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("p"),
        F.sqrt(F.col("n").cast("double") / F.col("total")).alias("w_raw"),
    )
    z = p.agg(F.sum("w_raw").alias("z"))
    return p.crossJoin(F.broadcast(z)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(F.col("p"), 9).alias("p"),
        F.round(F.col("w_raw") / F.col("z"), 9).alias("w_temp"),
        F.round((F.col("w_raw") / F.col("z")) / F.col("p"), 9).alias(
            "upsample_factor"
        ),
    )


@query(
    "q_zipf_fit",
    r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        FROM documents
    ),
    freq AS (
        SELECT t, count(*) AS f FROM tok WHERE t <> '' GROUP BY t
    ),
    ranked AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, t) AS r
        FROM freq QUALIFY r <= 200
    ),
    fx AS (
        SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
               CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS y
        FROM ranked
    ),
    s AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM fx
    )
    SELECT n AS n_ranks,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS zipf_slope,
           round((CAST(sy AS DOUBLE) / n
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * (CAST(sx AS DOUBLE) / n)) / 1000000.0, 9) AS intercept_ln
    FROM s
    """,
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary: OLS slope of
    ln(frequency) against ln(rank) for the top-200 tokens — the
    token-distribution health probe (a healthy natural-language
    corpus slopes near −1; scraped boilerplate flattens it). The
    logs are quantized to 1e-6 fixed-point BIGINT so every OLS
    sufficient statistic is an exact integer sum; the slope is one
    double division. One scan + one vocabulary groupBy; the ranked
    head is 200 rows."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t")
    ).filter(F.col("t") != "")
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("f"))
    from pyspark.sql import Window

    ranked = (
        freq.withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc("f"), F.asc("t")))
        )
        .filter(F.col("r") <= 200)
    )
    fx = ranked.select(
        F.round(F.log(F.col("r").cast("double")) * 1000000)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    s = fx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        F.col("n").alias("n_ranks"),
        F.round(slope, 9).alias("zipf_slope"),
        F.round(
            (
                F.col("sy").cast("double") / F.col("n")
                - slope * (F.col("sx").cast("double") / F.col("n"))
            )
            / 1000000.0,
            9,
        ).alias("intercept_ln"),
    )


@query(
    "q_ttr_hapax",
    r"""
    WITH tok AS (
        SELECT source,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        FROM documents
    ),
    tc AS (
        SELECT source, t, count(*) AS c FROM tok WHERE t <> ''
        GROUP BY source, t
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(CAST(count(*) AS DOUBLE) / sum(c), 9) AS ttr,
           round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 9) AS hapax_frac
    FROM tc GROUP BY source
    """,
)
def q_ttr_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: type-token ratio and hapax-
    legomenon fraction — the vocabulary-health complement to
    q_zipf_fit (template-generated text collapses TTR; OCR noise
    inflates hapax). One scan, one (source, token) groupBy, one
    |sources|-sized rollup; every ratio a single division of exact
    counts."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    tc = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    return tc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).alias("n_hapax"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("c"), 9
        ).alias("ttr"),
        F.round(
            F.sum((F.col("c") == 1).cast("long")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("hapax_frac"),
    )


@query(
    "q_fano_burstiness",
    """
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        FROM events GROUP BY event_type, day
    )
    SELECT event_type,
           count(*) AS n_days,
           CAST(sum(x) AS BIGINT) AS n_events,
           round(CAST(sum(x) AS DOUBLE) / count(*), 9) AS mean_daily,
           round(CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
                 / CAST(count(*) * sum(x) AS DOUBLE), 9) AS fano
    FROM d GROUP BY event_type
    """,
)
def q_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio) of daily counts per event
    type — the burstiness probe (Poisson traffic ≈ 1, bursty ≫ 1;
    feeds crawl scheduling and anomaly thresholds). Population
    variance over mean in the integer closed form
    (n·Σx² − (Σx)²)/(n·Σx): exact BIGINT sums, one division."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    d = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    n = F.count(F.lit(1))
    sx = F.sum("x")
    sxx = F.sum(F.col("x") * F.col("x"))
    return d.groupBy("event_type").agg(
        n.alias("n_days"),
        sx.alias("n_events"),
        F.round(sx.cast("double") / n, 9).alias("mean_daily"),
        F.round(
            (n * sxx - sx * sx).cast("double") / (n * sx).cast("double"), 9
        ).alias("fano"),
    )


@query(
    "q_interarrival_quantiles",
    """
    WITH o AS (
        SELECT event_type, user_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    d AS (
        SELECT event_type, us - prev_us AS gap_us FROM o
        WHERE prev_us IS NOT NULL
    )
    SELECT event_type, count(*) AS n_gaps,
           round(quantile_cont(CAST(gap_us AS DOUBLE), 0.5) / 1e6, 4) AS p50_sec,
           round(quantile_cont(CAST(gap_us AS DOUBLE), 0.9) / 1e6, 4) AS p90_sec
    FROM d GROUP BY event_type
    """,
)
def q_interarrival_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival time distribution by event type: median
    and p90 gap between consecutive events of the same (user, type) —
    the cadence profile behind sessionization timeouts and rate
    alarms. Gaps are exact BIGINT microseconds (epoch_us ==
    unix_micros); the lag window orders by (ts, event_id) so ties are
    deterministic. At 100 TB swap percentile → approx_percentile, as
    q_percentiles documents."""
    from pyspark.sql import Window

    events = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    o = events.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    )
    d = o.filter(F.col("prev_us").isNotNull()).select(
        "event_type", (F.col("us") - F.col("prev_us")).alias("gap_us")
    )
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(
            F.percentile(F.col("gap_us").cast("double"), F.lit(0.5)) / 1e6, 4
        ).alias("p50_sec"),
        F.round(
            F.percentile(F.col("gap_us").cast("double"), F.lit(0.9)) / 1e6, 4
        ).alias("p90_sec"),
    )


@query(
    "q_alloc_largest_remainder",
    """
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    t AS (SELECT sum(n) AS total, count(*) AS n_src FROM c),
    b AS (
        SELECT source, n, total,
               (n * 1000) // total AS base,
               n * 1000 - ((n * 1000) // total) * total AS rem
        FROM c CROSS JOIN t
    ),
    l AS (SELECT 1000 - sum(base) AS leftover FROM b),
    r AS (
        SELECT source, n, base, rem,
               row_number() OVER (ORDER BY rem DESC, source) AS rk
        FROM b
    )
    SELECT source, n AS n_docs, CAST(base AS BIGINT) AS base,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM r CROSS JOIN l
    """,
)
def q_alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a fixed sampling
    budget (1000 docs) across sources pro-rata: integer base shares
    ``(n_i·B) div T`` plus one extra for the largest remainders until
    the budget is exact — Σ alloc == B always, no floating rounding
    drift (the naive round(p_i·B) can mis-total by several units).
    The allocation every fixed-budget corpus sampler runs; all
    integer arithmetic, |sources|-sized after one count."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from pyspark.sql import Window

    B = 1000
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    b = c.crossJoin(F.broadcast(t)).select(
        "source",
        "n",
        F.expr(f"(n * {B}) div total").alias("base"),
        F.expr(f"n * {B} - ((n * {B}) div total) * total").alias("rem"),
    )
    leftover = b.agg((F.lit(B) - F.sum("base")).alias("leftover"))
    r = b.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source")))
    )
    return r.crossJoin(F.broadcast(leftover)).select(
        "source",
        F.col("n").alias("n_docs"),
        "base",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("alloc"),
    )


@query(
    "q_seasonal_anomaly",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY day
    ),
    bd AS (
        SELECT dayofweek(day) AS dow, sum(c) AS sum_d, count(*) AS days_d
        FROM d GROUP BY dow
    ),
    r AS (
        SELECT day, c, sum_d, days_d,
               round(CAST(c * days_d AS DOUBLE) / sum_d, 9) AS vs_dow_avg
        FROM d JOIN bd ON bd.dow = dayofweek(day)
    )
    SELECT day, c AS n_events, vs_dow_avg,
           round(abs(vs_dow_avg - 1.0), 9) AS deviation
    FROM r
    ORDER BY abs(vs_dow_avg - 1.0) DESC, day LIMIT 5
    """,
)
def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly days: each day's count divided by
    its OWN day-of-week average (c·days_d / sum_d — one division of
    exact integer products, so the ratio is deterministic), top-5 by
    deviation from 1.0 — a Monday spike is judged against Mondays,
    not the global mean (which the raw z-score monitor would use).
    Composes the q_seasonal_dow profile with the anomaly ranking."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    d = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # _dow is internal grouping only (never emitted), so the Spark
    # 1..7 convention needs no oracle alignment here
    bd = d.groupBy(F.dayofweek("day").alias("_dow")).agg(
        F.sum("c").alias("sum_d"), F.count(F.lit(1)).alias("days_d")
    )
    r = d.join(
        F.broadcast(bd), F.dayofweek(F.col("day")) == F.col("_dow")
    ).select(
        "day",
        "c",
        F.round(
            (F.col("c") * F.col("days_d")).cast("double") / F.col("sum_d"), 9
        ).alias("vs_dow_avg"),
    )
    return (
        r.select(
            "day",
            F.col("c").alias("n_events"),
            "vs_dow_avg",
            F.round(F.abs(F.col("vs_dow_avg") - 1.0), 9).alias("deviation"),
        )
        .orderBy(F.desc(F.abs(F.col("vs_dow_avg") - 1.0)), F.asc("day"))
        .limit(5)
    )


@query(
    "q_pct_change_wow",
    """
    WITH w AS (
        SELECT DATE '2000-01-03' + CAST(
                   7 * floor(date_diff('day', DATE '2000-01-03',
                                       CAST(ts AS DATE)) / 7) AS INT) AS week,
               count(*) AS n
        FROM events GROUP BY week
    ),
    l AS (
        SELECT week, n, lag(n) OVER (ORDER BY week) AS prev_n FROM w
    )
    SELECT week, n,
           round(CAST(n - prev_n AS DOUBLE) / prev_n, 9) AS pct_change
    FROM l WHERE prev_n IS NOT NULL
    """,
)
def q_pct_change_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week percent change of event volume: weeks bucketed
    by the same epoch-Monday integer arithmetic as q_cohort_retention
    (no engine WEEK() semantics), change = one division of exact
    counts over a lag window — the elementary BI trend everybody
    asks for first."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    from pyspark.sql import Window

    week = F.date_add(
        F.to_date(F.lit("2000-01-03")),
        (
            7
            * F.floor(
                F.datediff(F.to_date("ts"), F.to_date(F.lit("2000-01-03"))) / 7
            )
        ).cast("int"),
    )
    w = events.groupBy(week.alias("week")).agg(F.count(F.lit(1)).alias("n"))
    l = w.withColumn("prev_n", F.lag("n").over(Window.orderBy("week")))
    return l.filter(F.col("prev_n").isNotNull()).select(
        "week",
        "n",
        F.round(
            (F.col("n") - F.col("prev_n")).cast("double") / F.col("prev_n"), 9
        ).alias("pct_change"),
    )


@query(
    "q_dup_inflation",
    r"""
    WITH t AS (
        SELECT source, md5(text) AS h,
               count(*) AS n_copies,
               min(CAST(len(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\s+'),
                   x -> x <> '')) AS BIGINT)) AS tok
        FROM documents GROUP BY source, md5(text)
    )
    SELECT source,
           CAST(sum(n_copies) AS BIGINT) AS n_docs,
           count(*) AS n_distinct,
           CAST(sum(n_copies * tok) AS BIGINT) AS total_tokens,
           CAST(sum(tok) AS BIGINT) AS deduped_tokens,
           round(CAST(sum(n_copies * tok) AS DOUBLE) / sum(tok), 9)
               AS inflation
    FROM t GROUP BY source
    """,
)
def q_dup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token inflation from exact duplicates per source: total tokens
    the corpus pays vs tokens after one-per-distinct-text dedup —
    the 'how much budget do duplicates burn' number that justifies
    the dedup stage. One (source, text-hash) aggregation (token
    counts ride along as min — identical text, identical count),
    one rollup; exact integer sums, one division."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    t = docs.groupBy("source", F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.size(toks).cast("long")).alias("tok"),
    )
    return t.groupBy("source").agg(
        F.sum("n_copies").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("n_copies") * F.col("tok")).alias("total_tokens"),
        F.sum("tok").alias("deduped_tokens"),
        F.round(
            F.sum(F.col("n_copies") * F.col("tok")).cast("double")
            / F.sum("tok"),
            9,
        ).alias("inflation"),
    )


@query(
    "q_tv_distance",
    r"""
    WITH tok AS (
        SELECT source,
               unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                                        '\s+'),
                      x -> x <> '')) AS t
        FROM documents WHERE source IN ('src0', 'src1')
    ),
    c AS (
        SELECT t,
               sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c2
        FROM tok GROUP BY t
    ),
    n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM c)
    SELECT count(*) AS n_tokens_union,
           round(CAST(sum(abs(c1 * n2 - c2 * n1)) AS DOUBLE)
                 / CAST(2 * n1 * n2 AS DOUBLE), 9) AS tv_distance
    FROM c CROSS JOIN n
    GROUP BY n1, n2
    """,
)
def q_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT total-variation distance between two sources' token
    distributions: TV = ½·Σ|p_i − q_i| computed as
    Σ|c1·N2 − c2·N1| / (2·N1·N2) — every term an exact BIGINT
    cross-product, ONE final division (the binned monitors q_psi_drift
    / q_ks_drift approximate; this is the exact categorical
    distance). One token groupBy with both counts in a single pass,
    one 1-row rollup."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = (
        docs.filter(F.col("source").isin("src0", "src1"))
        .select(
            "source",
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("t"),
        )
    )
    c = tok.groupBy("t").agg(
        F.sum((F.col("source") == "src0").cast("long")).alias("c1"),
        F.sum((F.col("source") == "src1").cast("long")).alias("c2"),
    )
    n = c.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    return (
        c.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(
            F.count(F.lit(1)).alias("n_tokens_union"),
            F.round(
                F.sum(
                    F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
                ).cast("double")
                / (2 * F.col("n1") * F.col("n2")).cast("double"),
                9,
            ).alias("tv_distance"),
        )
        .select("n_tokens_union", "tv_distance")
    )


@query(
    "q_rolling_dau",
    """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dom AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
    contrib AS (
        SELECT DISTINCT user_id, day + t.i AS w_day
        FROM ud CROSS JOIN (
            SELECT * FROM (VALUES (0),(1),(2),(3),(4),(5),(6)) AS v(i)
        ) t
    )
    SELECT w_day AS day, count(DISTINCT user_id) AS dau_7d
    FROM contrib CROSS JOIN dom
    WHERE w_day BETWEEN lo AND hi
    GROUP BY w_day
    """,
)
def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the classic
    engagement metric, computed LINEARLY: each (user, active-day) row
    contributes to the 7 window-end days it stays visible in
    (explode by 0..6), then one distinct count per day — never a
    per-day self-join over the window (which re-scans the activity
    table 7×). Domain-clipped to observed days."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    ud = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    dom = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("i"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("i")).alias("w_day")).distinct()
    return (
        contrib.crossJoin(F.broadcast(dom))
        .filter(F.col("w_day").between(F.col("lo"), F.col("hi")))
        .groupBy(F.col("w_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau_7d"))
    )


@query(
    "q_naive_bayes_langid",
    r"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                                        '\s+'),
                      x -> x <> '')) AS t
        FROM documents
    ),
    vocab AS (SELECT count(DISTINCT t) AS V FROM tok),
    langs AS (
        SELECT lang, count(*) AS n_l, count(DISTINCT doc_id) AS d_l
        FROM tok GROUP BY lang
    ),
    total_docs AS (SELECT count(DISTINCT doc_id) AS D FROM tok),
    ctl AS (SELECT lang, t, count(*) AS c FROM tok GROUP BY lang, t),
    doc_tok AS (SELECT doc_id, lang AS true_lang, t FROM tok),
    scored AS (
        SELECT dt.doc_id, dt.true_lang, l.lang AS cand,
               CAST(round(ln(
                   (COALESCE(ctl.c, 0) + 1)
                   / CAST(l.n_l + vocab.V AS DOUBLE)) * 1000000) AS BIGINT)
                   AS lp
        FROM doc_tok dt
        CROSS JOIN langs l
        CROSS JOIN vocab
        LEFT JOIN ctl ON ctl.lang = l.lang AND ctl.t = dt.t
    ),
    doc_scores AS (
        SELECT doc_id, true_lang, cand,
               sum(lp)
               + (SELECT CAST(round(ln(d_l / CAST(D AS DOUBLE)) * 1000000)
                         AS BIGINT)
                  FROM langs l2 CROSS JOIN total_docs
                  WHERE l2.lang = cand) AS score
        FROM scored GROUP BY doc_id, true_lang, cand
    ),
    pred AS (
        SELECT doc_id, true_lang,
               max(struct_pack(s := score, lang := cand)).lang AS pred_lang
        FROM doc_scores GROUP BY doc_id, true_lang
    )
    SELECT true_lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 9) AS accuracy
    FROM pred GROUP BY true_lang
    """,
)
def q_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL (tiny) ML model trained and applied entirely in-engine:
    multinomial Naive Bayes language ID with Laplace smoothing,
    trained on the corpus's own labels and evaluated in-sample per
    language. Determinism: every log-probability is quantized to
    1e-6 fixed-point BIGINT, so the per-doc log-sum is an EXACT
    integer sum (float log-sums are order-dependent) and the argmax
    (score, lang-last tiebreak via struct max) is reproducible.
    Shape: token-lang count table + broadcastable |langs| priors;
    scoring joins each doc token against the 5 candidate rows —
    tokens×|langs| rows, one groupBy, no driver state."""
    from .functions.skew import fan_out

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # the token table feeds FIVE consumers (vocab size, per-lang
    # counts, doc total, token-lang counts, scoring join) — checkpoint
    # so the corpus is tokenized once, not once per consumer. fan_out
    # FIRST: the checkpoint freezes the partition count, and a
    # single-file corpus would pin all five consumers' jobs to one core
    tok = fan_out(docs).select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("t"),
    ).localCheckpoint()
    vocab_v = tok.agg(F.countDistinct("t").alias("V"))
    langs = tok.groupBy(F.col("true_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_l"),
        F.countDistinct("doc_id").alias("d_l"),
    )
    total_docs = tok.agg(F.countDistinct("doc_id").alias("D"))
    ctl = tok.groupBy(F.col("true_lang").alias("clang"), "t").agg(
        F.count(F.lit(1)).alias("c")
    )
    cand = langs.crossJoin(F.broadcast(vocab_v)).crossJoin(
        F.broadcast(total_docs)
    )
    scored = (
        tok.crossJoin(F.broadcast(cand))
        .join(
            ctl,
            (F.col("clang") == F.col("lang")) & (ctl.t == tok.t),
            "left",
        )
        .select(
            "doc_id",
            "true_lang",
            F.col("lang").alias("cand"),
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("n_l") + F.col("V")).cast("double")
                )
                * 1000000
            )
            .cast("long")
            .alias("lp"),
            F.round(
                F.log(F.col("d_l") / F.col("D").cast("double")) * 1000000
            )
            .cast("long")
            .alias("prior"),
        )
    )
    doc_scores = scored.groupBy("doc_id", "true_lang", "cand").agg(
        (F.sum("lp") + F.first("prior")).alias("score")
    )
    pred = doc_scores.groupBy("doc_id", "true_lang").agg(
        F.max(
            F.struct(F.col("score").alias("s"), F.col("cand").alias("lang"))
        )["lang"].alias("pred_lang")
    )
    return pred.groupBy("true_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("pred_lang") == F.col("true_lang")).cast("long")).alias(
            "n_correct"
        ),
        F.round(
            F.sum((F.col("pred_lang") == F.col("true_lang")).cast("long")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            9,
        ).alias("accuracy"),
    )


@query(
    "q_isotonic_trend",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS y FROM events GROUP BY day
    ),
    idx AS (
        SELECT day, y, row_number() OVER (ORDER BY day) AS i FROM d
    ),
    pre AS (
        SELECT day, y, i,
               sum(y) OVER (ORDER BY i) AS p
        FROM idx
    ),
    pairs AS (
        SELECT j.i AS j, k.i AS k,
               CAST(k.p - COALESCE(jm.p, 0) AS DOUBLE) / (k.i - j.i + 1)
                   AS avg_jk
        FROM pre j
        JOIN pre k ON k.i >= j.i
        LEFT JOIN pre jm ON jm.i = j.i - 1
    ),
    m AS (SELECT j, min(avg_jk) AS mj FROM pairs GROUP BY j),
    iso AS (
        SELECT i, day, y,
               max(mj) OVER (ORDER BY i) AS iso_raw
        FROM pre JOIN m ON m.j = pre.i
    )
    SELECT day, y, round(iso_raw, 9) AS iso
    FROM iso
    """,
)
def q_isotonic_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of the daily
    count series via the MAX-MIN CLOSED FORM iso(i) = max_{j≤i}
    min_{k≥j} mean(y[j..k]) — the pool-adjacent-violators result
    WITHOUT the sequential PAV loop (which doesn't distribute): the
    |days|² segment-average table is bounded control data (the series
    is an aggregate), each average is one division of exact prefix
    sums, and min/max are selections — no accumulation-order hazard.
    The monotone-calibration primitive (score calibration, trend
    flooring)."""
    from pyspark.sql import Window

    events = load_tables(spark, sf_dir, ("events",))["events"]
    d = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    idx = d.withColumn("i", F.row_number().over(Window.orderBy("day")))
    pre = idx.withColumn(
        "p", F.sum("y").over(Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0))
    )
    j = pre.select(F.col("i").alias("j"), F.col("p").alias("pj"))
    k = pre.select(F.col("i").alias("k"), F.col("p").alias("pk"))
    jm = pre.select((F.col("i") + 1).alias("j"), F.col("p").alias("pjm"))
    pairs = (
        j.join(k, F.col("k") >= F.col("j"))
        .join(jm, "j", "left")
        .select(
            "j",
            (
                (F.col("pk") - F.coalesce(F.col("pjm"), F.lit(0))).cast("double")
                / (F.col("k") - F.col("j") + 1)
            ).alias("avg_jk"),
        )
    )
    m = pairs.groupBy("j").agg(F.min("avg_jk").alias("mj"))
    iso = (
        pre.join(m, pre.i == m.j)
        .withColumn("iso_raw", F.max("mj").over(Window.orderBy("i")))
    )
    return iso.select("day", "y", F.round("iso_raw", 9).alias("iso"))


@query(
    "q_decision_stump",
    """
    WITH pts AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS x,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    cand AS (
        SELECT x, count(*) AS n, sum(y) AS pos
        FROM pts GROUP BY x
    ),
    pre AS (
        SELECT x,
               sum(n) OVER w AS n_l, sum(pos) OVER w AS pos_l
        FROM cand
        WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)
    ),
    tot AS (SELECT count(*) AS n_tot, sum(y) AS pos_tot FROM pts),
    scored AS (
        SELECT x, n_l, n_tot - n_l AS n_r,
               round((
                   CAST(n_l * n_l - pos_l * pos_l
                        - (n_l - pos_l) * (n_l - pos_l) AS DOUBLE) / n_l
                 + CAST((n_tot - n_l) * (n_tot - n_l)
                        - (pos_tot - pos_l) * (pos_tot - pos_l)
                        - ((n_tot - n_l) - (pos_tot - pos_l))
                          * ((n_tot - n_l) - (pos_tot - pos_l)) AS DOUBLE)
                       / (n_tot - n_l)
               ) / n_tot, 12) AS gini
        FROM pre, tot
        WHERE n_tot - n_l > 0
    )
    SELECT round(CAST(x AS DOUBLE) / 100.0, 2) AS threshold,
           round(gini, 9) AS best_gini,
           CAST(n_l AS BIGINT) AS n_left,
           CAST(n_r AS BIGINT) AS n_right
    FROM scored
    ORDER BY gini, x LIMIT 1
    """,
)
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision stump (1-level tree) exact split search in-engine:
    the best value-threshold separating purchase events, by weighted
    Gini impurity — the axis-aligned split primitive under every
    gradient-boosted tree. Candidate thresholds are the DISTINCT
    value cents (bounded: ≤100·max_value candidates no matter how
    many events), so the prefix-sum window runs over the small
    aggregate, never the fact rows; impurity is a ratio of
    exact-integer squares (n²−pos²−neg²) with the two divisions done
    in the same order on both engines, argmin with an exact-integer
    threshold tiebreak. Splits with an empty right side are excluded
    (n_r > 0)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    pts = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    cand = pts.groupBy("x").agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
    from pyspark.sql import Window

    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = cand.select(
        "x", F.sum("n").over(w).alias("n_l"), F.sum("pos").over(w).alias("pos_l")
    )
    tot = pts.agg(F.count(F.lit(1)).alias("n_tot"), F.sum("y").alias("pos_tot"))
    j = pre.crossJoin(F.broadcast(tot)).filter(F.col("n_tot") - F.col("n_l") > 0)
    neg_l = F.col("n_l") - F.col("pos_l")
    n_r = F.col("n_tot") - F.col("n_l")
    pos_r = F.col("pos_tot") - F.col("pos_l")
    neg_r = n_r - pos_r
    gini = F.round(
        (
            (F.col("n_l") * F.col("n_l") - F.col("pos_l") * F.col("pos_l") - neg_l * neg_l).cast("double") / F.col("n_l")
            + (n_r * n_r - pos_r * pos_r - neg_r * neg_r).cast("double") / n_r
        )
        / F.col("n_tot"),
        12,
    )
    scored = j.select("x", "n_l", n_r.alias("n_r"), gini.alias("gini"))
    best = scored.agg(F.min(F.struct("gini", "x", "n_l", "n_r")).alias("b"))
    return best.select(
        F.round(F.col("b.x").cast("double") / 100.0, 2).alias("threshold"),
        F.round(F.col("b.gini"), 9).alias("best_gini"),
        F.col("b.n_l").alias("n_left"),
        F.col("b.n_r").alias("n_right"),
    )
