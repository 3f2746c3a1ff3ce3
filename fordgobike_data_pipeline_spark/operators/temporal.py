"""Temporal join operators Spark's DataFrame API lacks natively:
as-of join and bounded range join — composed from existing operators
(union + carry-forward window; bucketed equi-join) rather than a
quadratic inequality join, per the custom-operator policy
(composition first, Pandas UDF second, mapPartitions last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: for every left row, the latest right row of the
    same key with right.ts ≤ left.ts (NULLs when none).

    Distributed formulation: tag + union both sides, one window sort
    per key, carry the right payload forward with
    ``last(..., ignorenulls=True)``. One shuffle on the key — no
    inequality join, no per-key collect. Right rows order before left
    rows at equal timestamps so same-instant matches count (the ``≤``
    of SQL ASOF JOIN).

    Ties inside the right side (same key, same ts) must be resolved by
    the caller first (e.g. keep max id per (key, ts)) — mirrors what a
    SQL ASOF JOIN needs for determinism.
    """
    l_payload = F.struct(*[F.col(c) for c in left_cols])
    r_payload = F.struct(*[F.col(c) for c in right_cols])
    tagged_l = left.select(
        F.col(key_col), F.col(ts_col), F.lit(1).alias("_is_left"),
        l_payload.alias("_l"), F.lit(None).cast(
            right.select(r_payload.alias("x")).schema["x"].dataType
        ).alias("_r"),
    )
    tagged_r = right.select(
        F.col(key_col), F.col(ts_col), F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(l_payload.alias("x")).schema["x"].dataType
        ).alias("_l"), r_payload.alias("_r"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out_cols = (
        [F.col(key_col), F.col(ts_col)]
        + [F.col(f"_l.{c}").alias(c) for c in left_cols]
        + [F.col(f"_match.{c}").alias(c) for c in right_cols]
    )
    return carried.filter(F.col("_is_left") == 1).select(*out_cols)


def range_join_pairs(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Pairs of rows with the same key and 0 < t_b − t_a ≤ max_gap.

    A naive inequality join is O(n²) per key; bucketing time into
    max_gap-sized bins turns it into an equi-join on (key, bin) where a
    qualifying pair is always in the same or adjacent bin — the left
    side fans out to 2 keys, candidates are filtered exactly. At scale
    the join work is Σ per-bin densities, not per-key row counts².
    """
    if max_gap_seconds <= 0:
        raise ValueError(f"max_gap_seconds must be positive, got {max_gap_seconds}")
    gap_us = max_gap_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    base = events.select(
        F.col(key_col), F.col(id_col), us.alias("_us"), (us / gap_us).cast("long").alias("_bin")
    )
    a = base.select(
        F.col(key_col),
        F.col(id_col).alias("id_a"),
        F.col("_us").alias("us_a"),
        F.explode(F.array(F.col("_bin"), F.col("_bin") + 1)).alias("_bin"),
    )
    b = base.select(
        F.col(key_col), F.col(id_col).alias("id_b"), F.col("_us").alias("us_b"), "_bin"
    )
    dt = F.col("us_b") - F.col("us_a")
    return (
        a.join(b, [key_col, "_bin"])
        .filter((dt > 0) & (dt <= gap_us))
        .select(
            key_col, "id_a", "id_b", (dt / 1_000_000.0).alias("dt_sec")
        )
    )


def gap_fill_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Dense daily time series per key from sparse events: one row per
    (key, day) across the GLOBAL [min day, max day] span, zero-filled
    counts, and last-observation-carried-forward (LOCF) for the daily
    mean — the regularization step before any window/trend computation
    on irregular event data (and the dashboard-feed shape the
    reference's daily mart approximates with only observed days,
    gold_ddl.sql:11-26).

    Shape: one aggregation to daily grains; the calendar is
    keys × sequence(d0, d1) — the span is a 1-row broadcast and the
    explode is bounded by span length, so the densified table is
    |keys|·|days| by construction, never a shuffle amplification. The
    LOCF window partitions by key ordered by day (≤ |days| rows per
    partition). The carried daily mean derives from an INTEGER
    milli-sum (floor(v·1000) per row, summed as BIGINT): integer
    addition is order-independent, so the carried value is bit-stable
    under any partitioning — a plain double avg differs in the low
    digits between summation orders and cannot be carried
    deterministically (precision cost: 1e-3 per input value).
    """
    v = F.col(value_col).cast("double")
    daily = (
        df.groupBy(
            F.col(key_col).alias("grp"), F.to_date(F.col(ts_col)).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(v * 1000).cast("long")).alias("_s"),
            F.count(v).alias("_nv"),
        )
        .withColumn(
            # integer milli-mean via explicit FLOOR division (pmod keeps
            # it exact for negative sums too — `div` truncates toward
            # zero while SQL `//` floors), then an exact /1000.0 — no
            # round() call anywhere, so no half-boundary disagreement
            # between engines
            "day_avg",
            F.when(
                F.col("_nv") > 0,
                F.expr("(_s - pmod(_s, _nv)) div _nv").cast("double")
                / F.lit(1000.0),
            ),
        )
        .drop("_s", "_nv")
    )
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    keys = daily.select("grp").distinct()
    cal = keys.crossJoin(F.broadcast(span)).select(
        "grp",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    filled = cal.join(daily, ["grp", "day"], "left").select(
        "grp",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        "day_avg",
    )
    w = Window.partitionBy("grp").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return filled.select(
        "grp",
        "day",
        "n_events",
        F.last("day_avg", ignorenulls=True).over(w).alias("locf_avg"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Time-weighted average per key — the correct mean for
    irregularly-sampled state observations (balances, gauges, IoT
    sensors), where a plain AVG over-weights chatty periods: each
    observation holds until the next one, so it contributes
    value × holding-duration. The final observation has no successor
    and is excluded (standard right-open convention).

    Determinism at any partitioning: contributions are INTEGER
    products — floor(value·1000) milli-units × whole-second holding
    durations — summed exactly, with the single double division at
    the end. One lead() window per key, one aggregation."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    secs = F.unix_timestamp(F.col(ts_col))
    dur = (F.lead(secs).over(w) - secs).alias("dur")
    v_milli = F.floor(F.col(value_col).cast("double") * 1000).cast("long")
    obs = df.select(
        F.col(key_col).alias("grp"),
        dur,
        (v_milli * (F.lead(secs).over(w) - secs)).alias("contrib"),
    ).filter(F.col("dur").isNotNull() & (F.col("dur") > 0))
    return obs.groupBy("grp").agg(
        F.sum("dur").alias("total_secs"),
        (
            F.sum("contrib").cast("double")
            / (F.lit(1000.0) * F.sum("dur").cast("double"))
        ).alias("twa"),
    )


def ewma_latest(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Latest exponentially-weighted moving average per key with
    α = 1/2 — the O(1)-state trend tracker a monitoring rollup keeps
    per series (vs the rolling median's O(window) state).

    s_1 = x_1, s_t = (s_{t−1} + x_t)/2. α = 1/2 is deliberate: every
    intermediate is a dyadic rational, exact in binary floating point,
    so the fold is bit-identical on any engine — a general α would
    accumulate rounding that differs between fold implementations.
    The recurrence is inherently sequential per key, so it folds over
    the key's ordered value array (collect_list is bounded by the
    per-key series length — daily grains, not raw events; for
    unbounded series, fold incrementally per partition file instead).
    Returns (grp, n_points, ewma).
    """
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).cast("double").alias("v")))
    )
    g = df.groupBy(F.col(key_col).alias("grp")).agg(arr.alias("_a"))
    vals = F.transform(F.col("_a"), lambda s: s["v"])
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: (acc + x) / F.lit(2.0),
    )
    return g.select(
        "grp", F.size("_a").alias("n_points"), folded.alias("ewma")
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    n_rows: int = 7,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detector: each point scored
    against the mean/stddev of the PRIOR ``n_rows`` observations of
    its key (the point itself excluded — a spike must not inflate its
    own baseline). Emits every point with its z and an is_anomaly
    flag; z is NULL until a full baseline window exists or when the
    baseline is constant (zero variance).

    Determinism: Σx and Σx² accumulate over the bounded rows-window as
    exact BIGINTs (inputs integral — daily counts), sample variance in
    the closed form (nΣx²−(Σx)²)/(n(n−1)), ONE sqrt + one division,
    rounded 6dp. One window sort per key serves both running sums.
    """
    if n_rows < 2:
        raise ValueError(f"n_rows must be >= 2, got {n_rows}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(-n_rows, -1)
    )
    x = F.col(value_col).cast("long")
    cnt = F.count(x).over(w)
    sx = F.sum(x).over(w)
    sxx = F.sum(x * x).over(w)
    nn = cnt.cast("double")
    mean = sx.cast("double") / nn
    var = (nn * sxx.cast("double") - sx.cast("double") * sx.cast("double")) / (
        nn * (nn - 1)
    )
    z = F.when(
        (cnt == n_rows) & (var > 0),
        (x.cast("double") - mean) / F.sqrt(var),
    )
    zr = F.round(z, 6) + F.lit(0.0)
    return df.select(
        F.col(key_col),
        F.col(order_col),
        F.col(value_col),
        zr.alias("z"),
        (F.abs(zr) > threshold).alias("is_anomaly"),
    )


def clamped_running_balance(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    delta_col: str,
    floor: int = 0,
) -> DataFrame:
    """Floor-clamped running balance per key — the gift-card/inventory
    recurrence b_k = max(floor, b_{k-1} + delta_k), summarized per key
    as (n_events, floor_hits, max_balance, final_balance).

    The recurrence LOOKS inherently sequential (each step consumes the
    clamped previous step), which would force a per-key Python scan
    (applyInPandas). It is not: with c = b - floor and prefix sums
    P_k = sum(delta_1..delta_k), the clamp has the closed form

        c_k = P_k - min(0, min_{j<=k} P_j)

    (the running prefix-min absorbs exactly the mass the clamp would
    have discarded), so the whole scan is THREE window functions over
    one sort — cumulative sum, running min of it, and a lagged
    running min for the hit test (step k clamped iff
    c_{k-1} + delta_k < 0). Pure JVM whole-stage codegen, one shuffle
    on the key, no Python in the loop; the sequential reference scan
    lives in the unit test as the cross-check.

    Deltas must be exact integers (cents); all window arithmetic stays
    in BIGINT, so partitioning cannot perturb any sum. The balance
    starts AT the floor (c_0 = 0 — you cannot open below the floor),
    which is what makes the closed form exact.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    wcur = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    d = F.col(delta_col).cast("long")
    prefix = F.sum(d).over(wcur)
    runmin = F.least(F.lit(0).cast("long"), F.min(prefix).over(wcur))
    runmin_prev = F.least(
        F.lit(0).cast("long"), F.coalesce(F.min(prefix).over(wprev), F.lit(0))
    )
    bal = prefix - runmin
    clamped = (prefix - runmin_prev) < 0
    # keep the ORIGINAL key column through the aggregation: aliasing it
    # first mints a new exprId, and the groupBy exchange can no longer
    # see that the window already hash-partitioned on the same key —
    # measured as a second full shuffle in the plan before this fix
    stepped = df.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        bal.alias("bal"),
        clamped.cast("int").alias("hit"),
    )
    return stepped.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("hit").alias("floor_hits"),
        (F.max("bal") + floor).alias("max_balance"),
        (F.max_by("bal", F.struct(F.col("_ts"), F.col("_tb"))) + floor).alias(
            "final_balance"
        ),
    ).withColumnRenamed(key_col, "key")


def acf_daily(
    events: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation function of the DAILY EVENT-COUNT series at lags
    1..max_lag — the seasonality probe run before picking a forecast
    window or a partition cadence (a lag-7 spike = weekly cycle).

    Determinism: counts are integers, so every Pearson sufficient
    statistic (n, Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT sum;
    the coefficient is then a closed-form double expression of exact
    integers — no order-dependent double accumulation anywhere.

    Scale shape: one groupBy to the |days|-sized series, a broadcast
    of the lag list, one self-equi-join on shifted day index, one
    groupBy per lag. The heavy table (events) is touched exactly once.
    """
    spark = events.sparkSession
    counts = events.groupBy(
        F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    # dense integer index from the series' own min day
    base = counts.agg(F.min("day").alias("d0"))
    idx = counts.crossJoin(F.broadcast(base)).select(
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("i"),
        F.col("c").cast("long").alias("c"),
    )
    lags = spark.range(1, max_lag + 1).select(F.col("id").cast("int").alias("lag"))
    x = idx.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("i") + F.col("lag")).alias("j"), F.col("c").alias("x")
    )
    y = idx.select(F.col("i").alias("j"), F.col("c").alias("y"))
    pairs = x.join(y, "j")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.round(
            num.cast("double") / (F.sqrt(denx) * F.sqrt(deny)), 9
        ).alias("acf"),
    )


def cusum_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """CUSUM level-shift detection over the daily total of ``val_col``:
    the changepoint is the day maximizing |Σ_{i≤t}(x_i − x̄)| — the
    classic single-changepoint statistic, used to catch a corpus
    source changing volume or a metric stepping after a deploy.

    Integer closed form: with daily totals v_i in fixed-point cents
    and P_t the cumulative sum, n·S_t = n·P_t − t·T (T = grand total)
    — every term BIGINT-exact, so argmax and the reported statistic
    are deterministic. The emitted ``cusum_frac`` = |n·S_t| / (n·|T|)
    is the one double division.

    One groupBy to days, one window cumsum over the day order (a
    single |days|-sized partition — fine: the series is already
    aggregated), one 1-row argmax.
    """
    daily = events.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.sum(F.round(F.col(val_col) * 100).cast("long")).alias("v")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = daily.agg(
        F.sum("v").alias("t_all"), F.count(F.lit(1)).alias("n_days")
    )
    cum = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n_days",
        "t_all",
        (
            F.col("n_days") * F.sum("v").over(w)
            - F.row_number().over(Window.orderBy("day")) * F.col("t_all")
        ).alias("ns"),
    )
    return cum.select(
        F.struct(
            F.abs(F.col("ns")).alias("a"),
            (-F.datediff(F.col("day"), F.to_date(F.lit("1970-01-01")))).alias(
                "neg_d"
            ),
            F.col("day"),
            F.col("n_days"),
            F.col("ns"),
            F.col("t_all"),
        ).alias("s")
    ).agg(
        F.max("s").alias("m")
    ).select(
        F.col("m.day").alias("changepoint_day"),
        F.col("m.n_days").alias("n_days"),
        F.col("m.a").alias("abs_ns"),
        F.round(
            F.col("m.a").cast("double")
            / (F.col("m.n_days") * F.abs(F.col("m.t_all"))).cast("double"),
            9,
        ).alias("cusum_frac"),
    )


def seasonal_profile_dow(
    events: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """Day-of-week seasonal index: (mean daily count on DOW d) /
    (mean daily count overall), per DOW — the additive-seasonality
    profile a gap-fill or anomaly monitor normalizes against.

    Index = (sum_d · days_all) / (days_d · sum_all): one division of
    exact integer products. DOW convention pinned to DuckDB's
    ``dayofweek`` (0=Sunday) via Spark's ``dayofweek() − 1``.
    """
    daily = events.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    bydow = daily.groupBy(
        (F.dayofweek("day") - 1).alias("dow")
    ).agg(F.sum("c").alias("sum_d"), F.count(F.lit(1)).alias("days_d"))
    tot = daily.agg(
        F.sum("c").alias("sum_all"), F.count(F.lit(1)).alias("days_all")
    )
    return bydow.crossJoin(F.broadcast(tot)).select(
        "dow",
        "days_d",
        "sum_d",
        F.round(
            (F.col("sum_d") * F.col("days_all")).cast("double")
            / (F.col("days_d") * F.col("sum_all")).cast("double"),
            9,
        ).alias("seasonal_index"),
    )


def watermark_lateness_audit(
    events: DataFrame,
    delays_minutes: list[int] = (1, 5, 15),
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    batch_size: int = 256,
) -> DataFrame:
    """Watermark design audit — answers "which watermark delay would
    have dropped how much of THIS stream?" before anyone picks the
    ``withWatermark`` value for the streaming jobs
    (streaming/incremental.py): for each candidate delay, replay the
    batch's arrival order (the monotone ingest id) and count events
    whose event time had already fallen behind the watermark when
    they arrived. This is the offline twin of Structured Streaming's
    own bookkeeping: the engine advances the watermark per
    MICRO-BATCH (max event time seen in completed batches minus the
    delay), so the audit buckets arrivals into ``batch_size``-row
    micro-batches and takes the watermark an event faces as
    cummax(prior batches' max event time) − delay — exactly the
    granularity at which the real engine would have dropped it.

    Determinism: all comparisons run on integer epoch microseconds;
    the delay grid is a bounded literal relation (broadcast).

    Scale: one per-batch aggregate (output rows = n_events /
    batch_size), a cumulative-max window over that BATCH-SUMMARY
    table (metadata-scale — the same state the streaming engine keeps
    per micro-batch; at extreme event counts raise ``batch_size`` or
    two-level the cummax), then one broadcast join back. Returns one
    row per delay: (delay_min, n_late, n_total, late_ratio)."""
    ev = events.select(
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.expr(f"{arrival_col} div {int(batch_size)}").alias("_batch"),
    )
    per_batch = ev.groupBy("_batch").agg(F.max("_us").alias("_bmax"))
    w_prior = Window.orderBy("_batch").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm = per_batch.select(
        "_batch", F.max("_bmax").over(w_prior).alias("_wm_us")
    )
    spark = events.sparkSession
    delays = spark.createDataFrame(
        [(int(d),) for d in delays_minutes], "delay_min int"
    )
    joined = ev.join(F.broadcast(wm), "_batch").crossJoin(F.broadcast(delays))
    late = F.when(
        F.col("_wm_us").isNotNull()
        & (
            F.col("_us")
            < F.col("_wm_us") - F.col("delay_min").cast("long") * 60_000_000
        ),
        1,
    ).otherwise(0)
    return (
        joined.groupBy("delay_min")
        .agg(
            F.sum(late).cast("long").alias("n_late"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
        .select(
            "delay_min",
            "n_late",
            "n_total",
            F.round(
                F.col("n_late").cast("double") / F.col("n_total").cast("double"),
                9,
            ).alias("late_ratio"),
        )
    )
