"""Product/behavioral analytics operators over an event stream:
cohort retention, Markov transition matrices, marketing attribution,
rolling medians, and RFM segmentation — the dashboard-feeding shapes
the reference's notebook explorations sketch over trips
(EDA.ipynb usage-over-time / member-mix cells) generalized to any
(user, ts, type, value) event table.

Determinism rules shared with the rest of the package: every ordering
carries an explicit id tiebreak, every mean/share is a single double
division of exact integers, and week bucketing is arithmetic on day
counts from a fixed epoch Monday (no engine-specific WEEK() semantics
anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# A Monday, so every 7-day bucket from it is a Monday-start week on
# both engines without invoking either engine's week-of-year rules.
EPOCH_MONDAY = "2000-01-03"


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by the week of
    their FIRST event; for each (cohort_week, week_offset), how many of
    them were active that many weeks later, and what fraction of the
    cohort that is.

    Shape: one aggregation to per-user first day (|users| rows), one
    distinct user-day activity grain, one shuffle join on the user key
    (both sides user-partitioned; at 100 TB the first-day table is
    |users| — small relative to events but not broadcastable, so the
    equi-join is the right plan), then a count-distinct per cohort
    cell. Week bucketing = floor(days_since_epoch_monday / 7) — pure
    integer arithmetic, identical on any engine. retention_pct is the
    single double division n_active / cohort_size.
    """
    day = F.to_date(F.col(ts_col))
    epoch = F.lit(EPOCH_MONDAY).cast("date")
    first = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(day).alias("first_day")
    )
    cohort = first.select(
        "u",
        F.date_add(
            epoch,
            (7 * F.floor(F.datediff(F.col("first_day"), epoch) / 7)).cast("int"),
        ).alias("cohort_week"),
    )
    activity = events.select(F.col(user_col).alias("u"), day.alias("day")).distinct()
    cells = (
        activity.join(cohort, "u")
        .select(
            "u",
            "cohort_week",
            F.floor(F.datediff(F.col("day"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("u").alias("n_active"))
    )
    sizes = cohort.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return cells.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double")).alias(
            "retention_frac"
        ),
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type) with exact counts.

    One lag() window per user (deterministic (ts, id) order), one
    count aggregation over (prev, next) — |types|² rows — and the
    row-normalizing totals join is over that bounded matrix, so
    everything after the window is control-plane sized. The
    probability is one division of two exact BIGINTs (bit-identical
    across engines/partitionings).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = events.select(
        F.lag(F.col(type_col)).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n_trans").alias("_tot"))
    return counts.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n_trans",
        (F.col("n_trans").cast("double") / F.col("_tot").cast("double")).alias(
            "p_trans"
        ),
    )


def attribute_last_touch(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch marketing attribution: each conversion event is
    credited to the most recent preceding touch event (same user)
    within a lookback window; conversions with no in-window touch are
    'unattributed'. Returns conversions + credited value per channel.

    Shape: ONE window pass per user — the touch timestamp and touch
    type are carried forward with two last(..., ignorenulls=True)
    expressions over the same CASE (they null out together, so both
    always come from the same touch row; no struct needed, which keeps
    the oracle SQL plain). No join at all: the classic formulation
    joins conversions to touches with an inequality — quadratic per
    user — while the carry-forward is linear in the sorted stream.
    Value credit sums integer cents so the per-channel totals are
    partitioning-invariant.
    """
    if window_days <= 0:
        raise ValueError(f"window_days must be positive, got {window_days}")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros(F.col(ts_col))
    is_touch = F.col(type_col).isin(*touch_types)
    touch_us = F.last(F.when(is_touch, us), ignorenulls=True).over(w)
    touch_type = F.last(F.when(is_touch, F.col(type_col)), ignorenulls=True).over(w)
    window_us = window_days * 86_400 * 1_000_000
    conv = events.select(
        F.col(type_col).alias("_t"),
        us.alias("_us"),
        touch_us.alias("_tus"),
        touch_type.alias("_ttype"),
        F.floor(F.col("value") * 100).cast("long").alias("_cents"),
    ).filter(F.col("_t") == conversion_type)
    channel = F.coalesce(
        F.when(F.col("_us") - F.col("_tus") <= window_us, F.col("_ttype")),
        F.lit("unattributed"),
    )
    return conv.groupBy(channel.alias("channel")).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        (F.sum("_cents").cast("double") / F.lit(100.0)).alias("credited_value"),
    )


def rolling_median(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    n_rows: int = 7,
) -> DataFrame:
    """Rolling median of an integer-valued series over the trailing
    ``n_rows`` rows per key — the robust smoother for daily-count
    series (a rolling mean chases single-day spikes; the median
    ignores them).

    Spark has no median window function, so this composes one:
    collect_list over a BOUNDED rows-window (≤ n_rows elements — never
    an unbounded state blowup), sort_array for order-independence, and
    exact middle-element indexing; even-length windows average the two
    middles (a .5-exact double). Per-key partitions sort once and both
    the list window and the indexing ride that sort.
    """
    if n_rows <= 0:
        raise ValueError(f"n_rows must be positive, got {n_rows}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(-(n_rows - 1), 0)
    )
    arr = F.sort_array(F.collect_list(F.col(value_col).cast("long")).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return df.select(
        F.col(key_col),
        F.col(order_col),
        F.col(value_col),
        ((lo + hi) / F.lit(2.0)).alias("rolling_median"),
    )


def rfm_segments(
    events: DataFrame,
    purchase_type: str = "purchase",
    n_tiles: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """RFM segmentation: per user Recency (days since last purchase,
    vs the global max event day), Frequency (purchase count), Monetary
    (integer-cents purchase sum), each scored into ``n_tiles`` ntile
    buckets (1 = best) with a deterministic user-id tiebreak, plus the
    concatenated segment label ('111' = best customers).

    Shape: one per-user aggregation over the purchase subset, the
    global max day as a 1-row broadcast (scalar control data), then
    exact equal-count ntiles WITHOUT an unpartitioned window (a global
    ntile() pulls every user row into one partition — the single-sort
    bottleneck at billions of users). Instead, the rank_select_kth
    histogram pattern generalized to every row: the three metrics
    unpivot to (user, metric, sort_key) — descending axes negate the
    key so everything ranks ascending — an equi-width histogram on
    the broadcast (min, max) steers each row into one of ``n_buckets``
    ORDERED buckets, bucket counts cumulate over the bounded
    3×n_buckets control table, and rows rank inside a PER-BUCKET
    window; global rank = bucket offset + local rank, and the tile is
    closed-form in (rank, n) — the row→tile mapping is bit-identical
    to ``ntile() OVER (ORDER BY metric, user)``, which is what the
    oracle adjudicates. Largest partition = largest tie class +
    ~1/n_buckets of the value range, never the whole table.
    """
    if n_tiles <= 0:
        raise ValueError(f"n_tiles must be positive, got {n_tiles}")
    n_buckets = 256
    day = F.to_date(F.col(ts_col))
    anchor = events.agg(F.max(day).alias("anchor_day"))
    per_user = (
        events.filter(F.col(type_col) == purchase_type)
        .groupBy(F.col(user_col).alias("u"))
        .agg(
            F.max(day).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "u",
            F.datediff(F.col("anchor_day"), F.col("last_day")).alias("recency_days"),
            "frequency",
            (F.col("_cents").cast("double") / F.lit(100.0)).alias("monetary"),
        )
        # the user table feeds four plan branches (stats, bucketing,
        # ranking, final join) — pin it once
        .localCheckpoint()
    )
    # 1 = best on every axis: recency ascending (recent first),
    # frequency/monetary descending (big first) — negate the
    # descending keys so every axis ranks ascending. All three cast
    # to double (exact for day-diffs, counts < 2^53, and cents/100).
    longf = per_user.select(
        "u",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("metric"),
                    F.col("recency_days").cast("double").alias("v"),
                ),
                F.struct(
                    F.lit("f").alias("metric"),
                    (-F.col("frequency")).cast("double").alias("v"),
                ),
                F.struct(
                    F.lit("m").alias("metric"),
                    (-F.col("monetary")).cast("double").alias("v"),
                ),
            )
        ).alias("e"),
    ).select("u", F.col("e.metric").alias("metric"), F.col("e.v").alias("v"))
    stats = longf.groupBy("metric").agg(
        F.min("v").alias("_mn"),
        F.max("v").alias("_mx"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    b = F.when(F.col("_mx") == F.col("_mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col("v") - F.col("_mn"))
                / (F.col("_mx") - F.col("_mn"))
                * n_buckets
            ).cast("int"),
        )
    )
    bucketed = longf.join(F.broadcast(stats), "metric").select(
        "metric", "u", "v", "_n", b.alias("_b")
    )
    counts = bucketed.groupBy("metric", "_b").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_off = (
        Window.partitionBy("metric")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "metric",
        "_b",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    w_loc = Window.partitionBy("metric", "_b").orderBy(
        F.col("v").asc(), F.col("u").asc()
    )
    ranked = bucketed.join(F.broadcast(offsets), ["metric", "_b"]).select(
        "metric",
        "u",
        "_n",
        (F.col("_off") + F.row_number().over(w_loc)).alias("_rank"),
    )
    # ntile(t) closed form: q = n div t tiles of size q (+1 for the
    # first n mod t tiles); rows 1..rem*(q+1) land in the padded tiles.
    tile = F.when(
        F.col("_rank") <= F.col("_rem") * (F.col("_q") + 1),
        F.expr("(_rank - 1) div (_q + 1) + 1"),
    ).otherwise(
        F.expr("_rem + (_rank - 1 - _rem * (_q + 1)) div _q + 1")
    )
    tiles = (
        ranked.withColumn("_q", F.expr(f"_n div {n_tiles}"))
        .withColumn("_rem", F.expr(f"_n % {n_tiles}"))
        .withColumn("tile", tile.cast("int"))
        .groupBy("u")
        .pivot("metric", ["r", "f", "m"])
        .agg(F.first("tile"))
    )
    return per_user.join(tiles, "u").select(
        F.col("u").alias(user_col),
        "recency_days",
        "frequency",
        "monetary",
        F.col("r").alias("r_score"),
        F.col("f").alias("f_score"),
        F.col("m").alias("m_score"),
        F.concat_ws("", F.col("r"), F.col("f"), F.col("m")).alias("segment"),
    )


def ols_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key ordinary-least-squares trend line (slope + intercept)
    over integer (x, y) observations — the "is this metric drifting"
    detector run per segment on daily-count series.

    One aggregation per key accumulating Σx, Σy, Σxy, Σx² as exact
    BIGINTs (inputs must be integral — day offsets and counts are);
    the closed form slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) then runs in
    double on those exact sums, identical bits on any engine and any
    partitioning. Built-in regr_slope sums doubles in partition order
    — not hash-adjudicable. NULL slope for keys with < 2 distinct x
    (degenerate fit).
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    s = df.groupBy(F.col(key_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    nn = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    den = nn * F.col("sxx").cast("double") - sx * sx
    slope = F.when(
        den > 0, (nn * F.col("sxy").cast("double") - sx * sy) / den
    )
    return s.select(
        "grp",
        "n",
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (F.round((sy - slope * sx) / nn, 6) + F.lit(0.0)).alias("intercept"),
    )


def skyline_2d(
    df: DataFrame,
    max_col: str,
    min_col: str,
    id_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not dominated by any other —
    dominated means another row is ≥ on the maximized column and ≤ on
    the minimized one, strictly better in at least one. The
    price/performance shortlist query.

    The textbook formulation is a quadratic NOT EXISTS self-join; in
    2-D it collapses to ONE window pass: sort by (max_col DESC), track
    the running min of min_col over STRICTLY greater max values
    (RANGE frame excludes peers, so equal-max rows don't shadow each
    other), and keep rows strictly under that running min — plus,
    within an equal max value, only the min_col minimum survives
    (peer domination). Linear, one shuffle; d>2 needs the
    grid-partition generalization.
    """
    w_prev = (
        Window.orderBy(F.col(max_col).desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_peer = Window.partitionBy(max_col)
    prev_min = F.min(F.col(min_col)).over(w_prev)
    peer_min = F.min(F.col(min_col)).over(w_peer)
    return (
        df.select(
            F.col(id_col),
            F.col(max_col),
            F.col(min_col),
            prev_min.alias("_pm"),
            peer_min.alias("_qm"),
        )
        .filter(
            (F.col("_pm").isNull() | (F.col(min_col) < F.col("_pm")))
            & (F.col(min_col) == F.col("_qm"))
        )
        .select(id_col, max_col, min_col)
    )


def id_gap_islands(
    df: DataFrame,
    id_col: str,
) -> DataFrame:
    """Gap report over a supposedly-dense integer key: one row per
    missing run (gap_start, gap_end, gap_len) — the completeness check
    for sequence-keyed feeds (did the upstream skip order ids?).

    One distinct + one lead() window over the DISTINCT key table
    (|keys| rows, not raw data). The window is global — inherent to a
    global-sequence question (same documented trade as q_ntile); at
    100 TB, range-partition the key space and treat partition
    boundaries as candidate gaps.
    """
    w = Window.orderBy(F.col("_k").asc())
    keys = df.select(F.col(id_col).cast("long").alias("_k")).distinct()
    nxt = F.lead(F.col("_k")).over(w)
    return (
        keys.select("_k", nxt.alias("_n"))
        .filter(F.col("_n") - F.col("_k") > 1)
        .select(
            (F.col("_k") + 1).alias("gap_start"),
            (F.col("_n") - 1).alias("gap_end"),
            (F.col("_n") - F.col("_k") - 1).alias("gap_len"),
        )
    )


def ab_test_two_proportion(
    events: DataFrame,
    variant_expr,
    convert_expr,
    user_col: str = "user_id",
) -> DataFrame:
    """Two-proportion z-test between two experiment arms: per-arm
    user-level conversion rates and the pooled z statistic — the
    decision gate of an A/B readout.

    One aggregation to per-(arm, user) conversion flags (distinct
    users, so chatty users don't weight the rate), one to arms (2
    rows), then pure arithmetic on exact integers with the single
    √ at the end — rounded 6dp, the transcendental parity rule.
    variant_expr maps a row to arm 0/1 (e.g. a hash of the user id);
    convert_expr is the boolean per-event conversion condition. z is
    NULL when the pooled rate is degenerate (0 or 1 — zero standard
    error, nothing to test).
    """
    per_user = (
        events.select(
            variant_expr.cast("int").alias("arm"),
            F.col(user_col).alias("u"),
            convert_expr.cast("int").alias("c"),
        )
        .groupBy("arm", "u")
        .agg(F.max("c").alias("converted"))
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    a0 = arms.filter(F.col("arm") == 0).select(
        F.col("n_users").alias("n0"), F.col("n_converted").alias("c0")
    )
    a1 = arms.filter(F.col("arm") == 1).select(
        F.col("n_users").alias("n1"), F.col("n_converted").alias("c1")
    )
    j = a0.crossJoin(F.broadcast(a1))
    p0 = F.col("c0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pp * (1 - pp)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    return j.select(
        "n0",
        "c0",
        "n1",
        "c1",
        (F.round(p0, 6) + F.lit(0.0)).alias("p0"),
        (F.round(p1, 6) + F.lit(0.0)).alias("p1"),
        (
            F.round(F.when((pp > 0) & (pp < 1), (p0 - p1) / se), 6) + F.lit(0.0)
        ).alias("z"),
    )


def basket_pair_counts(
    items: DataFrame,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """Co-occurrence counts for market-basket mining: distinct
    (basket, item) grain → per-item basket counts and per-PAIR
    co-basket counts (a < b normalized). The self-join is keyed on the
    basket id, so its cost is Σ basket_size² — bounded by the basket
    grain (an order has a handful of items), never |items|²; a
    pathological mega-basket is the skew to cap upstream.

    Returns (a, b, n_ab, n_a, n_b, n_baskets) — the sufficient
    statistics every derived metric (support, confidence, lift,
    cosine) is pure arithmetic over.
    """
    # ONE (basket, item) shuffle builds per-basket item sets
    # (collect_set IS the distinct); items-per-basket counts, pair
    # co-occurrence counts and the basket total all derive from the
    # checkpointed set table — replacing a distinct exchange + a
    # basket-keyed self-join + a separate distinct-count job with one
    # aggregation and three cheap consumers. Pair expansion happens
    # in-array (a basket holds a handful of items, so combinations
    # stay tiny); the cost remains Σ basket_size², same as the join.
    sets_ = (
        items.groupBy(F.col(basket_col).alias("bk"))
        .agg(F.collect_set(F.col(item_col)).alias("_its"))
        .localCheckpoint()
    )
    item_n = (
        sets_.select(F.explode("_its").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    pairs = (
        sets_.select(
            F.explode(
                F.expr(
                    "flatten(transform(_its, x -> transform("
                    "filter(_its, y -> y > x), y -> struct(x AS a, y AS b))))"
                )
            ).alias("_ab")
        )
        .select(F.col("_ab.a").alias("a"), F.col("_ab.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    n_baskets = sets_.count()
    return (
        pairs.join(item_n.withColumnRenamed("i", "a").withColumnRenamed("n_i", "n_a"), "a")
        .join(item_n.withColumnRenamed("i", "b").withColumnRenamed("n_i", "n_b"), "b")
        .select("a", "b", "n_ab", "n_a", "n_b", F.lit(n_baskets).alias("n_baskets"))
    )


def association_rules(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 3,
    k: int = 25,
) -> DataFrame:
    """Top-k association rules a→b by lift with a support floor — the
    classic market-basket readout. Both rule directions are emitted
    (confidence is asymmetric); lift = n_ab·N/(n_a·n_b) is computed as
    exact integer products with ONE division (then 6dp), so ranking
    ties can't flap between engines; the tiebreak is (a, b). Top-k is
    TakeOrderedAndProject over the pair table (already ≪ data scale).
    """
    # both rule directions read the same pair stats — checkpoint so
    # the basket aggregation + pair join runs once
    stats = (
        basket_pair_counts(items, basket_col, item_col)
        .filter(F.col("n_ab") >= min_pair_count)
        .localCheckpoint()
    )
    fwd = stats.select(
        F.col("a").alias("lhs"), F.col("b").alias("rhs"),
        "n_ab", F.col("n_a").alias("n_lhs"), F.col("n_b").alias("n_rhs"), "n_baskets",
    )
    rev = stats.select(
        F.col("b").alias("lhs"), F.col("a").alias("rhs"),
        "n_ab", F.col("n_b").alias("n_lhs"), F.col("n_a").alias("n_rhs"), "n_baskets",
    )
    rules = fwd.unionByName(rev)
    support = F.col("n_ab").cast("double") / F.col("n_baskets").cast("double")
    confidence = F.col("n_ab").cast("double") / F.col("n_lhs").cast("double")
    lift = (F.col("n_ab") * F.col("n_baskets")).cast("double") / (
        F.col("n_lhs") * F.col("n_rhs")
    ).cast("double")
    scored = rules.select(
        "lhs", "rhs", "n_ab",
        (F.round(support, 6) + F.lit(0.0)).alias("support"),
        (F.round(confidence, 6) + F.lit(0.0)).alias("confidence"),
        (F.round(lift, 6) + F.lit(0.0)).alias("lift"),
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("lhs").asc(), F.col("rhs").asc()
    ).limit(k)


def item_cosine_similarity(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 3,
    k: int = 25,
) -> DataFrame:
    """Top-k item-item cosine similarities over basket co-occurrence —
    the memory-based collaborative-filtering neighborhood:
    sim = n_ab/√(n_a·n_b), i.e. cosine over binary basket-incidence
    vectors, computed ONLY for pairs that actually co-occur (the
    inverted-index trick: zero-overlap pairs never materialize).
    Exact integer product under the single √, 6dp, (a, b) tiebreak.
    """
    stats = basket_pair_counts(items, basket_col, item_col).filter(
        F.col("n_ab") >= min_pair_count
    )
    sim = F.col("n_ab").cast("double") / F.sqrt(
        (F.col("n_a") * F.col("n_b")).cast("double")
    )
    return (
        stats.select(
            "a", "b", "n_ab", (F.round(sim, 6) + F.lit(0.0)).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(k)
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Gini concentration coefficient over integer values (cents) —
    the revenue-concentration readout ("what share of revenue do the
    top suppliers hold"). Closed form over the ascending-sorted
    series: G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx).

    The rank is one global window over the |entities|-sized aggregate
    (bounded — never raw data; documented q_ntile trade), with an id
    tiebreak so equal values rank deterministically. Σ rank·x
    accumulates as DECIMAL(38,0) (rank·cents overflows BIGINT at
    ~1e7 entities × 1e9 cents; decimal sums stay exact), ONE double
    division at the end, 6dp.
    """
    w = Window.orderBy(F.col(value_col).asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(value_col).cast("decimal(38,0)").alias("x"),
        F.row_number().over(w).cast("decimal(38,0)").alias("r"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("r") * F.col("x")).alias("srx"),
    )
    nn = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    srx = F.col("srx").cast("double")
    return s.select(
        "n",
        (
            F.round((2 * srx - (nn + 1) * sx) / (nn * sx), 6) + F.lit(0.0)
        ).alias("gini"),
    )


def frequent_triples(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 3,
    min_triple_count: int = 2,
    k: int = 20,
) -> DataFrame:
    """Top-k frequent item TRIPLES with A-priori candidate pruning:
    a triple can only be frequent if all three of its pairs are, so
    the triple enumeration semi-joins each pair edge against the
    frequent-pair table BEFORE counting — the pruning that makes
    itemset mining survive scale (the unpruned 3-way self-join
    enumerates Σ C(basket,3) candidates; pruning cuts it to triples
    whose pairs already passed the support floor).
    """
    # the distinct basket-item table feeds five join legs — checkpoint
    # so the distinct runs once, not once per leg
    bi = (
        items.select(F.col(basket_col).alias("bk"), F.col(item_col).alias("it"))
        .distinct()
        .localCheckpoint()
    )
    x = bi.select("bk", F.col("it").alias("a"))
    y = bi.select("bk", F.col("it").alias("b"))
    z = bi.select("bk", F.col("it").alias("c"))
    fpairs = (
        x.join(y, "bk")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_pair_count)
        .select("a", "b")
    )
    # enumerate triples only through frequent (a,b); then A-priori
    # prune on (a,c) and (b,c) before the counting aggregation
    tri = (
        x.join(y, "bk")
        .filter(F.col("a") < F.col("b"))
        .join(fpairs, ["a", "b"], "left_semi")
        .join(z, "bk")
        .filter(F.col("b") < F.col("c"))
    )
    tri = tri.join(
        fpairs.select(F.col("a"), F.col("b").alias("c")), ["a", "c"], "left_semi"
    ).join(
        fpairs.select(F.col("a").alias("b"), F.col("b").alias("c")),
        ["b", "c"],
        "left_semi",
    )
    counted = (
        tri.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_triple_count)
    )
    return counted.orderBy(
        F.col("support").desc(), F.col("a").asc(), F.col("b").asc(), F.col("c").asc()
    ).limit(k)


def funnel_latency(
    events: DataFrame,
    first_type: str,
    second_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Conversion-latency distribution: per user, the seconds from the
    FIRST ``first_type`` event to the first ``second_type`` event
    AFTER it; one row of exact percentiles (p25/p50/p75, in seconds)
    + count — the "how long does the funnel take" readout next to
    q_funnel's "how many make it".

    Two per-user aggregations (min over a conditional); latencies in
    exact MICROSECOND BIGINTs (whole-second truncation would diverge
    from engines whose epoch() is fractional), exact interpolated
    percentiles on those integers, one /1e6 division at the end (the
    approx_percentile swap applies at 100 TB as everywhere else).
    """
    first_ts = F.min(
        F.when(F.col(type_col) == first_type, F.col(ts_col))
    ).alias("t1")
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(first_ts)
    joined = (
        events.select(F.col(user_col).alias("u"), F.col(type_col), F.col(ts_col))
        .join(per_user, "u")
        .filter(
            (F.col(type_col) == second_type)
            & F.col("t1").isNotNull()
            & (F.col(ts_col) > F.col("t1"))
        )
        .groupBy("u")
        .agg(
            F.min(
                F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("t1"))
            ).alias("latency_us")
        )
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_converted"),
        (F.percentile(F.col("latency_us"), F.lit(0.25)) / 1e6).alias("p25_s"),
        (F.percentile(F.col("latency_us"), F.lit(0.5)) / 1e6).alias("p50_s"),
        (F.percentile(F.col("latency_us"), F.lit(0.75)) / 1e6).alias("p75_s"),
    )


def benford_digit_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-numbers screen for financial columns. Per digit
    1–9: observed count, observed share, Benford expectation
    log10(1 + 1/d), and the chi-square contribution
    (obs − exp)²/exp on counts.

    The leading digit comes from the INTEGER STRING rendering of
    floor(value) (substr of a BIGINT cast) — never from
    floor(log10(x)) powers, whose float boundary behavior at exact
    powers of ten differs per engine. One groupBy on a 9-value key;
    shares and chi terms are single double divisions, 6dp.
    """
    v = F.floor(F.col(value_col)).cast("long")
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(v >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    tot = counts.agg(F.sum("n_obs").alias("n_total"))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    n_exp = expected * F.col("n_total")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            (F.round(F.col("n_obs") / F.col("n_total"), 6) + F.lit(0.0)).alias(
                "obs_share"
            ),
            (F.round(expected, 6) + F.lit(0.0)).alias("benford_share"),
            (
                F.round((F.col("n_obs") - n_exp) * (F.col("n_obs") - n_exp) / n_exp, 6)
                + F.lit(0.0)
            ).alias("chi2_term"),
        )
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Weighted median per group over integer values and integer
    weights: the smallest value v whose cumulative weight reaches half
    the total — the robust center when observations carry volume
    (price per unit weighted by quantity), where the unweighted median
    over-counts small lots.

    The cumulative weight window uses the default RANGE frame
    (ties in the value share one cumulative total), so the selection
    `min(value | 2·cumw >= total)` is deterministic with NO intra-tie
    ordering assumptions. All comparisons are integer (2·cumw vs
    total — no halving, no fractions); one shuffle on the group key.
    """
    w = Window.partitionBy("g").orderBy(F.col("v").asc())
    rows = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
        F.col(weight_col).cast("long").alias("wt"),
    )
    cum = rows.select(
        "g",
        "v",
        F.sum("wt").over(w).alias("cumw"),
        F.sum("wt").over(Window.partitionBy("g")).alias("total_w"),
    )
    return (
        cum.filter(2 * F.col("cumw") >= F.col("total_w"))
        .groupBy("g")
        .agg(
            F.min("v").alias("wmedian"),
            F.max("total_w").alias("total_w"),
        )
        .select(
            F.col("g").alias(group_col),
            "wmedian",
            "total_w",
        )
    )


def km_survival(
    subjects: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve over right-censored integer
    durations: one row per distinct event time t with d_t (observed
    events at t), n_t (subjects still at risk at t), and the product-
    limit estimate S(t) = Π_{u<=t} (1 − d_u/n_u) — the time-to-churn
    readout that a naive "mean lifetime of churned users" biases by
    ignoring the still-alive (censored) population.

    The running product is computed as exp(Σ ln(1 − d/n)) via a
    cumulative-sum window: both engines evaluate the SAME ln() inputs
    (one double division of exact integers each) in the SAME total
    order (event time ascending), so left-to-right float accumulation
    is bit-reproducible across engines; rounded 6dp on output. n_t is
    N − (cumulative subjects departed before t) — a second window over
    the same per-time aggregate (|distinct durations| rows, bounded),
    no pass over raw subjects beyond the first groupBy.
    """
    per_t = subjects.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(observed_col).cast("int")).alias("d"),
        F.count(F.lit(1)).alias("departed"),
    )
    n_total = subjects.count()
    wprev = (
        Window.orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcur = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = F.lit(n_total) - F.coalesce(F.sum("departed").over(wprev), F.lit(0))
    with_n = per_t.select("t", "d", at_risk.alias("n_at_risk")).filter(
        F.col("d") > 0
    )
    # ln(0) diverges across engines (Spark log -> NULL, DuckDB -> -inf),
    # so the d == n "curve hits zero" step is handled as an explicit
    # flag: log terms only for n > d, survival pinned to 0.0 once any
    # prior step extinguished the at-risk set.
    log_term = F.when(
        F.col("n_at_risk") > F.col("d"),
        F.log((F.col("n_at_risk") - F.col("d")).cast("double") / F.col("n_at_risk")),
    )
    dead = F.sum((F.col("n_at_risk") == F.col("d")).cast("int")).over(wcur)
    surv = F.when(dead > 0, F.lit(0.0)).otherwise(
        F.exp(F.sum(log_term).over(wcur))
    )
    return with_n.select(
        "t",
        "d",
        "n_at_risk",
        (F.round(surv, 6) + F.lit(0.0)).alias("survival"),
    )


def attribute_position_based(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each user's
    FIRST conversion distributes one unit of credit over the touch
    events that precede it within the lookback window — 40% to the
    first touch, 40% to the last, 20% split over the middles; a
    conversion with no in-window touch is 'unattributed'.

    Credit determinism: credit is INTEGER PERMILLE (400/400/200-split)
    — the middle share is ``200 div (n−2)`` with the remainder
    assigned to the EARLIEST middle touch, so per-channel totals are
    exact integer sums no matter the partitioning (the 1/n floating
    split of naive linear attribution is order-dependent); one final
    division renders conversions. n=1 → 1000, n=2 → 500/500.

    Shape: one (ts, id)-ordered min-struct per user for the first
    conversion, one join of touches onto that |users|-sized table,
    one rank window per user, one groupBy — no inequality self-join.
    """
    us = F.unix_micros(F.col(ts_col))
    conv = (
        events.filter(F.col(type_col) == conversion_type)
        .groupBy(user_col)
        .agg(
            F.min(F.struct(us.alias("us"), F.col(id_col).alias("id"))).alias(
                "_c"
            )
        )
        .select(user_col, F.col("_c.us").alias("p_us"))
    )
    window_us = window_days * 86_400 * 1_000_000
    touches = (
        events.filter(F.col(type_col).isin(*touch_types))
        .select(
            user_col,
            F.col(type_col).alias("channel"),
            us.alias("t_us"),
            F.col(id_col).alias("t_id"),
        )
        .join(conv, user_col)
        .filter(
            (F.col("t_us") < F.col("p_us"))
            & (F.col("p_us") - F.col("t_us") <= window_us)
        )
    )
    w = Window.partitionBy(user_col).orderBy("t_us", "t_id")
    ranked = touches.select(
        user_col,
        "channel",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy(user_col)).alias("n"),
    )
    base = F.expr("200 div (n - 2)")
    rem = F.lit(200) - base * (F.col("n") - 2)
    credit = (
        F.when(F.col("n") == 1, F.lit(1000))
        .when(F.col("n") == 2, F.lit(500))
        .when(F.col("rk") == 1, F.lit(400))
        .when(F.col("rk") == F.col("n"), F.lit(400))
        .otherwise(base + F.when(F.col("rk") == 2, rem).otherwise(F.lit(0)))
    ).cast("long")
    credited = ranked.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(credit).alias("_pm"),
    )
    # conversions whose user had no in-window touch
    unattr = (
        conv.join(
            touches.select(user_col).distinct(), user_col, "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("n_unattr"))
        .select(
            F.lit("unattributed").alias("channel"),
            F.col("n_unattr").alias("n_touches"),
            (F.col("n_unattr") * 1000).alias("_pm"),
        )
        .filter(F.col("n_touches") > 0)
    )
    return credited.unionByName(unattr).select(
        "channel",
        "n_touches",
        F.round(F.col("_pm").cast("double") / 1000.0, 9).alias(
            "credited_conversions"
        ),
    )


def theil_sen_trend(
    events: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """Theil–Sen robust trend of the daily event-count series: the
    MEDIAN of all pairwise slopes (c_j − c_i)/(j − i) — outlier-proof
    where the OLS fit (ols_trend) is not (one traffic spike can't
    move it). Each slope is a single division of exact integers
    (deterministic), and the median is a selection, not a sum — no
    accumulation-order hazard anywhere.

    The pair enumeration is |days|² — the series is an aggregate, so
    this is bounded control data (3.6k days = 6.5M pairs), not a
    fact-table self-join.
    """
    counts = events.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    base = counts.agg(F.min("day").alias("d0"))
    idx = counts.crossJoin(F.broadcast(base)).select(
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("i"),
        F.col("c").cast("long").alias("c"),
    )
    a = idx.select(F.col("i").alias("ia"), F.col("c").alias("ca"))
    b = idx.select(F.col("i").alias("ib"), F.col("c").alias("cb"))
    slopes = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            (
                (F.col("cb") - F.col("ca")).cast("double")
                / (F.col("ib") - F.col("ia")).cast("double")
            ).alias("s")
        )
    )
    return slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.percentile(F.col("s"), F.lit(0.5)), 9).alias("sen_slope"),
    )


def huber_location(
    df: DataFrame,
    group_col: str,
    value_col: str,
    c: float = 1.0,
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Huber M-estimator of location per group — the robust mean that
    completes the robust-stats family (q_mad_outliers detects,
    q_winsorize clips, this ESTIMATES): outliers beyond ``c`` get
    down-weighted by w = c/|r| instead of either dominating the mean
    or being hard-dropped. Computed by ``iters`` FIXED IRLS rounds
    (not convergence-tested, so the oracle unrolls the same depth —
    the q_power_iteration discipline).

    Determinism: values snap to 1e-6 integer units (rint); the
    running location is re-quantized to integer units each round via
    SIGN-AWARE truncating division of a decimal(38,0)/HUGEINT
    numerator (Σ w·v in 1e-12 units — v and w each carry 1e-6) by the
    exact Σ w — both engines agree bit-exactly, so round-(t+1)'s
    per-row weights see identical integers. Outlier terms w·v and w
    are each one double op ROUNDED to an integer unit grid before the
    exact sum (the order-independent-sum playbook).

    Scale: ``iters`` grouped aggregates over the corpus — partial-agg
    friendly, no windows, no driver data beyond the plan. Returns one
    row per group: (group, n, plain_mean, huber_mean, delta)."""
    cu = int(round(c * scale))
    ints = df.select(
        F.col(group_col).alias("grp"),
        F.rint(F.col(value_col).cast("double") * F.lit(float(scale)))
        .cast("long")
        .alias("v"),
    )
    base = ints.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    # integer-unit starting location: sign-aware truncating mean
    m0 = F.when(F.col("s") >= 0, F.expr("s div n")).otherwise(
        -F.expr("(0 - s) div n")
    )
    loc = base.select("grp", "n", "s", m0.cast("long").alias("m"))
    for _ in range(iters):
        j = ints.join(F.broadcast(loc.select("grp", "m")), "grp")
        r = F.col("v") - F.col("m")
        absr = F.abs(r)
        inlier = absr <= cu
        # inlier: w = 1e6 units, wv = v (1e-6 value units, w folded out
        # so both terms stay exact integers); outlier: one double op
        # each, rounded to the same grids
        w_units = F.when(inlier, F.lit(scale).cast("long")).otherwise(
            F.rint(F.lit(float(cu)) / absr.cast("double") * F.lit(float(scale))).cast("long")
        )
        wv_units = F.when(inlier, F.col("v") * F.lit(scale).cast("long")).otherwise(
            F.rint(
                F.lit(float(cu)) / absr.cast("double") * F.col("v").cast("double") * F.lit(float(scale))
            ).cast("long")
        )
        agg = (
            j.select("grp", w_units.alias("w_units"), wv_units.alias("wv_units"))
            .groupBy("grp")
            .agg(
                F.sum(F.col("wv_units").cast("decimal(38,0)")).alias("swv"),
                F.sum("w_units").cast("long").alias("sw"),
            )
        )
        # sw = 0 iff every row's residual exceeds ~cu·scale integer
        # units (w = rint(cu/|r|·scale) rounds to 0); keep the previous
        # iterate instead of dividing by zero (ANSI mode throws).
        loc = agg.join(loc.select("grp", "n", "s", F.col("m").alias("m_prev")), "grp").select(
            "grp",
            "n",
            "s",
            F.expr(
                "CASE WHEN sw > 0 THEN "
                "CAST(CASE WHEN swv >= 0 THEN CAST(swv AS DECIMAL(38,0)) div CAST(sw AS DECIMAL(38,0)) "
                "ELSE -(CAST(0 - swv AS DECIMAL(38,0)) div CAST(sw AS DECIMAL(38,0))) END AS BIGINT) "
                "ELSE m_prev END"
            ).alias("m"),
        )
    return loc.select(
        F.col("grp").alias(group_col),
        "n",
        F.round(F.col("s").cast("double") / F.col("n").cast("double") / F.lit(float(scale)), 9).alias("plain_mean"),
        F.round(F.col("m").cast("double") / F.lit(float(scale)), 9).alias("huber_mean"),
        F.round(
            (F.col("m").cast("double") - F.col("s").cast("double") / F.col("n").cast("double"))
            / F.lit(float(scale)),
            9,
        ).alias("delta"),
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Hill estimator of the heavy-tail index over the top-k order
    statistics — the distribution-shape audit behind every "cap the
    outliers" decision (q_domain_cap, packing budgets, skew-join
    salting): α̂ = k / Σ_{i≤k} ln(x_(i) / x_(k+1)). α̂ ≈ 1 means a
    Zipf-like tail where the largest items dominate totals (caps and
    salting are mandatory); α̂ > 2 means finite variance and sane
    averages. The token-frequency analogue is q_zipf_fit; this runs
    on any numeric column (document lengths here).

    The top-(k+1) selection is a TakeOrderedAndProject (bounded k+1
    rows, never a global sort), deterministically tie-broken by
    ascending id. Each log-ratio term is quantized to a 1e-12 BIGINT
    before the exact sum (order-independent), one final divide.
    Returns one row: (k, x_tail, alpha_hat)."""
    from pyspark.sql import Window

    top = (
        df.select(
            F.col(value_col).cast("long").alias("x"),
            F.col(id_col).alias("_id"),
        )
        .filter(F.col("x") > 0)
        .orderBy(F.col("x").desc(), F.col("_id").asc())
        .limit(k + 1)
    )
    w = Window.orderBy(F.col("x").desc(), F.col("_id").asc())
    ranked = top.withColumn("rn", F.row_number().over(w))
    ref = ranked.filter(F.col("rn") == k + 1).select(
        F.col("x").alias("x_tail")
    )
    terms = ranked.filter(F.col("rn") <= k).crossJoin(F.broadcast(ref)).select(
        "x_tail",
        F.rint(
            F.log(F.col("x").cast("double") / F.col("x_tail").cast("double"))
            * 1e12
        ).cast("long").alias("t"),
    )
    return terms.groupBy("x_tail").agg(
        F.lit(int(k)).cast("int").alias("k"),
        F.when(
            F.sum("t") > 0,
            F.round(F.lit(float(k)) * 1e12 / F.sum("t").cast("double"), 9),
        ).alias("alpha_hat"),
    ).select("k", "x_tail", "alpha_hat")


def one_way_anova(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """One-way ANOVA of a numeric column across groups: between/within
    sums of squares, the F statistic, and η² (the share of variance
    the grouping explains) — the test behind "does SOURCE actually
    explain quality/length, or is the mixture homogeneous?" that
    decides whether per-source thresholds are worth their complexity
    (η² ≈ 0 → one global threshold is fine).

    Exactness: per-group n and Σx are exact BIGINTs and Σx² is
    decimal(38,0)/HUGEINT (second-moment playbook); each group's
    Σx²ᵍ/nᵍ helper term is ONE double expression quantized to a 1e-6
    BIGINT before the exact cross-group sum (groups are bounded but
    the sum must still be order-independent), so SSB/SSW come out of
    exact integers with one float subtraction each.

    Accuracy bound: because Sg² is squared in DOUBLE before the
    quantize, its unit-in-the-last-place grows with the group sum —
    once Sg²/ng exceeds ~2^52·1e-6 ≈ 4.5e9 (e.g. |Sg| ≳ 9e7 at
    thousand-row groups) the double ulp exceeds the 1e-6 quantum and
    SSB/SSW lose ABSOLUTE accuracy at extreme sums. The expression is
    still one deterministic scalar per bounded group row, so results
    stay order-independent and bit-identical across engines and
    partitionings (the determinism gate this operator is adjudicated
    under); callers needing exact SS at |Σx| beyond ~1e8 should
    pre-scale the value column.

    Scale: one partial-agg groupBy over the corpus plus a bounded
    group-table reduce — no windows, no driver data.

    Returns one row: (n_groups, n_rows, ss_between, ss_within,
    f_stat, eta_sq)."""
    x = F.col(value_col).cast("long")
    per = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(x).cast("long").alias("sg"),
        F.sum(x.cast("decimal(38,0)") * x).alias("sq"),
    )
    # q = rint(Sg²/ng · 1e6): one double expr per bounded group row
    qg = F.rint(
        F.col("sg").cast("double")
        * F.col("sg").cast("double")
        / F.col("ng").cast("double")
        * F.lit(1e6)
    ).cast("decimal(38,0)")
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("ng").cast("long").alias("n_rows"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("sq").alias("sq_all"),
        F.sum(qg).alias("q_sum"),
    )
    grand = (
        F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n_rows").cast("double")
    )
    ssb = F.col("q_sum").cast("double") / F.lit(1e6) - grand
    ssw = F.col("sq_all").cast("double") - F.col("q_sum").cast("double") / F.lit(1e6)
    fstat = F.when(
        (F.col("n_groups") > 1) & (F.col("n_rows") > F.col("n_groups")) & (ssw > 0),
        (ssb / (F.col("n_groups") - 1).cast("double"))
        / (ssw / (F.col("n_rows") - F.col("n_groups")).cast("double")),
    )
    return tot.select(
        "n_groups",
        "n_rows",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(fstat, 9).alias("f_stat"),
        F.when(ssb + ssw > 0, F.round(ssb / (ssb + ssw), 9)).alias("eta_sq"),
    )
