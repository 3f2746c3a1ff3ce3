"""Data-quality validation operators.

The reference validates manually (notebooks/data_exploration.ipynb:
null census, dtype checks, outlier probes) and declares — but cannot
distributedly enforce — FK constraints (silver_ddl.sql:62-66). These
operators turn both into engine checks that run as ordinary jobs and
emit small report DataFrames (append them to the run-metrics table or
gate a publish on them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_census(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column null counts + ratios in ONE pass (notebook cell 7's
    isna().sum(), distributed). Output: one row per column."""
    cols = cols or df.columns
    aggs = [F.count("*").alias("_total")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_n_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_n_{c}").alias("n_null"),
                F.round(F.col(f"_n_{c}") / F.col("_total"), 6).alias("null_ratio"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("s"), F.col("_total").alias("n_rows")).select(
        "s.column", "s.n_null", "s.null_ratio", "n_rows"
    )


def fk_integrity(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, allow_null: bool = True
) -> DataFrame:
    """Referential-integrity report: rows whose FK resolves to no dim
    row (the check behind silver_ddl.sql's FK constraints). One
    broadcast-or-shuffle anti-join; returns a 1-row summary."""
    candidates = fact if not allow_null else fact.filter(F.col(fact_key).isNotNull())
    orphans = candidates.join(
        dim.select(F.col(dim_key).alias(fact_key)), fact_key, "left_anti"
    )
    return candidates.agg(F.count("*").alias("n_checked")).crossJoin(
        orphans.agg(F.count("*").alias("n_orphans"))
    ).select("n_checked", "n_orphans", (F.col("n_orphans") == 0).alias("ok"))


def range_check(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Out-of-range census for a numeric column (notebook cells 21-26
    outlier probes). NULLs are not violations."""
    c = F.col(col)
    viol = F.count(F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1))
    return df.agg(
        F.lit(col).alias("column"),
        F.count(c).alias("n_values"),
        viol.alias("n_out_of_range"),
        (viol == 0).alias("ok"),
    )


def expect_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """Uniqueness check on a key set (the reference's PRIMARY KEY /
    UNIQUE constraints): reports duplicate key count."""
    dups = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
    )
    return df.agg(F.count("*").alias("n_rows")).crossJoin(
        dups.agg(
            F.count("*").alias("n_duplicate_keys"),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("n_rows_in_duplicates"),
        )
    ).select(
        "n_rows",
        "n_duplicate_keys",
        "n_rows_in_duplicates",
        (F.col("n_duplicate_keys") == 0).alias("ok"),
    )


def iqr_outlier_census(
    df: DataFrame, value_col: str, group_col: str, k: float = 1.5
) -> DataFrame:
    """Per-group Tukey-fence outlier census (the notebook's outlier
    probes, cells 21-26, as a distributed check): values outside
    [q1 − k·IQR, q3 + k·IQR] count as outliers. Quartiles are exact
    interpolated percentiles rounded to 4dp BEFORE the fences are
    derived, so any engine computes identical bounds. Two passes: one
    per-group quartile aggregation (bounded — one row per group), one
    conditional count after joining the bounds back (AQE broadcasts
    the bounds table). At 100 TB swap percentile → approx_percentile
    (t-digest, partial-aggregatable) — same flagged deviation as the
    percentile harness query."""
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    q = df.groupBy(group_col).agg(
        F.round(F.percentile(value_col, F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile(value_col, F.lit(0.75)), 4).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - k * iqr
    hi = F.col("q3") + k * iqr
    return (
        df.select(g, v.alias("_v"))
        .join(q, group_col)
        .groupBy(group_col, "q1", "q3")
        .agg(
            F.count("_v").alias("n_values"),
            F.count(F.when((F.col("_v") < lo) | (F.col("_v") > hi), 1)).alias(
                "n_outliers"
            ),
        )
        .select(
            group_col,
            "q1",
            "q3",
            "n_values",
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n_values"), 6).alias("outlier_ratio"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
) -> DataFrame:
    """Per-group percentile clamp (robust cleaning's fix step, where
    :func:`iqr_outlier_census` is the detect step): values below the
    group's p_lo percentile or above p_hi are clamped to those bounds,
    and a flag records which rows were touched. Bounds are exact
    interpolated percentiles rounded to 4dp BEFORE clamping — any
    engine derives identical bounds (the q_outlier_iqr-proven parity).
    Same two-pass shape: one bounded per-group percentile agg, one
    broadcast-joined clamp pass. At 100 TB swap percentile →
    approx_percentile (t-digest partials), same flagged deviation as
    the percentile queries."""
    v = F.col(value_col).cast("double")
    q = df.groupBy(group_col).agg(
        F.round(F.percentile(value_col, F.lit(p_lo)), 4).alias("c_lo"),
        F.round(F.percentile(value_col, F.lit(p_hi)), 4).alias("c_hi"),
    )
    out = df.join(q, group_col)
    clamped = F.least(F.greatest(v, F.col("c_lo")), F.col("c_hi"))
    return out.select(
        *df.columns,
        clamped.alias(f"{value_col}_w"),
        ((v < F.col("c_lo")) | (v > F.col("c_hi"))).alias("was_clipped"),
    )


def corpus_datasheet(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row dataset datasheet — the summary card a corpus release
    ships with (and the first sanity gate a training run checks):
    volume, source/language spread, exact-duplicate rate. One full
    scan, all-aggregate (map-side combined); the mean length uses the
    exact-integer floor-division so the row is hash-stable."""
    t = F.col(text_col)
    agg = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.length(t).cast("long")).alias("total_chars"),
        F.countDistinct(F.md5(t)).alias("n_unique_texts"),
    )
    return agg.select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_chars",
        F.expr(
            "(total_chars - pmod(total_chars, n_docs)) div n_docs"
        ).alias("mean_chars"),
        "n_unique_texts",
        F.round(
            F.lit(1.0) - F.col("n_unique_texts") / F.col("n_docs"), 6
        ).alias("exact_dup_rate"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    split_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index per group between the two halves of
    ``split_col`` (0/1) — the standard distribution-drift monitor
    (PSI < 0.1 stable, > 0.25 shifted). Fixed bins (same clamped
    expression as warehouse.histogram_bin), Laplace +1 on every bin
    count so empty bins never hit log(0), and the per-group sum of
    bin terms folds SEQUENTIALLY over the bin-ordered array (the
    proven cross-engine parity) instead of an order-dependent grouped
    double sum. One aggregation to (group, bin, side) counts, one to
    groups — bounded state throughout."""
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(n_bins))
    bin_c = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    counts = (
        df.filter(v.isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            bin_c.alias("bin"),
            F.col(split_col).cast("int").alias("side"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_bin = counts.groupBy("grp", "bin").agg(
        F.sum(F.when(F.col("side") == 0, F.col("n")).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("side") == 1, F.col("n")).otherwise(0)).alias("nb"),
    )
    tot = per_bin.groupBy("grp").agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    # Laplace-smoothed proportions: (count+1)/(total+n_bins) — exact
    # rationals in double, so pa/pb and ln() see identical bits
    j = per_bin.join(tot, "grp")
    pa = (F.col("na") + 1) / (F.col("ta") + F.lit(n_bins))
    pb = (F.col("nb") + 1) / (F.col("tb") + F.lit(n_bins))
    term = (pa - pb) * F.log(pa / pb)
    folded = (
        j.select("grp", F.struct(F.col("bin"), term.alias("t")).alias("e"))
        .groupBy("grp")
        .agg(F.array_sort(F.collect_list("e")).alias("terms"))
    )
    psi = F.aggregate(
        F.col("terms"), F.lit(0.0), lambda acc, s: acc + s["t"]
    )
    return folded.select(
        "grp", (F.round(psi, 6) + F.lit(0.0)).alias("psi")
    )


def quantile_normalize(
    df: DataFrame, value_col: str, group_col: str, id_col: str
) -> DataFrame:
    """Per-group quantile (rank) normalization: each value maps to its
    percent-rank within its group — the calibration step before
    mixing scores from different domains, where raw scales are
    incomparable (a 0.8 web-quality score ≠ 0.8 code-quality score;
    their percentiles are). percent_rank = (rank−1)/(n−1): an exact
    rational of integers, so the normalized scores are hash-exact.
    One window per group (partition = group size), ties share a rank
    (standard competition ranking via rank())."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    return df.select(
        id_col,
        group_col,
        value_col,
        F.percent_rank().over(w).alias("pct_rank"),
    )


def ks_drift(
    df: DataFrame, value_col: str, group_col: str, split_col: str
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per group: the maximum
    gap between the two sides' empirical CDFs — the
    distribution-drift test with NO binning choice and NO
    transcendentals (every CDF value is an exact integer rational, so
    unlike PSI there is nothing to smooth and nothing that can differ
    in the last ulp). One aggregation to per-(group, value, side)
    counts, two cumulative windows over the distinct values, one max.
    At 100 TB, pre-bucket values to bound the distinct count — the
    same resolution/state trade as the histogram sketch."""
    v = F.col(value_col).cast("double")
    counts = (
        df.filter(v.isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            v.alias("val"),
            F.col(split_col).cast("int").alias("side"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_val = counts.groupBy("grp", "val").agg(
        F.sum(F.when(F.col("side") == 0, F.col("n")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("side") == 1, F.col("n")).otherwise(0)).alias("cb"),
    )
    from pyspark.sql import Window

    w_cum = Window.partitionBy("grp").orderBy("val").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.partitionBy("grp")
    cdf = per_val.select(
        "grp",
        "val",
        (F.sum("ca").over(w_cum).cast("double") / F.sum("ca").over(w_tot))
        .alias("fa"),
        (F.sum("cb").over(w_cum).cast("double") / F.sum("cb").over(w_tot))
        .alias("fb"),
    )
    return cdf.groupBy("grp").agg(
        (F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6) + F.lit(0.0)).alias(
            "ks_stat"
        )
    )


def mad_outlier_census(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier census via Median Absolute Deviation:
    a value is an outlier when |x − median| > k·MAD. The IQR census
    (iqr_outlier_census) breaks down when >25% of a group is bad —
    MAD's 50% breakdown point is the robust-statistics upper bound,
    which is why data-quality monitors prefer it on heavy-tailed
    columns.

    Two exact-percentile aggregations with a join-back between them
    (median, then median of |x − median|); comparisons are against
    .5-exact doubles (integer inputs interpolate at most to halves, and
    0.5 is a power of two — exact in binary on both engines). At
    100 TB the documented swap is approx_percentile for both medians,
    same as the IQR census.
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.percentile(v, F.lit(0.5)).alias("median")
    )
    with_ad = df.join(med, df[group_col] == med["grp"]).select(
        "grp", "median", F.abs(v - F.col("median")).alias("_ad")
    )
    stats = with_ad.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("median").alias("median"),
        F.percentile(F.col("_ad"), F.lit(0.5)).alias("mad"),
    )
    return (
        with_ad.select("grp", "_ad")
        .join(stats, "grp")
        .groupBy("grp")
        .agg(
            F.min("n").alias("n"),
            F.min("median").alias("median"),
            F.min("mad").alias("mad"),
            F.sum((F.col("_ad") > F.lit(k) * F.col("mad")).cast("int")).alias(
                "n_outliers"
            ),
        )
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Chi-square test of independence between two categorical
    columns: one row with the cell count, degrees of freedom, and the
    X² statistic — the monitor for "did the type mix shift by segment"
    questions where PSI/KS (numeric) don't apply.

    One count aggregation to the |A|·|B|-bounded contingency table;
    marginals are aggregates OF that table (control-plane sized), so
    nothing after the first groupBy touches data-scale rows. The
    statistic sums (o−e)²/e over cells — transcendental-free but
    still an order-dependent double sum, so it folds SEQUENTIALLY
    over the cell-ordered array (the psi_drift parity pattern).
    """
    obs = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    ra = obs.groupBy("a").agg(F.sum("o").alias("rt"))
    cb = obs.groupBy("b").agg(F.sum("o").alias("ct"))
    n = obs.agg(
        F.sum("o").alias("n"),
        F.countDistinct("a").alias("na"),
        F.countDistinct("b").alias("nb"),
    )
    # densify to the FULL |A|x|B| grid: zero cells still contribute
    # (0-e)^2/e = e to the statistic — dropping them understates X^2
    cells = (
        ra.crossJoin(F.broadcast(cb))
        .join(obs, ["a", "b"], "left")
        .select("a", "b", "rt", "ct", F.coalesce(F.col("o"), F.lit(0)).alias("o"))
    )
    j = cells.crossJoin(F.broadcast(n))
    # e = rt*ct/n: exact integer product, one division -> identical double
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("n").cast("double")
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    folded = (
        j.select(
            F.col("na"),
            F.col("nb"),
            F.struct(F.col("a"), F.col("b"), term.alias("t")).alias("e"),
        )
        .groupBy("na", "nb")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.array_sort(F.collect_list("e")).alias("terms"),
        )
    )
    chi2 = F.aggregate(F.col("terms"), F.lit(0.0), lambda acc, s: acc + s["t"])
    return folded.select(
        "n_cells",
        ((F.col("na") - 1) * (F.col("nb") - 1)).cast("int").alias("dof"),
        (F.round(chi2, 6) + F.lit(0.0)).alias("chi2"),
    )


def corr_matrix(
    df: DataFrame,
    cols: list[str],
    scale: int = 1000,
) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns in ONE pass:
    each input is fixed-pointed to ``scale`` (floor(v·scale) — exact
    integers), and every Σx, Σx², Σxy accumulates as DECIMAL(38,0) —
    Spark decimals are exact BigDecimal arithmetic (DuckDB twin:
    HUGEINT), so the sums are order-independent where a double sum is
    not, and products of milli-scaled cents never overflow the 38-digit
    range that would break a BIGINT at 100 TB row counts. The closed
    form (nΣxy−ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) then runs in double
    on those exact sums — same bits on any engine, rounded to 6dp.

    Built-in corr() is the convenient alternative but sums doubles in
    partition order — unusable under a hash-adjudicated contract.
    Output: one row per pair (col_x, col_y, corr), pairs in given
    column order.
    """
    ints = {c: F.floor(F.col(c).cast("double") * scale).cast("decimal(38,0)") for c in cols}
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for c in cols:
        aggs.append(F.sum(ints[c]).alias(f"s_{c}"))
        aggs.append(F.sum(ints[c] * ints[c]).alias(f"ss_{c}"))
    pairs = [(x, y) for i, x in enumerate(cols) for y in cols[i + 1:]]
    for x, y in pairs:
        aggs.append(F.sum(ints[x] * ints[y]).alias(f"sp_{x}_{y}"))
    sums = df.agg(*aggs)
    out_rows = []
    for x, y in pairs:
        nn = F.col("n").cast("double")
        sx, sy = F.col(f"s_{x}").cast("double"), F.col(f"s_{y}").cast("double")
        ssx, ssy = F.col(f"ss_{x}").cast("double"), F.col(f"ss_{y}").cast("double")
        sxy = F.col(f"sp_{x}_{y}").cast("double")
        num = nn * sxy - sx * sy
        den = F.sqrt((nn * ssx - sx * sx) * (nn * ssy - sy * sy))
        out_rows.append(
            sums.select(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                (F.round(num / den, 6) + F.lit(0.0)).alias("corr"),
            )
        )
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out


def rank_select_kth(
    df: DataFrame,
    val_col: str,
    id_col: str,
    k_expr: str = "(n + 1) div 2",
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact k-th smallest element (default: lower median) by
    (value, id) order WITHOUT a global sort — the rank-selection
    pattern for order statistics at scale: a global sort of 100 TB to
    read one row is the classic anti-plan.

    Two passes: (1) a histogram over ``n_buckets`` equi-width buckets
    plus the (min, max, count) control row finds WHICH bucket holds
    rank k and how many rows precede it; (2) only that bucket's rows
    (≈ n / n_buckets, sized to executor memory by the bucket count)
    are ranked with a window and the (k − preceding)-th is taken.
    ``k_expr`` is a SQL expression over the row count ``n`` — a
    column, so nothing is collected to the driver.

    The float bucket boundaries only steer the SEARCH — the answer is
    the exact order statistic, which is why the oracle can be the
    independent global-sort row_number formulation.

    Returns one row: (n, k, kth_value, kth_id).
    """
    from pyspark.sql import Window

    stats = df.agg(
        F.min(val_col).alias("_mn"),
        F.max(val_col).alias("_mx"),
        F.count(F.lit(1)).alias("n"),
    ).withColumn("k", F.expr(k_expr))
    b = F.when(
        F.col("_mx") == F.col("_mn"), F.lit(0)
    ).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(val_col) - F.col("_mn"))
                / (F.col("_mx") - F.col("_mn"))
                * n_buckets
            ).cast("int"),
        )
    )
    bucketed = df.crossJoin(F.broadcast(stats)).select(
        F.col(val_col).alias("_v"),
        F.col(id_col).alias("_id"),
        b.alias("_b"),
        "n",
        "k",
    )
    counts = bucketed.groupBy("_b", "n", "k").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wcum = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "_b",
        "n",
        "k",
        F.sum("_c").over(wcum).alias("_cum"),
        (F.sum("_c").over(wcum) - F.col("_c")).alias("_before"),
    )
    # the unique bucket whose cumulative count first reaches k
    target = cum.filter(
        (F.col("_cum") >= F.col("k")) & (F.col("_before") < F.col("k"))
    ).select("_b", "_before")
    # pass 2: rank only the target bucket's rows
    in_bucket = bucketed.join(F.broadcast(target), "_b")
    wrank = Window.partitionBy("_b").orderBy("_v", "_id")
    return (
        in_bucket.withColumn("_rn", F.row_number().over(wrank))
        .filter(F.col("_rn") == F.col("k") - F.col("_before"))
        .select(
            "n",
            "k",
            F.col("_v").alias("kth_value"),
            F.col("_id").alias("kth_id"),
        )
    )


def ece_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Expected-calibration-error report for a [0,1] score against a
    binary outcome — the reliability audit run on any learned quality/
    toxicity/language classifier before its scores gate a corpus (a
    filter whose 0.9 means 60% is silently biased sampling).

    Per equal-width bin: count, positives, accuracy (= empirical
    positive rate) and confidence (= mean score); ECE is the
    count-weighted mean |acc − conf|. Determinism playbook: scores are
    snapped per-row to exact 1e-6 units (rint — engine-stable), so
    per-bin confidence numerators are order-independent BIGINT sums,
    and because the bin weight n_b/N cancels against the gap's 1/n_b,
    ECE reduces to  Σ_b |sum_label_b·1e6 − sum_micro_b| / (N·1e6) —
    exact integers divided ONCE at render. One hash-partitioned
    aggregation; the n_bins-row result broadcasts back for the scalar.

    Returns one row per non-empty bin: (bin, n_rows, n_pos, acc,
    conf, ece) with the corpus-level ece repeated per row."""
    micro = F.rint(F.col(score_col).cast("double") * F.lit(1_000_000.0)).cast(
        "long"
    )
    lab = F.col(label_col).cast("long")
    bin_ = F.least(
        F.floor(F.col(score_col).cast("double") * n_bins).cast("int"),
        F.lit(n_bins - 1),
    )
    per_bin = (
        df.select(bin_.alias("bin"), micro.alias("_m"), lab.alias("_y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.sum("_m").cast("long").alias("_sm"),
        )
    )
    totals = per_bin.agg(
        F.sum("n_rows").cast("long").alias("_n"),
        F.sum(
            F.abs(F.col("n_pos") * F.lit(1_000_000) - F.col("_sm"))
        ).cast("long").alias("_gap"),
    )
    return per_bin.crossJoin(F.broadcast(totals)).select(
        "bin",
        "n_rows",
        "n_pos",
        (F.col("n_pos").cast("double") / F.col("n_rows").cast("double")).alias(
            "acc"
        ),
        (
            F.col("_sm").cast("double")
            / (F.col("n_rows") * F.lit(1_000_000)).cast("double")
        ).alias("conf"),
        (
            F.col("_gap").cast("double")
            / (F.col("_n") * F.lit(1_000_000)).cast("double")
        ).alias("ece"),
    )


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    id_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal threshold calibration: the ⌈(n+1)(1−α)⌉-th
    smallest calibration score — accepting future items with score ≤
    this threshold gives ≥ 1−α coverage under exchangeability (the
    distribution-free guarantee). The principled way to turn a raw
    quality/novelty/nonconformity score into a filter cutoff, instead
    of eyeballing a percentile.

    The order statistic comes from :func:`rank_select_kth` (histogram
    probe + one-bucket rank — no global sort); the report adds the
    empirical accept rate at the threshold (exact int/int division).

    Returns one row: (n, k, threshold, n_accepted, accept_rate)."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    # the calibration table is read three times (rank_select_kth's
    # histogram + bucket passes, then the accept-rate aggregate) —
    # checkpoint the (id, score) projection so the caller's scoring
    # lineage runs once, not once per pass. fan_out was A/B'd here and
    # LOSES (0.68 vs 0.98s): the (id, score) rows are tiny and the
    # added exchange + plan-finalizing partition probe cost more than
    # the single-core passes they parallelize.
    df = df.select(id_col, score_col).localCheckpoint()
    # k = ceil((n+1)(1-alpha)) with alpha expressed as an exact integer
    # ratio so the k expression is integer arithmetic on both engines;
    # ceil(a/b) = (a + b - 1) div b for positive ints
    num = round((1.0 - alpha) * 1_000_000)
    kth = rank_select_kth(
        df,
        score_col,
        id_col,
        k_expr=f"least(n, ((n + 1) * {num} + 999999) div 1000000)",
    ).select("n", "k", F.col("kth_value").alias("threshold"))
    acc = df.crossJoin(F.broadcast(kth)).agg(
        F.first("n").alias("n"),
        F.first("k").alias("k"),
        F.first("threshold").alias("threshold"),
        F.sum(
            F.when(F.col(score_col) <= F.col("threshold"), 1).otherwise(0)
        ).cast("long").alias("n_accepted"),
    )
    return acc.select(
        "n",
        "k",
        "threshold",
        "n_accepted",
        (F.col("n_accepted").cast("double") / F.col("n").cast("double")).alias(
            "accept_rate"
        ),
    )


def filter_bias_report(
    df: DataFrame,
    keep_col: str,
    group_col: str,
) -> DataFrame:
    """Selection-bias audit for any boolean filter: per group (source,
    language, length bucket…), the kept/total counts, the group keep
    rate, and its ratio to the corpus-wide keep rate — the check that
    a quality/toxicity filter is not quietly deleting one feed or
    language (rate_ratio ≪ 1) while waving another through. Run it on
    every new filter BEFORE shipping the filtered corpus; pair with
    :func:`ece_calibration` for score-level diagnostics.

    One grouped aggregate plus a broadcast of the 1-row total. Exact
    integer counts; each rate is one division, and the ratio is
    computed as (kept_g · n_total) / (n_g · kept_total) — a single
    division of two exact BIGINT products, not a double/double.

    Returns one row per group: (group, n_rows, n_kept, keep_rate,
    rate_ratio)."""
    per = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(keep_col).cast("boolean").cast("long").alias("_k"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_k").cast("long").alias("n_kept"),
        )
    )
    tot = per.agg(
        F.sum("n_rows").cast("long").alias("_tn"),
        F.sum("n_kept").cast("long").alias("_tk"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("grp").alias(group_col),
        "n_rows",
        "n_kept",
        (F.col("n_kept").cast("double") / F.col("n_rows").cast("double")).alias(
            "keep_rate"
        ),
        F.when(
            F.col("_tk") > 0,
            (F.col("n_kept") * F.col("_tn")).cast("double")
            / (F.col("n_rows") * F.col("_tk")).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("rate_ratio"),
    )


def filter_interaction(
    docs: DataFrame,
    min_chars: int = 200,
    min_tokens: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Filter-interaction audit: doc and token counts under EVERY
    subset of the cheap quality filters (length, language, token
    count) via CUBE — the what-if table a curation run reads before
    committing a filter stack: marginal pass rates live in the
    single-flag rows, interactions (e.g. "short docs are mostly
    non-en, so the two filters overlap") in the pairwise rows, and the
    full-stack yield in the all-flags row. Complements
    filter_bias_report (per-GROUP rates for one filter) with the
    cross-FILTER view.

    One scan; CUBE expands to 2³ grouping sets inside the same
    hash aggregate (map-side combinable). Flags are INTs so the
    subtotal NULLs compare cleanly across engines.

    Returns (f_long, f_en, f_tok, n_docs, n_tokens) — NULL flag =
    "any" (the subtotal axis), 8 grouping sets over 3 flags."""
    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = docs.select(
        (F.length(F.col(text_col)) >= min_chars).cast("int").alias("f_long"),
        (F.col("lang") == "en").cast("int").alias("f_en"),
        (toks >= min_tokens).cast("int").alias("f_tok"),
        toks.alias("_t"),
    )
    return base.cube("f_long", "f_en", "f_tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_t").cast("long").alias("n_tokens"),
    )


def threshold_sweep(
    scored: DataFrame,
    score_col: str = "quality",
    label_col: str = "label",
    grid: int = 20,
) -> DataFrame:
    """Precision/recall sweep of a quality score against a binary
    proxy label across a fixed threshold grid — the calibration table
    read before committing a filter cutoff ("what do we keep and what
    do we lose at every t"), pairing conformal_threshold's single
    calibrated cutoff with the whole operating curve.

    Scores bucket to floor(score·grid) (same double product on both
    engines → identical buckets); per-bucket (count, positives) is one
    map-side-combinable aggregate, and the ≥-threshold cumulative runs
    over the ≤ grid+1-row bucket table (bounded control data, the
    rank_select_kth window pattern). Totals broadcast; each
    precision/recall is ONE division of exact BIGINTs.

    Returns one row per OCCUPIED bucket b (threshold = b/grid):
    (threshold, n_pred, n_tp, precision, recall)."""
    from pyspark.sql import Window

    if grid < 1:
        raise ValueError(f"grid must be >= 1, got {grid}")
    b = (
        F.least(
            F.greatest(F.floor(F.col(score_col) * grid), F.lit(0)), F.lit(grid)
        )
    ).cast("int")
    per = scored.select(
        b.alias("_b"), F.col(label_col).cast("long").alias("_l")
    ).groupBy("_b").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_l").alias("_p")
    )
    w = Window.orderBy(F.col("_b").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        "_b",
        F.sum("_n").over(w).cast("long").alias("n_pred"),
        F.sum("_p").over(w).cast("long").alias("n_tp"),
    )
    tot = scored.agg(F.sum(F.col(label_col).cast("long")).cast("long").alias("_P"))
    return cum.crossJoin(F.broadcast(tot)).select(
        (F.col("_b").cast("double") / F.lit(float(grid))).alias("threshold"),
        "n_pred",
        "n_tp",
        (F.col("n_tp").cast("double") / F.col("n_pred").cast("double")).alias(
            "precision"
        ),
        F.when(
            F.col("_P") > 0,
            F.col("n_tp").cast("double") / F.col("_P").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("recall"),
    )


def cohen_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cohen's kappa between two binary raters — chance-corrected
    agreement, the inter-rater reliability check run before trusting
    a cheap heuristic as a proxy for an expensive labeler (raw
    percent-agreement flatters any pair of imbalanced raters; kappa
    doesn't). κ = (p_o − p_e)/(1 − p_e) algebraically rearranged to
    ONE division of exact BIGINT products:
    (n·(n00+n11) − (a1·b1 + a0·b0)) / (n² − (a1·b1 + a0·b0)).

    One confusion-matrix aggregate (map-side combinable); NULL for
    the degenerate 1−p_e = 0 case (both raters constant).

    Returns one row: (n, n_both_pass, n_both_fail, n_only_a,
    n_only_b, kappa)."""
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    m = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(a * b).cast("long").alias("n_both_pass"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("n_both_fail"),
        F.sum(a * (1 - b)).cast("long").alias("n_only_a"),
        F.sum((1 - a) * b).cast("long").alias("n_only_b"),
    )
    a1 = F.col("n_both_pass") + F.col("n_only_a")
    b1 = F.col("n_both_pass") + F.col("n_only_b")
    a0 = F.col("n_both_fail") + F.col("n_only_b")
    b0 = F.col("n_both_fail") + F.col("n_only_a")
    chance = a1 * b1 + a0 * b0
    num = F.col("n") * (F.col("n_both_pass") + F.col("n_both_fail")) - chance
    den = F.col("n") * F.col("n") - chance
    return m.select(
        "n",
        "n_both_pass",
        "n_both_fail",
        "n_only_a",
        "n_only_b",
        F.when(den != 0, num.cast("double") / den.cast("double")).alias("kappa"),
    )


def matthews_corr(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Matthews correlation coefficient between two binary raters —
    the imbalance-robust agreement statistic (reference parity: the
    reference validates filters by eyeballing notebook counts; MCC is
    the engine-side replacement that stays honest when one class is
    rare, where kappa and accuracy both flatter). MCC is the Pearson
    correlation of the two 0/1 columns:
    (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN)).

    One confusion-matrix aggregate (map-side combinable, identical to
    cohen_kappa's). The cell counts are exact BIGINTs; the four
    marginal factors are paired into two double products before the
    sqrt (each pairwise product of exact-int doubles is correctly
    rounded, so both engines compute bit-identical results; a single
    int64 4-way product would overflow at n ≈ 55k). NULL when any
    marginal is zero (a constant rater — MCC undefined).

    Returns one row: (n, n_tp, n_tn, n_fp, n_fn, mcc)."""
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    m = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(a * b).cast("long").alias("n_tp"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("n_tn"),
        F.sum(a * (1 - b)).cast("long").alias("n_fp"),
        F.sum((1 - a) * b).cast("long").alias("n_fn"),
    )
    tp, tn = F.col("n_tp"), F.col("n_tn")
    fp, fn_ = F.col("n_fp"), F.col("n_fn")
    pa1 = (tp + fp).cast("double") * (tp + fn_).cast("double")
    pa0 = (tn + fp).cast("double") * (tn + fn_).cast("double")
    num = tp.cast("double") * tn.cast("double") - fp.cast("double") * fn_.cast("double")
    return m.select(
        "n",
        "n_tp",
        "n_tn",
        "n_fp",
        "n_fn",
        F.when(
            (tp + fp > 0) & (tp + fn_ > 0) & (tn + fp > 0) & (tn + fn_ > 0),
            num / (F.sqrt(pa1) * F.sqrt(pa0)),
        ).alias("mcc"),
    )


def wasserstein_hist_drift(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    value_col: str,
    bucket_width: int = 32,
) -> DataFrame:
    """1-D earth-mover distance (Wasserstein-1) between two groups'
    value distributions on a fixed-width integer bucket grid — the
    drift number with UNITS: unlike the bounded scores in this family
    (JSD bits, KS statistic, PSI, total variation), W1 reads directly
    as "the distributions are ~N characters apart", which is what a
    mixture dashboard wants when deciding whether a source's length
    profile moved enough to re-tune packing or curriculum cutoffs.

    On a shared discrete grid W1 has the closed form
    ``width · Σ_buckets |CDF_a − CDF_b|`` where the sum runs over the
    FULL grid. We only materialize occupied buckets, so each occupied
    bucket's |ΔCDF| term is weighted by the run length it represents:
    ``gap = lead(bucket) − bucket`` (the CDFs are constant across the
    empty buckets in between, so one term times the gap is exact; the
    last bucket contributes 0 — both CDFs are 1 there). Without the
    gap weight, gapped supports under-report (a=0 vs b=96 at width 32
    would return 32 instead of the true 96). Determinism/exactness:
    bucket = value // width (integer floor division — non-negative
    values, so Spark ``div`` and DuckDB ``//`` agree); cumulative
    counts are exact BIGINT window sums; each |ΔCDF| term is
    cross-multiplied to the integer ``|cum_a·n_b − cum_b·n_a|·gap``
    (decimal(38,0)/HUGEINT — the product reaches n² ≈ 1e22 at 1e11
    rows, past int64) and summed exactly; the ONLY float op is the
    final ``width·Σ / (n_a·n_b)`` divide.

    Scale: one grouped count over the corpus, then a single-partition
    window over the BUCKET table — bounded by value-range/width (a
    few hundred rows for document lengths), independent of corpus
    size, the same bounded-support argument as the histogram-quantile
    operators. Returns one row: (w1, n_a, n_b, n_buckets)."""
    g = F.col(group_col)
    base = (
        df.filter(g.isin(group_a, group_b))
        .select(
            F.expr(f"{value_col} div {int(bucket_width)}").alias("bucket"),
            F.when(g == group_a, 1).otherwise(0).alias("ia"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("ia").cast("long").alias("ca"),
            F.sum(1 - F.col("ia")).cast("long").alias("cb"),
        )
    )
    from pyspark.sql import Window

    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_lead = Window.orderBy("bucket")
    cum = base.select(
        "bucket",
        F.sum("ca").over(w_cum).alias("cum_a"),
        F.sum("cb").over(w_cum).alias("cum_b"),
        (
            F.coalesce(F.lead("bucket").over(w_lead), F.col("bucket"))
            - F.col("bucket")
        )
        .cast("long")
        .alias("gap"),
    )
    tot = base.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    term = (
        F.abs(
            F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
            - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
        )
        * F.col("gap")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(term).alias("_s"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max("n_buckets").alias("n_buckets"),
        )
        .select(
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.round(
                    F.lit(float(bucket_width))
                    * F.col("_s").cast("double")
                    / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                    9,
                ),
            ).alias("w1"),
            "n_a",
            "n_b",
            "n_buckets",
        )
    )


def encoding_census(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source text-encoding artifact census — the mojibake audit a
    crawled corpus runs before tokenization: U+FFFD replacement
    characters (a decoder already lost bytes there), C0 control
    characters (protocol junk that breaks downstream tooling), and the
    non-ASCII character share. Per source: docs affected by each
    artifact class, total artifact characters (exact integer counts via
    length-difference / regex-strip arithmetic — no per-char explode),
    and the mean ASCII ratio (1e-12-quantized exact sum). Empty docs
    are excluded from the ratio (undefined) but still counted.

    Shape at 100 TB: pure per-row string expressions, then one
    map-side-combinable groupBy on the source key. One scan, one
    bounded shuffle."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_repl = n_chars - F.length(F.regexp_replace(t, "�", ""))
    n_ctrl = n_chars - F.length(
        F.regexp_replace(t, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    )
    n_ascii = F.length(F.regexp_replace(t, r"[^\x00-\x7f]", ""))
    per_doc = docs.select(
        F.col(group_col).alias("grp"),
        n_chars.alias("n_chars"),
        n_repl.alias("n_repl"),
        n_ctrl.alias("n_ctrl"),
        (n_chars - n_ascii).alias("n_nonascii"),
        F.when(
            n_chars > 0,
            F.bround(
                n_ascii.cast("double") / n_chars.cast("double") * F.lit(1e12)
            ).cast("long"),
        ).alias("aq"),
    )
    agg = per_doc.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("n_repl") > 0).cast("long")).cast("long").alias("n_docs_repl"),
        F.sum((F.col("n_ctrl") > 0).cast("long")).cast("long").alias("n_docs_ctrl"),
        F.sum(F.col("n_repl").cast("long")).cast("long").alias("n_repl_chars"),
        F.sum(F.col("n_ctrl").cast("long")).cast("long").alias("n_ctrl_chars"),
        F.sum(F.col("n_nonascii").cast("long")).cast("long").alias("n_nonascii_chars"),
        F.sum(F.col("aq")).cast("long").alias("aqs"),
        F.sum(F.col("aq").isNotNull().cast("long")).cast("long").alias("n_nonempty"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_docs_repl",
        "n_docs_ctrl",
        "n_repl_chars",
        "n_ctrl_chars",
        "n_nonascii_chars",
        F.when(
            F.col("n_nonempty") > 0,
            F.round(
                F.col("aqs").cast("double")
                / F.col("n_nonempty").cast("double")
                / F.lit(1e12),
                6,
            ),
        ).alias("avg_ascii_ratio"),
    )
