"""Harness entries for the data-quality validation operators
(operators/quality.py) — the engine-side versions of the reference's
manual notebook checks (notebooks/data_exploration.ipynb null census /
outlier probes) and its declared-but-unenforced FK constraints
(include/sql/silver/silver_ddl.sql:62-66).

The raw testdata has no nulls or orphans, so each query derives a
violation surface in-query (CASE-injected nulls, a filtered dim, a
deliberately tight range) — the oracle mirrors the derivation, so the
checks are adjudicated against non-trivial counts, not all-zero rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .harness import query
from .io import load_tables
from .operators import quality


@query(
    "q_null_census",
    """
    WITH d AS (
        SELECT user_id,
               CASE WHEN value > 400 THEN NULL ELSE value END AS value_capped,
               CASE WHEN event_type = 'view' THEN NULL ELSE event_type END AS event_type_nv
        FROM events
    ),
    t AS (
        SELECT count(*) AS n_rows,
               count(*) FILTER (user_id IS NULL) AS n_user,
               count(*) FILTER (value_capped IS NULL) AS n_val,
               count(*) FILTER (event_type_nv IS NULL) AS n_et
        FROM d
    )
    SELECT 'user_id' AS "column", n_user AS n_null,
           round(n_user / n_rows, 6) AS null_ratio, n_rows FROM t
    UNION ALL
    SELECT 'value_capped', n_val, round(n_val / n_rows, 6), n_rows FROM t
    UNION ALL
    SELECT 'event_type_nv', n_et, round(n_et / n_rows, 6), n_rows FROM t
    """,
)
def q_null_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null counts/ratios in ONE aggregation pass (the
    distributed form of the notebook's isna().sum() census). Nulls are
    injected via CASE so the counts are non-trivial."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    derived = ev.select(
        "user_id",
        F.when(F.col("value") > 400, None).otherwise(F.col("value")).alias("value_capped"),
        F.when(F.col("event_type") == "view", None)
        .otherwise(F.col("event_type"))
        .alias("event_type_nv"),
    )
    return quality.null_census(derived)


@query(
    "q_fk_integrity",
    """
    WITH dim AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 0),
    cand AS (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL),
    orph AS (
        SELECT count(*) AS n_orphans
        FROM cand ANTI JOIN dim ON cand.o_custkey = dim.c_custkey
    )
    SELECT (SELECT count(*) FROM cand) AS n_checked, n_orphans,
           n_orphans = 0 AS ok
    FROM orph
    """,
)
def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed referential-integrity check (the FK constraint
    silver_ddl.sql declares but Postgres enforces row-at-a-time): one
    anti-join, 1-row report. The dim is filtered (custkey % 10 == 0
    removed) so the orphan count is non-zero."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    dim = t["customer"].filter(F.col("c_custkey") % 10 != 0)
    return quality.fk_integrity(t["orders"], dim, "o_custkey", "c_custkey")


@query(
    "q_range_check",
    """
    SELECT 'value' AS "column", count(value) AS n_values,
           count(*) FILTER (value IS NOT NULL AND (value < 0.0 OR value > 100.0))
               AS n_out_of_range,
           count(*) FILTER (value IS NOT NULL AND (value < 0.0 OR value > 100.0)) = 0
               AS ok
    FROM events
    """,
)
def q_range_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-range census (the notebook's outlier probes as an engine
    job): events.value against a deliberately tight [0, 100] band so
    the violation count is non-zero. Single aggregation, no shuffle of
    raw rows beyond the partial-agg combine."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return quality.range_check(ev, "value", 0.0, 100.0)


@query(
    "q_expect_unique",
    """
    WITH d AS (
        SELECT l_orderkey, count(*) AS _n
        FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
    )
    SELECT (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM d) AS n_duplicate_keys,
           (SELECT CAST(coalesce(sum(_n), 0) AS BIGINT) FROM d) AS n_rows_in_duplicates,
           (SELECT count(*) FROM d) = 0 AS ok
    """,
)
def q_expect_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-uniqueness audit (the PRIMARY KEY/UNIQUE constraints as a
    distributed check): lineitem keyed on l_orderkey alone has
    duplicates by construction (multi-line orders), so the report is
    non-trivial. One hash aggregation + tiny crossJoin of 1-row aggs."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return quality.expect_unique(li, ["l_orderkey"])


@query(
    "q_outlier_iqr",
    """
    WITH q AS (
        SELECT event_type,
               round(quantile_cont(value, 0.25), 4) AS q1,
               round(quantile_cont(value, 0.75), 4) AS q3
        FROM events GROUP BY event_type
    ),
    j AS (
        SELECT e.event_type, CAST(e.value AS DOUBLE) AS v, q1, q3, q3 - q1 AS iqr
        FROM events e JOIN q USING (event_type)
    )
    SELECT event_type, q1, q3,
           count(v) AS n_values,
           count(*) FILTER (v < q1 - 1.5 * iqr OR v > q3 + 1.5 * iqr) AS n_outliers,
           round(count(*) FILTER (v < q1 - 1.5 * iqr OR v > q3 + 1.5 * iqr)
                 / count(v), 6) AS outlier_ratio
    FROM j GROUP BY event_type, q1, q3
    """,
)
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier census per event type (the notebook's
    manual outlier probes as an engine job): exact interpolated
    quartiles rounded before the fences derive, so both engines draw
    identical bounds; then one conditional-count pass."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return quality.iqr_outlier_census(ev, "value", "event_type")


@query(
    "q_skew_count",
    """
    SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
    """,
)
def q_skew_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase count (functions/skew.two_phase_count, the
    manual lever for hot keys AQE can't split): (key, salt) partial
    counts then key totals. The oracle is the PLAIN group-by — the
    adjudicated property is salt-invariance: whatever the
    position-dependent salt assignment did, totals are identical."""
    from .functions.skew import two_phase_count

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return two_phase_count(ev, ["event_type"], n_salt=32)


@query(
    "q_salted_join",
    """
    WITH dim AS (
        SELECT DISTINCT event_type,
               CASE event_type WHEN 'error' THEN 10 ELSE 1 END AS weight
        FROM events
    )
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(d.weight) AS BIGINT) AS total_weight
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join (functions/skew.salted_join): the small
    side carries every salt, big rows hash-split across salts, so a
    hot join key fans over n_salt reducers. Oracle = the plain join —
    adjudicates that salting never changes join semantics."""
    from .functions.skew import salted_join

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    dim = ev.select("event_type").distinct().withColumn(
        "weight",
        F.when(F.col("event_type") == "error", F.lit(10)).otherwise(F.lit(1)),
    )
    joined = salted_join(ev.select("event_type"), dim, "event_type", n_salt=8)
    return joined.groupBy("event_type").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("weight").cast("long").alias("total_weight"),
    )


@query(
    "q_winsorize",
    """
    WITH q AS (
        SELECT event_type,
               round(quantile_cont(value, 0.05), 4) AS c_lo,
               round(quantile_cont(value, 0.95), 4) AS c_hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           least(greatest(CAST(e.value AS DOUBLE), c_lo), c_hi) AS value_w,
           (CAST(e.value AS DOUBLE) < c_lo OR CAST(e.value AS DOUBLE) > c_hi)
               AS was_clipped
    FROM events e JOIN q USING (event_type)
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (quality.winsorize) — the FIX step to
    q_outlier_iqr's detect step: values outside the group's
    [p05, p95] clamp to the bounds, flagged. Bounds are exact
    interpolated percentiles rounded to 4dp before clamping (the
    proven cross-engine parity), derived in one bounded per-group agg
    and applied in one broadcast-joined pass."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return quality.winsorize(ev, "value", "event_type").select(
        "event_id", "event_type", "value_w", "was_clipped"
    )


@query(
    "q_dataset_stats",
    """
    WITH a AS (
        SELECT count(*) AS n_docs,
               count(DISTINCT source) AS n_sources,
               count(DISTINCT lang) AS n_langs,
               sum(CAST(length(text) AS BIGINT)) AS total_chars,
               count(DISTINCT md5(text)) AS n_unique_texts
        FROM documents
    )
    SELECT n_docs, n_sources, n_langs,
           CAST(total_chars AS BIGINT) AS total_chars,
           CAST((total_chars - (((total_chars % n_docs) + n_docs) % n_docs))
                // n_docs AS BIGINT) AS mean_chars,
           n_unique_texts,
           round(CAST(1 AS DOUBLE)
                 - CAST(n_unique_texts AS DOUBLE) / n_docs, 6) AS exact_dup_rate
    FROM a
    """,
)
def q_dataset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus datasheet (quality.corpus_datasheet): volume,
    source/language spread, exact-duplicate rate — the summary card a
    dataset release ships with and the first gate a training run
    checks. One all-aggregate scan, integer-exact mean."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return quality.corpus_datasheet(docs)


@query(
    "q_psi_drift",
    """
    WITH c AS (
        SELECT event_type AS grp,
               least(greatest(CAST(floor((CAST(value AS DOUBLE) - 0.0)
                                   / 500.0 * 10) AS BIGINT), 0), 9) AS bin,
               CAST(event_id % 2 AS INT) AS side
        FROM events WHERE value IS NOT NULL
    ),
    pb AS (
        SELECT grp, bin,
               sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS na,
               sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS nb
        FROM c GROUP BY grp, bin
    ),
    t AS (SELECT grp, sum(na) AS ta, sum(nb) AS tb FROM pb GROUP BY grp),
    terms AS (
        SELECT pb.grp, pb.bin,
               ((pb.na + 1) / (t.ta + 10) - (pb.nb + 1) / (t.tb + 10)) *
               ln(((pb.na + 1) / (t.ta + 10)) / ((pb.nb + 1) / (t.tb + 10)))
                   AS tm
        FROM pb JOIN t ON t.grp = pb.grp
    )
    SELECT grp,
           round(list_sum(list_transform(array_agg(tm ORDER BY bin), x -> x)), 6)
               + 0.0 AS psi
    FROM terms GROUP BY grp
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the two
    event-id parities (quality.psi_drift) — the standard
    distribution-drift monitor a long-running ingest needs (PSI < 0.1
    stable). Laplace-smoothed fixed bins; the per-group sum folds
    sequentially over the bin-ordered array (proven cross-engine
    parity) instead of an order-dependent grouped double sum."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    keyed = ev.withColumn("side", (F.col("event_id") % 2).cast("int"))
    return quality.psi_drift(keyed, "value", "event_type", "side", 0.0, 500.0, 10)


@query(
    "q_quantile_norm",
    """
    SELECT doc_id, source, n_chars,
           percent_rank() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id) AS pct_rank
    FROM documents
    """,
)
def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile (rank) normalization
    (quality.quantile_normalize): each doc's length maps to its
    percent-rank within its source — the calibration step before
    mixing scores across domains with incomparable raw scales.
    percent_rank is an exact integer rational, so the normalized
    scores are hash-exact with no rounding."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return quality.quantile_normalize(docs, "n_chars", "source", "doc_id")


@query(
    "q_ks_drift",
    """
    WITH c AS (
        SELECT event_type AS grp, CAST(value AS DOUBLE) AS val,
               CAST(event_id % 2 AS INT) AS side
        FROM events WHERE value IS NOT NULL
    ),
    pv AS (
        SELECT grp, val,
               sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
        FROM c GROUP BY grp, val
    ),
    cdf AS (
        SELECT grp,
               CAST(sum(ca) OVER (PARTITION BY grp ORDER BY val
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   / sum(ca) OVER (PARTITION BY grp) AS fa,
               CAST(sum(cb) OVER (PARTITION BY grp ORDER BY val
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   / sum(cb) OVER (PARTITION BY grp) AS fb
        FROM pv
    )
    SELECT grp, round(max(abs(fa - fb)), 6) + 0.0 AS ks_stat
    FROM cdf GROUP BY grp
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift per event type
    (quality.ks_drift): the max gap between the two parities'
    empirical CDFs — the binning-free, transcendental-free complement
    to q_psi_drift (every CDF value is an exact integer rational, so
    nothing can differ in the last ulp). One agg to distinct values,
    two cumulative windows, one max."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    keyed = ev.withColumn("side", (F.col("event_id") % 2).cast("int"))
    return quality.ks_drift(keyed, "value", "event_type", "side")


@query(
    "q_rank_select_median",
    """
    WITH o AS (SELECT p_retailprice AS v, p_partkey AS id FROM part),
    nn AS (SELECT count(*) AS n, (count(*) + 1) // 2 AS k FROM o),
    rr AS (
        SELECT v, id, row_number() OVER (ORDER BY v, id) AS rn FROM o
    )
    SELECT nn.n, nn.k, rr.v AS kth_value, rr.id AS kth_id
    FROM rr CROSS JOIN nn WHERE rn = k
    """,
)
def q_rank_select_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global lower median by rank selection
    (quality.rank_select_kth): a 1024-bucket histogram locates the
    target bucket, then ONLY that bucket (~n/1024 rows) is ranked —
    no global sort anywhere, the order-statistics pattern that
    survives 100 TB. The ORACLE is the independent global-sort
    row_number formulation, so the hash match certifies the
    rank-selection algorithm end-to-end (n and k are carried as
    columns — nothing collected to the driver)."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return quality.rank_select_kth(
        part.select(F.col("p_retailprice").alias("v"), F.col("p_partkey").alias("id")),
        "v",
        "id",
    )


@query(
    "q_join_cardinality_estimate",
    """
    WITH a AS (SELECT l_partkey AS k, count(*) AS ca FROM lineitem GROUP BY k),
    b AS (SELECT p_partkey AS k, count(*) AS cb FROM part GROUP BY k)
    SELECT count(*) AS n_common_keys,
           CAST(sum(ca * cb) AS BIGINT) AS est_output_rows,
           max(ca * cb) AS max_key_contribution,
           round(CAST(max(ca * cb) AS DOUBLE) / sum(ca * cb), 9)
               AS top_key_share
    FROM a JOIN b USING (k)
    """,
)
def q_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-explosion pre-flight: the exact output cardinality of
    lineitem⋈part on partkey WITHOUT running the join —
    Σ cnt_a(k)·cnt_b(k) over the two key histograms, plus the single
    hottest key's contribution and share (the skew warning). Two
    map-side-combined aggregates and a join of the (small) key
    histograms — the check a pipeline runs before committing a
    multi-TB shuffle, complementing q_skew_count's one-sided
    histogram."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    a = t["lineitem"].groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    b = t["part"].groupBy(F.col("p_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    j = a.join(b, "k").select((F.col("ca") * F.col("cb")).alias("prod"))
    return j.agg(
        F.count(F.lit(1)).alias("n_common_keys"),
        F.sum("prod").alias("est_output_rows"),
        F.max("prod").alias("max_key_contribution"),
        F.round(
            F.max("prod").cast("double") / F.sum("prod"), 9
        ).alias("top_key_share"),
    )


@query(
    "q_kl_divergence",
    """
    WITH tok AS (
        SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents WHERE source IN ('src0', 'src1')
    ),
    cnt AS (
        SELECT w,
               sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
        FROM tok WHERE w != '' GROUP BY w
    ),
    tot AS (
        SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS v FROM cnt
    ),
    terms AS (
        SELECT
            CAST(round((CAST(ca + 1 AS DOUBLE) / (na + v))
                * ln(CAST((ca + 1) * (nb + v) AS DOUBLE)
                     / CAST((cb + 1) * (na + v) AS DOUBLE)) * 1e12) AS BIGINT) AS t_ab,
            CAST(round((CAST(cb + 1 AS DOUBLE) / (nb + v))
                * ln(CAST((cb + 1) * (na + v) AS DOUBLE)
                     / CAST((ca + 1) * (nb + v) AS DOUBLE)) * 1e12) AS BIGINT) AS t_ba
        FROM cnt, tot
    )
    SELECT round(CAST(sum(t_ab) AS DOUBLE) / 1e12, 9) AS kl_ab,
           round(CAST(sum(t_ba) AS DOUBLE) / 1e12, 9) AS kl_ba,
           (SELECT CAST(v AS BIGINT) FROM tot) AS vocab
    FROM terms
    """,
)
def q_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence between two sources' unigram LMs (add-one
    smoothed over the union vocabulary, both directions) — the
    distribution-shift probe for corpus mixing: how unlike is src1's
    language when coded with src0's model. Every ln() argument is an
    exact-integer rational, each term is QUANTIZED to a 1e-12 BIGINT
    and the total is an exact integer sum — the order-dependent
    double Σ p·ln(p/q) never exists (the pagerank fixed-point
    discipline applied to information measures). One token explode,
    one vocab-level aggregate; the 1-row totals broadcast."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = (
        docs.filter(F.col("source").isin("src0", "src1"))
        .select(
            "source",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    cnt = tok.groupBy("w").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("cb"),
    )
    tot = cnt.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"), F.count(F.lit(1)).alias("v")
    )
    j = cnt.crossJoin(F.broadcast(tot))
    t_ab = F.round(
        ((F.col("ca") + 1).cast("double") / (F.col("na") + F.col("v")))
        * F.log(
            ((F.col("ca") + 1) * (F.col("nb") + F.col("v"))).cast("double")
            / ((F.col("cb") + 1) * (F.col("na") + F.col("v"))).cast("double")
        )
        * 1e12
    ).cast("long")
    t_ba = F.round(
        ((F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("v")))
        * F.log(
            ((F.col("cb") + 1) * (F.col("na") + F.col("v"))).cast("double")
            / ((F.col("ca") + 1) * (F.col("nb") + F.col("v"))).cast("double")
        )
        * 1e12
    ).cast("long")
    vocab = tot.select(F.col("v").cast("long").alias("vocab"))
    return (
        j.select(t_ab.alias("t_ab"), t_ba.alias("t_ba"))
        .agg(
            F.round(F.sum("t_ab").cast("double") / 1e12, 9).alias("kl_ab"),
            F.round(F.sum("t_ba").cast("double") / 1e12, 9).alias("kl_ba"),
        )
        .crossJoin(F.broadcast(vocab))
    )


@query(
    "q_ece_calibration",
    """
    WITH s AS (
        SELECT ((CAST(round(value * 100) AS BIGINT) % 101 + 101) % 101)
                   AS k,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    r AS (
        SELECT CAST(least((k * 10) // 100, 9) AS INT) AS bin,
               k * 10000 AS m, y
        FROM s
    ),
    pb AS (
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(sum(m) AS BIGINT) AS sm
        FROM r GROUP BY bin
    ),
    t AS (
        SELECT CAST(sum(n_rows) AS BIGINT) AS n,
               CAST(sum(abs(n_pos * 1000000 - sm)) AS BIGINT) AS gap
        FROM pb
    )
    SELECT bin, n_rows, n_pos,
           CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE) AS acc,
           CAST(sm AS DOUBLE) / CAST(n_rows * 1000000 AS DOUBLE) AS conf,
           CAST(gap AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS ece
    FROM pb, t
    """,
)
def q_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability audit of a [0,1] score against a binary outcome
    (quality.ece_calibration): per-bin accuracy vs confidence plus the
    expected calibration error — the check a learned quality/toxicity
    filter must pass before its scores gate a corpus. The synthetic
    score is a hash-like projection of the value cents into [0,1]
    (pmod 101 / 100), the outcome is event_type='purchase'. Exact by
    construction: scores snap to 1e-6 integer units per row, the bin
    weight cancels the gap denominator, and ECE is ONE division of
    two BIGINTs — no double summation anywhere."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    scored = ev.select(
        (
            F.pmod(F.rint(F.col("value") * 100).cast("long"), F.lit(101)).cast(
                "double"
            )
            / F.lit(100.0)
        ).alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return quality.ece_calibration(scored, "score", "label", n_bins=10)


@query(
    "q_conformal_threshold",
    r"""
    WITH s AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               list_sum(list_transform(string_split(text, ' '),
                                       w -> length(w))) AS tok_chars,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                   AS n_punct
        FROM documents
    ),
    q0 AS (
        SELECT doc_id,
               round(0.4 * least(n_tok / 100.0, 1.0)
                   + 0.3 * (1.0 - least((n_punct / n_chars) * 5.0, 1.0))
                   + 0.3 * least((tok_chars / n_tok) / 10.0, 1.0), 6)
                   AS quality
        FROM s
    ),
    ranked AS (
        SELECT quality,
               row_number() OVER (ORDER BY quality, doc_id) AS rn,
               count(*) OVER () AS n
        FROM q0
    ),
    kth AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(least(n, ((n + 1) * 900000 + 999999) // 1000000)
                    AS BIGINT) AS k
        FROM ranked LIMIT 1
    ),
    thr AS (
        SELECT kth.n, kth.k, r.quality AS threshold
        FROM kth JOIN ranked r ON r.rn = kth.k
    )
    SELECT t.n, t.k, t.threshold,
           CAST(sum(CASE WHEN q0.quality <= t.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_accepted,
           CAST(sum(CASE WHEN q0.quality <= t.threshold THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(t.n AS DOUBLE) AS accept_rate
    FROM q0, thr t
    GROUP BY t.n, t.k, t.threshold
    """,
)
def q_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal threshold calibration at alpha=0.1
    (quality.conformal_threshold): the ceil((n+1)*0.9)-th smallest
    quality score — accepting items at or below it gives >=90%
    coverage under exchangeability, the distribution-free way to turn
    a raw score into a filter cutoff. The order statistic comes from
    rank_select_kth's histogram probe (no global sort); the oracle is
    the independent global-sort formulation, plus the exact-integer
    empirical accept rate."""
    from .operators import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scored = text_ops.quality_score(docs)
    return quality.conformal_threshold(scored, "quality", "doc_id", alpha=0.1)


@query(
    "q_filter_bias",
    r"""
    WITH s AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               list_sum(list_transform(string_split(text, ' '),
                                       w -> length(w))) AS tok_chars,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                   AS n_punct
        FROM documents
    ),
    q0 AS (
        SELECT doc_id,
               round(0.4 * least(n_tok / 100.0, 1.0)
                   + 0.3 * (1.0 - least((n_punct / n_chars) * 5.0, 1.0))
                   + 0.3 * least((tok_chars / n_tok) / 10.0, 1.0), 6)
                   AS quality
        FROM s
    ),
    d AS (
        SELECT source, CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END AS k
        FROM documents JOIN q0 USING (doc_id)
    ),
    per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(k) AS BIGINT) AS n_kept
        FROM d GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_rows) AS BIGINT) AS tn,
               CAST(sum(n_kept) AS BIGINT) AS tk
        FROM per
    )
    SELECT source, n_rows, n_kept,
           CAST(n_kept AS DOUBLE) / CAST(n_rows AS DOUBLE) AS keep_rate,
           CASE WHEN tk > 0
                THEN CAST(n_kept * tn AS DOUBLE)
                     / CAST(n_rows * tk AS DOUBLE)
                ELSE 0.0 END AS rate_ratio
    FROM per, tot
    """,
)
def q_filter_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection-bias audit of the quality>=0.5 filter by source
    (quality.filter_bias_report): per-source keep rates and their
    ratio to the corpus-wide rate — the check that a filter is not
    quietly deleting one feed (rate_ratio << 1) while waving another
    through. The ratio is ONE division of two exact BIGINT products,
    not a double/double."""
    from .operators import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scored = docs.join(text_ops.quality_score(docs), "doc_id").select(
        "source", (F.col("quality") >= 0.5).alias("keep")
    )
    return quality.filter_bias_report(scored, "keep", "source")


@query(
    "q_filter_interaction",
    """
    WITH b AS (
        SELECT CAST(length(text) >= 200 AS INT) AS f_long,
               CAST(lang = 'en' AS INT) AS f_en,
               CAST(len(string_split(text, ' ')) >= 50 AS INT) AS f_tok,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS t
        FROM documents
    )
    SELECT f_long, f_en, f_tok, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(t) AS BIGINT) AS n_tokens
    FROM b GROUP BY CUBE (f_long, f_en, f_tok)
    """,
)
def q_filter_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-interaction what-if table (quality.filter_interaction):
    doc/token counts under every subset of the cheap quality filters
    (length ≥ 200 chars, lang = en, ≥ 50 tokens) via CUBE — marginal
    pass rates in single-flag rows, filter overlap in pairwise rows,
    full-stack yield in the all-flags row. One scan; the 2³ grouping
    sets share one hash aggregate."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return quality.filter_interaction(docs, min_chars=200, min_tokens=50)


@query(
    "q_threshold_sweep",
    r"""
    WITH s AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tok,
               list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS tok_chars,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
        FROM documents
    ),
    q AS (
        SELECT CAST(lang = 'en' AS BIGINT) AS l,
               round(0.4 * least(n_tok / 100.0, 1.0)
                   + 0.3 * (1.0 - least((n_punct / n_chars) * 5.0, 1.0))
                   + 0.3 * least((tok_chars / n_tok) / 10.0, 1.0), 6) AS quality
        FROM s
    ),
    b AS (SELECT least(greatest(CAST(floor(quality * 20) AS INT), 0), 20) AS b, l FROM q),
    per AS (SELECT b, count(*) AS n, sum(l) AS p FROM b GROUP BY b),
    cum AS (
        SELECT b, CAST(sum(n) OVER w AS BIGINT) AS n_pred,
               CAST(sum(p) OVER w AS BIGINT) AS n_tp
        FROM per WINDOW w AS (ORDER BY b DESC ROWS UNBOUNDED PRECEDING)
    ),
    tot AS (SELECT CAST(sum(l) AS BIGINT) AS pos FROM q)
    SELECT CAST(b AS DOUBLE) / 20.0 AS threshold, n_pred, n_tp,
           CAST(n_tp AS DOUBLE) / CAST(n_pred AS DOUBLE) AS sel_precision,
           CASE WHEN pos > 0 THEN CAST(n_tp AS DOUBLE) / CAST(pos AS DOUBLE)
                ELSE 0.0 END AS sel_recall
    FROM cum CROSS JOIN tot
    """,
)
def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall threshold sweep (quality.threshold_sweep) of
    the composite quality score against the lang='en' proxy label —
    the operating-curve table read before committing a filter cutoff
    (pairs with q_conformal_threshold's single calibrated cutoff).
    Bucketed cumulative over the ≤21-row grid table; exact-BIGINT
    counts, one division per metric."""
    from .operators import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scored = text_ops.quality_score(docs).join(
        docs.select(
            "doc_id", (F.col("lang") == "en").cast("long").alias("label")
        ),
        "doc_id",
    )
    sweep = quality.threshold_sweep(scored, score_col="quality", label_col="label")
    return sweep.select(
        "threshold",
        "n_pred",
        "n_tp",
        F.col("precision").alias("sel_precision"),
        F.col("recall").alias("sel_recall"),
    )


@query(
    "q_rater_kappa",
    r"""
    WITH s AS (
        SELECT doc_id, n_chars AS meta_chars, text,
               len(string_split(text, ' ')) AS n_tok,
               list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS tok_chars,
               length(text) AS nc,
               length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
        FROM documents
    ),
    r AS (
        SELECT CAST(round(0.4 * least(n_tok / 100.0, 1.0)
                   + 0.3 * (1.0 - least((n_punct / nc) * 5.0, 1.0))
                   + 0.3 * least((tok_chars / n_tok) / 10.0, 1.0), 6) >= 0.5
                   AS BIGINT) AS a,
               CAST(nc >= 200 AND n_tok >= 50 AS BIGINT) AS b
        FROM s
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a * b) AS BIGINT) AS n_both_pass,
               CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n_both_fail,
               CAST(sum(a * (1 - b)) AS BIGINT) AS n_only_a,
               CAST(sum((1 - a) * b) AS BIGINT) AS n_only_b
        FROM r
    )
    SELECT n, n_both_pass, n_both_fail, n_only_a, n_only_b,
           CASE WHEN n * n - ((n_both_pass + n_only_a) * (n_both_pass + n_only_b)
                              + (n_both_fail + n_only_b) * (n_both_fail + n_only_a)) <> 0
                THEN CAST(n * (n_both_pass + n_both_fail)
                          - ((n_both_pass + n_only_a) * (n_both_pass + n_only_b)
                             + (n_both_fail + n_only_b) * (n_both_fail + n_only_a))
                          AS DOUBLE)
                     / CAST(n * n - ((n_both_pass + n_only_a) * (n_both_pass + n_only_b)
                                     + (n_both_fail + n_only_b) * (n_both_fail + n_only_a))
                            AS DOUBLE)
                ELSE NULL END AS kappa
    FROM m
    """,
)
def q_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (quality.cohen_kappa) between two cheap raters —
    the composite quality heuristic at 0.5 vs the length gate
    (≥200 chars AND ≥50 tokens): chance-corrected agreement, the
    reliability check before substituting one filter for the other.
    One confusion-matrix aggregate; κ is ONE division of exact BIGINT
    products."""
    from .operators import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = F.col("text")
    rated = text_ops.quality_score(docs).join(
        docs.select(
            "doc_id",
            (
                (F.length(t) >= 200)
                & (F.size(F.split(t, " ")) >= 50)
            ).cast("long").alias("b"),
        ),
        "doc_id",
    ).select((F.col("quality") >= 0.5).cast("long").alias("a"), "b")
    return quality.cohen_kappa(rated, "a", "b")


# ---------------------------------------------------------------------------
# Wave 31 — symmetric drift, pass-rate CIs, MCC, mixture diversity
# ---------------------------------------------------------------------------


@query(
    "q_jsd_drift",
    """
    WITH tok AS (
        SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents WHERE source IN ('src0', 'src2')
    ),
    cnt AS (
        SELECT w,
               sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS cb
        FROM tok WHERE w != '' GROUP BY w
    ),
    tot AS (
        SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS v FROM cnt
    ),
    terms AS (
        SELECT
            CAST(round((CAST(ca + 1 AS DOUBLE) / (na + v))
                * ln(CAST(2 * (ca + 1) * (nb + v) AS DOUBLE)
                     / CAST((ca + 1) * (nb + v) + (cb + 1) * (na + v) AS DOUBLE))
                * 1e12) AS BIGINT) AS t_p,
            CAST(round((CAST(cb + 1 AS DOUBLE) / (nb + v))
                * ln(CAST(2 * (cb + 1) * (na + v) AS DOUBLE)
                     / CAST((ca + 1) * (nb + v) + (cb + 1) * (na + v) AS DOUBLE))
                * 1e12) AS BIGINT) AS t_q
        FROM cnt, tot
    )
    SELECT round((CAST(sum(t_p) AS DOUBLE) + CAST(sum(t_q) AS DOUBLE))
                 / 2.0 / 1e12 / ln(2.0), 9) AS jsd_bits,
           (SELECT CAST(v AS BIGINT) FROM tot) AS vocab
    FROM terms
    """,
)
def q_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between two sources' unigram LMs
    (add-one smoothed, union vocabulary) — the SYMMETRIC, bounded
    [0,1]-bits companion to q_kl_divergence: the mixture-drift number
    dashboards actually plot, safe when either side has zero counts
    and comparable across source pairs because of the fixed upper
    bound. Every ln() argument is an exact-integer rational
    (2·p/(p+q) cross-multiplied to integers), each vocab term is
    QUANTIZED to a 1e-12 BIGINT and summed exactly — no
    order-dependent double Σ. One token explode, one vocab aggregate;
    the 1-row totals broadcast."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = (
        docs.filter(F.col("source").isin("src0", "src2"))
        .select(
            "source",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    cnt = tok.groupBy("w").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("source") == "src2", 1).otherwise(0)).alias("cb"),
    )
    tot = cnt.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"), F.count(F.lit(1)).alias("v")
    )
    j = cnt.crossJoin(F.broadcast(tot))
    mix_den = (
        (F.col("ca") + 1) * (F.col("nb") + F.col("v"))
        + (F.col("cb") + 1) * (F.col("na") + F.col("v"))
    ).cast("double")
    t_p = F.round(
        ((F.col("ca") + 1).cast("double") / (F.col("na") + F.col("v")))
        * F.log((2 * (F.col("ca") + 1) * (F.col("nb") + F.col("v"))).cast("double") / mix_den)
        * 1e12
    ).cast("long")
    t_q = F.round(
        ((F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("v")))
        * F.log((2 * (F.col("cb") + 1) * (F.col("na") + F.col("v"))).cast("double") / mix_den)
        * 1e12
    ).cast("long")
    vocab = tot.select(F.col("v").cast("long").alias("vocab"))
    return (
        j.select(t_p.alias("t_p"), t_q.alias("t_q"))
        .agg(
            F.round(
                (F.sum("t_p").cast("double") + F.sum("t_q").cast("double"))
                / 2.0 / 1e12 / math.log(2.0),
                9,
            ).alias("jsd_bits")
        )
        .crossJoin(F.broadcast(vocab))
    )


_GATE_CTE = """
    s AS (
        SELECT source, length(text) AS nc,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    r AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN nc >= 200 AND n_tok >= 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        FROM s GROUP BY source
    )
"""


@query(
    "q_wilson_ci",
    f"""
    WITH {_GATE_CTE}
    SELECT source, n_docs, n_pass,
           round((CAST(n_pass AS DOUBLE) / n_docs + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2 * n_docs))
                     / (1 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / n_docs)
                 - (CAST(1.96 AS DOUBLE) * sqrt((CAST(n_pass AS DOUBLE) / n_docs)
                                * (1 - CAST(n_pass AS DOUBLE) / n_docs) / n_docs
                                + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4 * CAST(n_docs AS DOUBLE) * n_docs)))
                     / (1 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / n_docs), 9) AS ci_lo,
           round((CAST(n_pass AS DOUBLE) / n_docs + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2 * n_docs))
                     / (1 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / n_docs)
                 + (CAST(1.96 AS DOUBLE) * sqrt((CAST(n_pass AS DOUBLE) / n_docs)
                                * (1 - CAST(n_pass AS DOUBLE) / n_docs) / n_docs
                                + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4 * CAST(n_docs AS DOUBLE) * n_docs)))
                     / (1 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / n_docs), 9) AS ci_hi
    FROM r
    """,
)
def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval on each source's length-gate pass
    rate — the uncertainty band a curation dashboard needs before
    acting on a per-source rate (a 3-doc source at 33% is not a
    drifted source; Wilson stays honest at small n and near 0/1 where
    the normal interval collapses or escapes [0,1]). One groupBy for
    (n, k); the interval is a closed-form double chain over exact
    integers written in the IDENTICAL operation order on both engines
    (z² always spelled 1.96*1.96 so both sides round the same
    product, never a decimal literal that could parse 1 ulp away)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = F.col("text")
    r = (
        docs.select(
            "source",
            F.length(t).alias("nc"),
            F.size(F.split(t, " ")).alias("n_tok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when((F.col("nc") >= 200) & (F.col("n_tok") >= 50), 1).otherwise(0)
            ).cast("long").alias("n_pass"),
        )
    )
    n = F.col("n_docs")
    z2 = F.lit(1.96) * F.lit(1.96)
    p = F.col("n_pass").cast("double") / n
    denom = 1 + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = (
        F.lit(1.96)
        * F.sqrt(p * (1 - p) / n + z2 / (4 * n.cast("double") * n))
    ) / denom
    return r.select(
        "source",
        "n_docs",
        "n_pass",
        F.round(center - half, 9).alias("ci_lo"),
        F.round(center + half, 9).alias("ci_hi"),
    )


@query(
    "q_mcc_eval",
    r"""
    WITH s AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_tok,
               list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS tok_chars,
               length(text) AS nc,
               length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
        FROM documents
    ),
    r AS (
        SELECT CAST(round(0.4 * least(n_tok / 100.0, 1.0)
                   + 0.3 * (1.0 - least((n_punct / nc) * 5.0, 1.0))
                   + 0.3 * least((tok_chars / n_tok) / 10.0, 1.0), 6) >= 0.5
                   AS BIGINT) AS a,
               CAST(nc >= 200 AND n_tok >= 50 AS BIGINT) AS b
        FROM s
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a * b) AS BIGINT) AS n_tp,
               CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n_tn,
               CAST(sum(a * (1 - b)) AS BIGINT) AS n_fp,
               CAST(sum((1 - a) * b) AS BIGINT) AS n_fn
        FROM r
    )
    SELECT n, n_tp, n_tn, n_fp, n_fn,
           CASE WHEN n_tp + n_fp > 0 AND n_tp + n_fn > 0
                 AND n_tn + n_fp > 0 AND n_tn + n_fn > 0
                THEN (CAST(n_tp AS DOUBLE) * n_tn - CAST(n_fp AS DOUBLE) * n_fn)
                     / (sqrt(CAST(n_tp + n_fp AS DOUBLE) * (n_tp + n_fn))
                        * sqrt(CAST(n_tn + n_fp AS DOUBLE) * (n_tn + n_fn)))
                ELSE NULL END AS mcc
    FROM m
    """,
)
def q_mcc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation (quality.matthews_corr) between the same
    two cheap raters as q_rater_kappa (composite quality heuristic at
    0.5 vs the length gate): the imbalance-robust agreement number —
    when the pass class is rare, kappa and raw accuracy both flatter
    a rater that just says "fail"; MCC is the 0/1 Pearson correlation
    and doesn't. Same single confusion-matrix aggregate; marginals
    pair into two double products before the sqrt (bit-identical on
    both engines, and immune to the int64 4-way-product overflow)."""
    from .operators import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = F.col("text")
    rated = text_ops.quality_score(docs).join(
        docs.select(
            "doc_id",
            (
                (F.length(t) >= 200)
                & (F.size(F.split(t, " ")) >= 50)
            ).cast("long").alias("b"),
        ),
        "doc_id",
    ).select((F.col("quality") >= 0.5).cast("long").alias("a"), "b")
    return quality.matthews_corr(rated, "a", "b")


@query(
    "q_source_diversity",
    """
    WITH c AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n_c
        FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n FROM c),
    terms AS (
        SELECT CAST(round((CAST(n_c AS DOUBLE) / n)
                          * ln(CAST(n AS DOUBLE) / n_c) * 1e12) AS BIGINT) AS h_t,
               CAST(n_c * n_c AS BIGINT) AS sq,
               n_c
        FROM c, tot
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           round(CAST(sum(h_t) AS DOUBLE) / 1e12 / ln(2.0), 9) AS shannon_bits,
           round(exp(CAST(sum(h_t) AS DOUBLE) / 1e12), 9) AS effective_cells,
           round(CAST(sum(sq) AS DOUBLE)
                 / (CAST((SELECT n FROM tot) AS DOUBLE)
                    * (SELECT n FROM tot)), 9) AS simpson,
           round(CAST(max(n_c) AS DOUBLE) / (SELECT n FROM tot), 9) AS top_share
    FROM terms
    """,
)
def q_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture diversity audit over (source, lang) cells:
    Shannon entropy in bits, the effective number of cells (exp H —
    "how many equally-sized sources is this mixture really"),
    Simpson/HHI concentration, and the top cell's share — the numbers
    a data-mixing decision (and a DoReMi/DSIR reweighting) starts
    from. Entropy terms quantize to 1e-12 BIGINTs before the exact
    sum (no order-dependent double Σ); Simpson is an exact Σn² over
    N² — ONE float division. One cell aggregate (bounded rows), the
    1-row total broadcasts."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    c = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_c")
    )
    tot = c.agg(F.sum("n_c").cast("long").alias("n"))
    j = c.crossJoin(F.broadcast(tot))
    h_t = F.round(
        (F.col("n_c").cast("double") / F.col("n"))
        * F.log(F.col("n").cast("double") / F.col("n_c"))
        * 1e12
    ).cast("long")
    agg = j.select(
        h_t.alias("h_t"),
        (F.col("n_c") * F.col("n_c")).cast("long").alias("sq"),
        "n_c",
        "n",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(F.sum("h_t").cast("double") / 1e12 / math.log(2.0), 9).alias(
            "shannon_bits"
        ),
        F.round(F.exp(F.sum("h_t").cast("double") / 1e12), 9).alias(
            "effective_cells"
        ),
        F.round(
            F.sum("sq").cast("double")
            / (F.max("n").cast("double") * F.max("n")),
            9,
        ).alias("simpson"),
        F.round(F.max("n_c").cast("double") / F.max("n"), 9).alias("top_share"),
    )
    return agg


@query(
    "q_sample_bias",
    """
    WITH h AS (
        SELECT lang,
               ((CAST(CAST(from_hex(substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                           AS BIT) AS BIGINT) % 1000000) + 1000000) % 1000000 AS hv
        FROM documents
    ),
    corp AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM h GROUP BY lang),
    samp AS (SELECT lang, CAST(count(*) AS BIGINT) AS o
             FROM h WHERE hv < 200000 GROUP BY lang),
    tot AS (
        SELECT CAST((SELECT sum(c) FROM corp) AS BIGINT) AS n,
               CAST((SELECT count(*) FROM h WHERE hv < 200000) AS BIGINT) AS ns
    ),
    cells AS (
        SELECT corp.lang, corp.c, COALESCE(samp.o, 0) AS o, tot.n, tot.ns
        FROM corp LEFT JOIN samp USING (lang) CROSS JOIN tot
    ),
    terms AS (
        SELECT CAST(round(
            ((o - CAST(ns AS DOUBLE) * c / n) * (o - CAST(ns AS DOUBLE) * c / n))
            / (CAST(ns AS DOUBLE) * c / n) * 1e9) AS BIGINT) AS t
        FROM cells
    )
    SELECT (SELECT n FROM tot) AS n_corpus,
           (SELECT ns FROM tot) AS n_sample,
           CAST((SELECT count(*) FROM cells) AS BIGINT) AS n_cells,
           CAST((SELECT count(*) FROM cells) - 1 AS BIGINT) AS dof,
           round(CAST(sum(t) AS DOUBLE) / 1e9, 6) AS chi2
    FROM terms
    """,
)
def q_sample_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-bias audit: chi-square goodness-of-fit between the 20%
    deterministic md5-hash sample (sampling.deterministic_sample's
    exact selection rule) and the full corpus over language cells —
    the QA gate a subsampling pipeline runs before trusting metrics
    computed on the sample (a hash that correlates with the stratum
    silently skews every downstream estimate; χ² ≫ dof says the
    sample is NOT exchangeable with the corpus). Expected counts come
    from exact BIGINT cell counts; each cell's χ² term is a fixed
    double chain QUANTIZED to a 1e-9 BIGINT before the exact sum.
    Two hash aggregates over one scan's projection, bounded cells."""
    from .operators.sampling import _bucket

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    h = docs.select("lang", _bucket(F.col("doc_id")).alias("hv"))
    corp = h.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("c"))
    samp = (
        h.filter(F.col("hv") < 200000)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    tot = corp.agg(F.sum("c").cast("long").alias("n")).crossJoin(
        h.filter(F.col("hv") < 200000).agg(
            F.count(F.lit(1)).cast("long").alias("ns")
        )
    )
    cells = (
        corp.join(samp, "lang", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "c",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            "n",
            "ns",
        )
    )
    e = F.col("ns").cast("double") * F.col("c") / F.col("n")
    t = F.round(((F.col("o") - e) * (F.col("o") - e)) / e * 1e9).cast("long")
    n_cells = cells.agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
    return (
        cells.select(t.alias("t"), "n", "ns")
        .agg(
            F.max("n").alias("n_corpus"),
            F.max("ns").alias("n_sample"),
            F.round(F.sum("t").cast("double") / 1e9, 6).alias("chi2"),
        )
        .crossJoin(F.broadcast(n_cells))
        .select(
            "n_corpus",
            "n_sample",
            "n_cells",
            (F.col("n_cells") - 1).cast("long").alias("dof"),
            "chi2",
        )
    )


# ---------------------------------------------------------------------------
# Wave 36 — W1 drift with units
# ---------------------------------------------------------------------------


@query(
    "q_wasserstein_drift",
    """
    WITH base AS (
        SELECT n_chars // 32 AS bucket,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia
        FROM documents WHERE source IN ('src0', 'src2')
    ),
    b AS (
        SELECT bucket,
               CAST(sum(ia) AS BIGINT) AS ca,
               CAST(sum(1 - ia) AS BIGINT) AS cb
        FROM base GROUP BY bucket
    ),
    cum AS (
        SELECT bucket,
               sum(ca) OVER (ORDER BY bucket
                             ROWS UNBOUNDED PRECEDING) AS cum_a,
               sum(cb) OVER (ORDER BY bucket
                             ROWS UNBOUNDED PRECEDING) AS cum_b,
               COALESCE(lead(bucket) OVER (ORDER BY bucket), bucket)
                 - bucket AS gap
        FROM b
    ),
    tot AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n_a,
               CAST(sum(cb) AS BIGINT) AS n_b,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM b
    )
    SELECT CASE WHEN n_a > 0 AND n_b > 0 THEN
             round(32.0 * CAST((SELECT sum(abs(CAST(cum_a AS HUGEINT) * n_b
                                              - CAST(cum_b AS HUGEINT) * n_a)
                                           * gap)
                                FROM cum, tot) AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 9)
           END AS w1,
           n_a, n_b, n_buckets
    FROM tot
    """,
)
def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between src0 and src2
    document-length distributions on a 32-char bucket grid
    (quality.wasserstein_hist_drift) — the drift statistic WITH UNITS
    that completes the divergence family (JSD bits, KS stat, PSI, TV):
    the result reads directly as "the length profiles are N
    characters apart". Exact-integer CDF cross-multiplication
    (decimal/HUGEINT), window only over the bounded bucket table,
    one final double divide."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return quality.wasserstein_hist_drift(
        docs, "source", "src0", "src2", "n_chars", bucket_width=32
    )


# ---------------------------------------------------------------------------
# Round-12 wave 41: per-source stopword profile.
# ---------------------------------------------------------------------------

_SW_IN = "('the','be','to','of','and','that','have','with')"


@query(
    "q_stopword_profile",
    f"""
    WITH w AS (
        SELECT source,
               list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
    ),
    d AS (
        SELECT source, len(w) AS n_words,
               len(list_filter(w, x -> x IN {_SW_IN})) AS n_stop,
               len(list_filter(list_distinct(w), x -> x IN {_SW_IN}))
                   AS n_distinct_stop
        FROM w WHERE len(w) > 0
    ),
    a AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(round_even(
                   CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 1e12,
                   0) AS BIGINT)) AS BIGINT) AS rq,
               CAST(sum(n_distinct_stop) AS BIGINT) AS ds,
               CAST(sum(CASE WHEN n_distinct_stop < 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_low_stop
        FROM d GROUP BY source
    )
    SELECT source, n_docs,
           round(CAST(rq AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1e12, 6)
               AS avg_stop_ratio,
           round(CAST(ds AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
               AS avg_distinct_stop,
           n_low_stop
    FROM a
    """,
)
def q_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stopword-usage profile (text.stopword_profile): mean
    stopword-token ratio (1e-12-quantized exact sum), mean distinct
    stopwords, and the count of docs that would fail the Gopher ≥2-
    distinct-stopwords gate — the corpus-level tuning view for that
    rule. Literal stopword list, no join; one map-side-combinable
    groupBy on source."""
    from .operators import text

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.stopword_profile(docs)


# ---------------------------------------------------------------------------
# Round-12 wave 42: code-vs-prose routing profile + encoding artifact
# census. The synthetic corpus is clean prose, so each query derives
# its artifact surface deterministically in-query (the q_pii_redact
# convention) — the oracle mirrors the derivation, so the audits are
# adjudicated against non-trivial counts.
# ---------------------------------------------------------------------------

_CODE_KW_IN = (
    "('def','return','import','class','function','var','const','void')"
)


@query(
    "q_code_detect",
    f"""
    WITH raw AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 7 = 0 THEN
                   text || chr(10) || 'def f_' || CAST(doc_id % 100 AS VARCHAR)
                        || '(x):' || chr(10) || '    return x * '
                        || CAST(doc_id % 9 AS VARCHAR) || ';'
                        || chr(10) || '    import os'
               ELSE text END AS t
        FROM documents
    ),
    d AS (
        SELECT source,
               string_split(t, chr(10)) AS ln,
               list_filter(regexp_split_to_array(t, '[\\s(:;]+'),
                           x -> x != '') AS tk,
               length(t) AS n_chars,
               length(t) - length(regexp_replace(t, '[{{}}();=<>\\[\\]]', '', 'g'))
                   AS n_sym
        FROM raw
    ),
    e AS (
        SELECT source, len(ln) AS n_lines,
               len(list_filter(ln, l -> starts_with(l, '    '))) AS n_indent,
               len(list_filter(tk, x -> x IN {_CODE_KW_IN})) AS n_kw,
               n_chars, n_sym
        FROM d WHERE n_chars > 0
    ),
    a AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_kw >= 2 AND n_indent >= 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
               CAST(sum(CAST(round_even(
                   CAST(n_sym AS DOUBLE) / CAST(n_chars AS DOUBLE) * 1e12,
                   0) AS BIGINT)) AS BIGINT) AS sq,
               CAST(sum(CAST(round_even(
                   CAST(n_indent AS DOUBLE) / CAST(n_lines AS DOUBLE) * 1e12,
                   0) AS BIGINT)) AS BIGINT) AS iq
        FROM e GROUP BY source
    )
    SELECT source, n_docs, n_code,
           round(CAST(sq AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1e12, 6)
               AS avg_symbol_ratio,
           round(CAST(iq AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1e12, 6)
               AS avg_indent_frac
    FROM a
    """,
)
def q_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing profile (text.code_prose_profile): every
    7th doc gains a deterministic 3-line code snippet (def/return/
    import + two 4-space-indented lines), and the per-source profile
    must count exactly those as code — the branch-routing decision a
    mixed crawl makes before curation. Structural AND rule (≥2 keyword
    tokens AND ≥1 indented line), so prose mentioning 'class' alone
    never flips."""
    from .operators import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    injected = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit("\ndef f_"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit("(x):\n    return x * "),
            (F.col("doc_id") % 9).cast("string"),
            F.lit(";\n    import os"),
        ),
    ).otherwise(F.col("text"))
    mangled = docs.select("doc_id", injected.alias("text"), "source")
    return text_ops.code_prose_profile(mangled)


@query(
    "q_encoding_census",
    """
    WITH raw AS (
        SELECT source,
               text
               || CASE WHEN doc_id % 5 = 0
                       THEN substr(repeat(chr(65533), 3), 1,
                                   CAST(1 + doc_id % 3 AS INT))
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0 THEN chr(7) ELSE '' END
               || CASE WHEN doc_id % 3 = 0 THEN ' café' ELSE '' END AS t
        FROM documents
    ),
    d AS (
        SELECT source,
               length(t) AS n_chars,
               length(t) - length(replace(t, chr(65533), '')) AS n_repl,
               length(t) - length(regexp_replace(
                   t, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) AS n_ctrl,
               length(t) - length(regexp_replace(t, '[^\\x00-\\x7f]', '', 'g'))
                   AS n_nonascii
        FROM raw
    ),
    a AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_docs_repl,
               CAST(sum(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_docs_ctrl,
               CAST(sum(n_repl) AS BIGINT) AS n_repl_chars,
               CAST(sum(n_ctrl) AS BIGINT) AS n_ctrl_chars,
               CAST(sum(n_nonascii) AS BIGINT) AS n_nonascii_chars,
               CAST(sum(CASE WHEN n_chars > 0 THEN CAST(round_even(
                   CAST(n_chars - n_nonascii AS DOUBLE)
                   / CAST(n_chars AS DOUBLE) * 1e12, 0) AS BIGINT)
                   END) AS BIGINT) AS aqs,
               CAST(sum(CASE WHEN n_chars > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nonempty
        FROM d GROUP BY source
    )
    SELECT source, n_docs, n_docs_repl, n_docs_ctrl,
           n_repl_chars, n_ctrl_chars, n_nonascii_chars,
           CASE WHEN n_nonempty > 0
                THEN round(CAST(aqs AS DOUBLE)
                           / CAST(n_nonempty AS DOUBLE) / 1e12, 6)
           END AS avg_ascii_ratio
    FROM a
    """,
)
def q_encoding_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-artifact census (quality.encoding_census): every 5th
    doc gains 1-3 U+FFFD replacement chars, every 11th a C0 control
    char, every 3rd a non-ASCII suffix — the census must count exactly
    those docs/chars per source. The mojibake audit a crawled corpus
    runs before tokenization; clean sources read 1.0 ASCII ratio and
    zero artifact rows."""
    from .operators import quality as quality_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.substr(
                F.lit("���"),
                F.lit(1),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("\u0007")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" café")).otherwise(F.lit("")),
    )
    mangled = docs.select("doc_id", t.alias("text"), "source")
    return quality_ops.encoding_census(mangled)
