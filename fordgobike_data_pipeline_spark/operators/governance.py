"""Data-governance operators: right-to-be-forgotten delete
propagation with an audit trail, and a PII-exposure census.

A 100 TB corpus pipeline has legal surfaces, not just statistical
ones: GDPR/CCPA erasure requests must propagate through every derived
table WITH evidence (how many rows, where), and privacy review wants
a standing census of PII density per source before any training run.
Both are pure DataFrame algebra — an anti-join and a regex census —
shaped so the fact table is scanned exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# detection twins of curation.pii_redact's masking patterns
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PHONE_RE = r"\+\d[\d -]{7,}\d"


def gdpr_delete_audit(
    df: DataFrame,
    subjects: DataFrame,
    id_col: str,
    group_col: str,
) -> DataFrame:
    """Erasure-request propagation audit: how many rows each
    ``group_col`` slice loses when every row belonging to a subject in
    ``subjects`` (one column, named ``id_col``) is purged.

    One LEFT join against the subject list (broadcast when it fits —
    erasure batches are small next to the fact table) marks rows
    in-place, then one map-side-combined groupBy counts; the fact
    table is scanned once and never shuffled on its own key. Emits
    (group, rows_before, rows_deleted, rows_after, deleted_frac).

    The purged table itself is the same join with an anti filter —
    see :func:`gdpr_purge`.
    """
    mark = df.join(
        F.broadcast(subjects.select(F.col(id_col).alias("_subject")).distinct()),
        df[id_col] == F.col("_subject"),
        "left",
    )
    return (
        mark.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("rows_before"),
            F.sum(F.col("_subject").isNotNull().cast("long")).alias(
                "rows_deleted"
            ),
        )
        .select(
            group_col,
            "rows_before",
            "rows_deleted",
            (F.col("rows_before") - F.col("rows_deleted")).alias("rows_after"),
            F.round(
                F.col("rows_deleted").cast("double") / F.col("rows_before"), 9
            ).alias("deleted_frac"),
        )
    )


def gdpr_purge(df: DataFrame, subjects: DataFrame, id_col: str) -> DataFrame:
    """The erasure itself: anti-join the subject list out of the table."""
    return df.join(
        subjects.select(F.col(id_col)).distinct(), id_col, "left_anti"
    )


def pii_census(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Standing PII-exposure census per corpus source: document count
    plus how many documents contain an email, an IPv4, or an
    international phone number (the same patterns
    curation.pii_redact masks), and the any-PII fraction — the
    privacy-review dashboard row.

    All three probes are codegen ``rlike`` expressions evaluated in
    the same single scan; the output is |sources|-sized.
    """
    has_email = F.col(text_col).rlike(EMAIL_RE).cast("long")
    has_ip = F.col(text_col).rlike(IPV4_RE).cast("long")
    has_phone = F.col(text_col).rlike(PHONE_RE).cast("long")
    any_pii = (
        F.col(text_col).rlike(EMAIL_RE)
        | F.col(text_col).rlike(IPV4_RE)
        | F.col(text_col).rlike(PHONE_RE)
    ).cast("long")
    return (
        docs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(has_email).alias("n_email"),
            F.sum(has_ip).alias("n_ip"),
            F.sum(has_phone).alias("n_phone"),
            F.sum(any_pii).alias("n_any"),
        )
        .select(
            group_col,
            "n_docs",
            "n_email",
            "n_ip",
            "n_phone",
            F.round(F.col("n_any").cast("double") / F.col("n_docs"), 9).alias(
                "pii_frac"
            ),
        )
    )


def dp_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float] = (0.25, 0.5, 0.75),
    epsilon: float = 1.0,
    bucket_width: int = 32,
    salt: str = "dpq-seed-42",
) -> DataFrame:
    """Differentially-private quantile release via the EXPONENTIAL
    MECHANISM over a fixed bucket grid — the governance companion to
    the Laplace histogram (same release pipeline, different
    mechanism class): each candidate bucket edge scores utility
    u = −|cum_count − q·N| (rank distance to the target quantile,
    sensitivity 1), and the released value is
    argmax(ε·u/2 + Gumbel) — the standard Gumbel-max sampling of
    exp(ε·u/2). As with q_dp_histogram, the Gumbel draw inverts a
    uniform derived from md5(q‖bucket‖salt), so the release is
    SEEDED/reproducible and oracle-checkable; production swaps the
    hash for a CSPRNG (the mechanism plumbing — utilities,
    calibration, argmax — is the real part, entropy is the
    injectable part).

    Determinism: counts/cumulatives are exact BIGINT (window over the
    BOUNDED bucket table only); the score is quantized to 1e-6 before
    the argmax with an ascending-bucket tiebreak, so a last-ulp ln()
    difference between engines cannot flip the winner.

    Scale: one grouped count over the corpus; everything after runs
    on the bounded (buckets × |qs|) grid. Returns one row per q:
    (q, dp_value, true_value, rank_error)."""
    b = df.select(
        F.expr(f"{value_col} div {int(bucket_width)}").alias("bucket")
    ).groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n"))
    from pyspark.sql import Window

    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = b.select(
        "bucket", F.sum("n").over(w_cum).cast("long").alias("cum")
    )
    tot = b.agg(F.sum("n").cast("long").alias("big_n"))
    spark = df.sparkSession
    q_df = spark.createDataFrame([(float(q),) for q in qs], "q double")
    g = cum.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(q_df))
    # utility in exact 1e-6 rank units: -(|1e6*cum - round(1e6*q*N)|)
    target = F.rint(F.col("q") * F.col("big_n").cast("double") * 1e6).cast(
        "long"
    )
    u = -F.abs(F.col("cum") * F.lit(1_000_000).cast("long") - target)
    fp = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col("q").cast("string"), F.col("bucket").cast("string"), F.lit(salt)
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    uu = (fp.cast("double") + 0.5) / 1152921504606846976.0
    gumbel = -F.log(-F.log(uu))
    score = F.round(
        F.lit(float(epsilon)) / 2.0 * (u.cast("double") / 1e6) + gumbel, 6
    )
    from pyspark.sql import Window as W2

    w_pick = W2.partitionBy("q").orderBy(
        F.col("score").desc(), F.col("bucket").asc()
    )
    scored = g.select(
        "q", "bucket", "cum", "big_n", score.alias("score")
    ).withColumn("rn", F.row_number().over(w_pick))
    dp_pick = scored.filter(F.col("rn") == 1).select(
        "q",
        ((F.col("bucket") + 1) * F.lit(int(bucket_width))).cast("long").alias(
            "dp_value"
        ),
        F.col("cum").alias("dp_cum"),
        "big_n",
    )
    # true quantile on the same grid: first bucket with cum >= q*N
    hit = g.filter(
        F.col("cum") * F.lit(1_000_000).cast("long") >= target
    ).groupBy("q").agg(F.min("bucket").alias("tbucket"))
    true_cum = hit.join(
        cum.withColumnRenamed("bucket", "tbucket"), "tbucket"
    ).select("q", F.col("cum").alias("true_cum"), "tbucket")
    return (
        dp_pick.join(true_cum, "q")
        .select(
            "q",
            "dp_value",
            ((F.col("tbucket") + 1) * F.lit(int(bucket_width))).cast(
                "long"
            ).alias("true_value"),
            F.round(
                F.abs(F.col("dp_cum") - F.col("true_cum")).cast("double")
                / F.col("big_n").cast("double"),
                9,
            ).alias("rank_error"),
        )
    )
