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
