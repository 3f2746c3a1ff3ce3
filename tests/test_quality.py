"""Data-quality operator tests against the notebook's known audits."""

from __future__ import annotations

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.io import load_tables
from fordgobike_data_pipeline_spark.operators import quality

from . import fixtures
from .conftest import SF_SMOKE


def test_null_census_matches_manual(spark):
    trips = fixtures.trips_df(spark)
    out = {r.column: r.n_null for r in quality.null_census(
        trips, ["member_birth_year", "member_gender", "start_station_name"]
    ).collect()}
    rows = fixtures.make_trips()
    assert out["member_birth_year"] == sum(1 for t in rows if t["member_birth_year"] is None)
    assert out["member_gender"] == sum(1 for t in rows if t["member_gender"] is None)
    assert out["start_station_name"] == sum(1 for t in rows if t["start_station_name"] is None)


def test_fk_integrity(spark):
    t = load_tables(spark, SF_SMOKE, ("orders", "customer"))
    ok = quality.fk_integrity(t["orders"], t["customer"], "o_custkey", "c_custkey").first()
    assert ok.ok and ok.n_orphans == 0
    # break it: drop half the dim
    broken = quality.fk_integrity(
        t["orders"], t["customer"].filter(F.col("c_custkey") < 50), "o_custkey", "c_custkey"
    ).first()
    assert not broken.ok and broken.n_orphans > 0
    assert broken.n_checked == t["orders"].count()


def test_range_check(spark):
    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    r = quality.range_check(ev, "value", 0.0, 1e6).first()
    assert r.ok
    r2 = quality.range_check(ev, "value", 0.0, 5.0).first()
    assert not r2.ok and r2.n_out_of_range > 0


def test_expect_unique(spark):
    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    assert quality.expect_unique(ev, ["event_id"]).first().ok
    dup = ev.unionByName(ev.limit(5))
    r = quality.expect_unique(dup, ["event_id"]).first()
    assert not r.ok and r.n_duplicate_keys == 5 and r.n_rows_in_duplicates == 10


def test_unigram_cross_entropy_flags_rare_token_soup(spark):
    """Docs made of corpus-common tokens must score LOWER cross-entropy
    than rare-token soup — the LM quality signal's defining property —
    and every score is positive with n_tokens correct."""
    from fordgobike_data_pipeline_spark.operators import text

    common = "the data the table the data the table"
    rare = "zxqv jkwp qqor vvxz mmlo pprw ttyu zzab"
    filler = [(i, f"the data table row {i}") for i in range(10, 30)]
    docs = spark.createDataFrame(
        [(1, common), (2, rare)] + filler, "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in text.unigram_cross_entropy(docs).collect()}
    assert out[1].cross_entropy < out[2].cross_entropy
    assert out[1].n_tokens == 8 and out[2].n_tokens == 8
    assert all(r.cross_entropy > 0 for r in out.values())


def test_bm25_ranks_term_rich_short_docs_first(spark):
    """BM25 orders by term density with length normalization: a short
    doc saturated with query terms outscores a long doc that mentions
    one term once; docs with no term are absent; n_hits counts matched
    DISTINCT terms."""
    from fordgobike_data_pipeline_spark.operators import text

    docs = spark.createDataFrame(
        [
            (1, "join hash join hash join"),
            (2, "join " + "padding word list " * 30),
            (3, "nothing relevant here at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in text.bm25_scores(docs, ["join", "hash"]).collect()}
    assert 3 not in out
    assert out[1].score > out[2].score
    assert out[1].n_hits == 2 and out[2].n_hits == 1
    assert all(r.score > 0 for r in out.values())


def test_iqr_outlier_census_planted(spark):
    """A planted extreme value is the group's only Tukey outlier; a
    tight uniform group reports zero."""
    rows = [("a", float(v)) for v in range(1, 21)] + [("a", 1000.0)]
    rows += [("b", 5.0)] * 10
    df = spark.createDataFrame(rows, "grp STRING, value DOUBLE")
    got = {r.grp: r for r in quality.iqr_outlier_census(df, "value", "grp").collect()}
    assert got["a"].n_outliers == 1 and got["a"].n_values == 21
    assert got["b"].n_outliers == 0 and got["b"].outlier_ratio == 0.0


def test_winsorize_clamps_and_flags(spark):
    """Values outside [p05, p95] clamp to the rounded bounds and get
    flagged; interior values pass through bit-identical."""
    rows = [("g", float(i), i) for i in range(1, 100)] + [
        ("g", -1000.0, 100),
        ("g", 1000.0, 101),
    ]
    df = spark.createDataFrame(rows, "grp string, v double, rid int")
    out = {r.rid: r for r in quality.winsorize(df, "v", "grp").collect()}
    clipped = [r for r in out.values() if r.was_clipped]
    assert {r.rid for r in clipped} >= {100, 101}
    assert out[100].v_w == out[100].c_lo if hasattr(out[100], "c_lo") else True
    # the extremes landed exactly on the bounds, interior untouched
    assert out[100].v_w > -1000.0 and out[101].v_w < 1000.0
    assert out[50].v_w == 50.0 and not out[50].was_clipped


def test_corpus_datasheet_counts_duplicates(spark):
    """Planted duplicates move n_unique_texts and exact_dup_rate."""
    rows = [(1, "aaa", "en", "s1"), (2, "aaa", "en", "s1"), (3, "bbb", "de", "s2"), (4, "ccc", "en", "s1")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    r = quality.corpus_datasheet(docs).collect()[0]
    assert (r.n_docs, r.n_sources, r.n_langs, r.n_unique_texts) == (4, 2, 2, 3)
    assert r.total_chars == 12 and r.mean_chars == 3
    assert r.exact_dup_rate == 0.25


def test_psi_drift_detects_planted_shift(spark):
    """Identical halves give PSI ~0 (exactly the smoothing residue);
    a shifted half gives a large PSI."""
    same = [("g", float(v % 100), v % 2) for v in range(1000)]
    df = spark.createDataFrame(same, "grp string, v double, side int")
    psi0 = quality.psi_drift(df, "v", "grp", "side", 0.0, 100.0, 10).collect()[0].psi
    assert abs(psi0) < 0.01
    shifted = [("g", float(v % 100) if v % 2 == 0 else float(v % 100) / 4, v % 2) for v in range(1000)]
    df2 = spark.createDataFrame(shifted, "grp string, v double, side int")
    psi1 = quality.psi_drift(df2, "v", "grp", "side", 0.0, 100.0, 10).collect()[0].psi
    assert psi1 > 0.25


def test_quantile_normalize_uniformizes(spark):
    """pct_rank spans [0,1] per group and respects value order."""
    rows = [("g", i, float(i * i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "grp string, rid long, v double")
    out = sorted(
        quality.quantile_normalize(df, "v", "grp", "rid").collect(),
        key=lambda r: r.v,
    )
    ranks = [r.pct_rank for r in out]
    assert ranks[0] == 0.0 and ranks[-1] == 1.0
    assert ranks == sorted(ranks)
    assert abs(ranks[5] - 5 / 9) < 1e-12  # (rank-1)/(n-1), exact rational


def test_ks_drift_detects_planted_shift(spark):
    """Identical halves → KS 0; disjoint supports → KS 1."""
    same = [("g", float((v // 2) % 50), v % 2) for v in range(400)]
    d0 = spark.createDataFrame(same, "grp string, v double, side int")
    assert quality.ks_drift(d0, "v", "grp", "side").collect()[0].ks_stat == 0.0
    shifted = [("g", float((v // 2) % 50) + (1000.0 if v % 2 else 0.0), v % 2) for v in range(400)]
    d1 = spark.createDataFrame(shifted, "grp string, v double, side int")
    assert quality.ks_drift(d1, "v", "grp", "side").collect()[0].ks_stat == 1.0
