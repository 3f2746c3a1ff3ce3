"""Warehouse-lifecycle operators (operators/warehouse.py): SCD2
semantics on crafted change logs, partial-merge == full-recompute,
Z-order key correctness + file pruning, heavy-hitter pruning
losslessness, and the IVF-PQ / recall evaluation pair."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.io import load_tables
from fordgobike_data_pipeline_spark.operators import similarity, warehouse

from .conftest import SF_SMOKE


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2020, 1, day)


def test_scd2_change_detection_null_safe(spark):
    """Versions open on any attribute change including NULL→value and
    value→NULL; unchanged rows collapse into the open version."""
    rows = [
        ("a", "x", _ts(1), 1),
        ("a", "x", _ts(2), 2),   # no change — collapsed
        ("a", "y", _ts(3), 3),   # change
        ("a", None, _ts(4), 4),  # value→NULL opens a version
        ("a", None, _ts(5), 5),  # NULL→NULL is no change
        ("a", "y", _ts(6), 6),   # NULL→value opens a version
        ("b", None, _ts(1), 7),  # first row with NULL attr
    ]
    df = spark.createDataFrame(rows, "key string, attr string, ts timestamp, tb int")
    hist = warehouse.scd2_history(df, ["key"], ["attr"], "ts", ["tb"]).collect()
    a = sorted(
        [(r.attr, r.valid_from, r.valid_to, r.is_current) for r in hist if r.key == "a"],
        key=lambda t: t[1],
    )
    assert a == [
        ("x", _ts(1), _ts(3), False),
        ("y", _ts(3), _ts(4), False),
        (None, _ts(4), _ts(6), False),
        ("y", _ts(6), None, True),
    ]
    b = [(r.attr, r.is_current) for r in hist if r.key == "b"]
    assert b == [(None, True)]


def test_scd2_same_ts_tiebreak_deterministic(spark):
    """Two changes at the same timestamp order by the tiebreak column,
    so reruns produce identical histories."""
    rows = [("k", "v1", _ts(1), 10), ("k", "v2", _ts(1), 20)]
    df = spark.createDataFrame(rows, "key string, attr string, ts timestamp, tb int")
    out1 = warehouse.scd2_history(df, ["key"], ["attr"], "ts", ["tb"])
    got = sorted([(r.attr, r.is_current) for r in out1.collect()])
    assert got == [("v1", False), ("v2", True)]


def test_scd2_intervals_tile(spark):
    """On real data: per key exactly one current row, and each
    valid_to equals the next version's valid_from (no gaps/overlaps)."""
    orders = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    changes = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderstatus").alias("attr"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tb"),
    )
    hist = warehouse.scd2_history(changes, ["key"], ["attr"], "ts", ["tb"])
    per_key = hist.groupBy("key").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.count("*").alias("n_versions"),
    )
    assert per_key.filter(F.col("n_current") != 1).count() == 0
    # interval chaining: every non-current valid_to opens the next row
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("valid_from")
    chained = hist.withColumn("next_from", F.lead("valid_from").over(w))
    bad = chained.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert bad.count() == 0


def test_mv_merge_equals_full_recompute_incrementally(spark):
    """Folding a NEW batch's partials into previously-merged state must
    equal the direct aggregation over all rows — the MV-refresh
    algebra."""
    orders = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    base = orders.select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int").alias("k"),
        "o_totalprice",
        (F.col("o_orderkey") % 3).alias("batch_id"),
    )
    old = warehouse.aggregate_partials(
        base.filter("batch_id < 2"), ["k"], "o_totalprice", "batch_id"
    )
    new = warehouse.aggregate_partials(
        base.filter("batch_id = 2"), ["k"], "o_totalprice", "batch_id"
    )
    merged = warehouse.merge_aggregate_partials(old.unionByName(new), ["k"])
    direct = (
        base.groupBy("k")
        .agg(
            F.count("o_totalprice").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.round(F.sum("o_totalprice") / F.count("o_totalprice"), 6).alias("mean"),
            F.min("o_totalprice").alias("vmin"),
            F.max("o_totalprice").alias("vmax"),
        )
    )
    m = {r.k: (r.n_rows, r.total, r.mean, r.vmin, r.vmax) for r in merged.collect()}
    d = {r.k: (r.n_rows, r.total, r.mean, r.vmin, r.vmax) for r in direct.collect()}
    assert set(m) == set(d)
    for k in d:
        assert m[k][0] == d[k][0] and m[k][3] == d[k][3] and m[k][4] == d[k][4]
        assert abs(m[k][1] - d[k][1]) < 0.02  # sum order differs pre-round
        assert abs(m[k][2] - d[k][2]) < 1e-5


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (1234, 4321)]
    df = spark.createDataFrame(cases, "a long, b long").select(
        "a", "b", warehouse.zorder_key2(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == _py_morton(r.a, r.b), (r.a, r.b)


def test_zorder_write_prunes_files(spark, tmp_path):
    """The production clustered publish (io.publish_zordered) confines
    a 2-D box predicate to a subset of files; a hash-scattered layout
    smears it across all of them."""
    from fordgobike_data_pipeline_spark.io import publish_zordered

    li = load_tables(spark, SF_SMOKE, ("lineitem",))["lineitem"]
    n_files = 8
    zpath = str(tmp_path / "z")
    hpath = str(tmp_path / "h")
    publish_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=n_files)
    li.repartition(n_files).write.mode("overwrite").parquet(hpath)
    # ~1/8 × ~1/4 of each key range (keys span 0..199 / 0..9 at sf0.001)
    box = "l_partkey < 25 AND l_suppkey < 3"

    def files_touched(path: str) -> int:
        hit = (
            spark.read.parquet(path)
            .filter(box)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        return hit

    z_hit, h_hit = files_touched(zpath), files_touched(hpath)
    assert h_hit == n_files  # scattered layout: every file has box rows
    assert z_hit <= n_files // 2  # clustered: the box lives in few files


def test_heavy_hitters_pruning_is_lossless(spark):
    """Bucket pruning must not change the answer, even with heavy
    collision pressure (tiny bucket table)."""
    events = load_tables(spark, SF_SMOKE, ("events",))["events"]
    direct = {
        (r.user_id, r["count"])
        for r in events.groupBy("user_id").count().filter("count >= 60").collect()
    }
    for n_buckets in (16, 1 << 14):
        got = {
            (r.key, r.n_occurrences)
            for r in warehouse.heavy_hitters(
                events, "user_id", 60, n_buckets=n_buckets
            ).collect()
        }
        assert got == direct, n_buckets


def test_ivfpq_production_matches_oracle_mode(spark):
    """The numpy-assignment + einsum-encode production path must return
    the same ranked lists as the relational exact_assign oracle path
    (seeded quantizers on both sides)."""
    emb = load_tables(spark, SF_SMOKE, ("embeddings",))["embeddings"]
    cb = similarity.pq_codebooks(emb, dim=64, n_subspaces=4, seed_mod=40, n_iter=0)
    queries = emb.filter(F.col("vec_id") < 5)
    kw = dict(k=10, centroid_mod=25, nprobe=3, kmeans_iters=0)
    oracle = similarity.ivfpq_adc_topk(emb, queries, cb, exact_assign=True, **kw)
    prod = similarity.ivfpq_adc_topk(emb, queries, cb, exact_assign=False, **kw)
    o = {(r.query_id, r.rank, r.cand_id) for r in oracle.collect()}
    p = {(r.query_id, r.rank, r.cand_id) for r in prod.collect()}
    assert o == p


def test_ann_recall_bounds_and_exact_self_recall(spark):
    """recall(exact, exact) = 1.0 per query; recall of the LSH path is
    in [0, 1] and counts only true top-k members."""
    emb = load_tables(spark, SF_SMOKE, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(emb, queries, k=10)
    self_recall = similarity.ann_recall_at_k(exact, exact, k=10).collect()
    assert {r.recall_at_k for r in self_recall} == {1.0}
    approx = similarity.lsh_ann_topk(emb, queries, k=10, n_planes=6)
    rec = similarity.ann_recall_at_k(exact, approx, k=10).collect()
    assert len(rec) == 5
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in rec)


def test_distinct_partials_merge_is_register_exact(spark):
    """Merging per-batch HLL sketches must equal sketching the union
    EXACTLY (same registers, not approximately) — and be invariant to
    how rows were batched. That's the property that makes incremental
    COUNT(DISTINCT) refresh sound."""
    orders = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    base = orders.select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int").alias("k"),
        "o_custkey",
    )
    direct = {
        r.k: r.approx_distinct
        for r in base.withColumn("b", F.lit(0))
        .transform(lambda d: warehouse.aggregate_distinct_partials(d, ["k"], "o_custkey", "b"))
        .transform(lambda d: warehouse.merge_distinct_partials(d, ["k"]))
        .collect()
    }
    for n_batches in (3, 7):
        batched = base.withColumn("b", F.col("o_custkey") % n_batches)
        merged = {
            r.k: r.approx_distinct
            for r in warehouse.merge_distinct_partials(
                warehouse.aggregate_distinct_partials(batched, ["k"], "o_custkey", "b"),
                ["k"],
            ).collect()
        }
        assert merged == direct, n_batches


def test_distinct_partials_estimate_close_to_exact(spark):
    orders = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    base = orders.select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int").alias("k"),
        "o_custkey",
        (F.col("o_orderkey") % 4).alias("b"),
    )
    est = {
        r.k: r.approx_distinct
        for r in warehouse.merge_distinct_partials(
            warehouse.aggregate_distinct_partials(base, ["k"], "o_custkey", "b"), ["k"]
        ).collect()
    }
    exact = {
        r.k: r.x
        for r in base.groupBy("k").agg(F.countDistinct("o_custkey").alias("x")).collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(2, 0.05 * exact[k]), (k, est[k], exact[k])


def test_scd2_pit_join_matches_every_fact_exactly_once(spark):
    """Interval tiling means the point-in-time join is lossless and
    duplicate-free: every order matches exactly one dimension
    version."""
    from fordgobike_data_pipeline_spark import harness

    orders = load_tables(spark, SF_SMOKE, ("orders",))["orders"]
    pit = harness.all_queries()["q_scd2_pit"](spark, SF_SMOKE)
    assert pit.count() == orders.count()
    assert pit.select("o_orderkey").distinct().count() == orders.count()


# ---------------------------------------------------------------------------
# CDC changelog apply
# ---------------------------------------------------------------------------


def test_cdc_latest_wins_and_tombstones(spark):
    """Per key the newest change wins; a newest-change delete removes
    the key; a delete SUPERSEDED by a later upsert resurrects it."""
    rows = [
        ("a", _ts(1), 1, "upsert", "v1"),
        ("a", _ts(2), 2, "upsert", "v2"),   # latest for a → wins
        ("b", _ts(1), 3, "upsert", "v1"),
        ("b", _ts(2), 4, "delete", None),   # latest for b → gone
        ("c", _ts(1), 5, "delete", None),
        ("c", _ts(2), 6, "upsert", "back"), # delete superseded → present
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, tb int, op string, val string"
    )
    snap = warehouse.apply_changelog(df, ["key"], "ts", "op", ["tb"])
    got = {r.key: r.val for r in snap.collect()}
    assert got == {"a": "v2", "c": "back"}
    assert "op" not in snap.columns


def test_cdc_same_ts_tiebreak_and_idempotence(spark):
    """Same-ts changes order by the tiebreak (higher wins under DESC);
    re-applying the same changelog yields the identical snapshot."""
    rows = [
        ("k", _ts(1), 10, "upsert", "lo"),
        ("k", _ts(1), 20, "upsert", "hi"),
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, tb int, op string, val string"
    )
    one = warehouse.apply_changelog(df, ["key"], "ts", "op", ["tb"]).collect()
    two = warehouse.apply_changelog(df, ["key"], "ts", "op", ["tb"]).collect()
    assert [(r.key, r.val) for r in one] == [("k", "hi")]
    assert one == two


# ---------------------------------------------------------------------------
# Mergeable histogram quantiles
# ---------------------------------------------------------------------------


def test_histogram_merge_is_batching_invariant(spark):
    """Partials built under two different batch splits merge into the
    identical histogram (bin counts add exactly)."""
    li = load_tables(spark, SF_SMOKE, ("lineitem",))["lineitem"].select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") % 2).alias("b2"),
        (F.col("l_orderkey") % 5).alias("b5"),
    )
    h2 = warehouse.merge_histogram_partials(
        warehouse.histogram_partials(li, ["g"], "v", "b2", 0.0, 120000.0, 64), ["g"]
    )
    h5 = warehouse.merge_histogram_partials(
        warehouse.histogram_partials(li, ["g"], "v", "b5", 0.0, 120000.0, 64), ["g"]
    )
    assert sorted(map(tuple, h2.collect())) == sorted(map(tuple, h5.collect()))


def test_histogram_quantile_bounds_and_clamp(spark):
    """The q-estimate's bin always covers ≥ q of the mass, out-of-range
    values land in the edge bins, and state stays ≤ n_bins rows."""
    rows = [("g", float(v)) for v in range(100)] + [("g", -50.0), ("g", 999.0)]
    df = spark.createDataFrame(rows, "g string, v double").withColumn(
        "b", F.lit(0)
    )
    p = warehouse.histogram_partials(df, ["g"], "v", "b", 0.0, 100.0, 10)
    hist = warehouse.merge_histogram_partials(p, ["g"])
    hrows = hist.collect()
    assert len(hrows) <= 10
    bins = {r.bin: r.n for r in hrows}
    assert bins[0] == 11  # -50 clamped into bin 0 alongside 0..9
    assert bins[9] == 11  # 999 clamped into bin 9 alongside 90..99
    qs = warehouse.histogram_quantiles(hist, ["g"], [0.5, 1.0], 0.0, 100.0, 10)
    got = {r.q: (r.qbin, r.q_value) for r in qs.collect()}
    # 51 of 102 rows lie in bins 0..4 → cum(4) = 51 ≥ 0.5·102
    assert got[0.5] == (4, 50.0)
    assert got[1.0] == (9, 100.0)


# ---------------------------------------------------------------------------
# Global row index
# ---------------------------------------------------------------------------


def test_global_row_index_contiguous_and_layout_invariant(spark):
    """0..N-1 with no gaps, follows the total order, and the same
    index comes back under a different partition count (boundary
    placement is irrelevant to the output)."""
    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    n = ev.count()
    a = warehouse.global_row_index(ev, ["ts", "event_id"], n_parts=4)
    idx = sorted(r.row_idx for r in a.select("row_idx").collect())
    assert idx == list(range(n))
    b = warehouse.global_row_index(ev, ["ts", "event_id"], n_parts=13)
    ma = {r.event_id: r.row_idx for r in a.collect()}
    mb = {r.event_id: r.row_idx for r in b.collect()}
    assert ma == mb
    # cross-RUN stability: repartitionByRange boundaries drift between
    # executions; the checkpoint pins one materialization, so reruns
    # (and any boundary draw) give the identical index
    c = warehouse.global_row_index(ev, ["ts", "event_id"], n_parts=4)
    mc = {r.event_id: r.row_idx for r in c.collect()}
    assert mc == ma


def test_semi_additive_last_picks_latest_per_period(spark):
    """Only the latest observation per (account, period) survives;
    ties break on the tiebreak column."""
    rows = [
        ("a", 202401, _ts(1), 1, 100.0),
        ("a", 202401, _ts(5), 2, 150.0),   # latest in Jan → survives
        ("a", 202402, _ts(10), 3, 90.0),
        ("b", 202401, _ts(5), 4, 10.0),
        ("b", 202401, _ts(5), 5, 20.0),    # same ts — higher tb wins
    ]
    df = spark.createDataFrame(
        rows, "acct string, period int, ts timestamp, tb int, v double"
    )
    out = {
        (r.acct, r.period): r.v
        for r in warehouse.semi_additive_last(
            df, ["acct"], "period", "ts", "v", ["tb"]
        ).collect()
    }
    assert out == {("a", 202401): 150.0, ("a", 202402): 90.0, ("b", 202401): 20.0}
