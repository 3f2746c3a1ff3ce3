"""Physical-plan regression tests: the properties that make these
queries survive 100× scale-up must stay in the plan — filters reaching
the parquet scan, dims broadcast instead of shuffled, top-k compiling
to TakeOrderedAndProject, no accidental cartesian products."""

from __future__ import annotations

import pytest

from fordgobike_data_pipeline_spark import harness

from .conftest import SF_SMOKE


def explain(spark, name: str) -> str:
    df = harness.all_queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = explain(spark, "q_filter_eq")
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" in plan


def test_column_pruning(spark):
    plan = explain(spark, "q_agg_daily_summary")
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # only the 5 needed columns, not all 11
    assert "l_extendedprice" in read and "l_partkey" not in read and "l_discount" not in read


def test_dims_broadcast_not_shuffled(spark):
    plan = explain(spark, "q_join_role_playing")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark):
    plan = explain(spark, "q_topk_routes")
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT k


def test_no_unintended_cartesian(spark):
    """Only operators that *mean* cross join (q_cross_join, nearest
    neighbor, brute-force similarity) may contain a nested-loop/cartesian
    product."""
    allowed = {
        "q_cross_join",
        "q_nearest_neighbor",
        "q_embed_cosine_pairs",
        "q_ann_topk",
        "q_ann_lsh",
        "q_tfidf",  # broadcast scalar n_docs
        "q_generate_series",  # 1-row bounds
        "q_union_all_null",  # 1-row literal
    }
    for name in sorted(harness.all_oracle_sql()):
        if name in allowed:
            continue
        plan = explain(spark, name)
        assert "CartesianProduct" not in plan, name


def test_anti_join_stays_join(spark):
    plan = explain(spark, "q_anti_join")
    assert "LeftAnti" in plan


def test_incremental_read_prunes_partitions(spark, tmp_path):
    """The high-water-mark filter must prune bronze batch partitions at
    the scan (PartitionFilters), not post-filter rows."""
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("_batch_id", (F.col("id") % 4).cast("int"))
    path = str(tmp_path / "bronze_parts")
    df.write.partitionBy("_batch_id").parquet(path)
    scan = spark.read.parquet(path).filter(F.col("_batch_id") > 2)
    plan = scan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "_batch_id" in pf
    assert scan.count() == 25


def test_zorder_key_is_shuffle_free_codegen(spark):
    """The Morton key must compile to scan→project inside one codegen
    stage: zero Exchange, zero UDF (it's the expression every clustered
    write computes over the full table)."""
    plan = explain(spark, "q_zorder")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_shares_one_exchange_across_windows(spark):
    """Change detection and interval assembly partition identically, so
    Catalyst must reuse a single Exchange+Sort for both Window ops —
    two shuffles here would double the cost of every history build."""
    plan = explain(spark, "q_scd2")
    assert plan.count("+- Exchange") == 1
    assert plan.count("+- Window") == 2


def test_heavy_hitters_prunes_via_broadcast_semi_join(spark):
    """Phase-2 must consume the heavy-bucket table as a broadcast
    LeftSemi (map-side tail pruning); a shuffled semi-join would move
    the whole long tail — the thing the operator exists to avoid."""
    plan = explain(spark, "q_heavy_hitters")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_ivfpq_corpus_side_joins_are_broadcast(spark):
    """Probes and LUT are query-batch-bounded control data: every join
    against the coded corpus must broadcast them. A shuffled join on
    the corpus side would move the codes — tolerable — but also
    defeats list pruning by repartitioning everything."""
    plan = explain(spark, "q_ivfpq")
    # corpus-side scoring joins: listed⨝probes and ⨝lut are broadcasts
    assert plan.count("BroadcastHashJoin") >= 2


def test_exists_shape_is_semi_join_with_pushed_filter(spark):
    """EXISTS must decorrelate to a semi join and the probe-side
    predicate must reach the lineitem scan — a post-scan filter would
    read every returnflag at 100 TB."""
    plan = explain(spark, "q_exists_returned")
    assert "LeftSemi" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_not_exists_shape_is_anti_join(spark):
    plan = explain(spark, "q_anti_scalar")
    assert "LeftAnti" in plan


def test_correlated_avg_brand_dim_is_broadcast(spark):
    """Q17 shape: the brand dimension filter must come in as a
    broadcast join; only the aggregate self-join may shuffle."""
    plan = explain(spark, "q_subquery_avg_filter")
    assert "BroadcastHashJoin" in plan


def test_markov_normalization_join_is_broadcast(spark):
    """The row-normalizing totals table is |types|-bounded control
    data — it must broadcast, never shuffle the transition matrix."""
    plan = explain(spark, "q_markov_transitions")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_attribution_is_single_window_pass(spark):
    """Carry-forward attribution exists to avoid the quadratic
    conversions×touches join: the plan must contain exactly one
    Window (both last() exprs ride it) and no join at all."""
    plan = explain(spark, "q_attribution")
    assert plan.count("+- Window") == 1
    assert "Join" not in plan


def test_hierarchy_rollup_has_no_join(spark):
    """The closed-form ancestor unroll exists to beat the iterative
    join loop: the plan must contain no Join at all — explode +
    aggregate only."""
    plan = explain(spark, "q_hierarchy_rollup")
    assert "Join" not in plan
    assert "Generate" in plan  # the explode


def test_multi_exists_rewrite_is_single_semi_join(spark):
    """The Q21 aggregation rewrite replaces two correlated probes:
    exactly one LeftSemi join and no more than the two aggregations'
    exchanges over the fact."""
    plan = explain(spark, "q_multi_exists")
    assert plan.count("LeftSemi") >= 1
    assert "CartesianProduct" not in plan


def test_tpch_q3_q10_topk_is_take_ordered(spark):
    """The TPC-H top-k shapes must compile to TakeOrderedAndProject
    (per-partition heap + merge), never a global sort."""
    for name in ("q_tpch_q3", "q_tpch_q10"):
        plan = explain(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "GlobalLimit" not in plan, name


def test_tpch_q5_broadcasts_dims_single_smj(spark):
    """nation/region/supplier sides broadcast; the only SortMergeJoin
    is the genuinely large-large customer-orders-lineitem chain."""
    plan = explain(spark, "q_tpch_q5")
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 2  # c⋈o and (c⋈o)⋈l


def test_feature_hash_single_aggregate_no_join(spark):
    """The hashing trick must stay join-free: codegen expressions plus
    one partial/final aggregate pair, no python eval."""
    plan = explain(spark, "q_feature_hash")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_target_encode_broadcasts_stats(spark):
    """Category stats (5 rows) and the global 1-row aggregate must
    broadcast back onto the fact rows — no fact-side shuffle join."""
    plan = explain(spark, "q_target_encode_loo")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_nearest_centroid_broadcasts_centroids(spark):
    """The |labels|-row centroid table must broadcast into the single
    embedding scan (BroadcastNestedLoopJoin for the crossJoin)."""
    plan = explain(spark, "q_nearest_centroid")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_gdpr_audit_single_scan_broadcast_mark(spark):
    """The erasure mark join must broadcast the subject list; the
    events table is scanned once (one row-count-bearing scan node)."""
    plan = explain(spark, "q_gdpr_delete")
    assert "BroadcastHashJoin" in plan


def test_tpch_q19_single_join_or_residual(spark):
    """Q19's OR-of-ANDs must ride ONE broadcast join as a residual —
    not three separate lineitem scans unioned."""
    plan = explain(spark, "q_tpch_q19")
    import re

    # formatted explain lists each scan twice (tree + numbered detail);
    # count the detail headers: lineitem + part, once each
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    assert "BroadcastHashJoin" in plan and "Union" not in plan


def test_tpch_q17_semi_join_before_aggregate(spark):
    """The per-part avg must aggregate only Brand#2 lineitems: the
    brand semi-join happens BELOW the aggregate (no full-table
    groupBy), and the 95-part dim broadcasts."""
    plan = explain(spark, "q_tpch_q17")
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q1_no_join_partial_agg(spark):
    """Q1 is one scan + partial/final aggregate: no join anywhere,
    and the map-side HashAggregate pair must be present."""
    plan = explain(spark, "q_tpch_q1")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_max_concurrency_sweep_is_day_partitioned(spark):
    """The sweep-line window must partition by day — a global
    totally-ordered window (single-partition trap) shows up as a Sort
    with no partitioning expression before the Window node."""
    plan = explain(spark, "q_max_concurrency")
    import re

    for m in re.finditer(r"partitionSpec=\[([^\]]*)\]", plan):
        assert m.group(1).strip() != "", "window without PARTITION BY in sweep"
