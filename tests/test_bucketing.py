"""Bucketed co-located joins: same key + same bucket count on both
sides ⇒ the join runs with NO exchange (shuffle) on either side —
the physical-design lever replacing the reference's FK indexes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.io import load_tables, publish_bucketed

from .conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-join strategies so the exchange-elision is what's
    actually under test."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    t = load_tables(spark, SF_SMOKE, ("lineitem", "orders"))
    publish_bucketed(t["lineitem"], "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    publish_bucketed(t["orders"], "b_orders", ["o_orderkey"], 8, ["o_orderkey"])

    li, o = spark.table("b_lineitem"), spark.table("b_orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    join_section = plan.split("AdaptiveSparkPlan")[0]
    # the join itself must consume bucketed scans directly — the only
    # allowed exchange is the post-aggregation one (different key)
    pre_agg = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in pre_agg, pre_agg

    # and the result is still correct
    want = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .count()
    )
    assert {(r.o_orderstatus, r["count"]) for r in joined.collect()} == {
        (r.o_orderstatus, r["count"]) for r in want.collect()
    }


def test_bucketed_aggregation_skips_exchange(spark, no_broadcast):
    t = load_tables(spark, SF_SMOKE, ("lineitem",))
    publish_bucketed(t["lineitem"], "b_li_agg", ["l_orderkey"], 8)
    agg = spark.table("b_li_agg").groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan, plan
