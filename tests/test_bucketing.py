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


def test_zorder_publish_tightens_file_bounding_boxes(spark, tmp_path):
    """Z-order clustering must (a) preserve the data exactly and
    (b) give each written file a materially tighter (user_id × ts)
    bounding box than a naive write — parquet footer min/max stats are
    what scans prune on, so the summed normalized box area is a direct
    proxy for skippability on BOTH dimensions."""
    import glob

    import pyarrow.parquet as pq

    from fordgobike_data_pipeline_spark.io import publish_overwrite, publish_zordered

    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    naive_dir, z_dir = str(tmp_path / "naive"), str(tmp_path / "zorder")
    publish_overwrite(ev.repartition(8), naive_dir)
    publish_zordered(ev, z_dir, ["user_id", "ts"], n_files=8)

    # (a) same multiset of rows
    back = spark.read.parquet(z_dir)
    assert back.count() == ev.count()
    chk = lambda df: df.agg(  # noqa: E731
        F.bit_xor(F.xxhash64("event_id", "user_id", "event_type")).alias("h")
    ).first()["h"]
    assert chk(back) == chk(ev)

    def boxes_area(d: str) -> float:
        spans = {"user_id": [], "ts": []}
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = {}, {}
            for rg in range(md.num_row_groups):
                for ci in range(md.row_group(rg).num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in spans and col.statistics is not None:
                        st = col.statistics
                        mins[name] = min(mins.get(name, st.min), st.min)
                        maxs[name] = max(maxs.get(name, st.max), st.max)
            if mins:
                spans["user_id"].append((mins["user_id"], maxs["user_id"]))
                spans["ts"].append((mins["ts"], maxs["ts"]))
        glo = {
            k: (min(a for a, _ in v), max(b for _, b in v)) for k, v in spans.items()
        }
        total = 0.0
        for (ua, ub), (ta, tb) in zip(spans["user_id"], spans["ts"]):
            du = (ub - ua) / max(1, glo["user_id"][1] - glo["user_id"][0])
            dt = (tb - ta).total_seconds() / max(
                1e-9, (glo["ts"][1] - glo["ts"][0]).total_seconds()
            )
            total += du * dt
        return total

    naive_area, z_area = boxes_area(naive_dir), boxes_area(z_dir)
    # naive random placement → every file spans ~the full space (area≈1
    # each); z-order must cut the summed area by at least 2x
    assert z_area < naive_area / 2, (naive_area, z_area)


def test_compact_table_merges_small_files(spark, tmp_path):
    """Streaming appends leave a small-file mess; compaction must cut
    the file count to the size-derived target, keep every row, and stay
    atomic (output readable afterwards)."""
    import glob

    from fordgobike_data_pipeline_spark.io import compact_table, publish_overwrite

    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    d = str(tmp_path / "messy")
    publish_overwrite(ev.repartition(64), d)  # 64 tiny files
    n_before = len(glob.glob(f"{d}/*.parquet"))
    assert n_before >= 64

    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(f"{d}/*.parquet")
    )
    n_after = compact_table(spark, d, target_file_bytes=max(1, total // 2))
    assert n_after == len(glob.glob(f"{d}/*.parquet")) <= 3

    back = spark.read.parquet(d)
    assert back.count() == ev.count()
    chk = lambda df: df.agg(  # noqa: E731
        F.bit_xor(F.xxhash64("event_id", "user_id", "event_type")).alias("h")
    ).first()["h"]
    assert chk(back) == chk(ev)

    # z-order variant restores clustering during the rewrite
    n_z = compact_table(spark, d, target_file_bytes=max(1, total // 4), zorder_cols=["user_id", "ts"])
    assert n_z >= 1 and spark.read.parquet(d).count() == ev.count()


def test_training_shard_export_is_ordered_and_bounded(spark, tmp_path):
    """Shards must partition the key space contiguously (every file's
    key range disjoint from every other), each file internally sorted,
    no file above the row cap, and the full multiset preserved."""
    import glob

    import pyarrow.parquet as pq

    from fordgobike_data_pipeline_spark.io import write_training_shards

    ev = load_tables(spark, SF_SMOKE, ("events",))["events"].select(
        "event_id", "user_id", "value"
    )
    d = str(tmp_path / "shards")
    n = write_training_shards(ev, d, ["event_id"], rows_per_shard=150)
    files = sorted(glob.glob(f"{d}/*.parquet"))
    assert n == len(files) and n >= 5

    total, ranges = 0, []
    for f in files:
        t = pq.read_table(f, columns=["event_id"])
        ids = t["event_id"].to_pylist()
        assert len(ids) <= 150
        assert ids == sorted(ids)  # intra-shard order
        ranges.append((min(ids), max(ids)))
        total += len(ids)
    assert total == ev.count()
    # contiguous, non-overlapping key ranges across shards
    ranges.sort()
    for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi < lo2


def test_compact_preserves_hive_partition_layout(spark, tmp_path):
    """Compacting a key=value-partitioned table (e.g. the IVF lists
    index) must size from a RECURSIVE walk, keep the partition
    directories (downstream directory pruning depends on them), and
    keep every row."""
    import glob
    import os

    from fordgobike_data_pipeline_spark.io import compact_table, publish_overwrite

    ev = load_tables(spark, SF_SMOKE, ("events",))["events"].withColumn(
        "part", F.pmod(F.col("user_id"), F.lit(4)).cast("int")
    )
    d = str(tmp_path / "parted")
    # many small files per partition dir
    publish_overwrite(ev.repartition(16), d, partition_by=["part"])
    before = glob.glob(f"{d}/part=*/*.parquet")
    assert len(before) > 4

    n_after = compact_table(spark, d, target_file_bytes=1 << 30)
    after = glob.glob(f"{d}/part=*/*.parquet")
    # layout preserved: all files still under part= dirs, fewer of them
    assert sorted(os.listdir(d))[0].startswith("part=") or "_SUCCESS" in os.listdir(d)
    assert {p.split("part=")[1].split("/")[0] for p in after} == {"0", "1", "2", "3"}
    assert n_after == len(after) < len(before)

    back = spark.read.parquet(d)
    assert back.count() == ev.count()
    # partition pruning still works: a part filter reads one directory
    pruned = back.filter(F.col("part") == 2)
    assert pruned.count() == ev.filter(F.col("part") == 2).count()

    # z-order + partitioned input is a contract violation, not silent corruption
    with pytest.raises(ValueError, match="Hive-partitioned"):
        compact_table(spark, d, zorder_cols=["user_id"])


def test_zorder_bit_budget_and_date_columns(spark, tmp_path):
    """zorder_value must refuse a bit budget that overflows a long
    (JVM shifts wrap mod 64 → silent curve corruption), and
    publish_zordered must handle DateType cluster columns (no direct
    date→double cast in Spark) plus auto-reduce bits for wide keys."""
    from fordgobike_data_pipeline_spark.io import publish_zordered, zorder_value

    with pytest.raises(ValueError, match="63"):
        zorder_value([F.lit(1)] * 6, bits=12)  # 72 bits > 63

    ev = (
        load_tables(spark, SF_SMOKE, ("events",))["events"]
        .withColumn("d", F.to_date("ts"))
        .select("event_id", "user_id", "d")
    )
    d6 = str(tmp_path / "zdate")
    publish_zordered(ev, d6, ["user_id", "d"], n_files=4)
    back = spark.read.parquet(d6)
    assert back.count() == ev.count()
    # six columns auto-reduce to 63//6 = 10 bits instead of raising
    wide = ev.select(
        "event_id", *[F.col("user_id").alias(f"k{i}") for i in range(6)]
    )
    d7 = str(tmp_path / "zwide")
    publish_zordered(wide, d7, [f"k{i}" for i in range(6)], n_files=2)
    assert spark.read.parquet(d7).count() == ev.count()
