"""Stress the scale operators beyond the provided scale factors by
replicating the sf0.1 corpus N× (id-offset copies — deliberately
creates cross-copy exact/near duplicates, which is exactly the dedup
workload). Prints per-operator wall times and task-skew stats, and
(optionally) writes one JSON record per operator for SCALE.md.

    python tools/scale_stress.py [replication]
    SCALE_STRESS_JSON=/tmp/stress10.json python tools/scale_stress.py 10

Skew measurement: the session writes a Spark event log; each operator
runs under its own job group, so after `spark.stop()` the log maps
stages → operators and TaskEnd events give per-task executor run
times. Reported skew is max/median run time of the operator's worst
qualifying stage (≥8 tasks and ≥100 ms median — sub-100 ms stages are
scheduler noise where a 6× "skew" is 30 ms of JIT warmup, not a hot
partition).

Interpretation note: on this workload every doc has N-1 identical
copies, so EXACT pairwise metrics (containment_pairs, and
exact_jaccard at lower thresholds) emit Θ(docs·N²) true pairs — their
wall time tracks output mass, not wasted candidates (measured: 250k
true pairs at 10×). That output-size blowup, not candidate
generation, is why the sketch paths (minhash/simhash/LSH/SemDeDup)
are the 100 TB route: they return the same duplicate structure in
candidate-bounded time, and dedup_clusters collapses it to one
survivor per group without materializing all pairs."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fordgobike_data_pipeline_spark.operators import dedup, similarity, text  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

MIN_TASKS = 8  # stages below this can't exhibit partition skew
MIN_MEDIAN_MS = 100  # ignore scheduler-noise stages


def replicate(df, id_col, n):
    copies = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000)) for i in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


RESULTS: list[dict] = []


def timed(spark, name, df):
    sc = spark.sparkContext
    sc.setJobGroup(name, name)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sc.setLocalProperty("spark.jobGroup.id", None)
    print(f"  {name:<24} {wall:>7.2f}s")
    RESULTS.append({"op": name, "wall_sec": round(wall, 3)})


def parse_event_log(evdir: str) -> None:
    """Attach per-op task-skew stats to RESULTS from the event log."""
    # Spark 4 event logs are rolling DIRECTORIES (eventlog_v2_<appid>/
    # containing events_* parts); walk everything that looks like a line
    # file and skip markers/crcs
    files = []
    for root, _dirs, names in os.walk(evdir):
        for f in names:
            if f.startswith(".") or f.endswith(".crc") or f.startswith("appstatus"):
                continue
            files.append(os.path.join(root, f))
    stage_group: dict[int, str] = {}
    stage_tasks: dict[int, list[float]] = {}
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    group = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    if group:
                        for si in ev.get("Stage Infos", []):
                            stage_group[si["Stage ID"]] = group
                elif kind == "SparkListenerTaskEnd":
                    metrics = ev.get("Task Metrics") or {}
                    run_ms = metrics.get("Executor Run Time")
                    if run_ms is not None:
                        stage_tasks.setdefault(ev["Stage ID"], []).append(float(run_ms))
    by_op: dict[str, list[dict]] = {}
    for sid, times in stage_tasks.items():
        op = stage_group.get(sid)
        if op is None or len(times) < MIN_TASKS:
            continue
        times.sort()
        med = times[len(times) // 2]
        if med < MIN_MEDIAN_MS:
            continue
        by_op.setdefault(op, []).append(
            {
                "stage": sid,
                "tasks": len(times),
                "median_ms": round(med, 1),
                "max_ms": round(times[-1], 1),
                "skew": round(times[-1] / med, 2) if med else None,
            }
        )
    for rec in RESULTS:
        stages = by_op.get(rec["op"], [])
        if stages:
            worst = max(stages, key=lambda s: s["skew"])
            rec["n_stages_measured"] = len(stages)
            rec["worst_skew"] = worst["skew"]
            rec["worst_stage"] = worst
        else:
            rec["n_stages_measured"] = 0
            rec["worst_skew"] = None


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    evdir = tempfile.mkdtemp(prefix="stress_evlog_")
    spark = get_spark(
        app_name=f"scale-stress-{n}x",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            # plain single-file JSON lines so parse_event_log can read it
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = replicate(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text"),
        "doc_id",
        n,
    )
    emb = replicate(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding"),
        "vec_id",
        n,
    )
    n_docs, n_vecs = docs.count(), emb.count()
    print(f"stress at {n}x sf0.1: {n_docs} docs, {n_vecs} vectors")
    timed(spark, "exact_dedup", dedup.exact_dedup(docs, ["text"]))
    timed(spark, "minhash_lsh_pairs", dedup.minhash_lsh_pairs(docs, threshold=0.8))
    timed(spark, "simhash_pairs", dedup.simhash_pairs(docs, max_hamming=3))
    timed(spark, "winnow(xxhash64)", text.winnowing_fingerprints(docs))
    timed(spark, "tfidf_top_terms", text.tf_idf_top_terms(docs))
    timed(
        spark,
        "cosine_pairs_lsh",
        similarity.cosine_pairs_lsh(emb, threshold=0.9, n_planes=10),
    )
    queries = emb.filter(F.col("vec_id") < 5)
    timed(
        spark,
        "lsh_ann_topk(mp=1)",
        similarity.lsh_ann_topk(emb, queries, n_planes=8, multiprobe=1),
    )
    # round-3 operators
    from fordgobike_data_pipeline_spark.operators import curation  # noqa: E402

    sh = dedup.token_shingles(docs, k=3)
    timed(
        spark,
        "containment_pairs",
        dedup.containment_pairs(sh, threshold=0.9, max_shingle_freq=50 * n),
    )
    timed(spark, "top_ngrams", text.top_ngrams(docs, n=2, k=20))
    timed(
        spark,
        "semantic_dedup_pairs",
        similarity.semantic_dedup_pairs(emb, threshold=0.95, centroid_mod=200),
    )
    timed(
        spark,
        "chunk_documents",
        curation.chunk_documents(docs, chunk_tokens=128, stride=64),
    )
    # scale B with the corpus (constant per-bucket size) — the sizing
    # rule negative_samples documents; fixed B goes quadratic
    timed(
        spark,
        "negative_samples",
        curation.negative_samples(docs, k=4, n_buckets=256 * n),
    )
    # round-4 operators: span dedup is Θ(tokens) whatever the dup rate
    # (replication multiplies FLAGGED tokens, not candidate pairs); PQ
    # encode is one einsum pass; ADC joins 8-byte codes against a
    # bounded LUT; URL dedup is one hash agg
    timed(spark, "dup_span_stats", dedup.duplicated_span_stats(docs, k=5))
    timed(spark, "remove_dup_spans", dedup.remove_duplicated_spans(docs, k=5))
    cb = similarity.pq_codebooks(emb, dim=64, n_subspaces=4, seed_mod=40 * n, n_iter=1)
    timed(spark, "pq_encode(einsum)", similarity.pq_encode(emb, cb, dim=64))
    codes = similarity.pq_encode(emb, cb, dim=64).localCheckpoint(eager=True)
    timed(spark, "pq_adc_topk", similarity.pq_adc_topk(codes, queries, cb, k=10, dim=64))
    with_url = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://www.site"), (F.col("doc_id") % 1000).cast("string"),
            F.lit(".example.com/p/"), (F.col("doc_id") % 5000).cast("string"),
            F.lit("?utm_source=x&id=1"),
        ).alias("url"),
    )
    timed(spark, "url_dedup", curation.url_dedup(with_url))
    timed(spark, "bigram_cross_entropy", text.bigram_cross_entropy(docs))
    timed(spark, "gopher_quality_flags", text.gopher_quality_flags(docs))

    # round-5 operators: the kNN graph is the all-nodes bucket join
    # (work ∝ Σ bucket²; replication multiplies bucket sizes, the knob
    # n_planes counters); MaxSim multiplies rows n_sub×, never pairs;
    # PageRank cost is edges × iterations; global_row_index is two
    # bounded passes whatever N
    from fordgobike_data_pipeline_spark.operators import (  # noqa: E402
        graph,
        retrieval,
        warehouse,
    )

    timed(spark, "knn_graph(k=5,p=8)", retrieval.knn_graph(emb, k=5, n_planes=8))
    timed(spark, "maxsim_topk", retrieval.maxsim_topk(emb, queries, k=10))
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    # offset BOTH id spaces per copy so replication yields n disjoint
    # subgraphs (node and edge count both scale n×)
    copies = [
        li.select(
            (F.col("l_partkey") + F.lit(i * 10_000_000)).alias("p"),
            (F.col("l_suppkey") + F.lit(i * 10_000_000)).alias("s"),
        )
        for i in range(n)
    ]
    pairs = copies[0]
    for c in copies[1:]:
        pairs = pairs.unionByName(c)
    pairs = pairs.distinct()
    fwd = pairs.select(
        F.concat(F.lit("p"), F.col("p").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("s").cast("string")).alias("dst"),
    )
    rev = pairs.select(
        F.concat(F.lit("s"), F.col("s").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("p").cast("string")).alias("dst"),
    )
    timed(spark, "pagerank(3 iter)", graph.pagerank(fwd.unionByName(rev), 3))
    timed(spark, "global_row_index", warehouse.global_row_index(docs, ["doc_id"]))

    # round-5 third-session operators: triangle counting's wedge join is
    # Σ outdeg² under the degree orientation (disjoint-subgraph
    # replication scales edges n×, wedges n×); basket pair counts cost
    # Σ basket² (basket SIZE is replication-invariant here — only the
    # basket COUNT grows); the count-min build is a fixed d×w grid
    # whatever N; cohort retention is two aggs + one |users|-keyed join
    from fordgobike_data_pipeline_spark.operators import analytics  # noqa: E402
    from fordgobike_data_pipeline_spark.operators import sketches  # noqa: E402

    li_ord = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    bcopies = [
        li_ord.select(
            (F.col("l_orderkey") + F.lit(i * 10_000_000)).alias("bk"),
            (F.col("l_partkey") + F.lit(i * 10_000_000)).alias("it"),
        )
        for i in range(n)
    ]
    baskets = bcopies[0]
    for c in bcopies[1:]:
        baskets = baskets.unionByName(c)
    x = baskets.select("bk", F.col("it").alias("a"))
    y = baskets.select("bk", F.col("it").alias("b"))
    copurchase = x.join(y, "bk").filter(F.col("a") < F.col("b")).select("a", "b")
    timed(spark, "triangle_count", graph.triangle_count(copurchase, "a", "b"))
    timed(
        spark,
        "assoc_rules",
        analytics.association_rules(baskets, "bk", "it", min_pair_count=3, k=25),
    )
    tok = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    timed(spark, "count_min_build", sketches.count_min_build(tok, depth=4, width=256))
    from fordgobike_data_pipeline_spark.io import load_tables  # noqa: E402

    # events.ts is parquet TIMESTAMP(NANOS) — load_tables normalizes it
    ev = load_tables(spark, SF_DIR, ("events",))["events"].select(
        "event_id", "ts", "user_id"
    )
    ecopies = [
        ev.select(
            (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
        )
        for i in range(n)
    ]
    events = ecopies[0]
    for c in ecopies[1:]:
        events = events.unionByName(c)
    timed(spark, "cohort_retention", analytics.cohort_retention(events))

    # round-6 operators: k-core peel and local clustering coefficient
    # share the degree-oriented machinery (wedge work Σ outdeg²,
    # disjoint-subgraph replication scales it n×); the prefix-filtered
    # set-similarity join's candidate mass tracks the TRUE near-dup
    # pairs (cross-copy duplicates), like the other exact pairwise
    # metrics; nearest-centroid is one scan + |labels| broadcast rows
    timed(spark, "kcore_peel(k=3,3it)", graph.kcore_peel(copurchase, k=3, iterations=3))
    timed(
        spark,
        "clustering_coeff(top20)",
        graph.local_clustering_coefficient(copurchase, top_n=20),
    )
    # setsim_join_prefix is NOT stressed here: on the replicated corpus
    # every doc has n−1 exact copies, so its TRUE pair mass is
    # Θ(docs·n²·template-neighbors) ≈ 100M rows at 10× — the same
    # output-mass blowup the module docstring documents for
    # containment_pairs/exact_jaccard; the sketch paths are the scale
    # route and are measured above.
    emb_lbl = replicate(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), "vec_id", n
    )
    timed(
        spark,
        "nearest_centroid_eval",
        similarity.nearest_centroid_eval(emb_lbl),
    )

    # round-6 session-2 operators ------------------------------------
    # TPC-H plan shapes on n-replicated lineitem: Q1 is the pure
    # scan+partial-agg ceiling (6 groups regardless of n); Q18's
    # HAVING-filtered per-order sums grow the shuffle n-fold but the
    # qualifying set stays sparse.
    li_full = replicate(
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet"), "l_orderkey", n
    )
    q1_agg = li_full.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rc"),
        F.count(F.lit(1)).alias("cnt"),
    )
    timed(spark, "tpch_q1_shape", q1_agg)
    big = (
        li_full.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sq"))
        .filter(F.col("sq") > 300)
    )
    timed(spark, "tpch_q18_having", big)

    # interval concurrency: the sweep partitions by DAY, so n-fold
    # event replication grows each per-day partition n-fold while the
    # partition COUNT stays at the day span — the documented pinch
    # (partitions ∝ days); re-keying the sweep by (day, hour) is the
    # scale lever when day-partitions outgrow executors.
    from fordgobike_data_pipeline_spark.operators import sessions as sess_ops  # noqa: E402

    sess = sess_ops.session_windows(
        events.withColumn("value", F.lit(0.0)), gap_seconds=1800
    ).select("session_start", "session_end")
    timed(spark, "concurrency_by_day", sess_ops.concurrency_by_day(sess))

    # graph-level metrics on the n-replicated co-purchase edges:
    # disjoint copies scale |E| n-fold; both are one labeled-edge scan
    # over exact-integer moments after the shared edge build.
    bi = copurchase.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        copurchase.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = bi.groupBy(F.col("src").alias("nn")).agg(F.count(F.lit(1)).alias("d"))
    xy = (
        bi.join(deg.select(F.col("nn").alias("ns"), F.col("d").alias("x")), F.col("src") == F.col("ns"))
        .join(deg.select(F.col("nn").alias("nd"), F.col("d").alias("y")), F.col("dst") == F.col("nd"))
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    timed(spark, "assortativity_moments", xy)

    # decision stump: candidate thresholds are DISTINCT cents, bounded
    # by the value domain — near-flat in n by construction.
    evv_n = replicate(
        load_tables(spark, SF_DIR, ("events",))["events"].select(
            "event_id", "event_type", "value"
        ),
        "event_id",
        n,
    )
    cand = evv_n.groupBy(F.round(F.col("value") * 100).cast("long").alias("x")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("pos"),
    )
    timed(spark, "stump_candidates", cand)

    spark.stop()  # flush the event log
    parse_event_log(evdir)
    skews = [r["worst_skew"] for r in RESULTS if r["worst_skew"] is not None]
    print(f"worst task skew across measured stages: {max(skews) if skews else None}")
    out_path = os.environ.get("SCALE_STRESS_JSON")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {"replication": n, "n_docs": n_docs, "n_vecs": n_vecs, "ops": RESULTS},
                f,
                indent=1,
            )
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
