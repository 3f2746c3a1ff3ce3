"""One-off sf1-equivalent spot-bench at two core counts (VERDICT r12 #7).

sf0.1 is overhead-bound: every scaling ratio in the driver's 32-vs-8-core
block is ~1 because per-key walls are 0.2-7s of JVM/planning/fixed shuffle
cost, so the at-scale value of the r12/r13 plan restructurings rested on
plan shape alone. This tool converts those claims to measurements: it
replicates sf0.1 tenfold (= sf1-equivalent, the same replication shapes
as tools/composed_stress.py — per-copy text mutation so dedup does not
collapse copies; fixed src0 for the fixed-benchmark probes), then times
the slowest keys in TWO separate JVMs (local[32] and local[8]) on the
SAME materialized replica dirs.

Usage:
  python tools/sf1_spot_bench.py build      # materialize replicas, print dirs
  python tools/sf1_spot_bench.py run <cpus> <out.json> <plain_dir> <fb_dir>
  python tools/sf1_spot_bench.py merge <out32.json> <out8.json> <final.json>

A parallel-efficiency ratio (t_8c / t_32c) near 4 means the key's work is
CPU-bound and fully parallel; near 1 means fixed-cost-bound even at sf1.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, os.environ.get("PYTHONPATH")) if p
)

# the slowest families at r13 close (full-census ranking), one key per
# distinct plan shape; fixed-src0 keys probe a fixed benchmark/archive
KEYS_PLAIN = [
    "q_clean_corpus",
    "q_triangle_count",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_winnow_fingerprint",
    "q_pagerank",
    "q_stream_session",
    "q_stream_window",
    "q_stream_stateful",
    "q_power_iteration",
    "q_bootstrap_ci",
    "q_bfs_hops",
]
KEYS_FB = ["q_decontaminate_near", "q_dedup_incr_near"]
N = 10
RUNS = 2


def cmd_build() -> int:
    from fordgobike_data_pipeline_spark.session import get_spark
    from tools.composed_stress import build_sf

    spark = get_spark(app_name="sf1-build")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.environ.get("SF1_ROOT", "/tmp/sf1_spot")
    os.makedirs(root, exist_ok=True)
    plain = build_sf(spark, N, root)
    fb = build_sf(spark, N, root, fixed_src0=True)
    print(json.dumps({"plain": plain, "fb": fb}))
    return 0


def cmd_run(cpus: int, out_path: str, plain_dir: str, fb_dir: str) -> int:
    # EXACTLY the bench's session conf (get_spark honours
    # SPARK_GRAFT_CPUS for the master, shuffle partitions stay at the
    # repo's scale-aware default with AQE coalescing) — an earlier
    # variant of this tool used shuffle.partitions = 4*cpus and showed
    # 32c LOSING to 8c on the fixpoint-heavy keys purely from
    # near-empty-task scheduling; the comparison is only meaningful
    # under the conf the driver actually benches with.
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from fordgobike_data_pipeline_spark import harness
    from fordgobike_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"sf1-spot-{cpus}c")
    spark.sparkContext.setLogLevel("ERROR")
    queries = harness.all_queries()
    # warmup: absorb JVM/codegen startup on the small SF before timing
    queries["q_agg_daily_summary"](spark, "/root/testdata/sf0.1").write.format(
        "noop"
    ).mode("overwrite").save()
    result: dict[str, float] = {}
    for name, sf_dir in [(k, plain_dir) for k in KEYS_PLAIN] + [
        (k, fb_dir) for k in KEYS_FB
    ]:
        best = None
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"sf1-{cpus}c: {name}")
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        result[name] = round(best, 3)
        print(f"{name} @ {cpus}c: {best:.2f}s", flush=True)
    with open(out_path, "w") as f:
        json.dump({"cpus": cpus, "sf": "1.0-equivalent (10x sf0.1)", "queries": result}, f, indent=1)
    return 0


def cmd_merge(p32: str, p8: str, out: str) -> int:
    a = json.load(open(p32))
    b = json.load(open(p8))
    rows = {}
    for k in a["queries"]:
        t32, t8 = a["queries"][k], b["queries"].get(k)
        rows[k] = {
            "wall_32c": t32,
            "wall_8c": t8,
            "ratio_8c_over_32c": round(t8 / t32, 2) if t8 and t32 else None,
        }
    doc = {
        "what": "sf1-equivalent (10x replicated sf0.1) spot-bench, best-of-%d, "
        "two separate JVMs on identical replica dirs" % RUNS,
        "replication": "tools/composed_stress.build_sf shapes (per-copy text "
        "mutation; fixed src0 for the fixed-benchmark probes)",
        "reading": "ratio ~4 = CPU-bound and parallel; ~1 = fixed-cost-bound",
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))
    return 0


if __name__ == "__main__":
    if sys.argv[1] == "build":
        raise SystemExit(cmd_build())
    if sys.argv[1] == "run":
        raise SystemExit(cmd_run(int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]))
    if sys.argv[1] == "merge":
        raise SystemExit(cmd_merge(sys.argv[2], sys.argv[3], sys.argv[4]))
    raise SystemExit(f"unknown subcommand {sys.argv[1]!r}")
