"""Scaling exponents for the COMPOSED pipelines (VERDICT r7 item 7).

`scale_stress.py` measures individual operators under replication;
this tool measures the worst ABSOLUTE composed queries —
q_clean_corpus, q_triangle_count, q_stream_session, and (r9)
q_decontaminate_near, q_dedup_incr_near — end-to-end at
1× and N× (default 10× = sf1-equivalent) by materializing replicated
copies of the sf0.1 tables into temp sf-dirs and calling the exact
harness entry points on them. Replication offsets every id space per
copy (documents get cross-copy exact/near duplicates — the dedup
worst case; lineitem orders form disjoint co-purchase subgraphs;
events keep their time span with n-fold per-user density).

Reports wall times and the scaling exponent
    e = log(T_N / T_1) / log(N)
(e = 1 is perfectly linear; the SCALE.md acceptance bar is ≤ ~1.2).

    SCALE_STRESS_JSON=/tmp/composed.json python tools/composed_stress.py 10
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fordgobike_data_pipeline_spark.io import load_tables  # noqa: E402
from fordgobike_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_sf(
    spark, n: int, root: str, fixed_src0: bool = False, perturb_emb: bool = False
) -> str:
    """Materialize an n-replicated copy of the tables the composed
    queries read (documents, lineitem, events, embeddings).

    ``fixed_src0``: keep ONLY copy 0's src0 document rows — the
    replication shape for the decontamination/incremental-probe
    queries, whose src0 side is a FIXED benchmark/archive in
    production. Replicating src0 along with the corpus would make the
    corpus×bench match set itself grow ~n² (every corpus replica
    near-matches every bench replica), measuring output growth rather
    than operator scaling; with src0 fixed, matches grow linearly with
    the corpus — exactly the operator's O(batch) claim.

    ``perturb_emb``: BOUNDED-CLUSTER embedding replication — the
    vector-space analogue of the documents' per-copy text mutation,
    for the SemDeDup queries. Verbatim embedding replication makes
    every cross-copy pair a genuine cosine-1.0 duplicate, so the TRUE
    near-dup pair set grows ~n² by construction (the r10 SCALE.md †
    artifact). Instead, copy i applies the Walsh sign pattern
    s_j = (−1)^popcount(i & j) per dimension j — an exact isometry
    (reflection), so each copy's INTERNAL pair geometry (norms, all
    within-copy cosines, cluster structure) is bit-identical to copy
    0's, while any two copies' patterns differ in exactly half the
    dimensions, scrambling cross-copy cosines to ≈ 0 (far below the
    dedup threshold). Duplicate-cluster sizes therefore stay at their
    1× values — the production assumption every SemDeDup deployment
    makes — and the measured exponent reflects plan scaling, not
    planted output mass."""
    sfx = ("_fb" if fixed_src0 else "") + ("_pe" if perturb_emb else "")
    out = os.path.join(root, f"x{n}{sfx}")
    os.makedirs(out, exist_ok=True)

    def rep(df, offsets: dict[str, int]):
        copies = []
        for i in range(n):
            c = df
            for col, step in offsets.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * step))
            copies.append(c)
        u = copies[0]
        for c in copies[1:]:
            u = u.unionByName(c)
        return u

    # documents: mutate the text per copy (append a copy-marker token)
    # so exact dedup does NOT collapse the replicas — every copy
    # survives to near-dedup as a cross-copy NEAR-duplicate (k-shingle
    # Jaccard stays >= threshold), which is the honest worst case: the
    # near-dup pair graph grows with n, not just the scan
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dcopies = []
    for i in range(n):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if i > 0:
            if fixed_src0:
                c = c.filter(F.col("source") != "src0")
            c = c.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" rev{i} rev{i} rev{i}"))
            )
        dcopies.append(c)
    du = dcopies[0]
    for c in dcopies[1:]:
        du = du.unionByName(c)
    du.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    rep(cust, {"c_custkey": 10_000_000}).write.mode("overwrite").parquet(
        os.path.join(out, "customer.parquet")
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    rep(li, {"l_orderkey": 10_000_000, "l_partkey": 10_000_000}).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "lineitem.parquet"))
    ev = load_tables(spark, SF_DIR, ("events",))["events"]
    rep(ev, {"event_id": 100_000_000, "user_id": 10_000_000}).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "events.parquet"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if perturb_emb:
        dim = len(emb.select("embedding").first()["embedding"])
        ecopies = []
        for i in range(n):
            c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            if i > 0:
                signs = F.array(
                    *[
                        F.lit(float(1 - 2 * (bin(i & j).count("1") % 2)))
                        for j in range(dim)
                    ]
                )
                c = c.withColumn(
                    "embedding",
                    F.zip_with(
                        F.col("embedding"), signs, lambda x, s: x * s
                    ).cast("array<float>"),
                )
            ecopies.append(c)
        eu = ecopies[0]
        for c in ecopies[1:]:
            eu = eu.unionByName(c)
        eu.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    else:
        rep(emb, {"vec_id": 10_000_000}).write.mode("overwrite").parquet(
            os.path.join(out, "embeddings.parquet")
        )
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name=f"composed-stress-{n}x")
    spark.sparkContext.setLogLevel("ERROR")

    from fordgobike_data_pipeline_spark import harness

    queries = harness.all_queries()
    # default = the five worst absolute composed queries (r8 three +
    # the r9 additions per VERDICT item 6); argv[2:] overrides.
    targets = sys.argv[2:] or [
        "q_clean_corpus",
        "q_triangle_count",
        "q_stream_session",
        "q_decontaminate_near",
        "q_dedup_incr_near",
    ]

    # queries whose src0 side is a fixed benchmark/archive in
    # production get the fixed-src0 replication (see build_sf);
    # SemDeDup queries get bounded-cluster embedding replication
    # (perturb_emb — verbatim replicas make the TRUE pair set
    # quadratic, which measures output mass, not plan scaling)
    # q_contam_overlap joined r12: its src0 side IS the fixed eval
    # suite, so replicating it with the corpus would measure n²
    # bench×corpus match growth, not the operator's O(corpus) claim
    fixed_src0 = {"q_decontaminate_near", "q_dedup_incr_near", "q_contam_overlap"}
    perturb_emb = {"q_semantic_keep", "q_semantic_dedup"}

    root = tempfile.mkdtemp(prefix="composed_stress_")
    results: dict[str, dict] = {name: {} for name in targets}
    try:
        shapes = sorted({(t in fixed_src0, t in perturb_emb) for t in targets})
        for fb, pe in shapes:
            grp = [
                t
                for t in targets
                if (t in fixed_src0) == fb and (t in perturb_emb) == pe
            ]
            warm = build_sf(
                spark, 1, os.path.join(root, "warm"), fixed_src0=fb, perturb_emb=pe
            )
            for name in grp:  # absorb JVM/codegen startup before timing
                queries[name](spark, warm).write.format("noop").mode(
                    "overwrite"
                ).save()
            for scale in (1, n):
                sf_dir = build_sf(
                    spark, scale, root, fixed_src0=fb, perturb_emb=pe
                )
                for name in grp:
                    spark.catalog.clearCache()
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.perf_counter()
                    queries[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    wall = round(time.perf_counter() - t0, 3)
                    results[name][f"x{scale}"] = wall
                    print(f"  {name:<20} x{scale:<3} {wall:>8.2f}s", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    payload = {"sf_dir": SF_DIR, "replication": n, "queries": {}}
    for name, r in results.items():
        t1, tn = r.get("x1"), r.get(f"x{n}")
        exp = round(math.log(tn / t1) / math.log(n), 3) if t1 and tn else None
        payload["queries"][name] = {**r, "exponent": exp}
        print(f"{name}: x1={t1}s x{n}={tn}s exponent={exp}")
    out_path = os.environ.get("SCALE_STRESS_JSON")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
