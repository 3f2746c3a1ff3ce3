"""Units for governance (GDPR purge/audit, PII census) and the
node-level graph probes (local clustering coefficient, k-core peel)
on hand-checkable inputs; oracle parity is covered by the harness
queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fordgobike_data_pipeline_spark.operators import governance, graph


def test_gdpr_purge_and_audit_agree(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (1, "b"), (4, "b")], "uid LONG, grp STRING"
    )
    subjects = spark.createDataFrame([(1,)], "uid LONG")
    purged = governance.gdpr_purge(df, subjects, "uid")
    assert purged.count() == 3
    assert purged.filter(F.col("uid") == 1).count() == 0
    audit = {
        r["grp"]: r
        for r in governance.gdpr_delete_audit(df, subjects, "uid", "grp").collect()
    }
    assert audit["a"]["rows_deleted"] == 1 and audit["a"]["rows_after"] == 1
    assert audit["b"]["rows_deleted"] == 1 and audit["b"]["rows_after"] == 2
    assert audit["b"]["deleted_frac"] == round(1 / 3, 9)


def test_pii_census_detects_each_kind(spark):
    docs = spark.createDataFrame(
        [
            ("s1", "mail me at a.b@example.org please"),
            ("s1", "server 10.0.0.1 is down"),
            ("s1", "call +1 415 555 0100 now"),
            ("s1", "nothing sensitive here"),
            ("s2", "clean"),
        ],
        "source STRING, text STRING",
    )
    out = {r["source"]: r for r in governance.pii_census(docs).collect()}
    s1 = out["s1"]
    assert (s1["n_email"], s1["n_ip"], s1["n_phone"]) == (1, 1, 1)
    assert s1["pii_frac"] == 0.75
    assert out["s2"]["pii_frac"] == 0.0


def test_lcc_triangle_plus_tail(spark):
    # K3 (1,2,3) plus a tail 3-4: node 3 has degree 3, one triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a LONG, b LONG"
    )
    out = {r["node"]: r for r in graph.local_clustering_coefficient(edges, top_n=4).collect()}
    assert out[3]["degree"] == 3 and out[3]["n_triangles"] == 1
    assert out[3]["lcc"] == round(2 * 1 / (3 * 2), 9)
    assert out[1]["lcc"] == 1.0 and out[2]["lcc"] == 1.0
    assert out[4]["n_triangles"] == 0


def test_kcore_peels_tail_keeps_clique(spark):
    # K4 core (1-4) with pendant chain 4-5, 5-6
    k4 = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5), (5, 6)], "a LONG, b LONG")
    rows = {r["iter"]: r for r in graph.kcore_peel(edges, k=3, iterations=3).collect()}
    # round 1 drops 6 (deg 1); round 2 drops 5 (deg 1 after); K4 stable
    assert rows[2]["n_nodes"] == 4 and rows[2]["n_edges"] == 6
    assert rows[3]["n_nodes"] == 4 and rows[3]["n_edges"] == 6  # converged
