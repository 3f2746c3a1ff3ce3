"""Harness entries for the governance operators
(operators/governance.py: GDPR erasure propagation, PII census) and
the node-level graph probes (operators/graph.py
local_clustering_coefficient, kcore_peel) — each with a DuckDB
oracle twin.

Graph queries run on the co-purchase graph (parts linked by a shared
order) restricted to a deterministic quarter of orders
(``l_orderkey % 4 = 0``) so the per-node triangle enumeration stays
benchable; the restriction is part of the query contract, mirrored in
the oracle. The PII census injects deterministic synthetic contact
strings (the corpus has no real PII), same pattern as q_pii_redact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .harness import query
from .io import load_tables
from .operators import governance, graph

_COPURCHASE_SQL = """
    op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem WHERE l_orderkey % 4 = 0
    ),
    pr AS (
        SELECT x.p AS a, y.p AS b FROM op x JOIN op y
        ON x.o = y.o AND x.p < y.p
    ),
    e AS (
        SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
        FROM pr WHERE a <> b
    )
"""


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collect_set + in-array combinations (graph.order_part_pairs):
    # one shuffle instead of distinct + self-join — same pair multiset
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return graph.order_part_pairs(li.filter(F.col("l_orderkey") % 4 == 0)).select(
        F.col("p").alias("a"), F.col("q").alias("b")
    )


@query(
    "q_gdpr_delete",
    """
    WITH m AS (
        SELECT event_type,
               CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END AS del
        FROM events
    )
    SELECT event_type, count(*) AS rows_before,
           CAST(sum(del) AS BIGINT) AS rows_deleted,
           CAST(count(*) - sum(del) AS BIGINT) AS rows_after,
           round(CAST(sum(del) AS DOUBLE) / count(*), 9) AS deleted_frac
    FROM m GROUP BY event_type
    """,
)
def q_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation audit
    (governance.gdpr_delete_audit): subjects = every user with
    user_id % 97 == 0 (the synthetic erasure batch), audited per
    event_type — one broadcast mark join + one groupBy, the events
    table scanned once. gdpr_purge (the anti-join itself) is
    unit-tested; this emits the evidence trail."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    subjects = (
        events.select("user_id").distinct().filter(F.col("user_id") % 97 == 0)
    )
    audit = governance.gdpr_delete_audit(events, subjects, "user_id", "event_type")
    return audit.select(
        "event_type",
        "rows_before",
        "rows_deleted",
        "rows_after",
        "deleted_frac",
    )


@query(
    "q_pii_census",
    r"""
    WITH raw AS (
        SELECT source,
               text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact bob@example.com' ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' from 192.168.1.1' ELSE '' END
               || CASE WHEN doc_id % 13 = 0
                       THEN ' tel +1 415 555 0100' ELSE '' END AS t
        FROM documents
    ),
    f AS (
        SELECT source,
               CASE WHEN regexp_matches(t,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                    THEN 1 ELSE 0 END AS he,
               CASE WHEN regexp_matches(t,
                    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')
                    THEN 1 ELSE 0 END AS hi,
               CASE WHEN regexp_matches(t, '\+\d[\d -]{7,}\d')
                    THEN 1 ELSE 0 END AS hp
        FROM raw
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(he) AS BIGINT) AS n_email,
           CAST(sum(hi) AS BIGINT) AS n_ip,
           CAST(sum(hp) AS BIGINT) AS n_phone,
           round(CAST(sum(CASE WHEN he + hi + hp > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 9) AS pii_frac
    FROM f GROUP BY source
    """,
)
def q_pii_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-exposure census per source (governance.pii_census): email /
    IPv4 / phone detection with the same patterns pii_redact masks,
    over text with deterministic synthetic contact strings injected
    into id-keyed subsets — three codegen rlike probes in one scan."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" contact bob@example.com")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" from 192.168.1.1")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" tel +1 415 555 0100")).otherwise(F.lit("")),
    )
    return governance.pii_census(
        docs.select("source", t.alias("text")), "text", "source"
    )


@query(
    "q_clustering_coeff",
    f"""
    WITH {_COPURCHASE_SQL},
    deg AS (
        SELECT n, count(*) AS d FROM (
            SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e
        ) GROUP BY n
    ),
    keyed AS (
        SELECT u, v, du.d AS du, dv.d AS dv
        FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v
    ),
    o AS (
        SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS src,
               CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS dst
        FROM keyed
    ),
    w AS (
        SELECT o1.src, o1.dst AS x, o2.dst AS y
        FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.dst < o2.dst
    ),
    cl AS (SELECT least(src, dst) AS x, greatest(src, dst) AS y FROM o),
    tri AS (SELECT w.src, w.x, w.y FROM w JOIN cl ON w.x = cl.x AND w.y = cl.y),
    tpn AS (
        SELECT n, count(*) AS tri FROM (
            SELECT src AS n FROM tri
            UNION ALL SELECT x AS n FROM tri
            UNION ALL SELECT y AS n FROM tri
        ) GROUP BY n
    ),
    top AS (
        SELECT n, d FROM (
            SELECT n, d, row_number() OVER (ORDER BY d DESC, n) AS rk FROM deg
        ) WHERE rk <= 20
    )
    SELECT top.n AS node, d AS degree, COALESCE(tri, 0) AS n_triangles,
           round(CASE WHEN d > 1
                      THEN CAST(2 * COALESCE(tri, 0) AS DOUBLE)
                           / CAST(d * (d - 1) AS DOUBLE)
                      ELSE 0.0 END, 9) AS lcc
    FROM top LEFT JOIN tpn ON tpn.n = top.n
    """,
)
def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient of the 20 highest-degree parts in
    the (quarter-sampled) co-purchase graph
    (graph.local_clustering_coefficient): per-node triangle counts
    from the degree-ordered orientation — each triangle enumerated
    once and exploded to its three corners, no neighborhood
    materialization; lcc = 2·tri/(d·(d−1)) as one division."""
    pairs = _copurchase_pairs(spark, sf_dir)
    return graph.local_clustering_coefficient(pairs, top_n=20)


@query(
    "q_kcore",
    f"""
    WITH {_COPURCHASE_SQL},
    d1 AS (
        SELECT n, count(*) AS d FROM (
            SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e
        ) GROUP BY n
    ),
    k1 AS (SELECT n FROM d1 WHERE d >= 3),
    e1 AS (
        SELECT u, v FROM e
        WHERE u IN (SELECT n FROM k1) AND v IN (SELECT n FROM k1)
    ),
    d2 AS (
        SELECT n, count(*) AS d FROM (
            SELECT u AS n FROM e1 UNION ALL SELECT v AS n FROM e1
        ) GROUP BY n
    ),
    k2 AS (SELECT n FROM d2 WHERE d >= 3),
    e2 AS (
        SELECT u, v FROM e1
        WHERE u IN (SELECT n FROM k2) AND v IN (SELECT n FROM k2)
    ),
    d3 AS (
        SELECT n, count(*) AS d FROM (
            SELECT u AS n FROM e2 UNION ALL SELECT v AS n FROM e2
        ) GROUP BY n
    ),
    k3 AS (SELECT n FROM d3 WHERE d >= 3),
    e3 AS (
        SELECT u, v FROM e2
        WHERE u IN (SELECT n FROM k3) AND v IN (SELECT n FROM k3)
    )
    SELECT CAST(1 AS INT) AS iter,
           count(DISTINCT n) AS n_nodes, CAST(count(*) / 2 AS BIGINT) AS n_edges
    FROM (SELECT u AS n FROM e1 UNION ALL SELECT v AS n FROM e1)
    UNION ALL
    SELECT CAST(2 AS INT),
           count(DISTINCT n), CAST(count(*) / 2 AS BIGINT)
    FROM (SELECT u AS n FROM e2 UNION ALL SELECT v AS n FROM e2)
    UNION ALL
    SELECT CAST(3 AS INT),
           count(DISTINCT n), CAST(count(*) / 2 AS BIGINT)
    FROM (SELECT u AS n FROM e3 UNION ALL SELECT v AS n FROM e3)
    """,
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 3-core peel over the (quarter-sampled) co-purchase
    graph (graph.kcore_peel): three rounds of drop-degree-<3 nodes,
    per-round (n_nodes, n_edges) evidence — a converged tail (equal
    consecutive rows) means the true 3-core was reached."""
    pairs = _copurchase_pairs(spark, sf_dir)
    return graph.kcore_peel(pairs, k=3, iterations=3)


@query(
    "q_random_walks",
    f"""
    WITH {_COPURCHASE_SQL},
    und AS (
        SELECT u AS src, v AS dst FROM e
        UNION ALL SELECT v, u FROM e
    ),
    seeds AS (
        SELECT node AS seed FROM (
            SELECT DISTINCT src AS node FROM und
        ) ORDER BY node LIMIT 5
    ),
    s0 AS (SELECT seed, seed AS cur FROM seeds),
    s1 AS (
        SELECT seed,
               min(struct_pack(h := CAST(CAST(from_hex(substr(md5(
                   CAST(cur AS VARCHAR) || '|1|' || CAST(dst AS VARCHAR)
                   ), 1, 16)) AS BIT) AS BIGINT), m := dst)).m AS cur
        FROM s0 JOIN und ON und.src = s0.cur GROUP BY seed
    ),
    s2 AS (
        SELECT seed,
               min(struct_pack(h := CAST(CAST(from_hex(substr(md5(
                   CAST(cur AS VARCHAR) || '|2|' || CAST(dst AS VARCHAR)
                   ), 1, 16)) AS BIT) AS BIGINT), m := dst)).m AS cur
        FROM s1 JOIN und ON und.src = s1.cur GROUP BY seed
    ),
    s3 AS (
        SELECT seed,
               min(struct_pack(h := CAST(CAST(from_hex(substr(md5(
                   CAST(cur AS VARCHAR) || '|3|' || CAST(dst AS VARCHAR)
                   ), 1, 16)) AS BIT) AS BIGINT), m := dst)).m AS cur
        FROM s2 JOIN und ON und.src = s2.cur GROUP BY seed
    )
    SELECT seed, CAST(0 AS INT) AS step, seed AS node FROM seeds
    UNION ALL SELECT seed, CAST(1 AS INT), cur FROM s1
    UNION ALL SELECT seed, CAST(2 AS INT), cur FROM s2
    UNION ALL SELECT seed, CAST(3 AS INT), cur FROM s3
    """,
)
def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'random' walks (the DeepWalk/node2vec sampling
    primitive made hash-checkable): from 5 seed nodes, 3 steps where
    each step picks the neighbor minimizing the md5-parity hash of
    (current, step, neighbor) — uniform-ish, reproducible on any
    engine/partitioning, no RNG state. Each step is one
    join + argmin aggregate over the frontier (|seeds| rows) against
    the edge table — the walk batch a graph-embedding pipeline emits,
    scaled by seeds × steps, never by |V|."""
    pairs = _copurchase_pairs(spark, sf_dir)
    e = pairs.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    und = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).localCheckpoint()
    seeds = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(5)
        .select(F.col("node").alias("seed"))
    )
    out = seeds.select("seed", F.lit(0).cast("int").alias("step"), F.col("seed").alias("node"))
    cur = seeds.select("seed", F.col("seed").alias("cur"))
    for t in (1, 2, 3):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("cur").cast("string"),
                        F.lit(str(t)),
                        F.col("dst").cast("string"),
                    )
                ),
                1,
                16,
            ),
            16,
            -10,
        ).cast("long")
        nxt = (
            cur.join(und, cur.cur == und.src)
            .groupBy("seed")
            .agg(F.min(F.struct(h.alias("h"), F.col("dst").alias("m"))).alias("e"))
            .select("seed", F.col("e.m").alias("cur"))
            # deliberate NON-checkpoint: each step feeds two consumers
            # (output union + next frontier), but the re-executed
            # branches are 5-row broadcast probes against the CHECKPOINTED
            # edge table — interleaved A/B showed per-step localCheckpoint
            # LOSES (1.51s vs 1.28s; three blocking jobs cost more than
            # the cheap diamond recompute)
        )
        out = out.unionByName(
            nxt.select("seed", F.lit(t).cast("int").alias("step"), F.col("cur").alias("node"))
        )
        cur = nxt
    return out


@query(
    "q_bellman_ford",
    f"""
    WITH {_COPURCHASE_SQL},
    wed AS (
        SELECT u, v, 1 + (u + v) % 7 AS w FROM e
    ),
    und AS (
        SELECT u AS src, v AS dst, w FROM wed
        UNION ALL SELECT v, u, w FROM wed
    ),
    seeds AS (
        SELECT node AS seed FROM (
            SELECT DISTINCT src AS node FROM und
        ) ORDER BY node LIMIT 5
    ),
    d0 AS (SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist FROM seeds),
    r1 AS (
        SELECT seed, node, min(dist) AS dist FROM (
            SELECT seed, node, dist FROM d0
            UNION ALL
            SELECT d0.seed, und.dst AS node, d0.dist + und.w
            FROM d0 JOIN und ON und.src = d0.node
        ) GROUP BY seed, node
    ),
    r2 AS (
        SELECT seed, node, min(dist) AS dist FROM (
            SELECT seed, node, dist FROM r1
            UNION ALL
            SELECT r1.seed, und.dst AS node, r1.dist + und.w
            FROM r1 JOIN und ON und.src = r1.node
        ) GROUP BY seed, node
    ),
    r3 AS (
        SELECT seed, node, min(dist) AS dist FROM (
            SELECT seed, node, dist FROM r2
            UNION ALL
            SELECT r2.seed, und.dst AS node, r2.dist + und.w
            FROM r2 JOIN und ON und.src = r2.node
        ) GROUP BY seed, node
    )
    SELECT seed, count(*) AS n_reached,
           CAST(sum(dist) AS BIGINT) AS total_dist,
           max(dist) AS max_dist
    FROM r3 GROUP BY seed
    """,
)
def q_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths, 3 Bellman–Ford relaxation rounds from
    5 seeds over the co-purchase graph (deterministic synthetic edge
    weights 1+(u+v)%7 — the graph has no native weights): each round
    is one frontier⋈edges join plus a min-aggregate — the min-plus
    analogue of the BFS hop loop (q_bfs_hops), with integer distances
    so every min is exact. Emits per-seed reach/total/max distance
    (the 3-round ego-network cost profile)."""
    pairs = _copurchase_pairs(spark, sf_dir)
    e = pairs.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    wed = e.select("u", "v", (1 + (F.col("u") + F.col("v")) % 7).alias("w"))
    und = wed.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionAll(
        wed.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    ).localCheckpoint()
    seeds = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(5)
        .select(F.col("node").alias("seed"))
    )
    d = seeds.select(
        "seed", F.col("seed").alias("node"), F.lit(0).cast("long").alias("dist")
    )
    for _ in range(3):
        relaxed = d.join(und, d.node == und.src).select(
            "seed", F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        d = (
            d.unionByName(relaxed)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return d.groupBy("seed").agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum("dist").alias("total_dist"),
        F.max("dist").alias("max_dist"),
    )


@query(
    "q_hits_authority",
    """
    WITH e AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    h1 AS (SELECT p, count(*) * 1000000 AS h FROM e GROUP BY p),
    mh1 AS (SELECT max(h) AS m FROM h1),
    h1n AS (SELECT p, h * 1000000 // m AS h FROM h1 CROSS JOIN mh1),
    a1 AS (
        SELECT s, sum(h1n.h) AS a FROM e JOIN h1n USING (p) GROUP BY s
    ),
    ma1 AS (SELECT max(a) AS m FROM a1),
    a1n AS (SELECT s, a * 1000000 // m AS a FROM a1 CROSS JOIN ma1),
    h2 AS (
        SELECT p, sum(a1n.a) AS h FROM e JOIN a1n USING (s) GROUP BY p
    ),
    mh2 AS (SELECT max(h) AS m FROM h2),
    h2n AS (SELECT p, h * 1000000 // m AS h FROM h2 CROSS JOIN mh2),
    a2 AS (
        SELECT s, sum(h2n.h) AS a FROM e JOIN h2n USING (p) GROUP BY s
    ),
    ma2 AS (SELECT max(a) AS m FROM a2),
    a2n AS (SELECT s, a * 1000000 // m AS a FROM a2 CROSS JOIN ma2)
    SELECT s AS supplier, CAST(a AS BIGINT) AS authority_int,
           round(CAST(a AS DOUBLE) / 1000000.0, 9) AS authority
    FROM a2n ORDER BY a DESC, s LIMIT 10
    """,
)
def q_hits_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hubs-and-authorities, two mutual-reinforcement
    iterations over the part→supplier bipartite graph — the second
    classic link-analysis algorithm beside q_pagerank, with the same
    determinism treatment: scores live as 1e6 fixed-point BIGINTs,
    each iteration is one join + integer sum + max-normalization
    (``x·S div max`` — exact), so every score is hash-comparable.
    Emits the top-10 authorities (suppliers most endorsed by strong
    hub parts)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    S = 1_000_000
    e = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct().localCheckpoint()

    def norm(df, col):
        # each iteration's score table is read twice (max agg + the
        # normalizing projection) and then AGAIN by the next iteration's
        # join — without a cut the mutual-reinforcement chain re-derives
        # every earlier iteration per consumer (a 148-Exchange plan at
        # sf0.1; at scale, exponentially many passes over e). The
        # checkpointed frame is |parts|- or |suppliers|-sized.
        df = df.localCheckpoint()
        m = df.agg(F.max(col).alias("m"))
        return df.crossJoin(F.broadcast(m)).select(
            *[c for c in df.columns if c != col],
            F.expr(f"{col} * {S} div m").alias(col),
        )

    h = norm(
        e.groupBy("p").agg((F.count(F.lit(1)) * S).alias("h")), "h"
    )
    a = norm(e.join(h, "p").groupBy("s").agg(F.sum("h").alias("a")), "a")
    h = norm(e.join(a, "s").groupBy("p").agg(F.sum("a").alias("h")), "h")
    a = norm(e.join(h, "p").groupBy("s").agg(F.sum("h").alias("a")), "a")
    return (
        a.orderBy(F.desc("a"), F.asc("s"))
        .limit(10)
        .select(
            F.col("s").alias("supplier"),
            F.col("a").alias("authority_int"),
            F.round(F.col("a").cast("double") / S, 9).alias("authority"),
        )
    )


@query(
    "q_k_anonymity",
    """
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
                          / 100000.0) AS INT) AS bal_band
        FROM customer
    )
    SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS group_size
    FROM qi
    GROUP BY c_nationkey, c_mktsegment, bal_band
    HAVING count(*) < 5
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier tuple
    (nation, market segment, $1000 balance band): every group small
    enough to re-identify a member — the privacy screen a dataset
    passes before release, and the input to generalization (widen
    bands / suppress rows) when it fails. One groupBy over the QI
    projection; the band is floor of an exact-cents double division
    so the bucket edge is bit-identical on both engines."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    band = F.floor(
        F.round(F.col("c_acctbal") * 100).cast("long").cast("double") / 100000.0
    ).cast("int")
    return (
        cust.select("c_nationkey", "c_mktsegment", band.alias("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < 5)
    )


_COPURCHASE_BI_CTE = """
    op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e0 AS (
        SELECT DISTINCT x.p AS u, y.p AS v
        FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
    ),
    bi AS (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0),
    deg AS (SELECT src AS n, CAST(count(*) AS BIGINT) AS d FROM bi GROUP BY src)
"""


@query(
    "q_assortativity",
    f"""
    WITH {_COPURCHASE_BI_CTE},
    xy AS (
        SELECT ds.d AS x, dd.d AS y
        FROM bi JOIN deg ds ON ds.n = bi.src
                JOIN deg dd ON dd.n = bi.dst
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM xy
    )
    SELECT m AS n_directed_edges,
           round((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 9)
               AS assortativity
    FROM s
    """,
)
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — Pearson
    correlation of endpoint degrees over the directed edge list, the
    standard do-hubs-link-to-hubs probe (negative = hub-and-spoke,
    positive = core-periphery). Every moment (Σx, Σx², Σxy) is an
    exact BIGINT accumulated over edges; the Pearson formula then
    runs in double with the identical operation order on both
    engines (products of exact ints are correctly rounded; sqrt is
    IEEE-exact). Two broadcast-joinable aggregates (degree table),
    one edge-list scan."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    bi = graph.copurchase_bidirected(li)
    # the degree table joins onto BOTH edge endpoints — checkpoint the
    # |nodes|-row aggregate so the second join probe reuses it
    deg = (
        bi.groupBy(F.col("src").alias("n"))
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    xy = (
        bi.join(deg.select(F.col("n").alias("ns"), F.col("d").alias("x")), F.col("src") == F.col("ns"))
        .join(deg.select(F.col("n").alias("nd"), F.col("d").alias("y")), F.col("dst") == F.col("nd"))
        .select("x", "y")
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    md = F.col("m").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    return s.select(
        F.col("m").alias("n_directed_edges"),
        F.round(
            (md * F.col("sxy") - sxd * F.col("sy"))
            / (
                F.sqrt(md * F.col("sxx") - sxd * F.col("sx"))
                * F.sqrt(md * F.col("syy") - syd * F.col("sy"))
            ),
            9,
        ).alias("assortativity"),
    )


@query(
    "q_modularity",
    f"""
    WITH {_COPURCHASE_BI_CTE},
    lab AS (SELECT p_partkey, p_brand FROM part),
    e AS (
        SELECT ls.p_brand AS b_src, ld.p_brand AS b_dst
        FROM bi JOIN lab ls ON ls.p_partkey = bi.src
                JOIN lab ld ON ld.p_partkey = bi.dst
    ),
    m2 AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
    per_c AS (
        SELECT b_src AS community,
               CAST(sum(CASE WHEN b_src = b_dst THEN 1 ELSE 0 END) AS BIGINT) AS e_in,
               CAST(count(*) AS BIGINT) AS d_c
        FROM e GROUP BY b_src
    ),
    terms AS (
        SELECT CAST(round((CAST(e_in AS DOUBLE) / m
                   - (CAST(d_c AS DOUBLE) / m) * (CAST(d_c AS DOUBLE) / m)) * 1e12)
                 AS BIGINT) AS t
        FROM per_c, m2
    )
    SELECT round(CAST(sum(t) AS DOUBLE) / 1e12, 9) AS modularity,
           CAST((SELECT count(*) FROM per_c) AS INT) AS n_communities,
           (SELECT m FROM m2) AS n_directed_edges
    FROM terms
    """,
)
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the brand partition on the co-purchase
    graph — Q = Σ_c [e_c/2m − (d_c/2m)²], the did-my-communities-
    capture-the-structure score for any clustering (here: does brand
    predict co-purchase?). Per-community terms come from ONE pass
    over the labeled directed edge list (brand labels broadcast);
    each term is quantized to a 1e-12 BIGINT so Σ over communities
    is exact — same discipline as q_kl_divergence."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    part = load_tables(spark, sf_dir, ("part",))["part"].select("p_partkey", "p_brand")
    bi = graph.copurchase_bidirected(li)
    lab_s = part.select(F.col("p_partkey").alias("ks"), F.col("p_brand").alias("b_src"))
    lab_d = part.select(F.col("p_partkey").alias("kd"), F.col("p_brand").alias("b_dst"))
    e = (
        bi.join(F.broadcast(lab_s), F.col("src") == F.col("ks"))
        .join(F.broadcast(lab_d), F.col("dst") == F.col("kd"))
        .select("b_src", "b_dst")
    )
    # ONE pass over the labeled edge list: m (total directed edges) is
    # Σ d_c and n_communities is the row count of the per-community
    # table itself, so neither needs its own edge scan — per_c (a
    # |communities|-row frame) is checkpointed and every scalar derives
    # from it (was: three independent passes over e)
    per_c = (
        e.groupBy(F.col("b_src").alias("community"))
        .agg(
            F.sum(F.when(F.col("b_src") == F.col("b_dst"), 1).otherwise(0)).alias(
                "e_in"
            ),
            F.count(F.lit(1)).alias("d_c"),
        )
        .localCheckpoint()
    )
    m2 = per_c.agg(F.sum("d_c").alias("m"))
    md = F.col("m").cast("double")
    term = F.round(
        (F.col("e_in").cast("double") / md
         - (F.col("d_c").cast("double") / md) * (F.col("d_c").cast("double") / md))
        * 1e12
    ).cast("long")
    n_comm = per_c.agg(F.count(F.lit(1)).cast("int").alias("n_communities"))
    return (
        per_c.crossJoin(F.broadcast(m2))
        .select(term.alias("t"), F.col("m"))
        .agg(
            F.round(F.sum("t").cast("double") / 1e12, 9).alias("modularity"),
            F.max("m").alias("n_directed_edges"),
        )
        .crossJoin(F.broadcast(n_comm))
        .select("modularity", "n_communities", "n_directed_edges")
    )


@query(
    "q_l_diversity",
    """
    WITH qi AS (
        SELECT c_nationkey,
               CAST(floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
                          / 200000.0) AS INT) AS bal_band,
               c_mktsegment
        FROM customer
    )
    SELECT c_nationkey, bal_band,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct
    FROM qi GROUP BY c_nationkey, bal_band
    HAVING count(DISTINCT c_mktsegment) < 3
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=3) over the quasi-identifier tuple
    (nation, $2000 balance band) with market segment as the sensitive
    attribute: groups where too few distinct sensitive values survive
    — the disclosure risk k-anonymity alone misses (a k=20 group whose
    members all share one segment still leaks it). Same exact-cents
    band construction as q_k_anonymity; one groupBy + COUNT DISTINCT."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    band = F.floor(
        F.round(F.col("c_acctbal") * 100).cast("long").cast("double") / 200000.0
    ).cast("int")
    return (
        cust.select("c_nationkey", band.alias("bal_band"), "c_mktsegment")
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.countDistinct("c_mktsegment").cast("long").alias("l_distinct"),
        )
        .filter(F.col("l_distinct") < 3)
    )


@query(
    "q_modality_integrity",
    """
    SELECT CAST((SELECT count(*) FROM documents d
                 SEMI JOIN embeddings e ON e.vec_id = d.doc_id) AS BIGINT)
               AS n_paired,
           CAST((SELECT count(*) FROM documents d
                 ANTI JOIN embeddings e ON e.vec_id = d.doc_id) AS BIGINT)
               AS n_missing_embedding,
           CAST((SELECT count(*) FROM embeddings e
                 ANTI JOIN documents d ON d.doc_id = e.vec_id) AS BIGINT)
               AS n_orphan_vector
    """,
)
def q_modality_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired-modality integrity audit: documents without an embedding
    row and embeddings without a document (two anti-join counts + the
    paired count) — the referential screen a text+vector (or
    image+caption) pipeline runs before training on "pairs": silent
    pairing loss biases the mixture toward whichever side survived.
    Semi/anti joins on the id — no data columns shuffle."""
    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    docs, emb = t["documents"], t["embeddings"]
    d_ids = docs.select(F.col("doc_id").alias("k"))
    e_ids = emb.select(F.col("vec_id").alias("k"))
    paired = d_ids.join(e_ids, "k", "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_paired")
    )
    missing = d_ids.join(e_ids, "k", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_missing_embedding")
    )
    orphan = e_ids.join(d_ids, "k", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_orphan_vector")
    )
    return paired.crossJoin(missing).crossJoin(orphan)


@query(
    "q_t_closeness",
    """
    WITH qi AS (
        SELECT c_nationkey,
               CAST(floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
                          / 200000.0) AS INT) AS bal_band,
               c_mktsegment
        FROM customer
    ),
    g AS (SELECT c_nationkey, bal_band, CAST(count(*) AS BIGINT) AS n_g
          FROM qi GROUP BY 1, 2),
    s AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS c_s FROM qi GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS big_n FROM qi),
    gs AS (SELECT c_nationkey, bal_band, c_mktsegment,
                  CAST(count(*) AS BIGINT) AS c_gs
           FROM qi GROUP BY 1, 2, 3),
    d AS (
        SELECT g.c_nationkey, g.bal_band, g.n_g,
               sum(abs(COALESCE(gs.c_gs, 0) * big_n - s.c_s * g.n_g)) AS t_num,
               max(big_n) AS big_n
        FROM g CROSS JOIN s CROSS JOIN tot
        LEFT JOIN gs ON gs.c_nationkey = g.c_nationkey
                    AND gs.bal_band = g.bal_band
                    AND gs.c_mktsegment = s.c_mktsegment
        GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, bal_band, n_g AS group_size,
           round(CAST(t_num AS DOUBLE) / (2.0 * n_g * big_n), 9) AS t_value
    FROM d
    WHERE CAST(t_num AS DOUBLE) / (2.0 * n_g * big_n) > 0.15
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (t=0.15) over the same quasi-identifier bands
    as q_l_diversity (nation, $2000 balance band) with market segment
    sensitive: groups whose sensitive-value distribution sits further
    than t from the GLOBAL distribution in total-variation distance —
    the disclosure risk l-diversity still misses (a group can have
    all l values yet be 90% one of them; skew itself leaks). The
    distance numerator Σ|c_gs·N − c_s·n_g| is an exact BIGINT
    (cross-multiplied — no per-group float ratios), absent sensitive
    values enter via the bounded groups×segments grid (the segment
    table broadcasts), and the ONLY float op is the final divide by
    2·n_g·N. Bound: c_gs·N ≤ N² — exact to N ≈ 3e9 rows."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    band = F.floor(
        F.round(F.col("c_acctbal") * 100).cast("long").cast("double") / 200000.0
    ).cast("int")
    qi = cust.select(
        "c_nationkey", band.alias("bal_band"), "c_mktsegment"
    )
    g = qi.groupBy("c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_g")
    )
    s = qi.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("c_s")
    )
    tot = qi.agg(F.count(F.lit(1)).cast("long").alias("big_n"))
    gs = qi.groupBy("c_nationkey", "bal_band", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("c_gs")
    )
    d = (
        g.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(tot))
        .join(gs, ["c_nationkey", "bal_band", "c_mktsegment"], "left")
        .select(
            "c_nationkey",
            "bal_band",
            "n_g",
            "big_n",
            F.abs(
                F.coalesce(F.col("c_gs"), F.lit(0)) * F.col("big_n")
                - F.col("c_s") * F.col("n_g")
            ).alias("term"),
        )
        .groupBy("c_nationkey", "bal_band", "n_g")
        .agg(F.sum("term").alias("t_num"), F.max("big_n").alias("big_n"))
    )
    t_val = F.col("t_num").cast("double") / (
        2.0 * F.col("n_g") * F.col("big_n")
    )
    return d.filter(t_val > 0.15).select(
        "c_nationkey",
        "bal_band",
        F.col("n_g").alias("group_size"),
        F.round(t_val, 9).alias("t_value"),
    )


@query(
    "q_dp_histogram",
    """
    WITH h AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    u AS (
        SELECT lang, n,
               (CAST(CAST(('0x' || substr(md5(lang || '|dp-seed-42'), 1, 15))
                          AS BIGINT) AS DOUBLE) + 0.5)
                   / 1152921504606846976.0 AS uu
        FROM h
    )
    SELECT lang,
           round(CAST(n AS DOUBLE)
                 + (-1.0) * sign(uu - 0.5) * ln(1.0 - 2.0 * abs(uu - 0.5)), 6)
               AS noised_count,
           CAST(1.0 AS DOUBLE) AS epsilon
    FROM u
    """,
)
def q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release (Laplace mechanism,
    ε=1, sensitivity 1 — each document contributes to exactly one
    lang cell): the noised per-language counts a data consortium can
    publish about a private corpus. The Laplace draw inverts a
    uniform derived from md5(cell || salt) — SEEDED, so the release
    is reproducible and oracle-checkable; production swaps the hash
    for a CSPRNG draw (same convention as the multimodal stub
    decode: the mechanism's plumbing and calibration b=1/ε are real,
    the entropy source is the injectable part). One cell-level
    aggregate; noise applies to the bounded histogram, never
    per-row."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    h = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    fp = F.conv(
        F.substring(F.md5(F.concat(F.col("lang"), F.lit("|dp-seed-42"))), 1, 15),
        16,
        10,
    ).cast("long")
    u = (fp.cast("double") + 0.5) / 1152921504606846976.0
    noise = F.lit(-1.0) * F.signum(u - 0.5) * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    return h.select(
        "lang",
        F.round(F.col("n").cast("double") + noise, 6).alias("noised_count"),
        F.lit(1.0).cast("double").alias("epsilon"),
    )


# ---------------------------------------------------------------------------
# Wave 37 — DP quantiles (exponential mechanism)
# ---------------------------------------------------------------------------


@query(
    "q_dp_quantiles",
    """
    WITH b AS (
        SELECT n_chars // 32 AS bucket, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1
    ),
    cum AS (
        SELECT bucket,
               CAST(sum(n) OVER (ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM b
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM b),
    qd(q) AS (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
                     (CAST(0.75 AS DOUBLE))),
    g AS (
        SELECT cum.bucket, cum.cum, tot.big_n, qd.q,
               CAST(round_even(q * big_n * 1e6, 0) AS BIGINT) AS target
        FROM cum, tot, qd
    ),
    sc AS (
        SELECT q, bucket, cum, big_n,
               round(CAST(0.5 AS DOUBLE)
                     * (CAST(-abs(cum * CAST(1000000 AS BIGINT) - target)
                             AS DOUBLE) / 1e6)
                     + (-ln(-ln(
                         (CAST(CAST(('0x' || substr(md5(
                              CAST(q AS VARCHAR) || '|'
                              || CAST(bucket AS VARCHAR)
                              || '|' || 'dpq-seed-42'), 1, 15))
                            AS BIGINT) AS DOUBLE) + 0.5)
                         / 1152921504606846976.0))), 6) AS score
        FROM g
    ),
    pick AS (
        SELECT q, bucket, cum, big_n,
               row_number() OVER (PARTITION BY q
                                  ORDER BY score DESC, bucket ASC) AS rn
        FROM sc
    ),
    dp AS (SELECT q, (bucket + 1) * 32 AS dp_value, cum AS dp_cum, big_n
           FROM pick WHERE rn = 1),
    hit AS (SELECT q, min(bucket) AS tbucket FROM g
            WHERE cum * CAST(1000000 AS BIGINT) >= target GROUP BY q),
    tc AS (SELECT hit.q, cum.cum AS true_cum, hit.tbucket
           FROM hit JOIN cum ON cum.bucket = hit.tbucket)
    SELECT dp.q, CAST(dp.dp_value AS BIGINT) AS dp_value,
           CAST((tc.tbucket + 1) * 32 AS BIGINT) AS true_value,
           round(CAST(abs(dp.dp_cum - tc.true_cum) AS DOUBLE) / dp.big_n, 9)
               AS rank_error
    FROM dp JOIN tc USING (q)
    """,
)
def q_dp_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private quantile release via the exponential
    mechanism (governance.dp_quantiles, ε=1): candidate bucket edges
    score u = −|rank distance|, released edge = argmax(ε·u/2 +
    seeded Gumbel) — the mechanism-class companion to q_dp_histogram's
    Laplace release, with the same seeded-entropy convention (md5
    uniform → reproducible, oracle-checkable; production injects a
    CSPRNG). Exact BIGINT rank arithmetic on the bounded bucket
    table; scores quantized to 1e-6 with ascending-bucket tiebreak so
    a last-ulp ln() divergence cannot flip the argmax. Reports the
    released value, the true grid quantile, and the realized rank
    error."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return governance.dp_quantiles(docs, "n_chars", qs=[0.25, 0.5, 0.75])
