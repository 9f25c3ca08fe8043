"""Iterative graph analytics: PageRank over the part↔supplier graph.

The reference is a MapReduce engine (SURVEY.md §0); PageRank is THE
canonical iterative-MapReduce workload, so the engine should express it
natively: each iteration is one join (distribute rank along edges) +
one keyed aggregation (gather contributions) — exactly the reference's
partial-agg → shuffle → merge shape (map_reduce.cpp:191-438), looped.

Determinism: classic PageRank sums doubles whose addition order varies
with partitioning, so it can never hash-match an oracle bit-for-bit.
Here ranks are SCALED INTEGERS (1e6 = rank 1.0) and every step is
integer arithmetic — `rank div out_degree` to distribute, exact BIGINT
sums to gather (addition of integers is order-free), and
`150_000 + (85 × gathered) div 100` for the damping update.  The tiny
mass lost to integer floor division is identical on every engine and
partitioning, which is the whole point.

Scale: edges come straight off lineitem (one fact-table scan); each
iteration shuffles (node, contribution) pairs — the standard Pregel
partitioning.  The edge list is localCheckpointed once; three fixed
iterations keep the oracle SQL-expressible (unrolled CTEs) — a
convergence-driven variant would add the dedup_clusters-style
checksum loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import QuerySpec
from ..sources.tables import load_table

N_ITER = 3
RANK_SCALE = 1_000_000  # rank 1.0 == 1e6
DAMPING_NUM, DAMPING_DEN = 85, 100
BASE = RANK_SCALE * (DAMPING_DEN - DAMPING_NUM) // DAMPING_DEN  # 0.15 × 1e6
TOP_K = 20


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part↔supplier edges as two directed arcs; node ids
    are disjoint via even/odd encoding (part→2k, supplier→2k+1)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") * 2).alias("p"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    )
    return li.select(F.col("p").alias("src"), F.col("s").alias("dst")).unionByName(
        li.select(F.col("s").alias("src"), F.col("p").alias("dst"))
    )


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by 3-iteration integer PageRank (see module doc)."""
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = deg.select("src", F.lit(RANK_SCALE).cast("long").alias("rank"))
    for _ in range(N_ITER):
        contribs = (
            edges.join(ranks, "src")
            .join(deg, "src")
            .select("dst", F.expr("rank div out_deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("gathered"))
        )
        ranks = contribs.select(
            F.col("dst").alias("src"),
            (F.lit(BASE) + F.expr(f"(gathered * {DAMPING_NUM}) div {DAMPING_DEN}")).alias("rank"),
        )
    node = F.when(F.col("src") % 2 == 0, F.lit("part")).otherwise(F.lit("supplier"))
    key = F.expr("src div 2")
    return (
        ranks.select(node.alias("node_type"), key.alias("node_key"), "rank")
        .orderBy(F.desc("rank"), F.asc("node_type"), F.asc("node_key"))
        .limit(TOP_K)
    )


def _pagerank_oracle() -> str:
    it = """
r{n} AS (
  SELECT e.dst AS src,
         {base} + (sum(r{p}.rank // d.out_deg) * {dn}) // {dd} AS rank
  FROM edges e JOIN r{p} ON e.src = r{p}.src JOIN deg d ON e.src = d.src
  GROUP BY e.dst
)"""
    iters = ",".join(
        it.format(n=i + 1, p=i, base=BASE, dn=DAMPING_NUM, dd=DAMPING_DEN)
        for i in range(N_ITER)
    )
    return f"""
WITH arcs AS (
  SELECT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s FROM lineitem
),
edges AS (
  SELECT p AS src, s AS dst FROM arcs
  UNION ALL
  SELECT s AS src, p AS dst FROM arcs
),
deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
r0 AS (SELECT src, CAST({RANK_SCALE} AS BIGINT) AS rank FROM deg),
{iters}
SELECT CASE WHEN src % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
       src // 2 AS node_key,
       CAST(rank AS BIGINT) AS rank
FROM r{N_ITER}
ORDER BY rank DESC, node_type ASC, node_key ASC
LIMIT {TOP_K}
"""


HITS_SCALE = 1_000_000
HITS_ROUNDS = 2
HITS_TOP = 10


def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) over the DIRECTED
    part→supplier purchase graph — parts are hubs (they spread demand)
    and suppliers authorities (they concentrate it); {HITS_ROUNDS}
    mutual-reinforcement rounds, top-{HITS_TOP} of each role.

    Same exactness discipline as the PageRank above: scores are scaled
    integers, and the per-round L1 NORMALIZATION (classically a float
    L2 divide — order-dependent) is `score·{HITS_SCALE} div Σscore`,
    one exact global-scalar broadcast per half-round.  Edge
    multiplicity from lineitem is kept — a part bought often from a
    supplier reinforces both, which is the weighted-HITS semantics.

    Scale: each half-round is one keyed join + keyed sum + a 1-row
    total; the arc list is pinned once."""
    arcs = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .localCheckpoint(eager=True)
    )
    h = arcs.select("p").distinct().withColumn(
        "v", F.lit(HITS_SCALE).cast("long")
    )

    def _norm(df, key):
        # pin the summed frame: the total AND the rescale both read it,
        # and each round reads the previous round's result twice more —
        # unpinned, the lineage re-expands exponentially (measured: 90
        # exchanges vs 14 pinned).  The frame is node-cardinality rows.
        df = df.localCheckpoint(eager=True)
        tot = df.agg(F.sum("v").alias("t"))
        return (
            df.crossJoin(F.broadcast(tot))
            .select(key, F.expr(f"(v * {HITS_SCALE}) div t").alias("v"))
        )

    a = None
    for _ in range(HITS_ROUNDS):
        a = _norm(
            arcs.join(h, "p").groupBy("s").agg(F.sum("v").alias("v")), "s"
        )
        h = _norm(
            arcs.join(a, "s").groupBy("p").agg(F.sum("v").alias("v")), "p"
        )
    top_auth = (
        a.select(F.lit("supplier").alias("role"), F.col("s").alias("node_key"), F.col("v").alias("score"))
        .orderBy(F.desc("score"), F.asc("node_key"))
        .limit(HITS_TOP)
    )
    top_hub = (
        h.select(F.lit("part").alias("role"), F.col("p").alias("node_key"), F.col("v").alias("score"))
        .orderBy(F.desc("score"), F.asc("node_key"))
        .limit(HITS_TOP)
    )
    return top_auth.unionByName(top_hub)


def _hits_oracle() -> str:
    steps = ["h0 AS (SELECT p, CAST({s} AS BIGINT) AS v FROM (SELECT DISTINCT p FROM arcs))".format(s=HITS_SCALE)]
    prev_h = "h0"
    a = None
    for r in range(1, HITS_ROUNDS + 1):
        steps.append(
            f"a{r}r AS (SELECT s, sum({prev_h}.v) AS v FROM arcs "
            f"JOIN {prev_h} USING (p) GROUP BY s)"
        )
        steps.append(
            f"a{r} AS (SELECT s, (v * {HITS_SCALE}) // (SELECT sum(v) FROM a{r}r) AS v FROM a{r}r)"
        )
        steps.append(
            f"h{r}r AS (SELECT p, sum(a{r}.v) AS v FROM arcs "
            f"JOIN a{r} USING (s) GROUP BY p)"
        )
        steps.append(
            f"h{r} AS (SELECT p, (v * {HITS_SCALE}) // (SELECT sum(v) FROM h{r}r) AS v FROM h{r}r)"
        )
        prev_h, a = f"h{r}", f"a{r}"
    ctes = ",\n".join(steps)
    return f"""
WITH arcs AS (SELECT l_partkey AS p, l_suppkey AS s FROM lineitem),
{ctes}
SELECT * FROM (
  SELECT 'supplier' AS role, s AS node_key, CAST(v AS BIGINT) AS score
  FROM {a} ORDER BY v DESC, s ASC LIMIT {HITS_TOP}
)
UNION ALL
SELECT * FROM (
  SELECT 'part' AS role, p AS node_key, CAST(v AS BIGINT) AS score
  FROM {prev_h} ORDER BY v DESC, p ASC LIMIT {HITS_TOP}
)
"""


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count over the near-dup document graph — the
    other canonical MapReduce graph workload (two self-joins on the
    canonically-oriented edge list a<b, so each triangle is counted
    exactly once).

    Scale: wedge generation is inherently Σ over b of
    indeg(b)·outdeg(b) under the a<b orientation — Ω(#wedges) work no
    exact count can avoid — but the WEDGE STREAM must never hit a
    shuffle: the round-14 dup-extreme×skew sweep (giant ~1000-doc
    near-dup cliques, 1.3e9 wedges) killed the old plan, which
    shuffled every wedge row into the closing (a,c) join (30+ GB
    exchange → read-ahead heap OOM after 28 min).  The fix is the
    MapReduce classic: partial-aggregate wedges per (a,c) in the SAME
    stage that generates them (map-side combine → at most one row per
    node pair crosses the wire, ≤ |E| rows per component), then join
    the closing edge and sum.  Edge derivation rides the PPJoin exact
    join (r9) — same pair set as the all-pairs spelling the oracle
    still uses, without the quadratic co-occurrence term."""
    from .dedup import _ppjoin_pairs_from, shingles

    e = (
        _ppjoin_pairs_from(shingles(spark, sf_dir).localCheckpoint(eager=True))
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    e1 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = e.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    wedges = (
        e1.join(e2, "b")
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("w_n"))
    )
    return (
        wedges.join(e3, ["a", "c"])
        .agg(F.coalesce(F.sum("w_n"), F.lit(0)).cast("long").alias("n_triangles"))
    )


def _triangle_oracle() -> str:
    from .dedup import _NGRAM_JACCARD_ORACLE

    return f"""
WITH pairs AS ({_NGRAM_JACCARD_ORACLE}),
e AS (SELECT doc_a, doc_b FROM pairs)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1 JOIN e e2 ON e1.doc_b = e2.doc_a JOIN e e3
  ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
"""


#: BFS source (part #1 under the even/odd node encoding) and the level
#: cap shared by the Spark loop and the recursive-CTE oracle.
BFS_SOURCE = 2
BFS_MAX_LEVEL = 15


def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS hop distances over the part↔supplier graph —
    frontier expansion as iterative MapReduce: each round is one join
    (frontier × edges), a distinct, and an anti-join against the
    visited set; the loop stops when the frontier empties (a driver
    count per round — the convergence test itself, O(1) rows, same
    discipline as dedup_clusters).  The bipartite fact graph is dense,
    so the loop runs ~3-5 rounds regardless of node count.

    Exact oracle: DuckDB's recursive CTE computes min-hop levels with
    UNION-dedup bounding the working set to nodes × levels.  Scale:
    per-round cost is one keyed shuffle on the frontier; the visited
    set stays partitioned, and each round's frontier is
    localCheckpointed to cut the growing lineage.  Only the frontier
    checkpoints per round: ``visited`` is a union of
    already-checkpointed frontiers (lineage depth = rounds, bounded
    by BFS_MAX_LEVEL), so re-materializing the whole visited set each
    round paid O(rounds × nodes) for nothing.  Locally only ~4 %
    (the per-round scheduling floor dominates at fixture scale, 4.96
    → 4.75 s same-session at sf0.1) — the saved term is the one that
    grows with node count."""
    edges = _edges(spark, sf_dir).distinct().localCheckpoint(eager=True)
    visited = spark.range(1).select(
        F.lit(BFS_SOURCE).cast("long").alias("node"), F.lit(0).alias("level")
    ).localCheckpoint(eager=True)
    frontier = visited.select("node")
    for level in range(1, BFS_MAX_LEVEL + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(level).alias("level"))
        )
        frontier = nxt
    return visited.select("node", F.col("level").cast("int").alias("level"))


_BFS_ORACLE = f"""
WITH RECURSIVE edges AS (
  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
  UNION
  SELECT DISTINCT l_suppkey * 2 + 1, l_partkey * 2 FROM lineitem
),
bfs AS (
  SELECT CAST({BFS_SOURCE} AS BIGINT) AS node, 0 AS level
  UNION
  SELECT e.dst, b.level + 1 FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.level < {BFS_MAX_LEVEL}
)
SELECT node, CAST(min(level) AS INTEGER) AS level FROM bfs GROUP BY node
"""


def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part↔supplier graph: per node type,
    how many nodes have each (multi-)degree — the first diagnostic run
    on any production graph (skew detection: a power-law hub means the
    Pregel-style queries above need salting or hub-splitting).

    Scale: degree is one keyed count over the edge list; the histogram
    is a second keyed count over node-cardinality data.  Both are
    map-side-partial aggregations — no joins, no windows."""
    deg = (
        _edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    node_type = F.when(F.col("src") % 2 == 0, F.lit("part")).otherwise(
        F.lit("supplier")
    )
    return (
        deg.select(node_type.alias("node_type"), "degree")
        .groupBy("node_type", "degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


_DEGREES_ORACLE = """
WITH edges AS (
  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
  UNION ALL
  SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM lineitem
),
deg AS (
  SELECT src, count(*) AS degree FROM edges GROUP BY src
)
SELECT CASE WHEN src % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
       degree, count(*) AS n_nodes
FROM deg GROUP BY 1, 2
"""


LPA_ITER = 3
LPA_TOP = 20


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007), made deterministic: init label(v)=v, then each round
    every node adopts the label with the highest multi-edge-weighted
    vote among its neighbors, ties broken by smallest label — no
    random visit order, no async races, so the result is a pure
    function of the edge list on any engine or partitioning.  Emits
    the top-{LPA_TOP} communities by size after {LPA_ITER} rounds
    (sync LPA on a bipartite graph may oscillate rather than converge
    — fixed rounds make that a feature: the oracle unrolls the exact
    same {LPA_ITER} steps).

    Scale: each round is one edge⋈label join (shuffle keyed on node)
    plus one (node, label) vote count and a per-node argmax window —
    the Pregel shape PageRank above already proves; the label frame is
    node-cardinality, never materialized wider.  Hub skew treatments
    (salting the vote count) apply unchanged."""
    from pyspark.sql import Window

    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(LPA_ITER):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax(c DESC, label ASC) as a single-word max_by agg — no
        # per-partition sort of the vote table (struct compares c
        # first, then -label, so ties resolve to the SMALLEST label,
        # matching the oracle's row_number order; labels are node ids
        # ≥ 2, so negation is safe)
        labels = votes.groupBy("node").agg(
            F.expr("max_by(label, struct(c, -label))").alias("label")
        )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(LPA_TOP)
    )


def _lpa_oracle() -> str:
    parts = [
        """edges AS (
  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
  UNION ALL
  SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM lineitem
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"""
    ]
    for i in range(LPA_ITER):
        parts.append(f"""v{i + 1} AS (
  SELECT e.dst AS node, l.label, count(*) AS c
  FROM edges e JOIN l{i} l ON e.src = l.node
  GROUP BY 1, 2
),
l{i + 1} AS (
  SELECT node, label FROM (
    SELECT *, row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
    FROM v{i + 1}
  ) WHERE rn = 1
)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT label AS community, count(*) AS n_members
FROM l{LPA_ITER}
GROUP BY 1
ORDER BY n_members DESC, community
LIMIT {LPA_TOP}
"""
    )


def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood overlap: for supplier pairs in
    the same nation, the Jaccard similarity of their part
    neighborhoods (common-neighbors score over the bipartite
    supplier↔part graph) — "suppliers likely to be substitutes".

    Nation is the BLOCKING key: candidate pairs are generated only
    within a block, the standard entity-resolution/link-prediction
    move that keeps the pair space from going quadratic in the node
    count (the same role LSH bands play for documents).  Within a
    block the pair generation is the part-keyed self-join, cost
    Σ_part deg(part)² — at power-law scale you additionally cap or
    sample hub parts; the fixture's part degrees are near-uniform so
    the cap is not load-bearing here and is left out.

    Integer-exact scoring: jacc_ppm = (10^6 · |∩|) div |∪| avoids any
    float division.

    The neighbor frame feeds THREE consumers (degrees + both join
    sides); without pinning, Spark re-scans lineitem and re-runs the
    distinct per consumer (measured: 8 scans / 11 exchanges / zero
    reuse).  It is checkpointed like the module's other edge lists —
    on a cluster the same pin is a persisted staging table."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nei = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_nationkey", "s_suppkey", "l_partkey")
        .localCheckpoint(eager=True)
    )
    deg = nei.groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("deg"))
    a, b = nei.alias("a"), nei.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
        )
        .groupBy(
            F.col("a.s_nationkey").alias("nationkey"),
            F.col("a.s_suppkey").alias("supp_a"),
            F.col("b.s_suppkey").alias("supp_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select(F.col("s_suppkey").alias("supp_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("s_suppkey").alias("supp_b"), F.col("deg").alias("deg_b"))
    return (
        pairs.join(da, "supp_a")
        .join(db, "supp_b")
        .select(
            "nationkey",
            "supp_a",
            "supp_b",
            "n_common",
            (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).alias("n_union"),
            F.expr("(1000000 * n_common) div (deg_a + deg_b - n_common)").alias(
                "jacc_ppm"
            ),
        )
    )


_COMMON_NEIGHBORS_ORACLE = """
WITH nei AS (
  SELECT DISTINCT s.s_nationkey, l.l_suppkey, l.l_partkey
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
deg AS (SELECT l_suppkey, count(*) AS deg FROM nei GROUP BY l_suppkey),
pairs AS (
  SELECT a.s_nationkey AS nationkey, a.l_suppkey AS supp_a,
         b.l_suppkey AS supp_b, count(*) AS n_common
  FROM nei a JOIN nei b
    ON a.s_nationkey = b.s_nationkey AND a.l_partkey = b.l_partkey
   AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2, 3
)
SELECT nationkey, supp_a, supp_b,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(da.deg + db.deg - n_common AS BIGINT) AS n_union,
       CAST((1000000 * n_common) // (da.deg + db.deg - n_common) AS BIGINT) AS jacc_ppm
FROM pairs
JOIN deg da ON pairs.supp_a = da.l_suppkey
JOIN deg db ON pairs.supp_b = db.l_suppkey
"""


SPECS = [
    QuerySpec("graph_pagerank", graph_pagerank, _pagerank_oracle(),
              "3-iteration integer PageRank over the part↔supplier graph (join+agg per iteration)"),
    QuerySpec("graph_hits", graph_hits, _hits_oracle(),
              "HITS hubs/authorities over directed part→supplier arcs "
              "(integer L1-normalized mutual reinforcement)"),
    QuerySpec("graph_degrees", graph_degrees, _DEGREES_ORACLE,
              "multi-degree distribution per node type (skew diagnostic)"),
    QuerySpec("graph_bfs_levels", graph_bfs_levels, _BFS_ORACLE,
              "single-source BFS hop levels (frontier loop vs recursive-CTE oracle)"),
    QuerySpec("graph_triangle_count", graph_triangle_count, _triangle_oracle(),
              "triangle count over the near-dup graph (two joins on the a<b orientation)"),
    QuerySpec("graph_label_propagation", graph_label_propagation, _lpa_oracle(),
              "deterministic synchronous LPA communities (weighted votes, "
              "min-label ties, 3 unrolled rounds)"),
    QuerySpec("graph_common_neighbors", graph_common_neighbors,
              _COMMON_NEIGHBORS_ORACLE,
              "nation-blocked supplier link prediction by part-neighborhood "
              "Jaccard (integer ppm scores)"),
]
