"""Graph analytics: PageRank oracle parity + integer-determinism
properties."""

from __future__ import annotations

import pytest

from map_reduce_multi_threaded_spark.operators import graph
from tests.oracle_utils import compare

ORACLE_SPECS = [s for s in graph.SPECS if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, sf_oracle_dir, spec):
    compare(spec.fn(spark, sf_oracle_dir), spec.oracle, sf_oracle_dir)


def test_pagerank_repartition_invariant(spark, sf_oracle_dir):
    """Integer arithmetic makes the ranks independent of partitioning —
    the property double-summing PageRank cannot have."""
    base = {
        (r["node_type"], r["node_key"]): r["rank"]
        for r in graph.graph_pagerank(spark, sf_oracle_dir).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        alt = {
            (r["node_type"], r["node_key"]): r["rank"]
            for r in graph.graph_pagerank(spark, sf_oracle_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt


def test_pagerank_mass_sane(spark, sf_oracle_dir):
    """Ranks stay positive and bounded: floor division only ever LOSES
    mass, so no node can exceed the initial total."""
    rows = graph.graph_pagerank(spark, sf_oracle_dir).collect()
    assert len(rows) == graph.TOP_K
    assert all(r["rank"] >= graph.BASE for r in rows)
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_maxby_struct_argmax_tiebreak(spark):
    """The argmax pattern LPA and k-means now share —
    max_by(payload, struct(score, -k)) — must pick the LOWEST k on
    exact score ties (the window spelling's (score DESC, k ASC)
    order).  Pinned on constructed ties, including a negative-score
    tie and a double-valued score."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [  # (node, k, score)
            (1, 3, 5.0), (1, 2, 5.0), (1, 4, 1.0),   # tie at 5.0 -> k=2
            (2, 7, -2.5), (2, 6, -2.5),              # negative tie -> k=6
            (3, 1, 0.0),                             # singleton
        ],
        "node int, k int, score double",
    )
    rows = {
        r["node"]: r["kk"]
        for r in df.groupBy("node")
        .agg(F.expr("max_by(k, struct(score, -k))").alias("kk"))
        .collect()
    }
    assert rows == {1: 2, 2: 6, 3: 1}


def test_common_neighbors_vs_python_sets(spark, sf_oracle_dir):
    """Re-derive every nation-blocked pair score from collected Python
    neighbor sets — pins the blocking, the a<b orientation, and the
    integer ppm arithmetic."""
    from collections import defaultdict

    from map_reduce_multi_threaded_spark.operators.graph import graph_common_neighbors
    from map_reduce_multi_threaded_spark.sources.tables import load_table

    got = {
        (r["nationkey"], r["supp_a"], r["supp_b"]): (
            r["n_common"], r["n_union"], r["jacc_ppm"]
        )
        for r in graph_common_neighbors(spark, sf_oracle_dir).collect()
    }
    sup = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, sf_oracle_dir, "supplier").collect()
    }
    nei = defaultdict(set)
    for r in load_table(spark, sf_oracle_dir, "lineitem").select(
        "l_suppkey", "l_partkey"
    ).collect():
        nei[r["l_suppkey"]].add(r["l_partkey"])
    want = {}
    sks = sorted(nei)
    for i, sa in enumerate(sks):
        for sb in sks[i + 1:]:
            if sup[sa] != sup[sb]:
                continue
            common = len(nei[sa] & nei[sb])
            if common:
                union = len(nei[sa] | nei[sb])
                want[(sup[sa], sa, sb)] = (common, union, 1000000 * common // union)
    assert got == want
    assert want, "sf0.01 fixture should produce same-nation overlapping pairs"


def test_triangle_wedges_aggregate_before_closing_join(spark, sf_oracle_dir):
    """Round-14 scale fix: the wedge stream must be partial-aggregated
    per (a,c) BEFORE the closing edge join — the old plan shuffled
    every wedge row and heap-OOMed on giant near-dup cliques (2.3e9
    wedges, docs/altfixture_r14.md).  Assert the plan carries the
    wedge-count aggregate upstream of the final join, and that the
    map-side partial half exists (two HashAggregates for w_n)."""
    df = graph.graph_triangle_count(spark, sf_oracle_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "w_n" in plan, plan
    # partial + final pair for the wedge aggregate, before the sum agg
    idx_sum = plan.index("n_triangles")
    assert plan.count("HashAggregate", idx_sum) >= 2, plan


def test_triangle_count_exact_on_crafted_cliques(spark, tmp_path):
    """K4 ∪ K3 ∪ an open path must count C(4,3)+C(3,3)+0 = 5 when fed
    through the wedge-aggregate composition (bypassing the PPJoin edge
    derivation, which is oracle-gated elsewhere)."""
    import pyspark.sql.functions as F

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    k3 = [(a, b) for a in range(10, 13) for b in range(10, 13) if a < b]
    path = [(20, 21), (21, 22)]  # wedge, no closing edge
    e = spark.createDataFrame(k4 + k3 + path, "doc_a long, doc_b long")
    e1 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = e.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    wedges = e1.join(e2, "b").groupBy("a", "c").agg(F.count(F.lit(1)).alias("w_n"))
    got = (
        wedges.join(e3, ["a", "c"])
        .agg(F.coalesce(F.sum("w_n"), F.lit(0)).cast("long").alias("n_triangles"))
        .collect()[0]["n_triangles"]
    )
    assert got == 5
    # empty-graph degenerate: coalesce keeps the 0 row
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    ee1 = empty.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    ee2 = empty.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    ee3 = empty.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    w = ee1.join(ee2, "b").groupBy("a", "c").agg(F.count(F.lit(1)).alias("w_n"))
    z = (
        w.join(ee3, ["a", "c"])
        .agg(F.coalesce(F.sum("w_n"), F.lit(0)).cast("long").alias("n_triangles"))
        .collect()[0]["n_triangles"]
    )
    assert z == 0
