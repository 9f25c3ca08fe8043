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
