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
