"""Oracle-differential tests for the relational suite (driver-style
DuckDB comparison at sf0.01) plus plan-shape assertions for the
scale-critical physical properties."""

from __future__ import annotations

import pytest

from map_reduce_multi_threaded_spark.operators import relational
from tests.oracle_utils import compare, duck_con

ORACLE_SPECS = [s for s in relational.SPECS if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, sf_oracle_dir, spec):
    compare(spec.fn(spark, sf_oracle_dir), spec.oracle, sf_oracle_dir)


def test_approx_distinct_tolerance(spark, sf_oracle_dir):
    """HLL++ has no cross-engine oracle; gate on relative error vs exact."""
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in relational.agg_approx_distinct(spark, sf_oracle_dir).collect()
    }
    con = duck_con(sf_oracle_dir)  # keep a reference: GC closes the connection
    exact = {
        r[0]: r[1]
        for r in con.sql(
            "SELECT l_returnflag, count(DISTINCT l_partkey) FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    for flag, est in approx.items():
        assert abs(est - exact[flag]) / exact[flag] < 0.05


def test_approx_quantile_tolerance(spark, sf_oracle_dir):
    """Sketch has no cross-engine oracle; gate relative error vs exact."""
    con = duck_con(sf_oracle_dir)
    exact = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            "SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5), "
            "quantile_cont(l_extendedprice, 0.99) FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    for r in relational.agg_approx_quantile(spark, sf_oracle_dir).collect():
        med, p99 = exact[r["l_returnflag"]]
        assert abs(r["approx_median_price"] - med) / med < 0.05
        assert abs(r["approx_p99_price"] - p99) / p99 < 0.05


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_join_plan(spark, sf_dir):
    """Dimension joins must broadcast — zero shuffles for the join."""
    assert "BroadcastHashJoin" in _plan(relational.join_dim_broadcast(spark, sf_dir))


def test_filter_pushdown_plan(spark, sf_dir):
    """q6's predicates must reach the parquet scan."""
    plan = _plan(relational.q6_revenue(spark, sf_dir))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:300]


def test_column_pruning_plan(spark, sf_dir):
    """q1 must not read unused columns (e.g. l_partkey) from parquet."""
    plan = _plan(relational.q1_pricing_summary(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" not in read_schema and "l_quantity" in read_schema


def test_sort_limit_is_take_ordered(spark, sf_dir):
    """Global top-N must be TakeOrderedAndProject, not a full sort."""
    assert "TakeOrderedAndProject" in _plan(relational.sort_limit(spark, sf_dir))
