"""Physical-plan inspection helpers.

The reference had no plan at all (its "physical plan" was the lexical
order of OpenMP blocks, SURVEY.md §3.1); here the plan is Catalyst's,
and these helpers are how tests (and humans) assert the scale-critical
properties: filters reached the scan, dimensions broadcast, top-N
didn't global-sort, columns pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The executed (physical, possibly AQE-replanned) plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node ('' if none)."""
    plan = executed_plan(df)
    if "PushedFilters:" not in plan:
        return ""
    return plan.split("PushedFilters:")[1].splitlines()[0].strip()


def read_schema(df: DataFrame) -> str:
    """The ReadSchema of the scan — what actually gets read off disk;
    the column-pruning check is 'is this narrower than the table'."""
    plan = executed_plan(df)
    if "ReadSchema:" not in plan:
        return ""
    return plan.split("ReadSchema:")[1].splitlines()[0].strip()


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcast exchanges) —
    the metric to minimize at 100 TB."""
    plan = executed_plan(df)
    return sum(
        line.strip().lstrip("+-: ").startswith("Exchange")
        and "SinglePartition" not in line
        for line in plan.splitlines()
    )
