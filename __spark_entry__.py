"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``map_reduce_multi_threaded_spark``
package; this file only adapts its query registry to the driver's
calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_multi_threaded_spark.registry import collect_specs  # noqa: E402
from map_reduce_multi_threaded_spark.session import ensure_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's entire surface: word count,
    map_reduce.cpp S1-S14) on /root/testdata/sf0.001."""
    from map_reduce_multi_threaded_spark.operators.wordcount import word_counts_sorted

    ensure_confs(spark)
    return word_counts_sorted(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_confs(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {spec.name: _wrap(spec.fn) for spec in collect_specs()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column aliases)."""
    return {spec.name: spec.oracle for spec in collect_specs() if spec.oracle is not None}
