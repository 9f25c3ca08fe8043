"""SparkSession factory tuned for this engine.

The reference engine hand-tuned its parallelism (reader/mapper thread
pairs, 1024 hash bins, cyclic bin ownership — ``map_reduce.cpp:22-37``,
``:470-471``, ``:306``). Here the equivalent knobs are Spark configs:
``spark.sql.shuffle.partitions`` plays the role of the 1024 bins, the
task scheduler replaces the pull-based file queue, and AQE re-plans at
runtime (coalescing small shuffles, converting to broadcast joins,
splitting skewed partitions) — things the reference could not do at all.

Scale note: the defaults below are for the local[32] test harness.  On a
real 1000-executor cluster against ~100 TB you would raise
``shuffle.partitions`` to O(cores × 2..4) or simply rely on
``spark.sql.adaptive.coalescePartitions`` with a large initial number —
every operator in this package is written to be agnostic to the actual
partition count (no collect()-based logic, no driver-side loops over
data).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that must hold for correctness (not just speed).
_REQUIRED_CONFS = {
    # Legacy driver fixtures stored events.ts as TIMESTAMP(NANOS),
    # which Spark's vectorized reader rejects unless read as raw int64
    # nanos (normalized in sources.tables.normalize_event_ts; the
    # current micros fixture is unaffected by this conf).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics for TimestampType; the DuckDB
    # oracle reads the same parquet as naive (no-tz) timestamps.
    "spark.sql.session.timeZone": "UTC",
}

_PERF_CONFS = {
    # AQE: runtime coalescing of shuffle partitions, dynamic
    # broadcast-join conversion, skew-join splitting.  This is the
    # modern replacement for the reference's fixed 1024-bin layout.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas UDF / mapInPandas path (similarity,
    # multimodal): batch transfer instead of row-at-a-time pickling.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Python UDTFs default to row-at-a-time pickle transfer
    # (BatchEvalPythonUDTF) — opt into the Arrow-batched evaluator so
    # the table-function path honors the same no-row-eval policy as
    # every other Python stage (found by tests/test_plan_policy.py).
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
    # Partial aggregation pushdown for distinct-style aggregates.
    "spark.sql.optimizer.distinctBeforeIntersect.enabled": "true",
}


def get_spark(
    app_name: str = "map_reduce_multi_threaded_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's required configs.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    for the test harness; on a cluster, leave it unset and let
    spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = builder.master(master)

    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))

    for k, v in {**_REQUIRED_CONFS, **_PERF_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    # If an existing session was reused, make sure the correctness
    # configs still hold (they are all runtime-settable).
    for k, v in _REQUIRED_CONFS.items():
        spark.conf.set(k, v)
    return spark


def ensure_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's required runtime confs to an externally
    created session (the driver hands us one in ``__spark_entry__``)."""
    for k, v in _REQUIRED_CONFS.items():
        spark.conf.set(k, v)
    for k, v in _PERF_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep going
    return spark
