"""Two-pass distributed prefix sum — the scale-safe spelling of a
cumulative sum over a GLOBAL total order.

A naive ``Window.orderBy(...)`` with no ``partitionBy`` executes in a
single task; this helper instead (1) range-partitions by the sort key
(``repartitionByRange`` keeps partition i's keys strictly ahead of
partition i+1's under the given ordering), (2) cumulative-sums WITHIN
each partition in parallel, and (3) adds per-partition offsets — an
``n_parts``-row prefix sum broadcast back to the data.  The classic
parallel-scan decomposition (Blelloch 1990), expressed in DataFrame
ops.

One eager ``localCheckpoint`` pins the sampled range boundaries so the
per-row sums and the offset table see the SAME partitioning (the two
consumers would otherwise re-execute the exchange and could re-sample
different boundaries).  Fault-tolerance caveat: ``localCheckpoint``
stores blocks on executors, NOT reliable storage — an executor loss
(or dynamic-allocation decommission) loses blocks and FAILS the job
rather than recomputing.  That trade is fine for interactive/bench
runs; a cluster-grade production run should swap the pin for a
reliable ``checkpoint()`` (with ``sparkContext.setCheckpointDir`` on
durable storage) or stage the ranged frame to a persisted table — the
algorithm is unchanged, only the pinning mechanism.

Used by ``orders_abc_analysis`` (Pareto cumulative shares) and
``pipeline_budget_select`` (token-budget corpus selection).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: default range-partition count — at cluster scale set to the
#: executor-core count; the offset table stays this many rows.
DEFAULT_PARTS = 16


def two_pass_cumsum(
    df: DataFrame,
    value: Column | str,
    order_cols: list[Column],
    n_parts: int = DEFAULT_PARTS,
    cum_col: str = "_cum",
    total_col: str = "_total",
) -> DataFrame:
    """Attach ``cum_col`` (running sum of ``value`` over the global
    ``order_cols`` order) and ``total_col`` (grand total) to ``df``.

    ``value`` must be an exact type (decimal/integer) for the result
    to be partitioning-independent; ``order_cols`` must be a TOTAL
    order (include a unique tie-break column)."""
    value = F.col(value) if isinstance(value, str) else value
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    part = ranged.groupBy("_pid").agg(F.sum(value).alias("_part_sum"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    tot_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = part.select(
        "_pid",
        F.coalesce(F.sum("_part_sum").over(off_w), F.lit(0)).alias("_off"),
        F.sum("_part_sum").over(tot_w).alias(total_col),
    )
    return (
        ranged.withColumn("_local", F.sum(value).over(local_w))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(cum_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )


def two_pass_cummax(
    df: DataFrame,
    value: Column | str,
    order_cols: list[Column],
    n_parts: int = DEFAULT_PARTS,
    cum_col: str = "_cummax",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Attach ``cum_col`` (running MAX of ``value`` over the global
    ``order_cols`` order) to ``df`` — the same Blelloch two-pass
    decomposition as :func:`two_pass_cumsum` with (max, -∞) replacing
    (sum, 0): per-partition running max in parallel, then each
    partition's rows lifted by the max of all STRICTLY EARLIER
    partitions (an ``n_parts``-row broadcast).  The streaming
    watermark's high-water-mark computation, as a batch audit.

    ``group_cols`` (column NAMES) makes the running max restart per
    group while keeping the same decomposition: the local window and
    the per-partition maxima are keyed by (partition, group), and the
    offset table grows to ≤ n_parts × n_groups rows — still a
    broadcast, so the contract is a MODEST group cardinality (a few
    thousand; one range exchange regardless).  Range partitioning by
    the total order guarantees every earlier-in-order row of a group
    sits in the same or an earlier partition, so per-group offsets
    need only strictly-earlier partitions, exactly as in the global
    form.  A per-key ``Window.partitionBy(group)`` would instead put
    ALL of a group's rows in ONE task — the skew trap this helper
    exists to avoid when single groups are huge.

    Same contracts as cumsum: ``value`` exact-typed, ``order_cols`` a
    total order, and the one ``localCheckpoint`` pins the sampled
    range boundaries (see the module docstring for the
    fault-tolerance caveat)."""
    value = F.col(value) if isinstance(value, str) else value
    groups = list(group_cols or [])
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    local_w = (
        Window.partitionBy("_pid", *groups)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    part = ranged.groupBy("_pid", *groups).agg(F.max(value).alias("_part_max"))
    off_w = (
        Window.partitionBy(*groups)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = part.select(
        "_pid", *groups, F.max("_part_max").over(off_w).alias("_off")
    )
    return (
        ranged.withColumn("_local", F.max(value).over(local_w))
        .join(F.broadcast(offsets), ["_pid", *groups])
        .withColumn(cum_col, F.greatest(F.col("_local"), F.coalesce(F.col("_off"), F.col("_local"))))
        .drop("_pid", "_local", "_off")
    )
