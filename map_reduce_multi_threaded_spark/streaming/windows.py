"""Structured Streaming operators over the ``events`` table.

The reference is strictly batch (SURVEY.md §2.1) — its closest analogue
to streaming is the bounded reader→mapper queue with backpressure
(``map_reduce.cpp:72-115``), which Structured Streaming's micro-batch
engine subsumes (source offsets + state store + watermark-driven
eviction instead of spin/usleep).

Each operator is expressed once over a DataFrame that may be batch or
streaming — the same plan runs both ways, which is how the streaming
results are oracle-checked: replay the parquet through a file source,
drain with ``trigger(availableNow)`` into a memory sink, compare to the
batch/DuckDB answer.

Scale: streaming state (window aggregates, dedup keys) is partitioned
by group key across executors exactly like a batch shuffle; watermarks
bound state size — without them a 100 TB replay would accumulate state
forever.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: physical schema of events.parquet (ts = raw int64 nanos; converted
#: after read exactly like sources.tables.load_table).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of events.parquet as a stream."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source requires a directory; select just events.parquet
    # from the sf dir via glob filter
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame) -> DataFrame:
    """10-minute tumbling windows per event type (works on batch or
    streaming input — same plan, same oracle)."""
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(events: DataFrame) -> DataFrame:
    """30-minute-gap session windows per user."""
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
        )
    )


def dedup_counts(events: DataFrame) -> DataFrame:
    """Streaming dedup by event_id, then counts per type.  Fed with a
    doubled stream (self-union) to make the dedup observable."""
    return (
        events.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def write_foreach_batch(df: DataFrame, path: str, checkpoint: str) -> None:
    """Production streaming sink shape: ``foreachBatch`` with a
    checkpoint location → exactly-once micro-batch writes (each batch
    id is committed to the checkpoint after its write; a restarted
    query skips committed batches instead of re-appending them).

    Scale: the batch function receives an ordinary DataFrame — reuse
    any batch writer (partitioned parquet, JDBC upsert, merge) without
    a dedicated streaming connector."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(path)
        )

    query = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


#: State partition count for streaming queries started here.  Streaming
#: state (window aggs, dedup keys, applyInPandasWithState) is hash-
#: partitioned at query start using spark.sql.shuffle.partitions, and
#: each state partition pays a fixed per-micro-batch cost (state-store
#: commit + an Arrow channel / Python worker for stateful UDFs) that
#: dominates small replays: stream_stateful_counts at sf0.1 runs 6.0 s
#: with 32 partitions vs 2.5 s with 8.  This is a deployment knob — a
#: real 100 TB cluster raises it to O(cores) just like batch shuffle —
#: so it is a module constant, not a buried literal.
STREAM_STATE_PARTITIONS = 8


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete") -> DataFrame:
    """Drain a streaming DataFrame into an in-memory table and return
    it as a batch DataFrame — the bridge that lets the driver's oracle
    harness gate streaming operators like any other query.

    The state partition count is pinned to STREAM_STATE_PARTITIONS for
    the duration of query start (it is baked into the streaming plan at
    ``start()``); the session's batch shuffle setting is restored after."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS))
    try:
        query = (
            df.writeStream.queryName(name)
            .outputMode(output_mode)
            .format("memory")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)
