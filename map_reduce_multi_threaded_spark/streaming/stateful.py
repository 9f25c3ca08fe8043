"""Custom stateful streaming operator via ``applyInPandasWithState``.

This is the escape hatch for operators Structured Streaming lacks
natively: per-key mutable state carried across micro-batches, with
Arrow-batched pandas on each side.  The reference's closest analogue
is its per-process ``output_hashmap`` accumulating merged counts
across the shuffle (``map_reduce.cpp:386-438``) — here the state store
is per-key, fault-tolerant, and partitioned across executors.

Scale: state lives in the state store keyed by group — memory is
bounded by (keys × state size) per partition, and GroupStateTimeout
evicts idle keys; never hold unbounded history in state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("count", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_user_counts(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event count + latest timestamp across
    micro-batches; emit the running totals each batch."""
    count, last_ts = state.get if state.exists else (0, None)
    for pdf in pdfs:
        count += len(pdf)
        batch_max = pdf["ts"].max()
        if last_ts is None or batch_max > last_ts:
            last_ts = batch_max
    state.update((count, last_ts))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [count], "last_ts": [last_ts]})


def running_user_counts(events: DataFrame) -> DataFrame:
    """Streaming per-user running event counts with custom state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
