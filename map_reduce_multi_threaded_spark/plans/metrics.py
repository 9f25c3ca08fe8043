"""Metrics — the engine's answer to the reference's hand-rolled
per-stage timers (S15: ``map_reduce.cpp:44-49, 497-613``, MPI_Wtime
deltas reduced to rank 0).

Spark already records task/stage metrics internally; the supported
query-level surface is ``Dataset.observe`` (JVM-side accumulators
evaluated inline with the query — zero extra passes), plus wall-clock
around actions for harness-level timing.  Use these instead of
re-counting rows with a second action.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


def observe_rows(df: DataFrame, *extra_metrics) -> tuple[DataFrame, Observation]:
    """Attach an Observation counting output rows (plus any extra
    aggregate Columns).  Metrics materialize when an action runs —
    one pass, no re-execution, exactly the reference's 'count as you
    go' instrumentation done declaratively."""
    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"), *extra_metrics)
    return observed, obs


def timed(action: Callable[[], Any]) -> tuple[Any, float]:
    """Wall-clock an action (the bench harness's primitive)."""
    t0 = time.perf_counter()
    result = action()
    return result, time.perf_counter() - t0
