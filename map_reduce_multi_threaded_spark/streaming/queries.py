"""Streaming query specs — each runs a REAL Structured Streaming query
(file-source replay → availableNow trigger → memory sink) and returns
the drained result, so the DuckDB oracle gates streaming execution,
not just the window expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import QuerySpec
from . import windows as W


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = W.read_events_stream(spark, sf_dir)
    return W.run_to_memory(W.tumbling_counts(ev), "stream_tumbling_sink")


_TUMBLING_ORACLE = """
SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = W.read_events_stream(spark, sf_dir)
    return W.run_to_memory(W.session_counts(ev), "stream_session_sink")


_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       count(*) AS n_events
FROM sessions GROUP BY user_id, session_id
"""


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-union doubles every event; streaming dropDuplicates must
    collapse them back to the batch truth."""
    ev = W.read_events_stream(spark, sf_dir)
    doubled = ev.unionByName(W.read_events_stream(spark, sf_dir))
    return W.run_to_memory(W.dedup_counts(doubled), "stream_dedup_sink")


_DEDUP_ORACLE = """
SELECT event_type, count(*) AS n_events FROM events GROUP BY 1
"""


SPECS = [
    QuerySpec("stream_tumbling", stream_tumbling, _TUMBLING_ORACLE,
              "streaming tumbling windows drained through a memory sink"),
    QuerySpec("stream_session", stream_session, _SESSION_ORACLE,
              "streaming session windows (30-min gap) per user"),
    QuerySpec("stream_dedup", stream_dedup, _DEDUP_ORACLE,
              "streaming dropDuplicates over a doubled replay"),
]
