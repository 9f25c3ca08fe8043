#!/usr/bin/env python
"""Measure the skew gate's stats pre-pass cost at sf0.1 (VERDICT r13
ask #4: the ~0.1 s claim in docs/skew_gate_ab_r13.md read 2-4x
optimistic — measure per-gated-query pre-pass cost properly, including
the round-14 per-session memoization).

Protocol: warm session, best-of-N wall times for
  (a) the pre-pass alone (_hot_key_stats on the exact gated input),
  (b) each gated query cold (memo cleared before every run), and
  (c) each gated query warm (memo primed — the sweep/bench shape,
      where the resample pair also shares one entry).

Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_multi_threaded_spark.operators import relational as R
from map_reduce_multi_threaded_spark.session import get_spark
from map_reduce_multi_threaded_spark.sources.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(os.environ.get("GATE_COST_RUNS", "3"))


def best_of(fn, n=N):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3)


def main() -> int:
    import pyspark.sql.functions as F

    spark = get_spark(app_name="measure_gate_cost")
    spark.sparkContext.setLogLevel("ERROR")

    def asof_input():
        ev = load_table(spark, SF_DIR, "events")
        p = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
        e = ev.where(F.col("event_type") == "error").select("user_id", "ts")
        return p.unionByName(e)

    def resample_input():
        return load_table(spark, SF_DIR, "events").select(
            "user_id",
            F.expr(f"unix_micros(ts) div {R.RESAMPLE_BUCKET_US}").alias("bucket"),
        )

    out = {"sf_dir": SF_DIR, "runs": N}
    # (a) the pre-pass alone, uncached
    out["prepass_asof_s"] = best_of(
        lambda: (R._HOT_KEY_STATS_CACHE.clear(),
                 R._hot_key_stats(asof_input(), ["user_id"], "ts"))
    )
    out["prepass_resample_s"] = best_of(
        lambda: (R._HOT_KEY_STATS_CACHE.clear(),
                 R._hot_key_stats(resample_input(), ["user_id", "bucket"]))
    )

    def run_query(fn, cold):
        if cold:
            R._HOT_KEY_STATS_CACHE.clear()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for name, fn in (
        ("join_asof_nearest", R.join_asof_nearest),
        ("events_resample_ffill", R.events_resample_ffill),
        ("events_resample_interpolate", R.events_resample_interpolate),
    ):
        out[f"{name}_cold_s"] = best_of(lambda f=fn: run_query(f, cold=True))
        out[f"{name}_warm_s"] = best_of(lambda f=fn: run_query(f, cold=False))
    # the sweep shape: ffill primes the memo, interpolate reuses it
    R._HOT_KEY_STATS_CACHE.clear()

    def pair():
        R._HOT_KEY_STATS_CACHE.clear()
        run_query(R.events_resample_ffill, cold=False)
        run_query(R.events_resample_interpolate, cold=False)

    out["resample_pair_shared_memo_s"] = best_of(pair)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
