#!/usr/bin/env python
"""Round-7 measurement harness for the BENCH_r06 RAG discrepancy
(VERDICT r6 ask #1): pipeline_rag_end_to_end recorded 17.78 s first /
8.06 s best in the driver's full-suite bench, while the committed
round-6 A/B at the same sf measured 1.92 s.  This script measures the
query under three controlled conditions in ONE session so the
difference, if real, reproduces deterministically:

  standalone : fresh session, sf0.001 warmup, then N timed runs
  prefixed   : same session, after first running a configurable prefix
               of the bench HEADLINE (to reproduce "suite position")

Usage: python scripts/measure_rag.py [n_runs] [prefix_count]
Prints one JSON line per condition; commit the output next to the
analysis in docs/BACKLOG.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_multi_threaded_spark.registry import collect_specs
from map_reduce_multi_threaded_spark.session import get_spark

QUERY = "pipeline_rag_end_to_end"


def timed_runs(spark, spec, sf_dir, n):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    prefix_count = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure_rag")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in collect_specs()}

    # same warmup bench.py does, for the queries we'll actually run
    from bench import HEADLINE

    prefix = [q for q in HEADLINE if q != QUERY][:prefix_count]
    for name in prefix + [QUERY]:
        specs[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    prefix_times = {}
    for name in prefix:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        prefix_times[name] = round(time.perf_counter() - t0, 3)

    runs = timed_runs(spark, specs[QUERY], sf_dir, n)
    print(
        json.dumps(
            {
                "query": QUERY,
                "sf_dir": sf_dir,
                "prefix_count": len(prefix),
                "prefix_total_sec": round(sum(prefix_times.values()), 3),
                "runs": runs,
                "best": min(runs),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
