#!/usr/bin/env python
"""Round-7 streaming replay-floor attribution (VERDICT r6 ask #6):
stream_join_left_outer (~6 s) and stream_tumbling_multibatch (~3.7 s)
dominate the streaming bench; BACKLOG attributes the cost to per-batch
state-store commits, not the plan.  This script backs that claim with
the engine's own telemetry: per-micro-batch ``durationMs`` phases
(addBatch = plan execution, walCommit/commitOffsets = offset-log
fsyncs, getBatch/latestOffset = source listing) and per-operator state
commit times from the StreamingQuery progress JSON, captured by
``run_to_memory`` during a normal drain at $SPARK_GRAFT_SF_DIR.

Prints one JSON document; committed as docs/stream_floor_r7.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_multi_threaded_spark.registry import collect_specs
from map_reduce_multi_threaded_spark.session import get_spark
from map_reduce_multi_threaded_spark.streaming import windows as W

QUERIES = {
    "stream_join_left_outer": "stream_join_lo_sink",
    "stream_tumbling_multibatch": "stream_tumbling_mb_sink",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stream_floor")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in collect_specs()}
    out: dict[str, dict] = {"sf_dir": sf_dir}
    for name, sink in QUERIES.items():
        walls = []
        for _ in range(2):  # cold (staging+codegen) then warm; progress
            t0 = time.perf_counter()  # below comes from the warm run
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
        wall = walls[-1]
        batches = []
        for p in W.RECENT_PROGRESS.get(sink, []):
            d = p.get("durationMs", {})
            batches.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": d,
                    "stateOperators": [
                        {
                            "operatorName": so.get("operatorName"),
                            "commitTimeMs": so.get("commitTimeMs"),
                            "numRowsTotal": so.get("numRowsTotal"),
                            "numRowsUpdated": so.get("numRowsUpdated"),
                        }
                        for so in p.get("stateOperators", [])
                    ],
                }
            )
        phase_totals: dict[str, int] = {}
        for b in batches:
            for k, v in b["durationMs"].items():
                phase_totals[k] = phase_totals.get(k, 0) + int(v)
        commit_total = sum(
            so["commitTimeMs"] or 0
            for b in batches
            for so in b["stateOperators"]
        )
        out[name] = {
            "wall_sec_runs": walls,
            "wall_sec": wall,
            "n_micro_batches": len(batches),
            "phase_totals_ms": phase_totals,
            "state_commit_total_ms": commit_total,
            "batches": batches,
        }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
