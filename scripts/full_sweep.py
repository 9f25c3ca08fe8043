#!/usr/bin/env python
"""Full-registry driver-style oracle sweep at one or more scale
factors — the superset of the round driver's ~50-query sf0.01 gate
(round-5 lesson: scale-dependent float fragility is invisible at the
small gate).  Prints one line per (sf, query) failure and a final
summary; exit code 1 on any failure.

Usage: python scripts/full_sweep.py [sf0.01] [sf0.1] ...
       python scripts/full_sweep.py /tmp/altdata/alt1   # absolute dir
                                                        # (alt fixture)
       --verbose / -v : print per-query timings (always printed for
                        queries over 5 s — adversarial fixtures can
                        make single queries dominate a sweep, round 13)
       --skip=a,b     : skip named queries (round 14: some DuckDB
                        oracle spellings are deliberately naive —
                        wedge enumeration, recursive-CTE CC — and are
                        INFEASIBLE on giant-dup-family fixtures; skip
                        them here and verify those queries engine-side
                        instead, recording why in docs/altfixture_*.md)
       --start-after=q: resume a crashed/killed sweep after query q
                        (spec order is deterministic)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_multi_threaded_spark.registry import collect_specs
from map_reduce_multi_threaded_spark.session import get_spark
from tests.oracle_utils import compare


def main() -> int:
    known_flags = ("--verbose", "-v")
    known_prefixes = ("--skip=", "--start-after=")
    unknown = [
        a for a in sys.argv[1:]
        if a.startswith("-") and a not in known_flags
        and not a.startswith(known_prefixes)
    ]
    if unknown:
        # ADVICE r13: a typo like `-sf0.1` used to be silently dropped,
        # quietly sweeping the default fixtures instead of failing.
        sys.exit(f"unknown flag(s): {' '.join(unknown)}; known: {known_flags}")
    verbose = any(a in known_flags for a in sys.argv[1:])
    skip: set[str] = set()
    start_after = None
    for a in sys.argv[1:]:
        if a.startswith("--skip="):
            skip |= {n for n in a[len("--skip="):].split(",") if n}
        elif a.startswith("--start-after="):
            start_after = a[len("--start-after="):]
    sfs = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "sf0.01", "sf0.1"
    ]
    specs = collect_specs()
    # ADVICE r14: a misspelled --start-after used to make seen_start
    # never flip, silently skipping EVERY query and exiting 0 green —
    # the same silent-skip mode the unknown-flag check above closes.
    known_names = {s.name for s in specs}
    bad_names = sorted(
        (skip | ({start_after} if start_after else set())) - known_names
    )
    if bad_names:
        sys.exit(f"unknown query name(s): {', '.join(bad_names)}")
    spark = get_spark(app_name="full_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for sf in sfs:
        sf_dir = sf if os.path.isabs(sf) else f"/root/testdata/{sf}"
        t0 = time.perf_counter()
        seen_start = start_after is None
        for spec in specs:
            if not seen_start:
                seen_start = spec.name == start_after
                continue
            if spec.name in skip:
                print(f"SKIP {sf} {spec.name}", flush=True)
                continue
            q0 = time.perf_counter()
            try:
                compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
            except Exception as exc:  # noqa: BLE001 - report and continue
                failures.append((sf, spec.name, str(exc)[:200]))
                print(f"FAIL {sf} {spec.name}: {str(exc)[:200]}", flush=True)
            dt = time.perf_counter() - q0
            if verbose or dt > 5:
                print(f"TIME {sf} {spec.name}: {round(dt, 1)}s", flush=True)
        print(
            f"SWEEP {sf}: {len(specs)} queries, "
            f"{len([f for f in failures if f[0] == sf])} failures, "
            f"{round(time.perf_counter() - t0, 1)}s",
            flush=True,
        )
    print(f"TOTAL failures: {len(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
