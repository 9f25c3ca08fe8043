#!/usr/bin/env python
"""Per-user-window skew audit (round 14, VERDICT r13 ask #1).

The round-12/13 A/Bs proved the evidence→recipe→gate pipeline on the
as-of/interval family; this script measures the REST of the per-user
window/sort surface on the same 100×/90%-one-key fixture so every
operator that cliffs gets the gate and every operator that doesn't
gets a measured "linear frame, straggler-bounded" annotation instead
of an unmeasured guess.

Method: for every registered batch query in operators/relational.py
(plus any module passed via --modules), build the plan on the skew
fixture and keep the ones whose executed plan contains a Window or
Sort keyed by hashpartitioning(user_id) ALONE — the shapes where one
90% key lands in one task.  Each candidate then runs to the noop sink
under a wall-clock cap; a capped run is reported as `capped` (the
cliff signal — on local[32] a balanced 300k-event query finishes in
single-digit seconds, so hitting a 120 s cap means a super-linear
single task, the r12 plain-carry signature).

Usage:
  python scripts/skew_window_audit.py /tmp/altdata/skew100_r14 \
      [--cap 120] [--names q1,q2] [--json docs/skew_audit_r14.json]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_multi_threaded_spark.registry import collect_specs
from map_reduce_multi_threaded_spark.session import get_spark

#: plan shapes that concentrate one key in one task: a hash exchange
#: whose ONLY key is the audited column (Window/Sort/SMJ on the raw
#: key).  The (key, bucket) spellings the gate dispatches to do NOT
#: match.  Round 15 (VERDICT r14 ask #6): the audited key is now a
#: --key-cols parameter so the same protocol covers the other
#: hot-key-prone families (word/token/gram in textstats, doc_id in
#: the dedup shingle fan-out, custkey in the TPC-H joins) — user_id
#: remains the default.
def _key_exchange_re(key_cols: str) -> re.Pattern:
    alt = "|".join(re.escape(c) for c in key_cols.split(",") if c)
    return re.compile(rf"hashpartitioning\((?:{alt})#\d+L?, \d+\)")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _timed_noop(spark, name: str, df, cap: float, observe_rows: bool = False):
    """Run df to the noop sink in a worker thread under a job group;
    cancel the group at the cap.  Returns (seconds | None, err | None,
    rows | None); (None, None, None) means capped.  With
    ``observe_rows`` the OUTPUT row count rides the same action via
    Dataset.observe (round 15: quadratic-OUTPUT queries need the
    volume recorded alongside the wall time — part of a 'capped' cost
    can be irreducible output, and the cap policy must distinguish
    that from a bad plan)."""
    sc = spark.sparkContext
    group = f"skew_audit_{name}"
    out: dict = {}
    obs = None
    if observe_rows:
        from pyspark.sql import Observation
        import pyspark.sql.functions as F

        obs = Observation(f"rows_{name}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))

    def work():
        sc.setJobGroup(group, name, interruptOnCancel=True)
        t0 = time.perf_counter()
        try:
            df.write.format("noop").mode("overwrite").save()
            out["t"] = time.perf_counter() - t0
            if obs is not None:
                out["rows"] = obs.get["rows"]
        except Exception as exc:  # noqa: BLE001 - cancellation lands here
            out["err"] = str(exc)[:200]

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(cap)
    if th.is_alive():
        sc.cancelJobGroup(group)
        th.join(60)
        return None, None, None
    if "err" in out:
        return None, out["err"], None
    return out["t"], None, out.get("rows")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("fixture")
    ap.add_argument("--cap", type=float, default=120.0)
    ap.add_argument("--names", default="", help="comma list; default = auto-detect")
    ap.add_argument("--all", action="store_true",
                    help="run every query in --modules regardless of the "
                         "user-keyed plan filter (engine-only 100x stress "
                         "sweep — no oracle, any key can be the hot one)")
    ap.add_argument("--modules", default="relational",
                    help="comma list of operator-module suffixes to scan")
    ap.add_argument("--key-cols", default="user_id",
                    help="comma list of columns whose single-key hash "
                         "exchanges select a query for the audit "
                         "(e.g. word,token,gram / doc_id / "
                         "c_custkey,o_custkey)")
    ap.add_argument("--observe-rows", action="store_true",
                    help="record each query's OUTPUT row count via "
                         "Dataset.observe on the same noop action — "
                         "use when the output itself may be the cost "
                         "(quadratic-output dedup families)")
    ap.add_argument("--exempt", default="",
                    help="comma list of queries to record as "
                         "'exempt_brute_baseline' WITHOUT running — "
                         "for labeled quadratic-by-design correctness "
                         "baselines whose scale path is a separate "
                         "registered query")
    ap.add_argument("--json", default="", help="write results JSON here")
    a = ap.parse_args()

    mods = tuple(a.modules.split(","))
    only = set(n for n in a.names.split(",") if n)
    all_names = {s.name for s in collect_specs()}
    bad = sorted((only | set(n for n in a.exempt.split(",") if n)) - all_names)
    if bad:
        # round 15: a typo in --names used to silently run nothing
        sys.exit(f"unknown query name(s): {', '.join(bad)}")
    spark = get_spark(app_name="skew_window_audit")
    spark.sparkContext.setLogLevel("ERROR")
    if only:
        # explicit names take precedence over everything (round 14:
        # --all + --names used to run the whole module, so a re-time
        # of one fixed query burned its cap on the brute baselines)
        specs = [s for s in collect_specs() if s.name in only]
    else:
        specs = [
            s for s in collect_specs()
            if s.fn.__module__.rsplit(".", 1)[-1] in mods
        ]
    exempt = set(n for n in a.exempt.split(",") if n)
    results: dict[str, dict] = {}
    for spec in specs:
        if spec.name in exempt:
            results[spec.name] = {
                "status": "exempt_brute_baseline",
                "note": "quadratic-by-design correctness baseline; "
                        "scale path is a separate registered query",
            }
            print(f"EXEMPT  {spec.name} (brute baseline)", flush=True)
            continue
        b0 = time.perf_counter()
        try:
            df = spec.fn(spark, a.fixture)
            plan = _plan(df)
        except Exception as exc:  # noqa: BLE001 - build failure is a result
            results[spec.name] = {"status": "build_err", "err": str(exc)[:200]}
            print(f"BUILD_ERR {spec.name}: {str(exc)[:160]}", flush=True)
            continue
        build_s = time.perf_counter() - b0
        user_only = bool(_key_exchange_re(a.key_cols).search(plan))
        if only or a.all:
            pass  # explicit names / --all always run
        elif not user_only:
            continue
        t, err, rows = _timed_noop(spark, spec.name, df, a.cap,
                                   observe_rows=a.observe_rows)
        if t is None and err is None:
            results[spec.name] = {"status": "capped", "cap_s": a.cap,
                                  "build_s": round(build_s, 2)}
            print(f"CAPPED  {spec.name} (> {a.cap:.0f}s)", flush=True)
        elif err is not None:
            results[spec.name] = {"status": "err", "err": err}
            print(f"ERR     {spec.name}: {err[:160]}", flush=True)
        else:
            results[spec.name] = {"status": "ok", "secs": round(t, 2),
                                  "build_s": round(build_s, 2)}
            if rows is not None:
                results[spec.name]["out_rows"] = int(rows)
            print(f"OK      {spec.name}: {t:.2f}s"
                  + (f" ({rows} rows)" if rows is not None else ""),
                  flush=True)
    if a.json:
        with open(a.json, "w") as fh:
            json.dump({"fixture": a.fixture, "cap_s": a.cap,
                       "results": results}, fh, indent=1, sort_keys=True)
    ranked = sorted(
        results.items(),
        key=lambda kv: -(kv[1].get("secs") or a.cap + 1),
    )
    print("== ranked ==")
    for name, r in ranked:
        print(f"{r.get('secs', r['status'])}\t{name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
