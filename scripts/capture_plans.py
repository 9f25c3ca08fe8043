#!/usr/bin/env python
"""Capture `explain("formatted")` for named queries into plan files.

Usage:
  python scripts/capture_plans.py --out plans/r16 --suffix before \
      --sf /root/testdata/sf0.1 q1 q2 ...

Writes <out>/<query>_<suffix>.txt for each name — the committed
evidence files the optimization-round judge diffs against the code
(the judge cannot run Spark).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_multi_threaded_spark.registry import collect_specs
from map_reduce_multi_threaded_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    a = ap.parse_args()
    specs = {s.name: s for s in collect_specs()}
    bad = [n for n in a.names if n not in specs]
    if bad:
        sys.exit(f"unknown query name(s): {', '.join(bad)}")
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(a.out, exist_ok=True)
    for name in a.names:
        df = specs[name].fn(spark, a.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(a.out, f"{name}_{a.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
