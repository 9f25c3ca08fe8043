#!/usr/bin/env python
"""Append exchange-count budgets for queries not yet in
tests/plan_budget.json (new queries are skipped by the gate until
baselined here).  Existing budgets are never modified — loosening a
committed budget stays a conscious manual edit.

Usage: python scripts/baseline_plan_budget.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_multi_threaded_spark.session import get_spark
from tests.test_plan_policy import SF, _batch_specs


def main() -> int:
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "plan_budget.json")
    with open(path) as f:
        budget = json.load(f)
    spark = get_spark(app_name="baseline_plan_budget")
    spark.sparkContext.setLogLevel("ERROR")
    added = {}
    for s in _batch_specs():
        if s.name in budget:
            continue
        plan = s.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        n = (
            plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition")
        )
        added[s.name] = n
        print(f"ADD {s.name}: {n}", flush=True)
    if added:
        budget.update(added)
        with open(path, "w") as f:
            f.write("{\n")
            f.write(",\n".join(f'"{k}": {v}' for k, v in sorted(budget.items())))
            f.write("\n}\n")
    print(f"baselined {len(added)} new queries")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
