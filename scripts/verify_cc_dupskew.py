#!/usr/bin/env python
"""Engine-side exact verification of the CC family on a giant-dup
fixture (round 14, adversarial axis Q).

The DuckDB oracles for dedup_clusters / dedup_cluster_keep derive
min-label reachability with a recursive CTE — deliberately naive, and
INFEASIBLE on a fixture whose near-dup graph is 8 ~1000-doc cliques
(the CTE's working set holds every distinct (node, label) pair it has
seen; inside a clique that is quadratic before convergence — measured
>25 min single-query before the round-14 sweep killed it).  The engine
is still fully checkable: this script recomputes components with a
DRIVER-SIDE union-find over the materialized edge list (verification
tooling, not a registered path) and asserts the Spark results match
EXACTLY — labels = min doc_id per component, keep bit = longest text /
smallest id per cluster.

Usage: python scripts/verify_cc_dupskew.py /tmp/altdata/r14_dupskew
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_multi_threaded_spark.session import get_spark


def main() -> int:
    import pyspark.sql.functions as F

    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/altdata/r14_dupskew"
    spark = get_spark(app_name="verify_cc_dupskew")
    spark.sparkContext.setLogLevel("ERROR")
    from map_reduce_multi_threaded_spark.operators import dedup
    from map_reduce_multi_threaded_spark.sources.tables import load_table

    edges = (
        dedup._ppjoin_pairs_from(
            dedup.shingles(spark, fixture).localCheckpoint(eager=True)
        )
        .select("doc_a", "doc_b")
        .toPandas()
    )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth_label = {d: find(d) for d in list(parent)}
    # canonical min-label per component
    comp_min: dict[int, int] = {}
    for d, r in truth_label.items():
        comp_min[r] = min(comp_min.get(r, d), d)
    truth = {d: comp_min[find(d)] for d in truth_label}
    all_docs = [
        r["doc_id"] for r in load_table(spark, fixture, "documents")
        .select("doc_id").collect()
    ]
    for d in all_docs:
        truth.setdefault(d, d)  # singletons label themselves

    t0 = time.time()
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(spark, fixture).collect()
    }
    cc_s = round(time.time() - t0, 1)
    assert got == truth, (
        f"label mismatch: {sum(1 for d in truth if got.get(d) != truth[d])} docs"
    )
    n_comp = len({v for v in truth.values()})
    sizes = sorted(
        [sum(1 for v in truth.values() if v == c)
         for c in {v for v in truth.values()}], reverse=True
    )[:10]
    print(f"RESULT dedup_clusters exact match: {len(truth)} docs, "
          f"{n_comp} clusters, top sizes {sizes}, spark {cc_s}s")

    nchars = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, fixture, "documents")
        .select("doc_id", "n_chars").collect()
    }
    best: dict[int, int] = {}
    for d, c in truth.items():
        b = best.get(c)
        if b is None or (nchars[d], -d) > (nchars[b], -b):
            best[c] = d
    t0 = time.time()
    keep_rows = dedup.dedup_cluster_keep(spark, fixture).collect()
    keep_s = round(time.time() - t0, 1)
    got_keep = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in keep_rows}
    assert got_keep == {
        d: (c, best[c] == d) for d, c in truth.items()
    }, "keep bits mismatch"
    print(f"RESULT dedup_cluster_keep exact match "
          f"({sum(1 for _, k in got_keep.values() if k)} kept), spark {keep_s}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
