#!/usr/bin/env python
"""Text-side twin of measure_dup_collapse.py (round 15): measure the
SCALE.md "collapse exact duplicates before near-dup banding" rule for
the DOCUMENT pipeline (MinHash+LSH), on a giant-identical-family
fixture.

Same theorem as the embedding side: identical texts produce identical
shingle sets, hence identical MinHash signatures, band hashes and
verification Jaccards — so (a) every within-family pair is found with
J=1, (b) a cross-family member pair collides iff its representative
pair collides and carries the same Jaccard.  Therefore

  |dedup_minhash_lsh(corpus)| == Σ_fam C(w_f, 2)
                                + Σ_{(a,b) in dedup_minhash_lsh(reps)} w_a·w_b

and the composed path (one O(n) hash collapse + banding over DISTINCT
texts + integer weight readout) is lossless.  Unlike the embedding
twin there is no corpus-count-adaptive banding parameter — 48/12×4 is
fixed — so no index-parameter priming is needed.

Usage:
  python scripts/measure_dup_collapse_text.py /tmp/altdata/r15_dup100 \
      [--raw-rows N | --run-raw] [--json docs/dup_collapse_text_r15.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from map_reduce_multi_threaded_spark.session import get_spark
from map_reduce_multi_threaded_spark.sources.tables import load_table


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("fixture")
    ap.add_argument("--raw-rows", type=int, default=None)
    ap.add_argument("--run-raw", action="store_true")
    ap.add_argument("--json", default="")
    a = ap.parse_args()

    spark = get_spark(app_name="measure_dup_collapse_text")
    spark.sparkContext.setLogLevel("ERROR")
    from map_reduce_multi_threaded_spark.operators import dedup as D

    out: dict = {"fixture": a.fixture}
    docs = load_table(spark, a.fixture, "documents")

    t0 = time.perf_counter()
    # 1. exact collapse: the text is the key (at 100 TB, a digest of
    #    the bytes — same single hash shuffle)
    fams = (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("w"),
             F.min("lang").alias("lang"), F.min("source").alias("source"),
             F.min("n_chars").alias("n_chars"))
        .localCheckpoint()
    )
    n_fams = fams.count()
    within = fams.select(
        F.sum(F.col("w") * (F.col("w") - 1) / 2).cast("long").alias("m")
    ).first()["m"]

    # 2. band + verify the DISTINCT representatives via the REGISTERED
    #    production path over a staged reps-only fixture dir
    reps_dir = os.path.join("/tmp", "dup_collapse_text_reps")
    fams.select(F.col("rep_id").alias("doc_id"), "text", "lang",
                "source", "n_chars") \
        .coalesce(1).write.mode("overwrite").parquet(f"{reps_dir}/documents.parquet")
    rep_pairs = D.dedup_minhash_lsh(spark, reps_dir)

    # 3. weighted readout
    wa = fams.select(F.col("rep_id").alias("doc_a"), F.col("w").alias("wa"))
    wb = fams.select(F.col("rep_id").alias("doc_b"), F.col("w").alias("wb"))
    cross = (
        rep_pairs.join(wa, "doc_a").join(wb, "doc_b")
        .select(F.sum(F.col("wa") * F.col("wb")).cast("long").alias("m"))
        .first()["m"]
    ) or 0
    composed_s = time.perf_counter() - t0
    total = int(within) + int(cross)
    out.update({
        "n_docs": docs.count(),
        "n_families": n_fams,
        "within_family_pairs": int(within),
        "cross_family_pairs": int(cross),
        "composed_total_pairs": total,
        "composed_secs": round(composed_s, 2),
    })
    print(f"COMPOSED {composed_s:.2f}s: {n_fams} families, "
          f"{within} within + {cross} cross = {total} pairs", flush=True)

    raw = a.raw_rows
    if a.run_raw:
        t0 = time.perf_counter()
        raw = D.dedup_minhash_lsh(spark, a.fixture).count()
        out["raw_secs"] = round(time.perf_counter() - t0, 2)
        print(f"RAW      {out['raw_secs']}s: {raw} pairs", flush=True)
    if raw is not None:
        out["raw_total_pairs"] = int(raw)
        out["exact_match"] = (total == int(raw))
        print(f"IDENTITY {'EXACT' if out['exact_match'] else 'MISMATCH'}: "
              f"composed {total} vs raw {raw}", flush=True)
    if a.json:
        with open(a.json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()
    return 0 if raw is None or out.get("exact_match") else 1


if __name__ == "__main__":
    sys.exit(main())
