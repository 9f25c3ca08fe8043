"""Composed pipeline + BM25: oracle parity and composition sanity."""

from __future__ import annotations

import pytest

from map_reduce_multi_threaded_spark.operators import pipeline
from tests.oracle_utils import compare

ORACLE_SPECS = [s for s in pipeline.SPECS if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, sf_oracle_dir, spec):
    compare(spec.fn(spark, sf_oracle_dir), spec.oracle, sf_oracle_dir)


def test_pipeline_dedup_actually_fires(spark, sf_oracle_dir):
    """The two-batch union doubles the corpus; the pipeline's dedup
    must bring per-source doc counts back to single-batch levels."""
    rows = pipeline.pipeline_end_to_end(spark, sf_oracle_dir).collect()
    assert sum(r["n_docs"] for r in rows) <= 500  # never more than one batch


def test_bm25_descending_and_positive(spark, sf_oracle_dir):
    rows = sorted(
        pipeline.bm25_rank(spark, sf_oracle_dir).collect(), key=lambda r: r["rank"]
    )
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_balance_sources_hits_exact_quotas(spark, sf_oracle_dir):
    """Rank-based mixing must keep EXACTLY ceil(n_src * rate) docs per
    source — the property threshold sampling only has in expectation."""
    import math

    from map_reduce_multi_threaded_spark.operators import pipeline as P
    from tests.oracle_utils import duck_con

    con = duck_con(sf_oracle_dir)
    n_by_src = dict(con.sql("SELECT source, count(*) FROM documents GROUP BY 1").fetchall())
    rows = P.pipeline_balance_sources(spark, sf_oracle_dir).collect()
    kept = {}
    for r in rows:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
    import hashlib

    for src, n in n_by_src.items():
        rate_num = 1 + int(hashlib.md5(src.encode()).hexdigest()[:15], 16) % P.MIX_RATE_BUCKETS
        assert kept.get(src, 0) == math.ceil(n * rate_num / P.MIX_RATE_BUCKETS)


def test_rerank_stays_within_candidates_and_reorders(spark, sf_oracle_dir):
    """The rerank stage must only ever emit docs the retrieval stage
    nominated (stage-2 cost is O(k), never O(corpus)), and at sf0.01 it
    must genuinely CHANGE the ordering vs raw BM25 — a reranker that
    returns the input order is a no-op, and this pin makes the oracle
    parity check meaningful rather than vacuous."""
    from map_reduce_multi_threaded_spark.operators import pipeline as P

    import pyspark.sql.functions as F

    # same (bm25 DESC, doc_id ASC) total order as the query — a plain
    # bm25 sort would make a boundary tie pick an arbitrary candidate
    # here while the query picks the lower doc_id
    cand = {
        r["doc_id"]
        for r in P._bm25_scored(spark, sf_oracle_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(P.RERANK_CANDIDATES)
        .collect()
    }
    rr = sorted(
        P.rerank_crossencoder(spark, sf_oracle_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rr) == P.RERANK_TOPN
    assert {r["doc_id"] for r in rr} <= cand
    scores = [r["rerank_score"] for r in rr]
    assert scores == sorted(scores, reverse=True)
    bm = [r["doc_id"] for r in sorted(
        P.bm25_rank(spark, sf_oracle_dir).collect(), key=lambda r: r["rank"])]
    assert [r["doc_id"] for r in rr] != bm


def test_mmr_diversifies_within_candidates(spark, sf_oracle_dir):
    """MMR must (a) pick only nominated candidates (stage-2 cost
    bounded by k), (b) lead with the single most relevant doc — λ·rel
    dominates an empty selected set — and (c) actually buy diversity:
    the mean pairwise token-Jaccard of its picks must not exceed that
    of the pure-relevance top-{MMR_TOPN}, else λ or the similarity
    metric silently stopped mattering and oracle parity is vacuous."""
    from itertools import combinations

    import pyspark.sql.functions as F

    from map_reduce_multi_threaded_spark.operators import pipeline as P
    from map_reduce_multi_threaded_spark.sources.tables import load_table

    cand_rows = (
        P._bm25_scored(spark, sf_oracle_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(P.RERANK_CANDIDATES)
        .collect()
    )
    cand = {r["doc_id"] for r in cand_rows}
    by_rel = [r["doc_id"] for r in cand_rows[: P.MMR_TOPN]]
    mmr = sorted(P.rerank_mmr(spark, sf_oracle_dir).collect(), key=lambda r: r["rank"])
    assert len(mmr) == P.MMR_TOPN
    picks = [r["doc_id"] for r in mmr]
    assert set(picks) <= cand
    assert picks[0] == by_rel[0]

    texts = {
        r["doc_id"]: set(r["text"].split())
        for r in load_table(spark, sf_oracle_dir, "documents")
        .where(F.col("doc_id").isin(*cand))
        .collect()
    }

    def mean_jac(ids):
        js = [
            len(texts[a] & texts[b]) / len(texts[a] | texts[b])
            for a, b in combinations(ids, 2)
        ]
        return sum(js) / len(js)

    assert mean_jac(picks) <= mean_jac(by_rel) + 1e-12, (picks, by_rel)


def test_rerank_plan_uses_arrow_batch_stage(spark, sf_dir):
    """The pairwise scorer must run as an Arrow-batched pandas stage
    (the model-call slot) fed by a BROADCAST of the bounded candidate
    set — not a shuffle join, not a row-at-a-time Python UDF."""
    from map_reduce_multi_threaded_spark.operators import pipeline as P

    plan = (
        P.rerank_crossencoder(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_snapshot_diff_statuses_match_the_simulated_refresh(spark, sf_oracle_dir):
    """Status semantics pinned against the refresh rules: removed ⇔
    dropped 13-multiples, changed ⇔ surviving 7-multiples, added ⇔
    re-appearances in the new-id namespace; nothing else leaks."""
    from map_reduce_multi_threaded_spark.operators import pipeline as P
    from tests.oracle_utils import duck_con

    rows = P.corpus_snapshot_diff(spark, sf_oracle_dir).collect()
    con = duck_con(sf_oracle_dir)
    (idbase,) = con.sql(
        "SELECT CAST(power(10, ceil(log10(max(doc_id) + 1))) AS BIGINT) FROM documents"
    ).fetchone()
    by = {}
    for r in rows:
        by.setdefault(r["status"], set()).add(r["doc_id"])
    assert all(i % 13 == 0 for i in by["removed"])
    assert all(i % 7 == 0 and i % 13 != 0 for i in by["changed"])
    assert all(i >= idbase and (i - idbase) % 11 == 0 for i in by["added"])
    assert by["removed"] and by["changed"] and by["added"]


def test_rag_composition_is_meaningful(spark, sf_oracle_dir):
    """The composed chain must produce a real ranking: full top-k with
    strictly positive integer dots in non-increasing order, and — over
    the WHOLE corpus, where the margin is dozens of docs rather than
    the single top-10 row that originally carried this pin — a
    meaningful set of documents whose best chunk is NOT chunk 0,
    proving the per-doc window genuinely selects within documents."""
    from map_reduce_multi_threaded_spark.operators import pipeline as P
    from tests.oracle_utils import duck_con

    rows = sorted(
        P.pipeline_rag_end_to_end(spark, sf_oracle_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == P.RAG_TOPN
    dots = [r["dot"] for r in rows]
    assert all(d > 0 for d in dots) and dots == sorted(dots, reverse=True)
    con = duck_con(sf_oracle_dir)
    sql = (
        P._rag_oracle().rsplit("SELECT rank,", 1)[0]
        + "SELECT count(*) FILTER (WHERE chunk_idx > 0) FROM best"
    )
    (nonzero_best,) = con.sql(sql).fetchone()
    assert nonzero_best >= 10, nonzero_best  # 43 at sf0.01 today


def test_snapshot_diff_prunes_to_id_and_text(spark, sf_dir):
    """Both snapshot scans must read only (doc_id, text) — the diff is
    hash-projected in the scan, so lang/source/n_chars never leave
    parquet — and the diff join itself is a non-nested-loop full outer
    on doc_id."""
    from map_reduce_multi_threaded_spark.operators import pipeline as P

    plan = (
        P.corpus_snapshot_diff(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    reads = re.findall(r"ReadSchema: (\S+)", plan)
    assert reads and all(
        "lang" not in r and "source" not in r and "n_chars" not in r
        for r in reads
    ), reads
    foj = [l for l in plan.splitlines() if "FullOuter" in l]
    assert foj and all("NestedLoop" not in l for l in foj), foj


def test_rag_scoring_is_single_data_exchange(spark, sf_dir):
    """The fused dot product must shuffle the scored token stream
    exactly once, on (doc_id, chunk_idx) — no intermediate
    (doc, chunk, bucket) frame ever reaches an exchange, and (round 7)
    no Python-RDD-backed local relation appears anywhere in the plan
    (the query vector is a driver-side literal map).  Exchange count is
    an upper bound, not an exact match (ADVICE r6: a planner/AQE change
    may legitimately fuse an exchange) — the load-bearing assertions
    are the negative ones."""
    from map_reduce_multi_threaded_spark.operators import pipeline as P

    plan = (
        P.pipeline_rag_end_to_end(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    ex = [
        line for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    ]
    # (doc, chunk) scoring agg + per-doc window; anything more means a
    # frame we meant to fuse is shuffling again
    assert len(ex) <= 2, ex
    assert not any("chunk_idx" in l and ", b#" in l for l in ex), ex
    # the round-7 regression this test exists to prevent: a local-data
    # createDataFrame re-entering the plan as a Python RDD scan
    # (32 Python worker tasks per execution — see BACKLOG)
    assert "Scan ExistingRDD" not in plan, plan


def test_py_md5_bucket_matches_spark(spark):
    """Driver-side constant folding is only sound if py_md5_bucket is
    bit-identical to the md5_bucket Column expression."""
    import pyspark.sql.functions as F

    from map_reduce_multi_threaded_spark.functions.text import (
        md5_bucket,
        py_md5_bucket,
    )
    from map_reduce_multi_threaded_spark.operators.pipeline import (
        BM25_QUERY_TERMS,
        RAG_BUCKETS,
    )

    toks = list(BM25_QUERY_TERMS) + ["", "a", "don't", "ZZZ", "42", "émoji"]
    rows = (
        spark.range(1)
        .select(F.explode(F.array(*[F.lit(t) for t in toks])).alias("tok"))
        .select(
            "tok",
            md5_bucket(F.col("tok"), RAG_BUCKETS, salt="feat").alias("b"),
        )
        .collect()
    )
    for r in rows:
        assert r.b == py_md5_bucket(r.tok, RAG_BUCKETS, salt="feat"), r.tok


def test_corpus_release_gate_algebra(spark, sf_oracle_dir):
    """End-to-end algebra of the release gates (BACKLOG depth item):
    the manifest rows must account for the release EXACTLY —
    batch_kept + batch_dropped = simulated batch size, batch_kept =
    the novel (edited) docs, release_docs = corpus + kept, ids_unique
    holds, and the XOR of per-shard checksums equals the XOR over the
    release computed independently."""
    from functools import reduce

    import pyspark.sql.functions as F

    from map_reduce_multi_threaded_spark.functions.text import md5_long
    from map_reduce_multi_threaded_spark.operators.pipeline import (
        pipeline_corpus_release,
    )
    from map_reduce_multi_threaded_spark.sources.tables import load_table

    rows = pipeline_corpus_release(spark, sf_oracle_dir).collect()
    assert rows
    d = load_table(spark, sf_oracle_dir, "documents")
    n_corpus = d.count()
    n_third = d.where(F.col("doc_id") % 3 == 0).count()
    n_fifth = d.where(F.col("doc_id") % 5 == 0).count()

    first = rows[0]
    # release-level columns are window constants: identical on every row
    for r in rows:
        assert (
            r["release_docs"], r["ids_unique"], r["batch_kept"], r["batch_dropped"]
        ) == (
            first["release_docs"], first["ids_unique"],
            first["batch_kept"], first["batch_dropped"],
        )
    assert first["ids_unique"] is True
    assert first["batch_kept"] == n_fifth, "every edited doc is novel"
    assert first["batch_dropped"] == n_third, "every verbatim re-crawl is a dup"
    assert first["batch_kept"] + first["batch_dropped"] == n_third + n_fifth
    assert first["release_docs"] == n_corpus + n_fifth
    assert first["release_docs"] == sum(r["n_docs"] for r in rows)

    # checksum algebra: XOR over shards == XOR over the release
    total_xor = reduce(lambda a, b: a ^ b, (r["content_checksum"] for r in rows), 0)
    base = 10 ** len(str(d.agg(F.max("doc_id")).collect()[0][0]))
    novel = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2 * base).alias("doc_id"),
        F.concat("text", F.lit(" revised")).alias("text"),
    )
    release = d.select("doc_id", "text").unionByName(novel)
    # recompute with the same hash the manifest used
    direct = release.select(md5_long(F.col("text")).alias("h")).agg(
        F.expr("bit_xor(h)")
    ).collect()[0][0]
    assert total_xor == direct


def test_preference_pairs_are_extreme_and_distinct(spark, sf_oracle_dir):
    """One pair per source; chosen strictly outscores rejected; both
    ids really are that source's argmax/argmin under the documented
    tie-breaks (re-derived from collected scores)."""
    from collections import defaultdict

    from map_reduce_multi_threaded_spark.operators.pipeline import (
        pipeline_preference_pairs,
    )
    from map_reduce_multi_threaded_spark.sources.tables import load_table

    rows = pipeline_preference_pairs(spark, sf_oracle_dir).collect()
    assert rows
    assert len({r["source"] for r in rows}) == len(rows)
    docs = load_table(spark, sf_oracle_dir, "documents").select(
        "source", "doc_id", "text"
    ).collect()
    scores = defaultdict(dict)
    for d in docs:
        toks = [t for t in d["text"].split() if t]
        scores[d["source"]][d["doc_id"]] = len(set(toks))
    for r in rows:
        s = scores[r["source"]]
        assert r["margin"] == r["chosen_score"] - r["rejected_score"] > 0
        best = max(s.items(), key=lambda kv: (kv[1], -kv[0]))
        worst = min(s.items(), key=lambda kv: (kv[1], kv[0]))
        assert (r["chosen_id"], r["chosen_score"]) == (best[0], best[1])
        assert (r["rejected_id"], r["rejected_score"]) == (worst[0], worst[1])
