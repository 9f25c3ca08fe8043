"""Text analysis: oracle parity + sanity checks."""

from __future__ import annotations

import pytest

from map_reduce_multi_threaded_spark.operators import textstats
from tests.oracle_utils import compare

ORACLE_SPECS = [s for s in textstats.SPECS if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, sf_oracle_dir, spec):
    compare(spec.fn(spark, sf_oracle_dir), spec.oracle, sf_oracle_dir)


def test_quality_features_sane(spark, sf_oracle_dir):
    rows = textstats.text_quality(spark, sf_oracle_dir).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r["punct_ratio"] <= 1
        assert 0 <= r["stopword_ratio"] <= 1
        assert r["n_tokens"] > 0


def test_tfidf_prefers_rare_terms(spark, sf_oracle_dir):
    """A term appearing in every document (df == N) has tf-idf 0, so a
    top term must have df < N whenever any rarer term exists."""
    rows = textstats.text_tfidf_top_term(spark, sf_oracle_dir).collect()
    assert len(rows) == 500
    assert all(r["tfidf"] >= 0 for r in rows)


def test_decontaminate_broadcasts_benchmark(spark, sf_oracle_dir):
    """The benchmark gram set is the bounded side — the join must be a
    BroadcastHashJoin so the corpus-sized gram stream never shuffles."""
    df = textstats.text_decontaminate(spark, sf_oracle_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % textstats.DECON_MOD != 0
        assert r["n_shared_grams"] >= 1


def test_repetition_score_bounds(spark, sf_oracle_dir):
    rows = textstats.text_repetition(spark, sf_oracle_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_distinct"] <= r["n_grams"]
        assert abs(r["dup_ratio"] - (r["n_grams"] - r["n_distinct"]) / r["n_grams"]) < 1e-15


def test_vocab_coverage_bounds(spark, sf_oracle_dir):
    rows = textstats.text_vocab_coverage(spark, sf_oracle_dir).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_ratio"] - r["n_oov"] / r["n_tokens"]) < 1e-15
    # a 16-word vocab over a 31-word corpus must leave real OOV mass
    assert any(r["n_oov"] > 0 for r in rows)


def test_ngram_counts_reconcile(spark, sf_oracle_dir):
    """Every reported gram meets the support floor, and the grand
    total over ALL grams (unfiltered) equals sum(len-2) over docs."""
    from pyspark.sql import functions as F

    from map_reduce_multi_threaded_spark.sources.tables import load_table

    rows = textstats.text_ngram_counts(spark, sf_oracle_dir).collect()
    assert rows
    assert all(r["n"] >= textstats.NGRAM_MIN_SUPPORT for r in rows)
    d = load_table(spark, sf_oracle_dir, "documents").select(
        F.expr(r"size(filter(split(text, '\\s+'), x -> length(x) > 0))").alias("n")
    )
    expected_total = d.where(f"n >= {textstats.DECON_N}").agg(
        F.sum(F.col("n") - textstats.DECON_N + 1)
    ).first()[0]
    from tests.oracle_utils import duck_con

    con = duck_con(sf_oracle_dir)
    total = con.sql(f"""
        WITH toks AS (SELECT list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0) t
                      FROM documents)
        SELECT sum(len(t) - {textstats.DECON_N - 1}) FROM toks WHERE len(t) >= {textstats.DECON_N}
    """).fetchall()[0][0]
    assert total == expected_total


def test_ngram_novelty_bounds_and_signal(spark, sf_oracle_dir):
    """Novelty is a fraction in [0,1]; the fixture's 31-word vocabulary
    guarantees 3-gram collisions, so the corpus must contain BOTH
    shared grams (novelty < 1 somewhere) and unique grams."""
    rows = textstats.text_ngram_novelty(spark, sf_oracle_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_unique"] <= r["n_grams"]
        assert abs(r["novelty"] - round(r["n_unique"] / r["n_grams"], 9)) < 1e-12
    assert any(r["n_unique"] < r["n_grams"] for r in rows)
    assert any(r["n_unique"] > 0 for r in rows)


def test_duplicate_spans_grams_occur_verbatim_elsewhere(spark, sf_oracle_dir):
    """End-to-end claim check on real rows, asserting exactly what the
    operator guarantees: every G-token WINDOW of a reported span
    occurs verbatim in another document (checked at the span's two
    ends).  The FULL span need not — a merged span's grams may match
    different partner docs.  If the gram hashing, 0/1-based indexing,
    or islands merge were off by one, these windows would not be found
    elsewhere (the oracle mirrors the same arithmetic, so only this
    cross-check catches a shared off-by-one)."""
    from map_reduce_multi_threaded_spark.operators.textstats import SPAN_G
    from map_reduce_multi_threaded_spark.sources.tables import load_table

    spans = textstats.text_duplicate_spans(spark, sf_oracle_dir).collect()
    assert spans, "fixture must contain duplicated spans"
    docs = {
        r["doc_id"]: [w for w in r["text"].split() if w]
        for r in load_table(spark, sf_oracle_dir, "documents").collect()
    }
    joined = {k: " ".join(v) for k, v in docs.items()}
    for r in sorted(spans, key=lambda r: (r["doc_id"], r["span_start"]))[:25]:
        toks = docs[r["doc_id"]][r["span_start"] : r["span_end"] + 1]
        assert len(toks) == r["span_tokens"], r
        for needle_toks in (toks[:SPAN_G], toks[-SPAN_G:]):
            needle = " ".join(needle_toks)
            assert any(
                d != r["doc_id"] and needle in j for d, j in joined.items()
            ), (r, needle[:80])


def test_fp_batch_matches_reference_expression():
    """The round-16 Arrow fingerprint must equal the retired SQL
    expression exactly: md5 hex of every char-8-gram (code-point
    slicing, utf-8 digest bytes), distinct, ascending, first 3,
    comma-joined — on ASCII (fast path), non-ASCII (char path),
    boundary lengths, and heavy-duplication inputs."""
    import hashlib

    import pandas as pd

    from map_reduce_multi_threaded_spark.operators.textstats import (
        FP_K,
        SHINGLE_CHARS,
        _fp_batch,
    )

    def ref(t: str) -> str:
        hx = sorted(
            {
                hashlib.md5(t[i : i + SHINGLE_CHARS].encode()).hexdigest()
                for i in range(len(t) - SHINGLE_CHARS + 1)
            }
        )
        return ",".join(hx[:FP_K])

    cases = [
        "abcdefgh",                      # exactly one gram
        "abcdefghi",                     # two grams
        "aaaaaaaaaaaaaaaa",              # total duplication -> 1 distinct
        "the quick brown fox jumps over the lazy dog",
        "ab " * 40,                      # vocab-style repetition
        "héllo wörld ünicode téxt µ∆ß",  # non-ASCII char path
        "日本語のテキストです、八文字以上あります",  # multi-byte code points
    ]
    got = _fp_batch()(pd.Series(cases))
    for i, t in enumerate(cases):
        assert got[i] == ref(t), t
