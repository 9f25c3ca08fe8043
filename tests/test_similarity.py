"""Similarity search: oracle parity + LSH recall measurement."""

from __future__ import annotations

import pytest

from map_reduce_multi_threaded_spark.operators import similarity
from tests.oracle_utils import compare

ORACLE_SPECS = [s for s in similarity.SPECS if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, sf_oracle_dir, spec):
    compare(spec.fn(spark, sf_oracle_dir), spec.oracle, sf_oracle_dir)


def test_knn_shape(spark, sf_oracle_dir):
    rows = similarity.knn_bruteforce(spark, sf_oracle_dir).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
    assert set(by_query) == set(range(similarity.N_QUERIES))
    for q, rs in by_query.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, similarity.K_NEIGHBORS + 1))
        sims = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_lsh_recall_measured(spark, sf_oracle_dir):
    """LSH is approximate: report recall vs brute force and require it
    beats the random-candidate floor (bucket keeps ~1/2^planes of the
    corpus, so random recall ≈ 1.6%%)."""
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(spark, sf_oracle_dir).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_lsh(spark, sf_oracle_dir).collect()
    }
    recall = len(brute & lsh) / len(brute)
    assert recall > 0.05, f"LSH recall {recall:.2%} not above random floor"
