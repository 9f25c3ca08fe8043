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
