"""UDF/UDAF/UDTF coverage: oracle parity + the row-UDF anti-pattern
producing identical results to the codegen pipeline."""

from __future__ import annotations

import pytest

from map_reduce_multi_threaded_spark.operators import udf_suite, wordcount
from tests.oracle_utils import compare

ORACLE_SPECS = [s for s in udf_suite.SPECS if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, sf_oracle_dir, spec):
    compare(spec.fn(spark, sf_oracle_dir), spec.oracle, sf_oracle_dir)


def test_row_udf_matches_builtin_pipeline(spark, sf_dir):
    """The row-at-a-time UDF anti-pattern must at least be CORRECT —
    same counts as the built-in normalize pipeline."""
    slow = {r["word"]: r["cnt"] for r in udf_suite.rowudf_normalize(spark, sf_dir).collect()}
    fast = {r["word"]: r["cnt"] for r in wordcount.word_counts(spark, sf_dir).collect()}
    assert slow == fast
