"""Multimodal binary plumbing: oracle parity + stub behavior."""

from __future__ import annotations

import pytest

from map_reduce_multi_threaded_spark.operators import multimodal
from tests.oracle_utils import compare

ORACLE_SPECS = [s for s in multimodal.SPECS if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, sf_oracle_dir, spec):
    compare(spec.fn(spark, sf_oracle_dir), spec.oracle, sf_oracle_dir)


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError, match="pillow"):
        multimodal.decode_image_real(b"\x89PNG")


def test_payload_is_binary(spark, sf_dir):
    df = multimodal.with_payload(spark, sf_dir)
    assert dict(df.dtypes)["payload"] == "binary"
