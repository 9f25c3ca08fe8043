"""Multimodal binary plumbing: oracle parity + stub behavior."""

from __future__ import annotations

import pytest

from map_reduce_multi_threaded_spark.operators import multimodal
from tests.oracle_utils import compare

ORACLE_SPECS = [s for s in multimodal.SPECS if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, sf_oracle_dir, spec):
    compare(spec.fn(spark, sf_oracle_dir), spec.oracle, sf_oracle_dir)


def test_decode_image_dispatch():
    """P6 decodes natively; compressed magic without pillow is a
    normal unsupported-format error (the r6 stub is retired)."""
    from map_reduce_multi_threaded_spark.functions.codecs import (
        decode_image,
        encode_ppm,
    )

    out = decode_image(encode_ppm(bytes(range(48))))
    assert (out["width"], out["height"], out["n_pixels"]) == (8, 2, 16)
    with pytest.raises(ValueError, match="unsupported image container"):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_wav_roundtrip_and_chunk_walk():
    """parse_wav must walk chunks by declared size (the fixture plants
    a LIST chunk between fmt and data), honor the RIFF odd-size pad
    rule, and compute exact PCM stats."""
    from map_reduce_multi_threaded_spark.functions.codecs import (
        WAV_SAMPLE_RATE,
        encode_wav,
        parse_wav,
    )

    samples = bytes([0, 1, 2, 255, 128])
    for info in (b"even-length..", b"odd-length..."):  # 13 odd, exercises pad
        out = parse_wav(encode_wav(samples, list_info=info))
        assert out == {
            "sample_rate": WAV_SAMPLE_RATE,
            "n_channels": 1,
            "bits": 16,
            "n_samples": 5,
            "peak": 255,
            "amp_sum": 0 + 1 + 2 + 255 + 128,
            "sq_sum": 1 + 4 + 255 * 255 + 128 * 128,
        }
    # empty payload: zero samples, stats defined as 0
    assert parse_wav(encode_wav(b""))["n_samples"] == 0
    assert parse_wav(encode_wav(b""))["peak"] == 0


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"JUNK" + b[4:], "not a RIFF"),
        (lambda b: b[:30], "exceeds available"),
        # flip the PCM format tag (offset: RIFF(12) + 'fmt '+size(8) = 20)
        (lambda b: b[:20] + b"\x03\x00" + b[22:], "unsupported audio format"),
    ],
)
def test_wav_malformed_inputs(mutate, msg):
    from map_reduce_multi_threaded_spark.functions.codecs import (
        encode_wav,
        parse_wav,
    )

    with pytest.raises(ValueError, match=msg):
        parse_wav(mutate(encode_wav(b"abcdef")))


def test_ppm_header_edges():
    """Comment lines, multi-digit dims, truncated raster, 16-bit
    maxval rejection."""
    from map_reduce_multi_threaded_spark.functions.codecs import parse_ppm

    raster = bytes(range(30)) * 12  # 360 bytes = 10x12 pixels
    ppm = b"P6\n# c1\n# c2\n10 12\n# c3\n255\n" + raster
    out = parse_ppm(ppm)
    assert (out["width"], out["height"], out["n_pixels"]) == (10, 12, 120)
    assert out["sum_r"] == sum(raster[0::3])
    with pytest.raises(ValueError, match="raster truncated"):
        parse_ppm(b"P6\n2 2\n255\n" + b"\x00" * 11)
    with pytest.raises(ValueError, match="16-bit"):
        parse_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)
    with pytest.raises(ValueError, match="not a P6"):
        parse_ppm(b"P3\n1 1\n255\n0 0 0")


def test_payload_is_binary(spark, sf_dir):
    df = multimodal.with_payload(spark, sf_dir)
    assert dict(df.dtypes)["payload"] == "binary"


def test_wav_roundtrip_property():
    """Hypothesis round-trip: for arbitrary payload bytes, the RIFF
    encode→parse stats must equal the pure-Python ground truth."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from map_reduce_multi_threaded_spark.functions.codecs import (
        encode_wav,
        parse_wav,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=300), st.binary(max_size=9))
    def check(payload, info):
        out = parse_wav(encode_wav(payload, list_info=b"INFOx" + info))
        assert out["n_samples"] == len(payload)
        assert out["peak"] == max(payload, default=0)
        assert out["amp_sum"] == sum(payload)
        assert out["sq_sum"] == sum(v * v for v in payload)

    check()


def test_ppm_roundtrip_property():
    """Hypothesis round-trip: encode_ppm→parse_ppm channel sums equal
    strided byte sums of the unpadded payload for any width."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from map_reduce_multi_threaded_spark.functions.codecs import (
        encode_ppm,
        parse_ppm,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=300), st.integers(min_value=1, max_value=32))
    def check(rgb, width):
        out = parse_ppm(encode_ppm(rgb, width=width))
        row = 3 * width
        padded = len(rgb) + (-len(rgb)) % row
        assert out["width"] == width
        assert out["height"] == padded // row
        assert out["n_pixels"] == width * (padded // row)
        assert out["sum_r"] == sum(rgb[0::3])
        assert out["sum_g"] == sum(rgb[1::3])
        assert out["sum_b"] == sum(rgb[2::3])

    check()


def test_parsers_never_crash_on_arbitrary_bytes():
    """Web-scale corpora guarantee malformed media: the binary parsers
    must either return a result or raise ValueError — never
    struct.error/IndexError/OverflowError or a hang — on ANY byte
    string (including truncations of valid containers, which hypothesis
    shrinks toward)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from map_reduce_multi_threaded_spark.functions.codecs import (
        decode_image,
        encode_wav,
        parse_ppm,
        parse_wav,
    )

    valid = encode_wav(bytes(range(64)))

    @settings(max_examples=300, deadline=None)
    @given(st.one_of(
        st.binary(max_size=200),
        # truncations/corruptions of a valid container hit deeper code
        st.integers(min_value=0, max_value=len(valid)).map(lambda i: valid[:i]),
        st.tuples(
            st.integers(min_value=0, max_value=len(valid) - 1), st.binary(min_size=1, max_size=4)
        ).map(lambda t: valid[: t[0]] + t[1] + valid[t[0] + len(t[1]):]),
    ))
    def check(b):
        for parser in (parse_wav, parse_ppm, decode_image):
            try:
                parser(b)
            except ValueError:
                pass

    check()


def test_image_tiles_grid_geometry_and_totals(spark, sf_oracle_dir):
    """Patch grid covers the padded raster exactly: per doc the patch
    count is ceil(h/4)*2, n_px sums to the raster pixel count, and
    tile sums add up to the document's total byte sum (padding adds
    zero)."""
    from collections import defaultdict

    from map_reduce_multi_threaded_spark.operators.multimodal import image_tiles
    from map_reduce_multi_threaded_spark.sources.tables import load_table

    per_doc = defaultdict(list)
    for r in image_tiles(spark, sf_oracle_dir).collect():
        per_doc[r["doc_id"]].append(r)
    texts = {
        r["doc_id"]: r["text"].encode()
        for r in load_table(spark, sf_oracle_dir, "documents").collect()
    }
    assert set(per_doc) == set(texts)
    for doc, tiles in per_doc.items():
        raw = texts[doc]
        h = (len(raw) + 23) // 24
        assert len(tiles) == ((h + 3) // 4) * 2
        assert sum(t["n_px"] for t in tiles) == 8 * h
        assert sum(t["tile_sum"] for t in tiles) == sum(raw)
