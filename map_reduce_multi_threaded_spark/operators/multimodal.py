"""Multimodal (binary) column plumbing.

Images/audio/video ride through the engine as opaque ``binary``
columns with typed metadata — the schema/partitioning/UDF-shape layer
is what an engine must get right; the codec itself is a library call.
Since round 7 the decode step is REAL for the two dependency-free
uncompressed containers (RIFF/WAVE PCM and binary PPM — see
``functions/codecs.py`` and the ``multimodal_wav_decode`` /
``multimodal_ppm_decode`` queries); compressed formats (jpeg/png/webp)
still dispatch to pillow where installed and raise a normal
unsupported-format ``ValueError`` here.  The deterministic fake decode
(:func:`decode_metadata`) remains as the plumbing-shape query whose
outputs are pure functions of payload length.

The payload fixture is ``documents.text`` UTF-8-encoded to binary.
Oracles read payload bytes portably from ``hex(encode(text))`` (two hex
chars per byte), so parity holds on ANY corpus — the round-11
adversarial-Unicode sweep showed ``ascii()``-based oracles are code-
point-, not byte-, indexed and break on multi-byte UTF-8.

Scale notes:
* binary payloads flow through Arrow batches (``mapInPandas``), sized
  by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — at 100 TB you
  bound executor memory by rows-per-batch × payload size;
* metadata extraction is a narrow map: no shuffle, parquet scan feeds
  straight into the Python worker and back.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import QuerySpec
from ..sources.tables import load_table

FRAME_STRIDE = 16  # "video frame sampling": every 16th byte


def with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a binary payload column (the multimodal stand-in)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


# Real decode entry point (round 7): dependency-free P6 PPM parser,
# pillow dispatch for compressed formats where installed — the former
# NotImplementedError stub is retired (functions/codecs.py).
from ..functions.codecs import decode_image  # noqa: F401  (public API)


_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("fmt", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

_FMTS = ["jpeg", "png", "webp"]


def decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched binary → metadata extraction via ``mapInPandas``.

    The fake decode derives (fmt, width, height) purely from payload
    length, so DuckDB can mirror it; the *plumbing* — binary Arrow
    transfer, iterator-of-batches UDF, typed output schema — is the
    real production shape."""
    df = with_payload(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "fmt": n.map(lambda x: _FMTS[x % 3]),
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n * 7 % 480 + 1).astype("int32"),
                }
            )

    return df.mapInPandas(decode, _META_SCHEMA)


_DECODE_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CASE octet_length(encode(text)) % 3
            WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS fmt,
       CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INTEGER) AS height
FROM documents
"""


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Video" frame sampling: take every FRAME_STRIDE-th byte of the
    payload; emit the sampled-frame count and a checksum.  Same
    ``mapInPandas`` shape a real ffmpeg-keyframe sampler would use
    (batch in, variable summary out)."""
    df = with_payload(spark, sf_dir)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = pdf["payload"].map(lambda b: b[::FRAME_STRIDE])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": frames.map(len).astype("int64"),
                    "frame_checksum": frames.map(lambda f: sum(f) % 256).astype("int64"),
                }
            )

    return df.mapInPandas(sample, _FRAME_SCHEMA)


# Byte-true oracle (round 11): ``ascii()`` returns CODE POINTS, so the
# old ascii(substr(text, i, 1)) spelling was only valid on pure-ASCII
# corpora.  Byte k of the UTF-8 payload is read portably from the hex
# dump — two hex chars per byte — which matches Spark's binary payload
# on ANY corpus (adversarial-Unicode sweep, docs/altfixture_r11.md).
_FRAME_SAMPLE_ORACLE = f"""
WITH s AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n FROM documents)
SELECT doc_id,
       CAST(len(generate_series(1, n, {FRAME_STRIDE})) AS BIGINT) AS n_frames,
       CAST(coalesce(list_sum(list_transform(generate_series(1, n, {FRAME_STRIDE}),
                               i -> ('0x' || substr(hx, 2*i - 1, 2))::INT)), 0) % 256 AS BIGINT) AS frame_checksum
FROM s
"""


def binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM binary column ops (no Python): length, md5, prefix —
    what you use to partition/bucket payloads before decode."""
    df = with_payload(spark, sf_dir)
    return df.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.hex(F.substring("payload", 1, 4)).alias("magic_hex"),
    )


_BINARY_STATS_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       substr(hex(encode(text)), 1, 8) AS magic_hex
FROM documents
"""


EMBED_DIM = 8
EMBED_QUERIES = 10
EMBED_K = 3

_EMBED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
    ]
    + [StructField(f"f{k}", LongType()) for k in range(EMBED_DIM)]
)


def embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed multimodal pipeline: binary payload → feature
    extraction (mapInPandas, the stand-in for a real image/audio
    encoder) → cosine top-3 neighbors for the first 10 docs.

    The fake encoder's 8 features are strided byte sums — exact
    integers, so every cosine numerator/denominator is bit-identical on
    both engines (the only float ops are one sqrt and one division).
    Scale: extraction is a narrow Arrow map; the query side (10 docs)
    is broadcast; the corpus is scanned once — the same shape as
    knn_bruteforce over real embeddings."""
    df = with_payload(spark, sf_dir).where(F.length("payload") >= EMBED_DIM)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"]}
            for k in range(EMBED_DIM):
                out[f"f{k}"] = pdf["payload"].map(
                    lambda b, k=k: sum(b[k::EMBED_DIM])
                ).astype("int64")
            yield pd.DataFrame(out)

    feats = df.mapInPandas(extract, _EMBED_SCHEMA)
    fcols = [f"f{k}" for k in range(EMBED_DIM)]
    norm = F.sqrt(sum((F.col(c) * F.col(c)).cast("double") for c in fcols))
    n = feats.withColumn("nrm", norm)
    q = n.where(F.col("doc_id") < EMBED_QUERIES).select(
        F.col("doc_id").alias("query_id"),
        *[F.col(c).alias(f"q{k}") for k, c in enumerate(fcols)],
        F.col("nrm").alias("q_nrm"),
    )
    c = n.select(
        F.col("doc_id").alias("neighbor_id"),
        *[F.col(col).alias(f"c{k}") for k, col in enumerate(fcols)],
        F.col("nrm").alias("c_nrm"),
    )
    dot = sum((F.col(f"q{k}") * F.col(f"c{k}")).cast("double") for k in range(EMBED_DIM))
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot / (F.col("q_nrm") * F.col("c_nrm")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= EMBED_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _embed_knn_oracle() -> str:
    fexprs = ",\n       ".join(
        f"list_sum(list_transform(generate_series({k + 1}, n, {EMBED_DIM}), "
        f"i -> ('0x' || substr(hx, 2*i - 1, 2))::INT)) AS f{k}"
        for k in range(EMBED_DIM)
    )
    sq = " + ".join(f"CAST(f{k} * f{k} AS DOUBLE)" for k in range(EMBED_DIM))
    dot = " + ".join(f"CAST(q.f{k} * c.f{k} AS DOUBLE)" for k in range(EMBED_DIM))
    return f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
f AS (
  SELECT doc_id,
       {fexprs}
  FROM b WHERE n >= {EMBED_DIM}
),
n AS (SELECT *, sqrt({sq}) AS nrm FROM f),
pairs AS (
  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         ({dot}) / (q.nrm * c.nrm) AS cosine
  FROM n q JOIN n c ON q.doc_id < {EMBED_QUERIES} AND q.doc_id <> c.doc_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= {EMBED_K}
"""


def arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the lowest-overhead Python batch API (raw
    pyarrow RecordBatches, no pandas conversion): per-payload byte
    length and 0x20-byte (space) count via ``pyarrow.compute`` kernels.
    Completes the Python-extension ladder (row UDF → pandas_udf →
    applyInPandas/cogroup → mapInPandas → mapInArrow); for byte-level
    work over binary media columns this path avoids the pandas
    object-boxing mapInPandas pays per payload.

    Scale: narrow map, zero shuffles; Arrow batches stream through the
    worker at ``maxRecordsPerBatch`` granularity."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for b in batches:
            payload = b.column(b.schema.get_field_index("payload"))
            n_bytes = pc.binary_length(payload)
            # count 0x20 bytes — count_substring works on binary, so no
            # unsafe cast-to-string for arbitrary payload bytes
            n_space = pc.count_substring(payload, " ")
            yield pa.RecordBatch.from_arrays(
                [b.column(0), n_bytes.cast(pa.int64()), n_space.cast(pa.int64())],
                ["doc_id", "n_bytes", "n_space"],
            )

    return with_payload(spark, sf_dir).mapInArrow(
        stats, "doc_id long, n_bytes long, n_space long"
    )


_ARROW_BYTE_STATS_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space
FROM documents
"""


def wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio container decode over the engine (VERDICT r6 ask #4):
    synthesize a RIFF/WAVE file per document (16-bit mono PCM whose
    samples are the text's byte values, plus a LIST chunk between fmt
    and data so chunk-walking is load-bearing), then parse it back with
    the dependency-free RIFF parser and emit exact PCM stats.  The
    decode stage sees ONLY bytes — the parser is the operator under
    test; the encode stage is fixture synthesis whose decoded stats a
    SQL oracle mirrors byte-true from hex(encode(text)).  Generalizes S4's bytes→records scan
    (``map_reduce.cpp:152-159``) to a binary container.

    Scale: two chained narrow Arrow maps, zero shuffles; payload
    memory is bounded by ``arrow.maxRecordsPerBatch`` × payload size,
    same as every other binary path here."""
    import pyarrow as pa

    from ..functions.codecs import encode_wav, parse_wav

    def encode(batches):
        for b in batches:
            docs = b.column(0).to_pylist()
            payloads = b.column(1).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [pa.array(docs, pa.int64()),
                 pa.array([encode_wav(p) for p in payloads], pa.binary())],
                ["doc_id", "wav"],
            )

    def decode(batches):
        cols = ["sample_rate", "n_channels", "bits", "n_samples",
                "peak", "amp_sum", "sq_sum"]
        for b in batches:
            docs = b.column(0).to_pylist()
            stats = [parse_wav(w) for w in b.column(1).to_pylist()]
            yield pa.RecordBatch.from_arrays(
                [pa.array(docs, pa.int64())]
                + [pa.array([s[c] for s in stats], pa.int64()) for c in cols],
                ["doc_id"] + cols,
            )

    wav = with_payload(spark, sf_dir).mapInArrow(encode, "doc_id long, wav binary")
    return wav.mapInArrow(
        decode,
        "doc_id long, sample_rate long, n_channels long, bits long, "
        "n_samples long, peak long, amp_sum long, sq_sum long",
    )


_WAV_DECODE_ORACLE = """
WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n FROM documents),
s AS (
  SELECT doc_id,
         list_transform(generate_series(1, n),
                        i -> ('0x' || substr(hx, 2*i - 1, 2))::INT) AS v
  FROM h
)
SELECT doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(16 AS BIGINT) AS bits,
       CAST(len(v) AS BIGINT) AS n_samples,
       CAST(coalesce(list_max(v), 0) AS BIGINT) AS peak,
       CAST(coalesce(list_sum(v), 0) AS BIGINT) AS amp_sum,
       CAST(coalesce(list_sum(list_transform(v, x -> x * x)), 0) AS BIGINT) AS sq_sum
FROM s
"""


WAV_DECIMATE = 2


def wav_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full media-pipeline shape — decode → DSP transform → stats:
    parse the synthesized WAV down to raw PCM (the real chunk-walk
    parser), DECIMATE by {WAV_DECIMATE} (keep every other sample — the
    integer core of sample-rate conversion), and emit exact stats of
    the downsampled signal plus its new nominal rate.  The transform
    stage operates on decoded samples, never on container bytes —
    the layering a real resampler (polyphase FIR) slots into.

    Scale: identical to wav_decode — chained narrow Arrow maps, zero
    shuffles, memory bounded by batch size."""
    import pyarrow as pa

    from ..functions.codecs import encode_wav, parse_wav_samples, pcm_stats

    def encode(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(b.column(0).to_pylist(), pa.int64()),
                    pa.array(
                        [encode_wav(p) for p in b.column(1).to_pylist()],
                        pa.binary(),
                    ),
                ],
                ["doc_id", "wav"],
            )

    def decimate(batches):
        cols = ["n_samples", "peak", "amp_sum", "sq_sum"]
        for b in batches:
            out_rate, stats = [], []
            for w in b.column(1).to_pylist():
                rate, _ch, _bits, vals = parse_wav_samples(w)
                stats.append(pcm_stats(vals[::WAV_DECIMATE]))
                out_rate.append(rate // WAV_DECIMATE)
            yield pa.RecordBatch.from_arrays(
                [pa.array(b.column(0).to_pylist(), pa.int64()),
                 pa.array(out_rate, pa.int64())]
                + [pa.array([s[c] for s in stats], pa.int64()) for c in cols],
                ["doc_id", "out_rate"] + cols,
            )

    wav = with_payload(spark, sf_dir).mapInArrow(encode, "doc_id long, wav binary")
    return wav.mapInArrow(
        decimate,
        "doc_id long, out_rate long, n_samples long, peak long, "
        "amp_sum long, sq_sum long",
    )


_WAV_DOWNSAMPLE_ORACLE = f"""
WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n FROM documents),
s AS (
  SELECT doc_id,
         list_transform(generate_series(1, n, {WAV_DECIMATE}),
                        i -> ('0x' || substr(hx, 2*i - 1, 2))::INT) AS v
  FROM h
)
SELECT doc_id,
       CAST({8000 // WAV_DECIMATE} AS BIGINT) AS out_rate,
       CAST(len(v) AS BIGINT) AS n_samples,
       CAST(coalesce(list_max(v), 0) AS BIGINT) AS peak,
       CAST(coalesce(list_sum(v), 0) AS BIGINT) AS amp_sum,
       CAST(coalesce(list_sum(list_transform(v, x -> x * x)), 0) AS BIGINT) AS sq_sum
FROM s
"""


def ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image container decode: synthesize a binary PPM (P6) per
    document (RGB raster = text bytes, zero-padded to the 8-pixel row
    grid; header includes a ``#`` comment line) and parse it back with
    :func:`~..functions.codecs.decode_image` — the dispatch that
    replaced the old import-gated stub.  Zero padding keeps the
    channel sums equal to strided ascii sums over the unpadded text,
    so the oracle is exact."""
    import pyarrow as pa

    from ..functions.codecs import decode_image, encode_ppm

    def roundtrip(batches):
        cols = ["width", "height", "maxval", "n_pixels",
                "sum_r", "sum_g", "sum_b"]
        for b in batches:
            docs = b.column(0).to_pylist()
            stats = [decode_image(encode_ppm(p)) for p in b.column(1).to_pylist()]
            yield pa.RecordBatch.from_arrays(
                [pa.array(docs, pa.int64())]
                + [pa.array([s[c] for s in stats], pa.int64()) for c in cols],
                ["doc_id"] + cols,
            )

    return with_payload(spark, sf_dir).mapInArrow(
        roundtrip,
        "doc_id long, width long, height long, maxval long, "
        "n_pixels long, sum_r long, sum_g long, sum_b long",
    )


_PPM_DECODE_ORACLE = """
WITH s AS (
  SELECT doc_id, octet_length(encode(text)) AS n,
         hex(encode(text)) AS hx FROM documents
)
SELECT doc_id,
       CAST(8 AS BIGINT) AS width,
       CAST((n + 23) // 24 AS BIGINT) AS height,
       CAST(255 AS BIGINT) AS maxval,
       CAST(8 * ((n + 23) // 24) AS BIGINT) AS n_pixels,
       CAST(coalesce(list_sum(list_transform(generate_series(1, n, 3),
            i -> ('0x' || substr(hx, 2*i - 1, 2))::INT)), 0) AS BIGINT) AS sum_r,
       CAST(coalesce(list_sum(list_transform(generate_series(2, n, 3),
            i -> ('0x' || substr(hx, 2*i - 1, 2))::INT)), 0) AS BIGINT) AS sum_g,
       CAST(coalesce(list_sum(list_transform(generate_series(3, n, 3),
            i -> ('0x' || substr(hx, 2*i - 1, 2))::INT)), 0) AS BIGINT) AS sum_b
FROM s
"""


#: tile (patch) geometry: 4×4-pixel patches over the 8-pixel-wide PPM
#: grid → 2 patch columns; the last patch row may be short.
TILE_PX = 4


def image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch extraction — the ViT/CLIP image-preprocessing step: parse
    the synthesized P6 PPM down to its raster and cut it into
    {TILE_PX}×{TILE_PX}-pixel patches, emitting per-patch byte counts
    and channel-summed intensities (stand-in for per-patch
    normalization stats / embedding input).  The tile stage operates
    on DECODED pixels via numpy slicing — the layering a real
    patchifier (reshape + transpose into model input) slots into; the
    raster never re-enters SQL, only the per-tile stats do.

    Oracle: raster bytes are the text bytes zero-padded to the 8-pixel
    row grid, so every patch sum has a closed form over strided
    character positions; the full patch GRID (including all-padding
    patches) must match too, which pins the ceil-division geometry.

    Scale: one narrow Arrow map (encode) chained to one narrow Arrow
    map (decode+tile) — zero shuffles; output is patches per doc, a
    bounded ~h/4×2 fan-out."""
    import numpy as np
    import pyarrow as pa

    from ..functions.codecs import PPM_WIDTH, encode_ppm, parse_ppm_raster

    def tile(batches):
        for b in batches:
            docs, tys, txs, npx, sums = [], [], [], [], []
            for doc, payload in zip(
                b.column(0).to_pylist(), b.column(1).to_pylist()
            ):
                w, h, _mx, raster = parse_ppm_raster(encode_ppm(payload))
                grid = np.frombuffer(raster, dtype=np.uint8).reshape(h, 3 * w)
                for ty in range((h + TILE_PX - 1) // TILE_PX):
                    for tx in range(w // TILE_PX):
                        patch = grid[
                            TILE_PX * ty:TILE_PX * (ty + 1),
                            3 * TILE_PX * tx:3 * TILE_PX * (tx + 1),
                        ]
                        docs.append(doc)
                        tys.append(ty)
                        txs.append(tx)
                        npx.append(patch.shape[0] * patch.shape[1] // 3)
                        sums.append(int(patch.sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(docs, pa.int64()),
                    pa.array(tys, pa.int64()),
                    pa.array(txs, pa.int64()),
                    pa.array(npx, pa.int64()),
                    pa.array(sums, pa.int64()),
                ],
                ["doc_id", "tile_y", "tile_x", "n_px", "tile_sum"],
            )

    assert PPM_WIDTH % TILE_PX == 0
    return with_payload(spark, sf_dir).mapInArrow(
        tile,
        "doc_id long, tile_y long, tile_x long, n_px long, tile_sum long",
    )


_IMAGE_TILES_ORACLE = f"""
WITH s AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents
),
dims AS (SELECT doc_id, n, (n + 23) // 24 AS h FROM s),
grid AS (
  SELECT doc_id, h, ty.g AS tile_y, tx.g AS tile_x
  FROM dims,
       LATERAL (SELECT unnest(generate_series(0, (h + {TILE_PX - 1}) // {TILE_PX} - 1)) AS g) ty,
       LATERAL (SELECT unnest(generate_series(0, 1)) AS g) tx
),
bytes AS (
  SELECT doc_id,
         ((i - 1) // 3 // 8) // {TILE_PX} AS tile_y,
         (((i - 1) // 3) % 8) // {TILE_PX} AS tile_x,
         ('0x' || substr(hx, 2*i - 1, 2))::INT AS v
  FROM s, unnest(generate_series(1, n)) AS u(i)
),
sums AS (
  SELECT doc_id, tile_y, tile_x, sum(v) AS tile_sum
  FROM bytes GROUP BY 1, 2, 3
)
SELECT g.doc_id, g.tile_y, g.tile_x,
       CAST({TILE_PX} * least({TILE_PX}, g.h - {TILE_PX} * g.tile_y) AS BIGINT) AS n_px,
       CAST(coalesce(tile_sum, 0) AS BIGINT) AS tile_sum
FROM grid g
LEFT JOIN sums USING (doc_id, tile_y, tile_x)
"""


SCENE_FRAME_BYTES = 64
SCENE_CUT_SAD = 2048  # ≈ p90 of the fixture's inter-frame SAD


def scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary ("scene cut") detection over the byte-stream
    video stand-in: the payload is framed into {SCENE_FRAME_BYTES}-
    byte frames, consecutive frames are compared by SAD (sum of
    absolute byte differences — the metric real shot detectors
    threshold), and a cut fires where SAD > {SCENE_CUT_SAD}.  Emits
    per doc the frame count, cut count, first cut index and max SAD —
    the summary a video-ingest pipeline keys keyframe extraction and
    clip splitting off.

    All integer arithmetic (int16 diffs summed in int64) — bit-exact
    against the closed-form oracle, which reproduces SAD as
    |ascii(i) − ascii(i+{SCENE_FRAME_BYTES})| grouped by frame.
    Docs with <2 full frames report 0 cuts and sentinel −1s.
    Scale: one narrow Arrow map, zero shuffles."""
    import numpy as np
    import pyarrow as pa

    fb = SCENE_FRAME_BYTES

    def cuts(batches):
        for b in batches:
            out = {k: [] for k in (
                "doc_id", "n_frames", "n_cuts", "first_cut", "max_sad",
            )}
            for doc, payload in zip(
                b.column(0).to_pylist(), b.column(1).to_pylist()
            ):
                nf = len(payload) // fb
                out["doc_id"].append(doc)
                out["n_frames"].append(nf)
                if nf < 2:
                    out["n_cuts"].append(0)
                    out["first_cut"].append(-1)
                    out["max_sad"].append(-1)
                    continue
                arr = np.frombuffer(
                    payload[: nf * fb], dtype=np.uint8
                ).reshape(nf, fb).astype(np.int16)
                sad = np.abs(np.diff(arr, axis=0)).sum(
                    axis=1, dtype=np.int64
                )
                hits = np.nonzero(sad > SCENE_CUT_SAD)[0]
                out["n_cuts"].append(int(hits.size))
                out["first_cut"].append(int(hits[0]) if hits.size else -1)
                out["max_sad"].append(int(sad.max()))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out[k], pa.int64()) for k in out], list(out)
            )

    return with_payload(spark, sf_dir).mapInArrow(
        cuts,
        "doc_id long, n_frames long, n_cuts long, first_cut long, max_sad long",
    )


_SCENE_CUTS_ORACLE = f"""
WITH s AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents
),
d AS (
  SELECT doc_id, (i - 1) // {SCENE_FRAME_BYTES} AS f,
         abs(('0x' || substr(hx, 2*i - 1, 2))::INT
             - ('0x' || substr(hx, 2*(i + {SCENE_FRAME_BYTES}) - 1, 2))::INT) AS dv
  FROM s, unnest(generate_series(1, (n // {SCENE_FRAME_BYTES} - 1)
                                    * {SCENE_FRAME_BYTES})) AS u(i)
  WHERE n // {SCENE_FRAME_BYTES} >= 2
),
sad AS (SELECT doc_id, f, sum(dv) AS sad FROM d GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
         count(*) FILTER (sad > {SCENE_CUT_SAD}) AS n_cuts,
         min(f) FILTER (sad > {SCENE_CUT_SAD}) AS first_cut,
         max(sad) AS max_sad
  FROM sad GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(s.n // {SCENE_FRAME_BYTES} AS BIGINT) AS n_frames,
       CAST(coalesce(a.n_cuts, 0) AS BIGINT) AS n_cuts,
       CAST(coalesce(a.first_cut, -1) AS BIGINT) AS first_cut,
       CAST(coalesce(a.max_sad, -1) AS BIGINT) AS max_sad
FROM s LEFT JOIN agg a USING (doc_id)
"""


def image_hist_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram EQUALIZATION over the decoded raster — the classic
    contrast-normalization preprocessing a vision ingest applies
    before patch extraction: per image, build the 256-bin intensity
    histogram, form its CDF, and remap every pixel to
    ⌊(cdf(v) − cdf_min)·255 / (N − cdf_min)⌋.  Every step is INTEGER
    arithmetic (counts, cumulative counts, floor division), so the
    remap is bit-portable with no float caveat, and the DuckDB oracle
    reproduces it closed-form over the text-byte raster (the same
    ascii-position trick as the tile oracle, plus the zero-padding
    rows encode_ppm appends to fill the 8-pixel row grid).

    Emitted per doc: pixel count, pre/post intensity sums and level
    counts — equalization should spread levels, which the level-count
    columns surface (and the degenerate single-level image maps to 0
    by the max(1, denom) guard on both engines).

    Scale: one narrow Arrow map (decode → bincount → remap in numpy),
    zero shuffles, 6 small columns out per image."""
    import numpy as np
    import pyarrow as pa

    from ..functions.codecs import encode_ppm, parse_ppm_raster

    def eq(batches):
        for b in batches:
            out = {k: [] for k in (
                "doc_id", "n_px", "sum_before", "sum_after",
                "n_levels_before", "n_levels_after",
            )}
            for doc, payload in zip(
                b.column(0).to_pylist(), b.column(1).to_pylist()
            ):
                _w, _h, _mx, raster = parse_ppm_raster(encode_ppm(payload))
                px = np.frombuffer(raster, dtype=np.uint8)
                n = int(px.size)
                if n == 0:
                    # empty payload → 0-row raster (round-11 catch: an
                    # empty document is legal input; px.min() below
                    # would raise on an empty array)
                    out["doc_id"].append(doc)
                    out["n_px"].append(0)
                    out["sum_before"].append(0)
                    out["sum_after"].append(0)
                    out["n_levels_before"].append(0)
                    out["n_levels_after"].append(0)
                    continue
                hist = np.bincount(px, minlength=256).astype(np.int64)
                cdf = hist.cumsum()
                cdf_min = int(cdf[int(px.min())])
                denom = max(1, n - cdf_min)
                mapped = (cdf - cdf_min) * 255 // denom
                live = hist > 0
                out["doc_id"].append(doc)
                out["n_px"].append(n)
                out["sum_before"].append(int((np.arange(256) * hist).sum()))
                out["sum_after"].append(int((mapped * hist).sum()))
                out["n_levels_before"].append(int(live.sum()))
                out["n_levels_after"].append(len(np.unique(mapped[live])))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out[k], pa.int64()) for k in out], list(out)
            )

    return with_payload(spark, sf_dir).mapInArrow(
        eq,
        "doc_id long, n_px long, sum_before long, sum_after long, "
        "n_levels_before long, n_levels_after long",
    )


_HIST_EQ_ORACLE = """
WITH s AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents
),
dims AS (SELECT doc_id, n, ((n + 23) // 24) * 24 AS n_pad FROM s),
bytes AS (
  SELECT doc_id, ('0x' || substr(hx, 2*i - 1, 2))::INT AS v
  FROM s, unnest(generate_series(1, n)) AS u(i)
  UNION ALL
  SELECT doc_id, 0 AS v
  FROM dims, unnest(generate_series(1, n_pad - n)) AS p(j)
),
hist AS (SELECT doc_id, v, count(*) AS c FROM bytes GROUP BY 1, 2),
cdf AS (
  SELECT *,
         sum(c) OVER (PARTITION BY doc_id ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY doc_id) AS n_px
  FROM hist
),
m AS (
  SELECT *,
         min(cum) OVER (PARTITION BY doc_id) AS cdf_min
  FROM cdf
),
mapped AS (
  SELECT doc_id, v, c, n_px,
         ((cum - cdf_min) * 255) // greatest(1, n_px - cdf_min) AS nv
  FROM m
),
agg AS (
  SELECT doc_id,
         CAST(max(n_px) AS BIGINT) AS n_px,
         CAST(sum(v * c) AS BIGINT) AS sum_before,
         CAST(sum(nv * c) AS BIGINT) AS sum_after,
         CAST(count(*) AS BIGINT) AS n_levels_before,
         CAST(count(DISTINCT nv) AS BIGINT) AS n_levels_after
  FROM mapped GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_px, 0) AS n_px,
       coalesce(a.sum_before, 0) AS sum_before,
       coalesce(a.sum_after, 0) AS sum_after,
       coalesce(a.n_levels_before, 0) AS n_levels_before,
       coalesce(a.n_levels_after, 0) AS n_levels_after
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


#: spectrum-analysis geometry: FFT length, sample rate, tone table size
FFT_N = 512
FFT_RATE = 8000
FFT_TONES = 200  # distinct exact-bin test tones (< FFT_N/2 Nyquist bins)


def wav_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION — the spectral front end (FFT →
    dominant frequency) every audio pipeline (MFCC, spectrogram
    embedding, VAD) starts with, run as a real numpy rFFT inside the
    Arrow decode path: synthesize one pure sine tone per document
    (frequency bin ``k = 1 + (doc_id + n_chars) mod {FFT_TONES}``,
    {FFT_N} samples at {FFT_RATE} Hz), container-encode it through the
    RIFF/WAVE writer, then DECODE: chunk-walk parse → rfft → magnitude
    argmax.  The analysis stage sees only container bytes; because
    each tone sits exactly on an FFT bin, the detected bin has a
    closed form the SQL oracle pins — the FFT must actually work to
    reproduce it (leakage, off-by-one binning, or int16 handling bugs
    all surface as wrong bins).

    Scale: two chained narrow Arrow maps, zero shuffles — numpy's
    vectorized rfft over {FFT_N}-sample rows batches at
    ``arrow.maxRecordsPerBatch`` granularity, the same bounded-memory
    contract as every binary path here."""
    import numpy as np
    import pyarrow as pa

    from ..functions.codecs import encode_wav, parse_wav_samples

    def encode(batches):
        for b in batches:
            docs = b.column(0).to_pylist()
            chars = b.column(1).to_pylist()
            wavs = []
            for doc_id, n_chars in zip(docs, chars):
                k = 1 + (doc_id + n_chars) % FFT_TONES
                i = np.arange(FFT_N)
                # byte-valued samples (encode_wav's contract) riding a
                # 127.5 DC offset; DC lands in bin 0, which the argmax
                # skips, and amplitude 127.5 dwarfs the ±0.5 rounding
                # noise floor (|X_k| = 127.5·N/2 vs ~√(N/12))
                pcm = np.round(
                    127.5 + 127.5 * np.sin(2.0 * np.pi * k * i / FFT_N)
                ).astype(np.uint8)
                wavs.append(encode_wav(pcm.tobytes()))
            yield pa.RecordBatch.from_arrays(
                [pa.array(docs, pa.int64()), pa.array(wavs, pa.binary())],
                ["doc_id", "wav"],
            )

    def analyze(batches):
        for b in batches:
            docs = b.column(0).to_pylist()
            bins, hzs = [], []
            for w in b.column(1).to_pylist():
                rate, _ch, _bits, vals = parse_wav_samples(w)
                mag = np.abs(np.fft.rfft(np.asarray(vals, dtype=np.float64)))
                dominant = int(np.argmax(mag[1:])) + 1  # skip DC
                bins.append(dominant)
                hzs.append(dominant * rate / len(vals))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(docs, pa.int64()),
                    pa.array([FFT_N] * len(docs), pa.int64()),
                    pa.array(bins, pa.int64()),
                    pa.array(hzs, pa.float64()),
                ],
                ["doc_id", "n_samples", "dominant_bin", "dominant_hz"],
            )

    tones = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    wav = tones.mapInArrow(encode, "doc_id long, wav binary")
    return wav.mapInArrow(
        analyze,
        "doc_id long, n_samples long, dominant_bin long, dominant_hz double",
    )


_WAV_SPECTRUM_ORACLE = f"""
SELECT doc_id,
       CAST({FFT_N} AS BIGINT) AS n_samples,
       CAST(1 + (doc_id + n_chars) % {FFT_TONES} AS BIGINT) AS dominant_bin,
       CAST((1 + (doc_id + n_chars) % {FFT_TONES}) * {FFT_RATE / FFT_N} AS DOUBLE) AS dominant_hz
FROM documents
"""


SPECS = [
    QuerySpec("multimodal_decode_meta", decode_metadata, _DECODE_META_ORACLE,
              "mapInPandas binary decode plumbing (deterministic fake codec)"),
    QuerySpec("multimodal_arrow_stats", arrow_byte_stats, _ARROW_BYTE_STATS_ORACLE,
              "mapInArrow byte stats (raw Arrow batches, no pandas boxing)"),
    QuerySpec("multimodal_embed_knn", embed_knn, _embed_knn_oracle(),
              "composed binary → feature-extract → cosine top-3 pipeline"),
    QuerySpec("multimodal_frame_sample", frame_sample, _FRAME_SAMPLE_ORACLE,
              "strided frame sampling over binary payloads"),
    QuerySpec("multimodal_binary_stats", binary_stats, _BINARY_STATS_ORACLE,
              "JVM-side binary column functions"),
    QuerySpec("multimodal_wav_decode", wav_decode, _WAV_DECODE_ORACLE,
              "real RIFF/WAVE chunk-walk parser over synthesized PCM fixtures"),
    QuerySpec("multimodal_ppm_decode", ppm_decode, _PPM_DECODE_ORACLE,
              "real binary-PPM (P6) parser via the decode_image dispatch"),
    QuerySpec("multimodal_wav_downsample", wav_downsample, _WAV_DOWNSAMPLE_ORACLE,
              "decode → decimate-by-2 → stats: the full media-transform "
              "pipeline over real container parsing"),
    QuerySpec("multimodal_wav_spectrum", wav_spectrum, _WAV_SPECTRUM_ORACLE,
              "real numpy rFFT dominant-frequency extraction over "
              "container-decoded exact-bin tones (closed-form oracle)"),
    QuerySpec("multimodal_image_tiles", image_tiles, _IMAGE_TILES_ORACLE,
              "ViT-style 4x4 patch extraction over the decoded P6 raster "
              "(numpy slicing; full patch grid incl. ragged edge oracled)"),
    QuerySpec("multimodal_image_hist_eq", image_hist_eq, _HIST_EQ_ORACLE,
              "histogram equalization over the decoded raster — all-integer "
              "CDF remap, closed-form oracle incl. row-grid padding"),
    QuerySpec("multimodal_scene_cuts", scene_cuts, _SCENE_CUTS_ORACLE,
              "shot-boundary detection: per-frame SAD thresholding over "
              "64-byte frames (integer-exact, sentinel -1s for short docs)"),
]
