"""Multimodal (binary) column plumbing.

Images/audio/video ride through the engine as opaque ``binary``
columns with typed metadata — the schema/partitioning/UDF-shape layer
is what an engine must get right; the codec itself is a library call.
This container has no image/audio libraries, so the decode step is a
clearly-marked stub (:func:`decode_image_real`) plus a deterministic
fake decode whose outputs are pure functions of the payload bytes —
which makes even the ``mapInPandas`` path oracle-checkable in DuckDB.

The payload fixture is ``documents.text`` UTF-8-encoded to binary (the
corpus is ASCII, so byte values equal character codes on both engines).

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


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real image decode — STUB.  Wire pillow/opencv here on a cluster
    with the codec libraries installed; the surrounding Spark plumbing
    (schema, batching, partitioning) is identical either way."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no pillow
        raise NotImplementedError(
            "image decode requires pillow, which is not available in this "
            "container; use decode_metadata (deterministic fake) instead"
        ) from exc
    raise NotImplementedError("real decode path not exercised in tests")


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


# corpus is ASCII: byte k == ascii(char k), so SQL can mirror the bytes
_FRAME_SAMPLE_ORACLE = f"""
SELECT doc_id,
       len(list_transform(generate_series(1, length(text), {FRAME_STRIDE}), i -> i)) AS n_frames,
       CAST(list_sum(list_transform(generate_series(1, length(text), {FRAME_STRIDE}),
                               i -> ascii(substr(text, i, 1)))) % 256 AS BIGINT) AS frame_checksum
FROM documents
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
       upper(hex(substr(text, 1, 4))) AS magic_hex
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
        f"list_sum(list_transform(generate_series({k + 1}, length(text), {EMBED_DIM}), "
        f"i -> ascii(substr(text, i, 1)))) AS f{k}"
        for k in range(EMBED_DIM)
    )
    sq = " + ".join(f"CAST(f{k} * f{k} AS DOUBLE)" for k in range(EMBED_DIM))
    dot = " + ".join(f"CAST(q.f{k} * c.f{k} AS DOUBLE)" for k in range(EMBED_DIM))
    return f"""
WITH f AS (
  SELECT doc_id,
       {fexprs}
  FROM documents WHERE length(text) >= {EMBED_DIM}
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
]
