"""Multi-format source readers (csv / json / orc / text).

The reference read exactly one format — whitespace-delimited raw text
(``map_reduce.cpp:152-159``).  A real engine ingests whatever the lake
holds; these thin wrappers standardize the options that matter for
correctness (headers, schema, timestamp parsing) so queries stay
format-agnostic.

Scale: all of these splits/parallelize server-side like parquet; the
difference is parse cost and the loss of pushdown/pruning (CSV/JSON
read every byte) — which is why :mod:`.sinks`' default is parquet and
these are for ingestion edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType | str | None = None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_xml(spark: SparkSession, path: str, schema: StructType | str | None = None, row_tag: str = "row") -> DataFrame:
    """Native XML source (new in Spark 4 — the spark-xml package moved
    in-tree): one DataFrame row per ``row_tag`` element."""
    reader = spark.read.option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format("xml").load(path)
