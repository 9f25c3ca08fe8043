"""Sinks.

The reference's sink (``map_reduce.cpp:440-450``, ``OutputToFile``)
wrote one ``Process_<pid>_Output_File.txt`` per MPI process, one
``<word, count> `` line per entry, sorted by word (a side effect of
``std::map`` key order).  The Spark equivalent is one file per shuffle
partition with an explicit ``sortWithinPartitions`` — Spark's hash
aggregate does NOT sort, so the ordering the reference got for free
must be declared.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_reference_format(
    df: DataFrame,
    path: str,
    word_col: str = "word",
    count_col: str = "cnt",
    num_files: int | None = None,
) -> None:
    """Write the reference's exact output contract: text files, one
    ``<word, count> `` line per row (trailing space included —
    ``map_reduce.cpp:448``: ``"<" << word << ", " << count << "> "``),
    sorted by word within each partition, partitioned by
    ``hash(word) % numPartitions`` exactly like the reference's cyclic
    bin→process ownership (``map_reduce.cpp:306,400``).  ``num_files``
    maps the reference's MPI world size (one output file per rank)."""
    parts = [F.col(word_col)] if num_files is None else [num_files, F.col(word_col)]
    (
        df.repartition(*parts)  # hash-partition by key = bin ownership
        .sortWithinPartitions(word_col)
        .select(
            F.concat(
                F.lit("<"), F.col(word_col), F.lit(", "),
                F.col(count_col).cast("string"), F.lit("> "),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """General sink: parquet/csv/json/orc/text.  At 100 TB, always
    parquet with partitioning on a low-cardinality natural key."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
