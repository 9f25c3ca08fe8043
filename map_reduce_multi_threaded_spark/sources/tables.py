"""Parquet table loaders for the test star schema (see FIXTURES.md).

Generalizes the reference's single directory-listing source
(``map_reduce.cpp:477-495``) into a catalog of typed tables.  Spark's
``InMemoryFileIndex`` + task scheduler replace the reference's
master-thread pull queue (``map_reduce.cpp:127-150``) wholesale — file
splits are assigned to tasks with locality and speculation for free.

Scale note: at 100 TB these would be partitioned/bucketed tables, not
single files; nothing else in the engine would change, because every
operator takes a DataFrame and never assumes a partition count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: All tables the driver materializes per scale factor.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables — safe to broadcast at any realistic scale
#: (region/nation are bounded by geography; supplier stays ~1e4/sf).
BROADCAST_SAFE = frozenset({"region", "nation", "supplier"})


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-UTC ``TimestampType`` whatever
    the fixture's physical parquet type is.  Generations of the driver
    fixture have shipped it as TIMESTAMP(NANOS) — which Spark reads as
    int64 nanoseconds under ``spark.sql.legacy.parquet.nanosAsLong`` —
    and as TIMESTAMP_MICROS with isAdjustedToUTC=false, which reads as
    TIMESTAMP_NTZ.  DuckDB (the correctness oracle) sees microsecond
    naive timestamps in both cases, so each branch lands on the same
    instants: the session timezone is pinned to UTC (session.py)."""
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # integer division — ts is 19-digit nanos; double math would
        # round the low microsecond digit (DuckDB truncates on read).
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        # naive micros; cast interprets wall-clock in session tz (UTC).
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df  # already TimestampType


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table (``events.ts`` → see normalize_event_ts)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def scan_max_tasks(sf_dir: str, name: str) -> tuple[int, int] | None:
    """(row_groups, rows): the total ROW-GROUP count across the
    table's files — the upper bound on scan parallelism, since Spark
    splits parquet at row-group boundaries (byte-range splits below
    that all collapse onto whichever task holds the group) — plus the
    footer row count.  None when the layout is not a flat file/dir of
    .parquet (caller treats unknown as 'parallel enough').  Footer
    metadata only — no Spark job (the corpus_count precedent,
    guide §6)."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        import pyarrow.parquet as pq

        if os.path.isfile(path):
            m = pq.ParquetFile(path).metadata
            return m.num_row_groups, m.num_rows
        if os.path.isdir(path):
            groups = rows = 0
            for f in os.listdir(path):
                if f.endswith(".parquet"):
                    m = pq.ParquetFile(os.path.join(path, f)).metadata
                    groups += m.num_row_groups
                    rows += m.num_rows
            return groups, rows
    except Exception:  # noqa: BLE001 — unknown layout → assume splittable
        return None
    return None


#: Minimum rows each would-be task must receive for the spread to be
#: worth an exchange: below ~1000 rows/core, task-launch and stage
#: latency dominate any per-row work a narrow map could parallelize
#: (measured: spreading the 2,000-row sf0.1 embeddings cost
#: knn_scalar_quant +0.9 s of pure stage latency at the bench scale
#: while buying nothing — the 80k-row stress corpus is where the same
#: spread wins 2–4×).  Scale-neutral: compares data volume to the
#: session's parallelism, not to any host constant.
SPREAD_MIN_ROWS_PER_TASK = 1000


def spread_unsplittable_scan(
    spark: SparkSession, df: DataFrame, sf_dir: str, name: str
) -> DataFrame:
    """Round 16 (guide §2.5 "input skew: one huge unsplittable file …
    otherwise repartition immediately after the read"): when the
    table's parquet layout cannot feed every core (row groups <
    default parallelism), round-robin repartition right after the
    scan so a CPU-heavy narrow map doesn't run as one straggler task.

    Every driver fixture is a single-row-group file, so every
    per-document pipeline (shingling, per-position md5, n-gram
    explode) was bottlenecked on ONE task regardless of cluster size —
    text_fingerprint measured 46.8 s single-task at the 100× stress
    fixture with 31 idle cores.  The gate is scale-adaptive, not a
    local[32] constant: on a production table with thousands of row
    groups the condition is false and NO exchange is added; it fires
    exactly when the scan's achievable parallelism starves the map
    (the same condition at any scale).  Round-robin repartition is
    retry-safe by default (spark.sql.execution.sortBeforeRepartition,
    guide §2.5)."""
    want = spark.sparkContext.defaultParallelism
    stats = scan_max_tasks(sf_dir, name)
    if (
        stats is not None
        and stats[0] < want
        and stats[1] >= SPREAD_MIN_ROWS_PER_TASK * want
    ):
        return df.repartition(want)
    return df


def power10_base(df: DataFrame, key: str, alias: str = "idbase") -> DataFrame:
    """1-row frame with ``alias`` = smallest power of 10 strictly above
    ``max(df[key])`` — a scale-safe namespace for synthesized row ids.
    A fixed additive constant collides with real keys once the fixture
    outgrows it (TPC-H o_orderkey crosses 1e8 around sf≈17); a
    max-derived power of 10 cannot, at any scale factor, and is exact
    in IEEE doubles for any realistic exponent so Spark and DuckDB
    agree bit-for-bit.  Oracle-side twin: ``CAST(power(10,
    ceil(log10(max(<key>) + 1))) AS BIGINT)``."""
    return df.agg(
        F.expr(
            f"CAST(power(10, ceil(log10(max({key}) + 1))) AS BIGINT)"
        ).alias(alias)
    )


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


#: staging kinds no code reads anymore (renamed layouts) — swept on
#: any staging access.  'formats' became 'formats_v2' when the XML
#: copy was added in round 5.
RETIRED_STAGE_KINDS = ("formats", "zorder")


def stage_scratch_dir(sf_dir: str, kind: str, *source_tables: str) -> str:
    """Scratch directory for staged derivatives of ``sf_dir`` tables,
    keyed by a CONTENT fingerprint of the source parquet files
    (absolute path + mtime + size), not just the sf dir basename — two
    sf dirs with the same basename, or a regenerated fixture, must not
    serve stale staged data (ADVICE r2).

    Layout is ``<root>/<base>/<kind>-<fp>`` so that when a fixture is
    regenerated the stale same-kind sibling (old fingerprint) can be
    pruned without touching other kinds' staging keyed on different
    source tables (ADVICE r3: fingerprinted dirs were never cleaned
    up).  Legacy flat ``<base>-<fp>`` dirs from the old layout are
    removed too — nothing reads them anymore, as are RETIRED kinds
    (renamed staging layouts would otherwise orphan their old dirs
    on disk forever)."""
    import hashlib
    import os
    import shutil

    parts = []
    for t in source_tables:
        p = os.path.abspath(f"{sf_dir}/{t}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{p}:{st.st_mtime_ns}:{st.st_size}")
        except OSError:
            parts.append(f"{p}:missing")
    fp = hashlib.md5("|".join(parts).encode()).hexdigest()[:12]
    base = os.path.basename(os.path.normpath(sf_dir))
    root = "/tmp/spark_graft_stage"
    try:
        for d in os.listdir(root):
            full = os.path.join(root, d)
            if d.startswith(f"{base}-"):  # legacy flat layout
                shutil.rmtree(full, ignore_errors=True)
            elif d == base and os.path.isdir(full):
                for sub in os.listdir(full):
                    stale_kind = sub.startswith(f"{kind}-") and sub != f"{kind}-{fp}"
                    retired = any(sub.startswith(f"{rk}-") for rk in RETIRED_STAGE_KINDS)
                    if stale_kind or retired:
                        shutil.rmtree(os.path.join(full, sub), ignore_errors=True)
    except OSError:
        pass
    return f"{root}/{base}/{kind}-{fp}"
