"""Driver-style oracle comparison: run a Spark query and its DuckDB SQL
oracle over the same parquet tables, compare row count + column names +
order-insensitive values.

Comparison is EXACT by default (the driver hashes values), which is why
every query in the registry is written to be bit-deterministic on both
engines (decimal-sum tricks for double aggregates, md5-based hashing,
explicit tie-breaks).
"""

from __future__ import annotations

import math

import duckdb

from map_reduce_multi_threaded_spark.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return f"{v:.12g}"
    if isinstance(v, bytes):
        return "bytes:" + v.hex()
    return f"{type(v).__name__}:{v}"


# Spark simpleString dtype -> DuckDB type strings that hash identically in
# the driver's Arrow-level comparison.  Anything outside this map (notably
# HUGEINT from DuckDB's integer-sum widening, or an unexpected DECIMAL) is a
# driver hash-fail even when Python-level values match, because duckdb's
# fetchall() collapses HUGEINT to int.  See ADVICE r1.
_SPARK_TO_DUCK = {
    "bigint": {"BIGINT"},
    # int32-vs-BIGINT is VERIFIED driver-safe (ADVICE r2 asked to
    # restrict or verify): round-2 driver records hash-matched Spark
    # `int` columns against DuckDB BIGINT oracles (text_token_count
    # n_ws_tokens/n_bpe_tokens/n_chars, knn_lsh rank — all
    # hash_match=true in CORRECTNESS_r02.json), so the driver
    # normalizes integer widths before hashing; HUGEINT remains the
    # only dangerous widening.
    "int": {"INTEGER", "BIGINT"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "binary": {"BLOB"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
}


def check_output_contract(spark_df) -> None:
    """Registered queries must expose SCALAR top-level columns only.

    The driver's canonicalizer sorts result columns through pandas,
    which cannot hash/sort numpy-array cells — CORRECTNESS_r04 recorded
    ``TypeError: unhashable type: 'numpy.ndarray'`` for the first two
    queries that leaked a top-level ARRAY column (embedding_pq,
    agg_array_collect).  Serialize arrays (``array_join``) / structs
    (project fields) instead."""
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if f.dataType.simpleString().startswith(("array", "map", "struct"))
    ]
    assert not bad, (
        "top-level complex column(s) break the driver canonicalizer "
        "(serialize with array_join / project struct fields): " + "; ".join(bad)
    )


def check_types(spark_df, duck_rel) -> None:
    """Fail when a DuckDB oracle column's type would hash differently from
    the Spark column's (e.g. HUGEINT vs int64, DECIMAL(38,0) vs bigint)."""
    spark_types = {f.name.lower(): f.dataType.simpleString() for f in spark_df.schema.fields}
    duck_types = {c.lower(): str(t).upper() for c, t in zip(duck_rel.columns, duck_rel.types)}
    bad = []
    for col, dt in duck_types.items():
        st = spark_types.get(col)
        if st is None:
            continue
        if st.startswith("decimal"):
            want = st.replace("decimal", "DECIMAL").replace(" ", "")
            if dt.replace(" ", "") != want:
                bad.append(f"{col}: spark={st} duck={dt}")
        elif st.startswith(("array", "map", "struct")):
            if "HUGEINT" in dt or "INT128" in dt:
                bad.append(f"{col}: spark={st} duck={dt} (HUGEINT element)")
        elif st in _SPARK_TO_DUCK:
            if dt not in _SPARK_TO_DUCK[st]:
                bad.append(f"{col}: spark={st} duck={dt}")
        elif "HUGEINT" in dt or "INT128" in dt:
            bad.append(f"{col}: spark={st} duck={dt}")
    assert not bad, (
        "oracle column type mismatch (driver hash would fail): " + "; ".join(bad)
    )


def rows_multiset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver behavior), canonicalize values,
    sort rows — an order-insensitive fingerprint."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, sql: str, sf_dir: str) -> None:
    check_output_contract(spark_df)
    con = duck_con(sf_dir)
    duck = con.sql(sql)
    check_types(spark_df, duck)
    duck_cols = [d.lower() for d in duck.columns]
    duck_rows = duck.fetchall()
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = rows_multiset(spark_cols, spark_rows)
    d = rows_multiset(duck_cols, duck_rows)
    if s != d:
        diff_s = [r for r in s if r not in set(d)][:5]
        diff_d = [r for r in d if r not in set(s)][:5]
        raise AssertionError(
            f"value mismatch ({len(diff_s)}+ rows differ)\n"
            f"spark-only: {diff_s}\nduck-only: {diff_d}"
        )
