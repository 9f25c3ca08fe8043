"""Query registry: the single source of truth wiring operators to the
driver contract in ``__spark_entry__.py``.

Each operator module contributes :class:`QuerySpec` entries; the
``queries()`` / ``oracle_sql()`` functions the driver calls are just
aggregations over this registry, so adding an operator is one list
append away from being correctness-gated against the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One correctness-gated query.

    ``oracle`` is the ANSI-SQL equivalent DuckDB runs over the same
    parquet tables (views: region nation customer supplier part orders
    lineitem events documents embeddings).  ``None`` marks an operator
    whose semantics are not SQL-expressible (the driver then records a
    weaker rows-only check).  Column names/aliases MUST match between
    the Spark result and the oracle — the driver sorts columns by name
    before value-hashing.
    """

    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


def collect_specs() -> list[QuerySpec]:
    """Import every operator module and concatenate its SPECS."""
    from .operators import (
        dedup,
        graph,
        multimodal,
        pipeline,
        relational,
        similarity,
        textstats,
        udf_suite,
        wordcount,
    )
    from .streaming import queries as streaming_queries

    specs: list[QuerySpec] = []
    for mod in (wordcount, similarity, textstats, multimodal, udf_suite, pipeline, graph, streaming_queries, relational, dedup):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate query names in registry: {dupes}")
    # Sweep order: round 1's driver stopped at spec #50 (a sweep cap),
    # leaving everything after it unverified.  Order specs so queries
    # WITHOUT a prior-round green CORRECTNESS record come first — new
    # queries and previously-failing ones get driver coverage before
    # the already-proven bulk, and the union across rounds converges
    # to full coverage even under a per-round cap.  Stable within each
    # group, falls back to module order when no records exist.
    proven = _previously_green()
    return sorted(
        specs, key=lambda s: (s.name in proven, names.index(s.name))
    )


def _previously_green() -> frozenset[str]:
    """Names with a passing record in any prior CORRECTNESS_r*.json
    (hash match, or a rows-only check for oracle-less specs)."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                records = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(records, dict):
            continue
        for name, rec in records.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("hash_match") or (
                rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            ):
                green.add(name)
    return frozenset(green)
