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

    # Module order == driver sweep order.  Round 1's driver stopped at
    # spec #50 (a sweep cap), leaving everything after the dedup module
    # unverified — so the modules that were cut off (similarity,
    # textstats, multimodal, udf_suite, pipeline, streaming) now come
    # FIRST; the round-1-verified relational/dedup bulk comes last.
    specs: list[QuerySpec] = []
    for mod in (wordcount, similarity, textstats, multimodal, udf_suite, pipeline, graph, streaming_queries, relational, dedup):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate query names in registry: {dupes}")
    return specs
