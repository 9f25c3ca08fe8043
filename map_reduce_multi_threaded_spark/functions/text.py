"""Text scalar functions — the reference's S5/S7 transforms plus the
deterministic hash helpers used by dedup/similarity.

All pure Column expressions: they stay inside whole-stage codegen (no
Python round-trip), and each has an exact DuckDB-SQL equivalent so the
oracle harness can verify value-level parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: Java ``\p{Punct}`` == ASCII punctuation == C ``ispunct`` in the C
#: locale — the exact character class the reference strips
#: (``map_reduce.cpp:160-165``). DuckDB's RE2 ``[[:punct:]]`` matches it.
PUNCT_RE = r"\p{Punct}"


def strip_punct(col: Column | str) -> Column:
    """Delete every ASCII punctuation char, the reference's in-place
    ``ispunct`` erase loop (``map_reduce.cpp:160-165``): ``don't`` →
    ``dont``, ``--`` → empty string."""
    return F.regexp_replace(col, PUNCT_RE, "")


_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col: Column | str) -> Column:
    """Byte-exact ASCII-only lowercase via ``translate`` — the
    reference's actual semantics (``std::tolower`` per char in the C
    locale, ``map_reduce.cpp:167``) and the only casefold that is
    engine-portable.  Full-Unicode ``lower()`` is NOT: the round-11
    adversarial-text sweep showed the JVM applies full Unicode casing
    (final sigma ``ΟΔΟΣ``→``οδος``, ``İ``→``i``+U+0307) while DuckDB's
    utf8proc applies simple 1:1 mappings (``οδοσ``, ``i``) — so any
    cross-engine-compared value derived from ``lower(text)`` silently
    diverges on non-ASCII input.  ``translate`` maps the 26 ASCII
    letters identically on both engines and passes every other code
    point through untouched."""
    return F.translate(F.col(col) if isinstance(col, str) else col,
                       _ASCII_UPPER, _ASCII_LOWER)


def duck_ascii_lower(expr: str) -> str:
    """DuckDB SQL mirror of :func:`ascii_lower`."""
    return f"translate({expr}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"


def to_lower(col: Column | str) -> Column:
    """ASCII lowercase (``std::tolower`` per char, ``map_reduce.cpp:167``)."""
    return ascii_lower(col)


def normalize_token(col: Column | str) -> Column:
    """strip punctuation then lowercase — the reference's full scalar
    pipeline between tokenize and emit (``map_reduce.cpp:160-171``)."""
    return to_lower(strip_punct(col))


def md5_long(col: Column, salt: str = "") -> Column:
    """Deterministic 60-bit non-negative hash derived from md5.

    Used as the hash family for MinHash/SimHash/LSH instead of Spark's
    ``xxhash64`` because DuckDB has no xxhash64 but both engines have
    bit-identical ``md5`` hex output; the oracle can reproduce this
    exactly via ``('0x' || substr(md5(x), 1, 15))::BIGINT``.

    15 hex chars = 60 bits < 2^63, so the cast never overflows/signs.
    """
    salted = F.concat(col.cast("string"), F.lit(salt)) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def md5_bucket(col: Column, n: int, salt: str = "") -> Column:
    """Stable bucket id in [0, n) — the engine-portable analogue of the
    reference's hand-rolled ``hash % 1024`` partitioning function
    (``map_reduce.cpp:214-217``)."""
    return md5_long(col, salt) % F.lit(n)


def py_md5_bucket(value: str, n: int, salt: str = "") -> int:
    """Driver-side Python mirror of :func:`md5_bucket` (same md5-hex
    prefix → 60-bit int → ``% n``), for folding SMALL compile-time
    constants (e.g. a fixed query-term vector) into literal expressions
    instead of shipping them through ``spark.createDataFrame``.

    Why this exists (round 7): a local-data ``createDataFrame`` builds
    a Python-RDD-backed relation whose every execution launches
    ``defaultParallelism`` Python worker tasks — measured 1.4-3.4 s per
    action for a 3-row frame on the round-7 host (vs 0.2 s for the
    equivalent JVM stage), recomputed per action and per AQE re-plan.
    A constant folded driver-side costs zero tasks, zero broadcast,
    and keeps the scoring expression inside whole-stage codegen.
    Parity with the Spark expression is pinned by a test.
    """
    import hashlib

    return int(hashlib.md5((value + salt).encode()).hexdigest()[:15], 16) % n


def duck_md5_long(expr: str, salt: str = "") -> str:
    """DuckDB SQL mirroring :func:`md5_long` for oracle queries."""
    salted = f"({expr}) || '{salt}'" if salt else f"({expr})"
    return f"('0x' || substr(md5({salted}), 1, 15))::BIGINT"
