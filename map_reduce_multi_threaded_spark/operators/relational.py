"""Relational operator suite over the TPC-H-ish star schema.

The reference had exactly one aggregation (COUNT by key) and zero
joins/windows/sorts/set-ops (SURVEY.md §2.1).  This module is the
generalized relational surface, DataFrame-first so Catalyst plans it.
"""

from __future__ import annotations

from ..registry import QuerySpec

SPECS: list[QuerySpec] = []
