"""Streaming query specs (run to a memory sink so the oracle can gate
them like any batch query)."""

from __future__ import annotations

from ..registry import QuerySpec

SPECS: list[QuerySpec] = []
