"""Deduplication operators (LLM-data-pipeline extension)."""

from __future__ import annotations

from ..registry import QuerySpec

SPECS: list[QuerySpec] = []
