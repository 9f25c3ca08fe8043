"""Plan inspection and metrics utilities."""

from .explain import executed_plan, has_broadcast_join, pushed_filters, read_schema
from .metrics import observe_rows, timed

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema",
    "observe_rows",
    "timed",
]
