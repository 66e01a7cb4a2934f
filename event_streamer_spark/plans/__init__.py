"""Plan introspection utilities (no custom Catalyst rules — SURVEY §4).

The engine deliberately ships zero custom optimizer rules: every operator
is declared through the DataFrame/SQL API so Catalyst's pushdown,
pruning, join selection, and AQE do the planning. This module only
*inspects* plans so tests and tuning sessions can assert the shapes that
matter at 100 TB.
"""

from event_streamer_spark.plans.introspect import (
    explain_str,
    pushed_filters,
    read_schemas,
    has_broadcast_join,
    has_sort_merge_join,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schemas",
    "has_broadcast_join",
    "has_sort_merge_join",
    "shuffle_count",
]
