"""Physical-plan introspection (SURVEY §4): the reference delegates all
optimization to SQLite's planner; the Spark engine delegates to Catalyst —
this module makes Catalyst's decisions *observable and assertable* so scan
pushdown, column pruning, broadcast choices and shuffle counts are tested
properties, not hopes.
"""

from sqlitedataframe_spark.plans.introspect import (
    broadcast_join_count,
    codegen_stage_count,
    foldable_partition_window_count,
    exchange_count,
    explain_text,
    global_window_count,
    partition_filters,
    pushed_filters,
    read_schemas,
    scan_count,
    upstream_global_sort_count,
)

__all__ = [
    "broadcast_join_count",
    "codegen_stage_count",
    "foldable_partition_window_count",
    "exchange_count",
    "explain_text",
    "global_window_count",
    "partition_filters",
    "pushed_filters",
    "read_schemas",
    "scan_count",
    "upstream_global_sort_count",
]
