"""Plan inspection utilities (see plans/inspect.py)."""

from iceberg_matrix_spark.plans.inspect import (
    broadcast_join_count,
    codegen_stage_count,
    explain_formatted,
    pushed_filters,
    round_robin_shuffle_count,
    read_schemas,
    scan_columns,
    data_shuffle_count,
    shuffle_count,
    sort_merge_join_count,
)

__all__ = [
    "broadcast_join_count",
    "codegen_stage_count",
    "explain_formatted",
    "pushed_filters",
    "round_robin_shuffle_count",
    "read_schemas",
    "scan_columns",
    "data_shuffle_count",
    "shuffle_count",
    "sort_merge_join_count",
]
