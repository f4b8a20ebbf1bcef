"""Matrix analytics: the reference app's own dataflow, as DataFrames.

See iceberg_matrix_spark/data/matrix.py (SURVEY.md §2.1).
"""

from iceberg_matrix_spark.data.matrix import (
    apply_filters,
    compute_comparison,
    detect_folder_collisions,
    engine_frames,
    features_frame,
    folder_name_expr,
    merge_support_last_wins,
    support_grid,
)

__all__ = [
    "apply_filters",
    "compute_comparison",
    "detect_folder_collisions",
    "engine_frames",
    "features_frame",
    "folder_name_expr",
    "merge_support_last_wins",
    "support_grid",
]
