"""Oracle-checked queries for the matrix-analytics module (SURVEY.md §2.1).

Both sides of each check are generated from the SAME Python literals in
iceberg_matrix_spark/data/matrix.py: the Spark side via createDataFrame,
the DuckDB side via rendered VALUES CTEs — the fixture cannot drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_matrix_spark.data.matrix import (
    ENGINE_FILES,
    FEATURES,
    VENDOR_GROUPS,
    apply_filters,
    compute_comparison,
    detect_folder_collisions,
    engine_frames,
    features_frame,
    merge_support_last_wins,
    support_grid,
    vendor_groups_frame,
)
from iceberg_matrix_spark.queries.registry import register

# ------------------------------------------------------------------ SQL gen


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_lit(x) for x in v) + "]"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values(rows, columns: str) -> str:
    body = ", ".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    return f"(VALUES {body}) AS t({columns})"


def _support_rows():
    return [
        s + (order,) for order, _platforms, support in ENGINE_FILES for s in support
    ]


def _platform_rows():
    return [
        p + (order,) for order, platforms, _support in ENGINE_FILES for p in platforms
    ]


_SUPPORT_CTE = (
    "support_raw AS (SELECT * FROM "
    + _values(
        _support_rows(),
        "platform_id, feature_id, version, level, notes, caveats, source_order",
    )
    + ")"
)

_PLATFORM_CTE = (
    "platforms AS (SELECT * FROM "
    + _values(
        _platform_rows(),
        "id, name, vendor, category, pgroup, variant_group, variant_label, source_order",
    )
    + ")"
)

_FEATURE_CTE = (
    "features AS (SELECT * FROM "
    + _values(FEATURES, "feature_id, name, category, introduced_in, description")
    + ")"
)

_MERGED_CTE = (
    "support AS (SELECT platform_id, feature_id, version, level, notes, caveats "
    "FROM (SELECT *, row_number() OVER (PARTITION BY platform_id, feature_id, version "
    "ORDER BY source_order DESC) AS rn FROM support_raw) WHERE rn = 1)"
)


def _grid_cte(versions: list[str]) -> str:
    vvals = ", ".join(f"('{v}')" for v in versions)
    return (
        f"versions AS (SELECT * FROM (VALUES {vvals}) AS v(version)), "
        "grid AS (SELECT p.id AS platform_id, f.feature_id, v.version, "
        "COALESCE(s.level, 'unknown') AS level, COALESCE(s.notes, '') AS notes, "
        "COALESCE(array_to_string(s.caveats, '|'), '') AS caveats_joined "
        "FROM platforms p CROSS JOIN features f CROSS JOIN versions v "
        "LEFT JOIN support s ON s.platform_id = p.id "
        "AND s.feature_id = f.feature_id AND s.version = v.version)"
    )


# ------------------------------------------------------------------ queries


@register(
    "q_matrix_support_lastwins",
    oracle="WITH "
    + _SUPPORT_CTE
    + ", "
    + _MERGED_CTE
    + " SELECT platform_id, feature_id, version, level, notes, "
    "COALESCE(array_to_string(caveats, '|'), '') AS caveats_joined FROM support",
)
def q_matrix_support_lastwins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mergeEngines' last-writer-wins support union (load-data.ts:69-84)."""
    _platforms, support = engine_frames(spark)
    return merge_support_last_wins(support).select(
        "platform_id",
        "feature_id",
        "version",
        "level",
        "notes",
        F.array_join("caveats", "|").alias("caveats_joined"),
    )


@register(
    "q_matrix_filtered_grid",
    oracle="WITH "
    + _PLATFORM_CTE
    + ", "
    + _FEATURE_CTE
    + ", "
    + _SUPPORT_CTE
    + ", "
    + _MERGED_CTE
    + ", "
    + _grid_cte(["v2"])
    + " SELECT g.* FROM grid g JOIN features f USING (feature_id) "
    "WHERE g.platform_id IN ('acme-alud', 'quarkdb', 'quarkdb-turbo', 'pond') "
    "AND f.introduced_in <> 'v3' AND f.category IN ('dml', 'snapshots') "
    "AND contains(lower(f.name), 'delete')",
)
def q_matrix_filtered_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyFilters + per-cell getSupportEntry with defaults
    (filters.ts:8-45; support.ts:17-25): v2-only view, dml/snapshots
    categories, search 'delete', four platforms selected."""
    platforms, support = engine_frames(spark)
    support = merge_support_last_wins(support)
    platforms, features = apply_filters(
        platforms,
        features_frame(spark),
        selected_platforms=["acme-alud", "quarkdb", "quarkdb-turbo", "pond"],
        selected_versions=["v2"],
        selected_categories=["dml", "snapshots"],
        search_query="Delete",
    )
    grid = support_grid(platforms, features, support, ["v2"])
    return grid.select(
        "platform_id",
        "feature_id",
        "version",
        "level",
        "notes",
        F.array_join("caveats", "|").alias("caveats_joined"),
    )


@register(
    "q_matrix_comparison_v2_v3",
    oracle="WITH "
    + _PLATFORM_CTE
    + ", "
    + _FEATURE_CTE
    + ", "
    + _SUPPORT_CTE
    + ", "
    + _MERGED_CTE
    + ", "
    + _grid_cte(["v2", "v3"])
    + ", per_feature AS (SELECT platform_id, feature_id, "
    "MAX(CASE WHEN version = 'v2' THEN level END) AS a, "
    "MAX(CASE WHEN version = 'v3' THEN level END) AS b "
    "FROM grid GROUP BY platform_id, feature_id) "
    "SELECT platform_id, "
    "CAST(SUM(CASE WHEN a = 'none' AND b <> 'none' THEN 1 ELSE 0 END) AS BIGINT) AS gained, "
    "CAST(SUM(CASE WHEN a <> 'none' AND b = 'none' THEN 1 ELSE 0 END) AS BIGINT) AS lost, "
    "CAST(SUM(CASE WHEN a <> b AND NOT (a = 'none' AND b <> 'none') "
    "AND NOT (a <> 'none' AND b = 'none') THEN 1 ELSE 0 END) AS BIGINT) AS changed "
    "FROM per_feature GROUP BY platform_id",
)
def q_matrix_comparison_v2_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """computeComparison for every platform (comparison.ts:4-30)."""
    platforms, support = engine_frames(spark)
    support = merge_support_last_wins(support)
    return compute_comparison(platforms, features_frame(spark), support, "v2", "v3")


@register(
    "q_matrix_level_summary",
    oracle="WITH "
    + _PLATFORM_CTE
    + ", "
    + _FEATURE_CTE
    + ", "
    + _SUPPORT_CTE
    + ", "
    + _MERGED_CTE
    + ", "
    + _grid_cte(["v2", "v3"])
    + " SELECT platform_id, version, "
    "CAST(SUM(CASE WHEN level = 'full' THEN 1 ELSE 0 END) AS BIGINT) AS n_full, "
    "CAST(SUM(CASE WHEN level = 'partial' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial, "
    "CAST(SUM(CASE WHEN level = 'none' THEN 1 ELSE 0 END) AS BIGINT) AS n_none, "
    "CAST(SUM(CASE WHEN level = 'unknown' THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown "
    "FROM grid GROUP BY platform_id, version",
)
def q_matrix_level_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per platform × version support-level histogram over the defaulted
    grid — the matrix page's summary row as a conditional aggregation."""
    platforms, support = engine_frames(spark)
    support = merge_support_last_wins(support)
    grid = support_grid(platforms, features_frame(spark), support, ["v2", "v3"])
    return grid.groupBy("platform_id", "version").agg(
        *[
            F.sum(F.when(F.col("level") == lvl, 1).otherwise(0)).alias(f"n_{lvl}")
            for lvl in ("full", "partial", "none", "unknown")
        ]
    )


@register(
    "q_matrix_folder_collisions",
    oracle="WITH groups AS (SELECT * FROM "
    + _values(
        [
            (vendor, prefix, pid, i)
            for vendor, (prefix, ids) in VENDOR_GROUPS.items()
            for i, pid in enumerate(ids)
        ],
        "vendor, vendor_prefix, id, ord",
    )
    + "), named AS (SELECT vendor, ord, id, "
    "CASE WHEN vendor_prefix IS NOT NULL AND starts_with(id, vendor_prefix || '-') "
    "THEN substring(id, length(vendor_prefix) + 2) ELSE id END AS folder_name "
    "FROM groups) "
    "SELECT vendor, folder_name, CAST(COUNT(*) AS BIGINT) AS n_ids, "
    "string_agg(id, ',' ORDER BY ord) AS platform_ids "
    "FROM named GROUP BY vendor, folder_name HAVING COUNT(*) >= 2",
)
def q_matrix_folder_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deriveEngineFolderName + detectFolderNameCollisions
    (engine-folders.ts:27-32,83-109)."""
    return detect_folder_collisions(vendor_groups_frame(spark))
