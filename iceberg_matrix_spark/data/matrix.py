"""The reference app's compatibility-matrix dataflow, re-expressed as Spark.

The reference's web app is itself a tiny query engine over merged JSON
(SURVEY.md §2.1). Each of its pure functions maps to a declarative
DataFrame operator here:

- ``mergeEngines`` (/root/reference/src/data/load-data.ts:69-84): platform
  arrays concatenate in a fixed vendor order; support maps union with
  last-writer-wins. Spark: ``unionByName`` + a ``row_number()`` window over
  the composite key ordered by source position descending.
- ``applyFilters`` (/root/reference/src/utils/filters.ts:8-45): platform-id
  membership, v3-introduced gate, category membership, case-insensitive
  name search. Spark: plain ``filter`` predicates (Catalyst folds them).
- ``getSupportEntry`` (/root/reference/src/utils/support.ts:17-25): point
  lookup with a default ``{level: unknown, notes: "", caveats: []}`` row.
  Spark: left join + ``coalesce`` — the (platform × feature × version)
  grid side is the big side at scale, the support fact table broadcasts.
- ``computeComparison`` (/root/reference/src/utils/comparison.ts:4-30):
  per-platform v2→v3 gained/lost/changed counters. Spark: two lookups +
  conditional aggregation (``sum(when(...))``).
- ``deriveEngineFolderName`` / ``detectFolderNameCollisions``
  (/root/reference/src/data/engine-folders.ts:27-32,83-109): prefix strip +
  group-by with ``count >= 2``.

Scale notes: platforms/features are dimension tables (hundreds of rows at
most) — every join here broadcasts. The same operators applied to a
billion-row support fact table still hold: the window for last-wins
shuffles on the composite key (uniformly distributed), the grid join
broadcasts the dims, and the conditional agg is map-side partial.

The fixture dataset below is synthetic (NOT copied from the reference's
catalog JSON); it exists so the operators are exercised end-to-end against
the DuckDB oracle with bit-identical inputs on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from iceberg_matrix_spark.session import local_df

# --------------------------------------------------------------------------
# Synthetic fixture: engine files in merge order (like load-data.ts imports).
# Tuples: platforms (id, name, vendor, category, pgroup, variant_group,
# variant_label); support (platform_id, feature_id, version, level, notes,
# caveats). The 'pond' file deliberately overrides an 'acme-alud' key to
# exercise last-writer-wins.
# --------------------------------------------------------------------------

VERSIONS = ["v2", "v3"]

FEATURES = [
    # (feature_id, name, category, introduced_in, description)
    ("row-reads", "Row reads", "read", "v2", "scan table rows"),
    ("pos-deletes", "Position deletes", "dml", "v2", "file/offset delete files"),
    ("eq-deletes", "Equality deletes", "dml", "v2", "value-match delete files"),
    ("time-travel", "Time travel", "snapshots", "v2", "query past snapshots"),
    ("branching", "Branching and tagging", "snapshots", "v2", "named refs"),
    ("deletion-vectors", "Deletion vectors", "dml", "v3", "puffin bitmap deletes"),
    ("variant-type", "Variant type", "types", "v3", "semi-structured values"),
    ("row-lineage", "Row lineage", "types", "v3", "row id + sequence tracking"),
]

ENGINE_FILES = [
    # (source_order, platforms, support)
    (
        0,
        [("acme-alud", "Alud", "acme", "cloud", "Acme Cloud", None, None)],
        [
            ("acme-alud", "row-reads", "v2", "partial", "needs manifest cache", ["slow planning"]),
            ("acme-alud", "row-reads", "v3", "partial", "", []),
            ("acme-alud", "pos-deletes", "v2", "full", "", []),
            ("acme-alud", "pos-deletes", "v3", "full", "", []),
            ("acme-alud", "time-travel", "v2", "none", "", []),
            ("acme-alud", "deletion-vectors", "v3", "none", "", []),
        ],
    ),
    (
        1,
        [("acme-borel", "Borel", "acme", "cloud", "Acme Cloud", None, None)],
        [
            ("acme-borel", "row-reads", "v2", "full", "", []),
            ("acme-borel", "pos-deletes", "v2", "partial", "read only", ["no writes"]),
            ("acme-borel", "eq-deletes", "v2", "none", "", []),
            ("acme-borel", "time-travel", "v2", "full", "", []),
            ("acme-borel", "branching", "v2", "none", "", []),
            ("acme-borel", "row-reads", "v3", "none", "", []),
            ("acme-borel", "variant-type", "v3", "partial", "no shredding", ["unshredded"]),
        ],
    ),
    (
        2,
        [
            ("quarkdb", "QuarkDB", "oss", "open-source", "Community", None, None),
            ("quarkdb-turbo", "QuarkDB Turbo", "oss", "open-source", "Community", "quarkdb", "Turbo"),
        ],
        [
            ("quarkdb", "row-reads", "v2", "full", "", []),
            ("quarkdb", "eq-deletes", "v2", "partial", "read path only", ["read-only", "no upsert"]),
            ("quarkdb", "time-travel", "v2", "full", "", []),
            ("quarkdb", "branching", "v2", "partial", "tags only", ["no branch writes"]),
            ("quarkdb", "deletion-vectors", "v3", "full", "", []),
            ("quarkdb", "row-lineage", "v3", "unknown", "untested", []),
            ("quarkdb-turbo", "row-reads", "v2", "full", "", []),
            ("quarkdb-turbo", "eq-deletes", "v2", "none", "", []),
        ],
    ),
    (
        3,
        [("pond", "Pond", "oss", "open-source", "Community", None, None)],
        [
            ("pond", "row-reads", "v2", "full", "", []),
            ("pond", "time-travel", "v2", "partial", "snapshot id only", ["no timestamp syntax"]),
            ("pond", "variant-type", "v3", "full", "", []),
            # deliberate override of engine-file 0's entry: last writer wins
            ("acme-alud", "row-reads", "v2", "full", "fixed in rev 2", []),
        ],
    ),
]

# Folder-collision fixture (engine-folders.ts): vendor → (prefix, ids).
# 'demo' contains a genuine collision: 'demo-a' and 'a' both derive to 'a'.
VENDOR_GROUPS = {
    "acme": ("acme", ["acme-alud", "acme-borel"]),
    "oss": (None, ["quarkdb", "quarkdb-turbo", "pond"]),
    "demo": ("demo", ["demo-a", "a", "demo-b"]),
}

_PLATFORM_SCHEMA = (
    "id string, name string, vendor string, category string, pgroup string, "
    "variant_group string, variant_label string, source_order int"
)
_SUPPORT_SCHEMA = (
    "platform_id string, feature_id string, version string, level string, "
    "notes string, caveats array<string>, source_order int"
)
_FEATURE_SCHEMA = (
    "feature_id string, name string, category string, introduced_in string, "
    "description string"
)


def _dim(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A dimension-table literal: ONE slice at parallelize time so
    cross/lookup joins against it plan as broadcast nested loops, not
    32×32 cartesian tasks — and so the 32 Python-backed partitions of a
    default createDataFrame never exist to begin with (each costs a
    Python worker per downstream touch)."""
    return local_df(spark, rows, schema)


def features_frame(spark: SparkSession) -> DataFrame:
    return _dim(spark, FEATURES, _FEATURE_SCHEMA)


def engine_frames(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """All engine files as (platforms, support) with their source order.

    Mirrors load-data.ts's static imports: each file contributes its rows
    tagged with its position in the merge order.
    """
    plat_rows = []
    sup_rows = []
    for order, platforms, support in ENGINE_FILES:
        plat_rows += [p + (order,) for p in platforms]
        sup_rows += [s + (order,) for s in support]
    return (
        _dim(spark, plat_rows, _PLATFORM_SCHEMA),
        _dim(spark, sup_rows, _SUPPORT_SCHEMA),
    )


def merge_support_last_wins(support: DataFrame) -> DataFrame:
    """mergeEngines' Object.assign union: keep the row with the highest
    source_order per (platform_id, feature_id, version).

    load-data.ts:73-76 — merge order is load-bearing. At scale this is one
    shuffle on the composite key; the key space is uniform so no salting
    is needed.
    """
    w = Window.partitionBy("platform_id", "feature_id", "version").orderBy(
        F.col("source_order").desc()
    )
    return (
        support.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_filters(
    platforms: DataFrame,
    features: DataFrame,
    *,
    selected_platforms: list[str] | None = None,
    selected_versions: list[str] | None = None,
    selected_categories: list[str] | None = None,
    search_query: str = "",
) -> tuple[DataFrame, DataFrame]:
    """filters.ts:8-45, predicate for predicate."""
    if selected_platforms:
        platforms = platforms.filter(F.col("id").isin(selected_platforms))
    versions = selected_versions if selected_versions is not None else VERSIONS
    if "v3" not in versions:
        features = features.filter(F.col("introduced_in") != "v3")
    if selected_categories:
        features = features.filter(F.col("category").isin(selected_categories))
    q = search_query.strip().lower()
    if q:
        features = features.filter(F.lower(F.col("name")).contains(q))
    return platforms, features


def support_grid(
    platforms: DataFrame,
    features: DataFrame,
    support: DataFrame,
    versions: list[str],
) -> DataFrame:
    """The rendered matrix: every (platform × feature × version) cell with
    getSupportEntry's default row for missing keys (support.ts:17-25).

    The grid side is platforms × features × versions (the render surface);
    the support fact table joins in. Dims broadcast; at a 10^9-cell scale
    the join key is the uniform composite key — plain shuffle hash join.
    """
    spark = platforms.sparkSession
    vdf = _dim(spark, [(v,) for v in versions], "version string")
    grid = (
        platforms.select(F.col("id").alias("platform_id"))
        .crossJoin(F.broadcast(features.select("feature_id")))
        .crossJoin(F.broadcast(vdf))
    )
    return grid.join(
        F.broadcast(support), ["platform_id", "feature_id", "version"], "left"
    ).select(
        "platform_id",
        "feature_id",
        "version",
        F.coalesce(F.col("level"), F.lit("unknown")).alias("level"),
        F.coalesce(F.col("notes"), F.lit("")).alias("notes"),
        F.coalesce(F.col("caveats"), F.array().cast("array<string>")).alias("caveats"),
    )


def compute_comparison(
    platforms: DataFrame,
    features: DataFrame,
    support: DataFrame,
    version_a: str,
    version_b: str,
) -> DataFrame:
    """comparison.ts:4-30 as one conditional aggregation.

    For each platform: count features whose support level differs between
    the two versions — gained (none → not-none), lost (not-none → none),
    changed (any other difference, including unknown→full).
    """
    cells = support_grid(platforms, features, support, [version_a, version_b])
    a = F.max(F.when(F.col("version") == version_a, F.col("level")))
    b = F.max(F.when(F.col("version") == version_b, F.col("level")))
    per_feature = cells.groupBy("platform_id", "feature_id").agg(
        a.alias("a"), b.alias("b")
    )
    return per_feature.groupBy("platform_id").agg(
        F.sum(
            F.when((F.col("a") == "none") & (F.col("b") != "none"), 1).otherwise(0)
        ).alias("gained"),
        F.sum(
            F.when((F.col("a") != "none") & (F.col("b") == "none"), 1).otherwise(0)
        ).alias("lost"),
        F.sum(
            F.when(
                (F.col("a") != F.col("b"))
                & ~((F.col("a") == "none") & (F.col("b") != "none"))
                & ~((F.col("a") != "none") & (F.col("b") == "none")),
                1,
            ).otherwise(0)
        ).alias("changed"),
    )


def folder_name_expr(id_col: Column, prefix_col: Column) -> Column:
    """engine-folders.ts:27-32: strip '<prefix>-' when present, else id."""
    has_prefix = prefix_col.isNotNull() & id_col.startswith(
        F.concat(prefix_col, F.lit("-"))
    )
    # built from the PASSED columns (an F.expr string would hardcode the
    # names 'id'/'vendor_prefix' and ignore the parameters)
    return F.when(
        has_prefix,
        id_col.substr(F.length(prefix_col) + F.lit(2), F.length(id_col)),
    ).otherwise(id_col)


def vendor_groups_frame(spark: SparkSession) -> DataFrame:
    rows = []
    for vendor, (prefix, ids) in VENDOR_GROUPS.items():
        rows += [(vendor, prefix, pid, i) for i, pid in enumerate(ids)]
    return _dim(
        spark, rows, "vendor string, vendor_prefix string, id string, ord int"
    )


def detect_folder_collisions(groups: DataFrame) -> DataFrame:
    """engine-folders.ts:83-109: derived folder names shared by >= 2 ids
    within one vendor, ids reported in input order."""
    named = groups.withColumn(
        "folder_name", folder_name_expr(F.col("id"), F.col("vendor_prefix"))
    )
    return (
        named.groupBy("vendor", "folder_name")
        .agg(
            F.count(F.lit(1)).alias("n_ids"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ord", "id"))),
                    lambda s: s["id"],
                ),
                ",",
            ).alias("platform_ids"),
        )
        .filter(F.col("n_ids") >= 2)
    )
