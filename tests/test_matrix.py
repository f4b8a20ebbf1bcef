"""Matrix-analytics semantics checks against hand-computed expectations.

Mirrors the reference app's pure-function behavior (SURVEY.md §2.1):
load-data.ts merge order, support.ts defaults, comparison.ts counters,
engine-folders.ts collision rule.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_matrix_spark.data.matrix import (
    apply_filters,
    compute_comparison,
    detect_folder_collisions,
    engine_frames,
    features_frame,
    merge_support_last_wins,
    support_grid,
    vendor_groups_frame,
)


def _merged(spark):
    _platforms, support = engine_frames(spark)
    return merge_support_last_wins(support)


def test_last_writer_wins_override(spark):
    # engine file 3 ('pond') overrides file 0's acme-alud:row-reads:v2
    row = (
        _merged(spark)
        .filter(
            (F.col("platform_id") == "acme-alud")
            & (F.col("feature_id") == "row-reads")
            & (F.col("version") == "v2")
        )
        .collect()
    )
    assert len(row) == 1
    assert row[0]["level"] == "full"
    assert row[0]["notes"] == "fixed in rev 2"
    assert row[0]["source_order"] == 3


def test_support_grid_defaults_missing_cells(spark):
    platforms, support = engine_frames(spark)
    grid = support_grid(platforms, features_frame(spark), _merged(spark), ["v2", "v3"])
    # 5 platforms x 8 features x 2 versions, every cell present
    assert grid.count() == 5 * 8 * 2
    missing = grid.filter(
        (F.col("platform_id") == "pond")
        & (F.col("feature_id") == "branching")
        & (F.col("version") == "v2")
    ).collect()[0]
    assert missing["level"] == "unknown"
    assert missing["notes"] == ""
    assert missing["caveats"] == []


def test_apply_filters_v3_gate_and_search(spark):
    platforms, support = engine_frames(spark)
    _p, feats = apply_filters(
        platforms, features_frame(spark), selected_versions=["v2"]
    )
    names = {r["feature_id"] for r in feats.collect()}
    assert "deletion-vectors" not in names and "row-reads" in names

    _p, feats = apply_filters(
        platforms, features_frame(spark), search_query="  DELETE "
    )
    # substring match: "Position deletes"/"Equality deletes" contain
    # "delete"; "Deletion vectors" does not (deletion != delete+suffix)
    assert {r["feature_id"] for r in feats.collect()} == {
        "pos-deletes",
        "eq-deletes",
    }


def test_compute_comparison_hand_checked(spark):
    platforms, support = engine_frames(spark)
    result = {
        r["platform_id"]: (r["gained"], r["lost"], r["changed"])
        for r in compute_comparison(
            platforms, features_frame(spark), _merged(spark), "v2", "v3"
        ).collect()
    }
    # acme-alud v2→v3 per feature (after last-wins override of row-reads:v2):
    #   row-reads     full    → partial  : changed
    #   pos-deletes   full    → full     : same
    #   time-travel   none    → unknown  : gained (none → not-none)
    #   branching     unknown → unknown  : same
    #   eq-deletes    unknown → unknown  : same
    #   deletion-vectors unknown → none  : lost (not-none → none)
    #   variant-type  unknown → unknown  : same
    #   row-lineage   unknown → unknown  : same
    assert result["acme-alud"] == (1, 1, 1)
    # pond: row-reads full→unknown changed; time-travel partial→unknown changed;
    # variant-type unknown→full changed; rest unknown→unknown
    assert result["pond"] == (0, 0, 3)


def test_folder_collisions(spark):
    rows = detect_folder_collisions(vendor_groups_frame(spark)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["vendor"], r["folder_name"], r["n_ids"]) == ("demo", "a", 2)
    assert r["platform_ids"] == "demo-a,a"  # input order preserved
