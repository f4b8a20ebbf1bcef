"""Daft API-shape parity: the reference's Daft suite program structure
(daft_feature_tests.py) runs 1:1 against IceLite — read_iceberg is a lazy
frame, write_iceberg appends/overwrites, from_pydict builds the input,
snapshot_id pins time travel, and MoR deletes apply through the read."""

from __future__ import annotations

import pytest

from iceberg_matrix_spark.tables import (
    IceLiteCatalog,
    from_pydict,
    read_iceberg,
    write_iceberg,
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = IceLiteCatalog(spark, str(tmp_path / "wh"))
    c.create_namespace("default")
    return c


def test_read_write_shapes(spark, cat):
    """write-insert (:184-196) then read-support (:166-171)."""
    tbl = cat.create_table("default.t", "id bigint, name string, value double")
    df = from_pydict(
        spark, {"id": [1, 2], "name": ["x", "y"], "value": [10.0, 20.0]}
    )
    assert df.rdd.getNumPartitions() == 1  # driver-scale literal, one slice
    write_iceberg(df, tbl, mode="append")
    result = read_iceberg(tbl).collect()
    assert len(result) == 2

    # laziness: stacking a filter on the read stays one plan, no action ran
    lazy = read_iceberg(tbl).filter("id = 2").select("name")
    assert lazy.collect()[0][0] == "y"


def test_overwrite_is_cow(spark, cat):
    """mode='overwrite' replaces ALL rows in one snapshot (:273-284)."""
    tbl = cat.create_table("default.cow", "id bigint, name string")
    write_iceberg(from_pydict(spark, {"id": [1, 2, 3], "name": ["a", "b", "c"]}), tbl)
    write_iceberg(
        from_pydict(spark, {"id": [10, 20], "name": ["new1", "new2"]}),
        tbl,
        mode="overwrite",
    )
    rows = {r["id"] for r in read_iceberg(tbl).collect()}
    assert rows == {10, 20}
    with pytest.raises(ValueError, match="append\\|overwrite"):
        write_iceberg(from_pydict(spark, {"id": [1], "name": ["z"]}), tbl, mode="upsert")


def test_snapshot_id_time_travel(spark, cat):
    """read_iceberg(tbl, snapshot_id=snap1) sees only snapshot 1 (:420-445)."""
    tbl = cat.create_table("default.tt", "id bigint, name string")
    write_iceberg(from_pydict(spark, {"id": [1], "name": ["first"]}), tbl)
    snap1 = tbl.meta.current_snapshot_id
    write_iceberg(from_pydict(spark, {"id": [2], "name": ["second"]}), tbl)
    assert read_iceberg(tbl).count() == 2
    pinned = read_iceberg(tbl, snapshot_id=snap1).collect()
    assert len(pinned) == 1 and pinned[0]["name"] == "first"


def test_read_applies_mor_deletes(spark, cat):
    """The Daft suite reads a table whose position deletes were written by
    ANOTHER engine and must see the post-delete state (:210-226)."""
    tbl = cat.create_table("default.mor", "id bigint, name string")
    tbl.set_properties({"write.delete.mode": "merge-on-read"})
    write_iceberg(
        from_pydict(spark, {"id": [1, 2, 3], "name": ["a", "b", "c"]}).coalesce(1),
        tbl,
    )
    tbl.delete("id = 2")
    assert {r["id"] for r in read_iceberg(tbl).collect()} == {1, 3}


def test_from_pydict_validation(spark):
    with pytest.raises(ValueError, match="lengths differ"):
        from_pydict(spark, {"a": [1, 2], "b": [1]})
    with pytest.raises(ValueError, match="at least one row"):
        from_pydict(spark, {"a": []})
