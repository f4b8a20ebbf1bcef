"""Maintenance-vs-writer safety: the hazards a concurrent writer creates
for compaction/cleanup procedures, exercised deterministically by
injecting the concurrent commit between a procedure's expensive phase and
its commit loop (the window the optimistic protocol is supposed to
protect)."""

from __future__ import annotations

import os
import time

import pytest

from iceberg_matrix_spark.tables import maintenance as maint
from iceberg_matrix_spark.tables.catalog import IceLiteCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    c = IceLiteCatalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def _ids(t):
    return sorted(r["id"] for r in t.refresh().df().collect())


def _race_once(t, action):
    """Wrap t._commit so `action` runs once, just before the first commit
    attempt — i.e. AFTER the procedure's heavy write, INSIDE its window."""
    real = t._commit
    state = {"fired": False}

    def racing(mutate):
        if not state["fired"]:
            state["fired"] = True
            action()
        return real(mutate)

    t._commit = racing


def test_rewrite_restarts_on_concurrent_cow_delete(spark, catalog):
    """A copy-on-write DELETE replaces victim files WITHOUT adding delete
    files; committing a rewrite captured before it would resurrect the
    deleted rows and duplicate the survivors. The victim-presence guard
    must restart instead."""
    t = catalog.create_table("ns.cowrace", "id bigint")
    t.append(spark.range(10).coalesce(1))
    t2 = catalog.load_table("ns.cowrace")
    _race_once(t, lambda: t2.delete("id < 5"))  # CoW mode by default

    maint.rewrite_data_files(t)
    assert _ids(t) == [5, 6, 7, 8, 9]
    # the aborted attempt's rewritten files were reclaimed immediately —
    # nothing for orphan cleanup even with an infinitely-aggressive cutoff
    future = int(time.time() * 1000) + 60_000
    assert maint.remove_orphan_files(t, dry_run=True, older_than_ms=future) == []


def test_rewrite_restarts_on_concurrent_rewrite(spark, catalog):
    """Two rewrites racing: the loser's victims vanished from the head, so
    it must restart, not double the table."""
    t = catalog.create_table("ns.rwrace", "id bigint")
    t.append(spark.range(8).coalesce(2))
    t2 = catalog.load_table("ns.rwrace")
    _race_once(t, lambda: maint.rewrite_data_files(t2))

    maint.rewrite_data_files(t)
    assert _ids(t) == list(range(8))


def test_rewrite_retry_reassigns_row_lineage(spark, catalog):
    """V3: a commit-conflict retry must draw FRESH _row_id ranges — the
    failed attempt's assignment overlaps the concurrent winner's."""
    t = catalog.create_table(
        "ns.v3race", "id bigint", properties={"format-version": "3"}
    )
    t.append(spark.range(5).coalesce(1))
    t2 = catalog.load_table("ns.v3race")
    # a concurrent APPEND (merges cleanly — no restart, just a
    # CommitConflict retry inside _commit)
    _race_once(t, lambda: t2.append(spark.range(100, 103).coalesce(1)))

    maint.rewrite_data_files(t)
    rows = t.refresh().df(with_lineage=True).select("id", "_row_id").collect()
    assert sorted(r["id"] for r in rows) == [0, 1, 2, 3, 4, 100, 101, 102]
    row_ids = [r["_row_id"] for r in rows]
    assert len(set(row_ids)) == len(row_ids), f"duplicate _row_id: {sorted(row_ids)}"


def test_zorder_survives_nan(spark, catalog):
    """One NaN in a z-order dimension must not poison the Morton code
    (span=NaN → ANSI cast error or a silent constant dimension)."""
    from pyspark.sql import functions as F

    t = catalog.create_table("ns.nanz", "id bigint, x double")
    t.append(
        spark.range(10)
        .select(
            "id",
            F.when(F.col("id") == 7, F.lit(float("nan")))
            .otherwise(F.col("id").cast("double"))
            .alias("x"),
        )
        .coalesce(1)
    )
    res = maint.rewrite_data_files(t, strategy="zorder", columns=["id", "x"])
    assert res["rewritten_data_files_count"] >= 1
    assert _ids(t) == list(range(10))


def test_rewrite_manifests_preserves_conflict_detection(spark, catalog):
    """Metadata-chain compaction keeps version tombstones: a writer
    holding a stale version must still CONFLICT (and retry onto the real
    head), never fork an invisible commit below it."""
    t = catalog.create_table("ns.mfst", "id bigint")
    t.append(spark.range(2))
    stale = catalog.load_table("ns.mfst")  # holds the current version
    t.append(spark.range(10, 12))
    t.append(spark.range(20, 22))

    res = maint.rewrite_manifests(t)
    assert res["rewritten_manifests_count"] >= 1
    mdir = os.path.join(t.location, "metadata")
    tombs = [
        n
        for n in os.listdir(mdir)
        if n.endswith(".metadata.json")
        and os.path.getsize(os.path.join(mdir, n)) == 0
    ]
    assert tombs, "old versions should remain as zero-byte tombstones"

    # the stale handle commits THROUGH the tombstones onto the real head
    stale.append(spark.range(30, 32))
    assert _ids(t) == [0, 1, 10, 11, 20, 21, 30, 31]


def test_remove_orphans_sees_concurrent_commits(spark, catalog):
    """Cleanup must refresh first: files committed after the handle was
    loaded are live, not orphans — even with an aggressive cutoff."""
    t = catalog.create_table("ns.orfresh", "id bigint")
    t.append(spark.range(3))
    stale = catalog.load_table("ns.orfresh")
    t.append(spark.range(10, 13))  # stale handle doesn't know this commit

    future = int(time.time() * 1000) + 60_000
    assert maint.remove_orphan_files(stale, older_than_ms=future) == []
    assert _ids(t) == [0, 1, 2, 10, 11, 12]
