"""Verbatim replay of the reference suite's SQL statements through the
facade (sql/replay.py): every literal ``spark.sql(...)`` from
/root/reference/tests/iceberg_feature_tests.py, executed in order per
test function × format version, must match the golden outcome map —
everything 'ok' except the multi-arg-transform negative probe."""

import os
import tempfile

import pytest

from iceberg_matrix_spark.sql.replay import (
    EXPECTED_OUTCOMES,
    REFERENCE_SUITE,
    extract_ops,
    replay_all,
    replay_function,
)
from iceberg_matrix_spark.tables.catalog import IceLiteCatalog

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_SUITE),
    reason="reference suite not present on this machine",
)


def test_extraction_covers_the_whole_suite():
    ext = extract_ops()
    sql = sum(sum(o.kind == "sql" for o in ops) for ops in ext.groups.values())
    appends = sum(
        sum(o.kind == "append" for o in ops) for ops in ext.groups.values()
    )
    drops = sum(
        sum(o.kind == "drop_table" for o in ops) for ops in ext.groups.values()
    )
    # the suite's literal statement surface: 200 sql statements across 29
    # test functions, 2 seed writes, and the _drop_table teardown calls;
    # exactly one statement is non-literal (the _drop_table helper body).
    # If the reference changes, these counts flag it for re-audit.
    assert len(ext.groups) == 29
    assert sql == 200
    assert appends == 2
    assert drops >= 25
    assert ext.skipped_nonliteral == 1


def test_full_replay_matches_golden(spark):
    """Every statement replayed once, on each function's newest
    applicable format version (the always-on full pass; the ×{v2,v3}
    matrix runs under the ``slow`` marker)."""
    cat = IceLiteCatalog(spark, tempfile.mkdtemp(prefix="replay-wh-"))
    summary = replay_all(spark, cat, versions=[3])
    assert summary["error"] == 0, summary["unexpected"]
    assert summary["unexpected"] == [], [
        (o.func, o.version, o.index, o.status, o.detail)
        for o in summary["unexpected"]
    ]
    # the one expected rejection — the reference's negative probe
    assert summary["rejected"] == len(EXPECTED_OUTCOMES) * 1
    assert summary["ok"] == summary["replayed"] - summary["rejected"]


@pytest.mark.slow
def test_full_replay_matches_golden_both_versions(spark):
    """The complete ×{v2,v3} matrix (default-off; `-m slow` runs it)."""
    cat = IceLiteCatalog(spark, tempfile.mkdtemp(prefix="replay-wh-"))
    summary = replay_all(spark, cat)
    assert summary["error"] == 0, summary["unexpected"]
    assert summary["unexpected"] == []
    assert summary["rejected"] == len(EXPECTED_OUTCOMES) * 1
    assert summary["ok"] == summary["replayed"] - summary["rejected"]


def test_branching_replay_values(spark):
    """Beyond acceptance: the branching pass's captured count(*) values
    must be the reference's own asserted numbers — main=1, branch=2
    (branch insert landed there, not on main), tag=1
    (iceberg_feature_tests.py:890-898)."""
    cat = IceLiteCatalog(spark, tempfile.mkdtemp(prefix="replay-wh-"))
    ops = extract_ops().groups["test_branching_tagging"]
    outs = replay_function(spark, cat, "test_branching_tagging", ops, 2)
    assert all(o.status == "ok" for o in outs)
    counts = [
        o.scalar for o in outs if o.statement.startswith("SELECT count(*)")
    ]
    assert counts == [1, 2, 1]  # main, branch_test_branch, tag_v1_release


def test_clickhouse_replay_matches_reference_asserts(spark):
    """The ClickHouse suite verbatim (sql/replay_clickhouse.py): Spark
    fixture statements + icebergLocal() reads, every output matching the
    reference's own literal asserts — 10 statement-bearing functions,
    11 ClickHouse statements, incl. the read-only INSERT rejection and
    the SETTINGS iceberg_snapshot_id time-travel pin
    (clickhouse_feature_tests.py:188-672)."""
    from iceberg_matrix_spark.sql.replay_clickhouse import (
        GOLDEN,
        extract_ops,
        replay_all,
    )

    groups = extract_ops()
    # tripwire: statement-bearing functions must equal the golden map —
    # a changed reference flags for re-audit instead of silently passing
    assert set(groups) == set(GOLDEN)
    summary = replay_all(spark, tempfile.mkdtemp(prefix="ch-replay-wh-"))
    assert summary["mismatches"] == []
    assert summary["functions"] == 10
    assert summary["ch_statements"] == 11


def test_flink_replay_matches_marker_asserts(spark):
    """The Flink suite's batch statements verbatim (sql/replay_flink.py):
    16 functions x format versions = 43 batches, every reference-asserted
    marker present (MARKROW=a:1.5, MARKWIDE=9999999999, MARKTAG=1,
    MARKT2T=b, MARKLIN row ids, value_counts cardinality ...), with the
    streaming/upsert-runtime functions excluded for stated reasons and
    zero unaccounted statement-bearing functions."""
    from iceberg_matrix_spark.sql.replay_flink import replay_all

    cat = IceLiteCatalog(spark, tempfile.mkdtemp(prefix="flink-replay-wh-"))
    summary = replay_all(spark, cat)
    assert summary["mismatches"] == []
    assert summary["unaccounted"] == []
    assert summary["functions"] == 16
    assert summary["batches_replayed"] == 43


def test_redshift_replay_matches_substring_asserts(spark):
    """The Redshift suite's literal statement lists verbatim
    (sql/replay_redshift.py): 12 functions, 26 batches on the suite's
    own v2 pass, every substring assert satisfied — SHOW TABLE DDL
    readback, the qualified-name MERGE final-state check
    ('updated'/'merged' present, 'third' absent), CoW honored with zero
    delete files, narrowing refused, the multi-arg transform rejected —
    with env-blocked/loop-variable functions excluded for stated
    reasons and zero unaccounted statement-bearing functions."""
    from iceberg_matrix_spark.sql.replay_redshift import replay_all

    cat = IceLiteCatalog(spark, tempfile.mkdtemp(prefix="rs-replay-wh-"))
    summary = replay_all(spark, cat)
    assert summary["mismatches"] == []
    assert summary["unaccounted"] == []
    assert summary["functions"] == 12
    assert summary["batches_replayed"] == 26


def test_duckdb_replay_matches_fetched_values(spark):
    """The DuckDB suite's literal statements verbatim
    (sql/replay_duckdb.py): 13 functions, 53 statements under the
    suite's own catalog name 'ib', every in-code assert satisfied —
    MERGE final state [(1,'J'),(3,'Sarah')], DESCRIBE column lists
    after evolution, AT (VERSION =>) with the captured snapshot id,
    duckdb_tables() counts, record_count sums, GEOMETRY/DEFAULT V3
    columns — with test_rest_catalog running over the real in-process
    REST server + client."""
    from iceberg_matrix_spark.sql.replay_duckdb import replay_all

    summary = replay_all(spark, tempfile.mkdtemp(prefix="dk-replay-wh-"))
    assert summary["mismatches"] == []
    assert summary["unaccounted"] == []
    assert summary["functions"] == 13
    assert summary["statements_replayed"] == 53


def test_dml_replay_values(spark):
    """The MERGE function's captured scalars: count drops to 2 after
    DELETE, returns to 3 after MERGE inserts the unmatched row, and the
    matched row's val reads back 'merged' (iceberg_feature_tests.py's
    own asserts at :512-535)."""
    cat = IceLiteCatalog(spark, tempfile.mkdtemp(prefix="replay-wh-"))
    ops = extract_ops().groups["test_write_merge_update_delete"]
    outs = replay_function(
        spark, cat, "test_write_merge_update_delete", ops, 2
    )
    assert all(o.status == "ok" for o in outs)
    scalars = [o.scalar for o in outs if o.scalar is not None]
    # SELECT val (='updated'), count(*) (=2), count(*) (=3), val (='merged')
    assert scalars == ["updated", 2, 3, "merged"]
