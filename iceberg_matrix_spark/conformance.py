"""Feature-conformance harness, reference-style (SURVEY §5).

The reference's most valuable IP is its testing philosophy
(/root/reference/tests/iceberg_feature_tests.py): one registered test per
cataloged feature, parameterized by format version, producing four-valued
verdicts — pass (measured supported), fail (measured UNsupported), skip
(honestly not measured), error (harness problem) — matched against a
support matrix where pass must meet full/partial and fail must meet
none/unknown (compute_match, :1680-1694). Coverage is enforced: every
feature must have a test (:1660-1677); discrepancies, errors, or coverage
gaps fail the run (:1915-1918). Each test runs in a unique namespace
(:202-213) and asserts on PHYSICAL artifacts (delete-file content codes,
PUFFIN formats, snapshot summaries), not just query results.

This module applies that harness to IceLite. The matrix below is OUR
support catalog — 'none' cells are proven by executing the probe and
classifying the rejection, exactly like the reference's negative tests
(flink_feature_tests.py:708-737).

Run:  python -m iceberg_matrix_spark.conformance  → conformance_report.{json,md}
"""

from __future__ import annotations

import json
import os
import traceback
import uuid
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from iceberg_matrix_spark.tables.catalog import IceLiteCatalog
from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.tables.maintenance import (
    expire_snapshots,
    remove_orphan_files,
    rewrite_data_files,
    rewrite_manifests,
)
from iceberg_matrix_spark.tables.metadata_tables import (
    files,
    history,
    partitions,
    refs,
    snapshots,
)

VERSIONS = [2, 3]

# (feature_id, name, category) — our catalog, mirroring the reference's
# feature taxonomy (src/data/features.json categories).
FEATURES = [
    ("read-support", "Table scan", "read"),
    ("insert-into", "Append writes", "write"),
    ("insert-overwrite", "Overwrite writes", "write"),
    ("ctas", "CREATE TABLE AS SELECT", "write"),
    ("row-update", "UPDATE ... WHERE", "dml"),
    ("row-delete-cow", "Copy-on-write DELETE", "dml"),
    ("row-delete-mor", "Merge-on-read DELETE", "dml"),
    ("position-deletes", "Position delete files", "dml"),
    ("equality-deletes", "Equality delete files", "dml"),
    ("deletion-vectors", "Deletion vectors (V3)", "dml"),
    ("merge-into", "MERGE INTO", "dml"),
    ("sql-dml", "SQL-string DML front-end", "dml"),
    ("streaming-upsert", "PK upsert", "dml"),
    ("hidden-partitioning", "Hidden partition transforms", "partitioning"),
    ("partition-evolution", "Partition spec evolution", "partitioning"),
    ("partition-pruning", "Transform partition pruning", "read"),
    ("schema-evolution", "Add/rename/drop columns", "schema"),
    ("type-widening", "Type promotion", "schema"),
    ("time-travel", "VERSION/TIMESTAMP AS OF", "snapshots"),
    ("branching-tagging", "Branches and tags", "snapshots"),
    ("incremental-read", "Snapshot-range reads", "snapshots"),
    ("snapshot-rollback", "rollback_to_snapshot / set_current_snapshot", "snapshots"),
    ("streaming-tail", "Continuous streaming read", "streaming"),
    ("compaction", "rewrite_data_files", "maintenance"),
    ("snapshot-expiry", "expire_snapshots", "maintenance"),
    ("orphan-cleanup", "remove_orphan_files", "maintenance"),
    ("manifest-rewrite", "rewrite_manifests", "maintenance"),
    ("rewrite-position-deletes", "rewrite_position_delete_files", "maintenance"),
    ("table-statistics", "compute_table_stats NDV sketches", "metadata"),
    ("metadata-tables", "files/snapshots/refs/partitions/history", "metadata"),
    ("column-stats", "Per-file min/max/null stats", "metadata"),
    ("table-properties", "Property round-trip", "metadata"),
    ("multi-arg-transforms", "Multi-source partition transforms (V3)", "partitioning"),
    ("arrow-interchange", "Arrow append / scan-to-arrow", "read"),
    ("bloom-filter-props", "Bloom-filter write properties", "metadata"),
    ("variant-type", "VARIANT parse/extract", "types"),
    ("geospatial-types", "GEOMETRY/GEOGRAPHY types", "types"),
    ("column-default-values", "Column DEFAULT values (V3)", "schema"),
    ("row-lineage", "Row lineage _row_id/_last_updated_seq (V3)", "metadata"),
    ("timestamp-ns", "Nanosecond timestamps (V3)", "types"),
    ("variant-shredding", "Shredded VARIANT storage (V3)", "types"),
    ("drop-table-purge", "DROP TABLE PURGE blast-radius gate", "lifecycle"),
    ("sql-refs", "Branch/tag SQL identifiers (tbl.branch_x / tbl.tag_x)", "snapshots"),
    ("sql-replay", "Verbatim replay of the reference suite's 200 SQL statements", "dml"),
    ("sql-replay-clickhouse", "Verbatim replay of the ClickHouse suite (Spark fixtures + icebergLocal reads)", "read"),
    ("sql-replay-flink", "Verbatim replay of the Flink suite's batch statements with its own marker asserts", "dml"),
    ("sql-replay-redshift", "Verbatim replay of the Redshift suite's statement lists with its own substring asserts", "dml"),
    ("sql-replay-duckdb", "Verbatim replay of the DuckDB suite's statements with its own fetched-value asserts", "dml"),
    ("wap-publish", "Write-audit-publish: fast_forward + cherrypick procedures", "snapshots"),
    # Catalog integrations: registered skip rows with honest reasons, the
    # reference's own pattern for environment-blocked features
    # (iceberg_feature_tests.py:1222-1290; coverage rule :1660-1677 demands
    # a verdict row for EVERY cataloged feature, including skips).
    ("rest-catalog", "REST catalog (Lakekeeper)", "catalog"),
    ("glue-catalog", "AWS Glue catalog", "catalog"),
    ("s3tables-catalog", "S3 Tables federation", "catalog"),
    ("jdbc-catalog", "JDBC catalog (Postgres)", "catalog"),
    ("sqlite-catalog", "SQLite SqlCatalog", "catalog"),
    ("hive-catalog", "Hive metastore catalog", "catalog"),
    ("nessie-catalog", "Nessie catalog", "catalog"),
    ("polaris-catalog", "Polaris catalog", "catalog"),
    ("unity-catalog", "Unity catalog", "catalog"),
    ("horizon-catalog", "Horizon catalog", "catalog"),
    ("metadata-location-sink", "Metadata-location sink (S3/boto3)", "write"),
    ("interop-duckdb-read", "Second-engine read (DuckDB over live files)", "read"),
    ("path-read-dialect", "Path table-function read (icebergLocal/iceberg_scan)", "read"),
    ("add-files", "add_files adoption of foreign parquet", "write"),
    ("sort-order-rewrite", "Sort-order clustering compaction", "maintenance"),
    ("zorder-clustering", "Z-order multi-dimension clustering", "maintenance"),
    ("sql-call-procedures", "CALL system.* maintenance procedures", "maintenance"),
    ("write-distribution", "write.distribution-mode hash/range", "write"),
    ("cdc-apply", "Changelog replication (CDC apply)", "snapshots"),
    ("nested-types", "struct/array/map columns", "types"),
    ("hadoop-catalog", "Filesystem (Hadoop-style) path catalog", "catalog"),
]

# Crosswalk: every feature id the reference's engine suites emit
# (TestResult("<id>", ...) across tests/*.py) → the finer-grained rows of
# OUR catalog that cover it. Makes the feature-by-feature parity check
# mechanical: a reference id is covered iff every mapped row probes green
# (or is a registered honest skip). Kept exhaustive by
# tests/test_conformance.py::test_reference_feature_crosswalk.
REFERENCE_FEATURE_MAP: dict[str, list[str]] = {
    "read-support": ["read-support", "path-read-dialect"],
    "write-insert": ["insert-into", "insert-overwrite", "ctas"],
    "write-merge-update-delete": [
        "merge-into", "row-update", "row-delete-cow", "sql-dml",
    ],
    "position-deletes": ["position-deletes"],
    "equality-deletes": ["equality-deletes"],
    "deletion-vectors": ["deletion-vectors"],
    "merge-on-read": ["row-delete-mor"],
    "copy-on-write": ["row-delete-cow"],
    "schema-evolution": ["schema-evolution"],
    "type-promotion": ["type-widening"],
    "column-default-values": ["column-default-values"],
    "hidden-partitioning": ["hidden-partitioning", "partition-pruning"],
    "partition-evolution": ["partition-evolution"],
    "multi-arg-transforms": ["multi-arg-transforms"],
    "time-travel": ["time-travel", "incremental-read"],
    "table-creation": ["ctas", "table-properties", "drop-table-purge"],
    "table-maintenance": [
        "compaction", "snapshot-expiry", "orphan-cleanup", "manifest-rewrite",
        "rewrite-position-deletes", "sql-call-procedures",
        "sort-order-rewrite", "zorder-clustering",
    ],
    "branching-tagging": [
        "branching-tagging", "sql-refs", "wap-publish", "snapshot-rollback",
    ],
    "statistics": ["table-statistics", "column-stats"],
    "bloom-filters": ["bloom-filter-props"],
    "variant-type": ["variant-type"],
    "shredded-variant": ["variant-shredding"],
    "nanosecond-timestamps": ["timestamp-ns"],
    "lineage": ["row-lineage"],
    "geometry-type": ["geospatial-types"],
    "catalog-integration": ["sqlite-catalog", "rest-catalog", "jdbc-catalog"],
    "hadoop-catalog": ["hadoop-catalog"],
    "rest-catalog": ["rest-catalog"],
    "jdbc-catalog": ["jdbc-catalog"],
    "aws-glue-catalog": ["glue-catalog"],
    "hive-metastore": ["hive-catalog"],
    "nessie": ["nessie-catalog"],
    "polaris": ["polaris-catalog"],
    "unity-catalog": ["unity-catalog"],
    "snowflake-horizon-catalog": ["horizon-catalog"],
}

# Support matrix: (feature_id, version) -> level. Everything unlisted is
# "full". 'none' cells are negative-capability probes.
SUPPORT_OVERRIDES = {
    ("deletion-vectors", 2): "none",  # V2 MoR emits plain parquet deletes
    ("multi-arg-transforms", 2): "none",  # rejected, like Spark/Iceberg
    ("multi-arg-transforms", 3): "none",  # (iceberg_feature_tests.py:1016-1031)
    # V3: GEOMETRY/GEOGRAPHY(srid) types + WKB io measured present,
    # constructors/predicates absent (functions/geo.py supplies them at
    # the WKB level) → partial. V2 measures the V3-only rejection.
    ("geospatial-types", 2): "none",
    ("geospatial-types", 3): "partial",
    # V3-only features: V2 probes measure the rejection
    ("column-default-values", 2): "none",
    ("row-lineage", 2): "none",
    ("timestamp-ns", 2): "none",
    ("variant-shredding", 2): "none",
    # environment-blocked integrations (no network/docker/services in the
    # sandbox) — registered as skips, expectations unknown
    # (sqlite-catalog is NOT here: implemented natively on stdlib sqlite3,
    # tables/sql_catalog.py)
    **{
        (fid, v): "unknown"
        for fid in (
            "glue-catalog", "s3tables-catalog",
            "hive-catalog", "nessie-catalog",
            "polaris-catalog", "unity-catalog", "horizon-catalog",
        )
        for v in (2, 3)
    },
    # DB-API adapter proven via the sqlite driver; the Postgres server
    # itself stays env-blocked → partial, measured by probe
    ("jdbc-catalog", 2): "partial",
    ("jdbc-catalog", 3): "partial",
}


def support_level(feature_id: str, version: int) -> str:
    return SUPPORT_OVERRIDES.get((feature_id, version), "full")


@dataclass
class Ctx:
    spark: SparkSession
    catalog: IceLiteCatalog
    version: int
    ns: str

    def table_name(self) -> str:
        return f"{self.ns}.t_{uuid.uuid4().hex[:8]}"

    def props(self) -> dict[str, str]:
        return {"format-version": str(self.version)}

    def create(self, schema: str, partition_by=None):
        return self.catalog.create_table(
            self.table_name(), schema, partition_by, self.props()
        )


TESTS: dict[str, callable] = {}


def conformance_test(feature_id: str):
    def deco(fn):
        TESTS[feature_id] = fn
        return fn

    return deco


# --------------------------------------------------------------------- tests


@conformance_test("read-support")
def t_read(ctx: Ctx) -> str:
    t = ctx.create("id bigint, v string")
    t.append(local_df(ctx.spark, [(1, "a"), (2, "b")], "id bigint, v string"))
    rows = t.df().filter("id > 1").select("v").collect()
    assert [r["v"] for r in rows] == ["b"]
    return "pass"


@conformance_test("insert-into")
def t_insert(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.append(ctx.spark.range(3))
    t.append(ctx.spark.range(3, 5))
    assert t.df().count() == 5
    assert len(t.meta.snapshots) == 2  # one snapshot per write
    return "pass"


@conformance_test("insert-overwrite")
def t_overwrite(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.append(ctx.spark.range(10))
    t.overwrite(ctx.spark.range(100, 103))
    assert sorted(r["id"] for r in t.df().collect()) == [100, 101, 102]
    return "pass"


@conformance_test("ctas")
def t_ctas(ctx: Ctx) -> str:
    t = ctx.catalog.create_table_as_select(
        ctx.table_name(), ctx.spark.range(4), properties=ctx.props()
    )
    assert t.df().count() == 4
    return "pass"


@conformance_test("row-update")
def t_update(ctx: Ctx) -> str:
    t = ctx.create("id bigint, v bigint")
    t.append(local_df(ctx.spark, [(1, 10), (2, 20)], "id bigint, v bigint"))
    t.update({"v": "v + 1"}, where="id = 2")
    got = {r["id"]: r["v"] for r in t.df().collect()}
    assert got == {1: 10, 2: 21}
    return "pass"


@conformance_test("row-delete-cow")
def t_delete_cow(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.set_properties({"write.delete.mode": "copy-on-write"})
    t.append(ctx.spark.range(10))
    t.delete("id >= 5")
    assert t.df().count() == 5
    head = t._current_snapshot()
    assert not head.delete_files  # CoW leaves no delete files
    return "pass"


@conformance_test("row-delete-mor")
def t_delete_mor(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(ctx.spark.range(10))
    t.delete("id >= 5")
    assert t.df().count() == 5
    assert t._current_snapshot().delete_files  # read-time merge evidence
    return "pass"


@conformance_test("position-deletes")
def t_position_deletes(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(ctx.spark.range(10).coalesce(1))  # single file → partial delete
    t.delete("id = 3")
    dfs = t._current_snapshot().delete_files
    assert any(d.content == 1 for d in dfs)
    assert t.df().count() == 9
    return "pass"


@conformance_test("equality-deletes")
def t_equality_deletes(ctx: Ctx) -> str:
    t = ctx.create("id bigint, v bigint")
    t.append(local_df(ctx.spark, [(1, 10), (2, 20)], "id bigint, v bigint"))
    t.upsert(
        local_df(ctx.spark, [(2, 21)], "id bigint, v bigint"), ["id"]
    )
    dfs = t._current_snapshot().delete_files
    assert any(d.content == 2 for d in dfs)
    got = {r["id"]: r["v"] for r in t.refresh().df().collect()}
    assert got == {1: 10, 2: 21}

    # NULL-keyed equality delete: the spec reader matches null-safely
    # (delete row carrying NULL deletes data rows with NULL in that
    # column) — both on IceLite's own MoR read and the DuckDB interop.
    from iceberg_matrix_spark.tables.interop import read_with_duckdb  # noqa: PLC0415

    t2 = ctx.create("id bigint, v bigint")
    t2.append(
        local_df(ctx.spark, 
            [(None, 1), (7, 2)], "id bigint, v bigint"
        )
    )
    t2.upsert(
        local_df(ctx.spark, [(None, 9)], "id bigint, v bigint"),
        ["id"],
    )
    got2 = {r["id"]: r["v"] for r in t2.refresh().df().collect()}
    assert got2 == {None: 9, 7: 2}, got2
    duck = {
        r["id"]: r["v"] for r in read_with_duckdb(t2).to_pylist()
    }
    assert duck == {None: 9, 7: 2}, duck
    return "pass"


@conformance_test("deletion-vectors")
def t_deletion_vectors(ctx: Ctx) -> str:
    """V3 MoR deletes surface as PUFFIN DVs; V2 must NOT
    (iceberg_feature_tests.py:1517-1555)."""
    t = ctx.create("id bigint")
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(ctx.spark.range(8).coalesce(1))
    t.delete("id = 2")
    formats = {d.file_format for d in t._current_snapshot().delete_files}
    if ctx.version >= 3:
        assert "PUFFIN" in formats
        return "pass"
    return "pass" if "PUFFIN" in formats else "fail"


@conformance_test("merge-into")
def t_merge(ctx: Ctx) -> str:
    t = ctx.create("id bigint, v bigint")
    t.append(local_df(ctx.spark, [(1, 10), (2, 20)], "id bigint, v bigint"))
    t.merge(
        local_df(ctx.spark, [(2, 99), (3, 30)], "id bigint, v bigint"),
        on="t.id = s.id",
        matched_update={"v": "s.v"},
    )
    got = {r["id"]: r["v"] for r in t.df().collect()}
    assert got == {1: 10, 2: 99, 3: 30}
    return "pass"


@conformance_test("jdbc-catalog")
def t_jdbc_catalog(ctx: Ctx) -> str:
    """JDBC-catalog adapter (flink_feature_tests.py:329-340 is the
    Postgres exercise): the DB-API seam is proven live with the sqlite
    driver URL, and the Postgres branch must fail with the explicit
    driver-unavailable signal (no psycopg2/services in the sandbox) —
    partial: adapter measured working, server env-blocked."""
    import tempfile  # noqa: PLC0415

    from iceberg_matrix_spark.tables.sql_catalog import (  # noqa: PLC0415
        DriverUnavailableError,
        dbapi_catalog_from_url,
    )

    wh = tempfile.mkdtemp(prefix="jdbc-wh-")
    cat = dbapi_catalog_from_url(
        ctx.spark, wh, f"sqlite:///{wh}/catalog.db"
    )
    cat.create_namespace("jns")
    t = cat.create_table("jns.t", "id bigint", properties=ctx.props())
    t.append(ctx.spark.range(3))
    assert cat.load_table("jns.t").df().count() == 3
    cat.rename_table("jns.t", "jns.t2")
    assert cat.list_tables("jns") == ["t2"]
    assert cat.metadata_location("jns.t2") is not None
    cat.drop_table("jns.t2", purge=True)
    # the env-blocked half, measured loudly:
    try:
        dbapi_catalog_from_url(ctx.spark, wh, "postgresql://localhost/ice")
        return "error"  # psycopg2 unexpectedly present but unprobed
    except DriverUnavailableError:
        pass
    return "pass"


@conformance_test("interop-duckdb-read")
def t_interop_duckdb(ctx: Ctx) -> str:
    """Write-here/read-there (daft_feature_tests.py:210-226): IceLite
    writes + MoR-deletes + evolves schema; DuckDB reconstructs the same
    rows from the exported live-file manifest alone."""
    from iceberg_matrix_spark.tables.interop import read_with_duckdb  # noqa: PLC0415

    t = ctx.create("id bigint, v string")
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(
        local_df(ctx.spark, 
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, v string"
        )
    )
    t.delete("id = 2")  # MoR → live position-delete file
    t.add_columns({"score": "double"})  # older files lack the column
    t.append(
        local_df(ctx.spark, [(4, "d", 1.5)], "id bigint, v string, score double")
    )
    expected = {
        tuple(r) for r in t.df().select("id", "v", "score").collect()
    }
    got = {
        (r["id"], r["v"], r["score"])
        for r in read_with_duckdb(t).to_pylist()
    }
    assert got == expected == {(1, "a", None), (3, "c", None), (4, "d", 1.5)}

    # equality deletes too (duckdb_feature_tests.py:358-368 — foreign
    # engines read equality deletes): upsert writes an equality-delete
    # file; rows appended AFTER it (higher sequence) must survive the
    # key-match, rows before it must not. Rename the key column after
    # the delete was written — field-id resolution must keep targeting it.
    t.upsert(
        local_df(ctx.spark, 
            [(3, "c2", 9.0), (5, "e", 2.5)], "id bigint, v string, score double"
        ),
        key_columns=["id"],
    )
    t.rename_column("v", "val")
    expected2 = {
        tuple(r) for r in t.df().select("id", "val", "score").collect()
    }
    got2 = {
        (r["id"], r["val"], r["score"])
        for r in read_with_duckdb(t).to_pylist()
    }
    assert (
        got2
        == expected2
        == {(1, "a", None), (3, "c2", 9.0), (4, "d", 1.5), (5, "e", 2.5)}
    )
    return "pass"


@conformance_test("add-files")
def t_add_files(ctx: Ctx) -> str:
    """The write direction of cross-engine interop: DuckDB writes
    parquet, IceLite adopts it in place via the add_files procedure
    (metadata-only commit), and row-level DML then works on the adopted
    rows like any other data."""
    import tempfile  # noqa: PLC0415

    import duckdb  # noqa: PLC0415

    t = ctx.create("id bigint, v string")
    t.append(local_df(ctx.spark, [(1, "spark")], "id bigint, v string"))
    ext = os.path.join(tempfile.mkdtemp(prefix="ducked-"), "foreign.parquet")
    con = duckdb.connect()
    try:
        con.execute(
            "COPY (SELECT * FROM (VALUES (2, 'duck'), (3, 'db')) t(id, v)) "
            f"TO '{ext}' (FORMAT parquet)"
        )
    finally:
        con.close()
    n = t.add_files([ext])
    assert n == 1
    got = {r["id"]: r["v"] for r in t.df().collect()}
    assert got == {1: "spark", 2: "duck", 3: "db"}
    # adopted rows participate in row-level DML
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.delete("id = 2")
    assert sorted(r["id"] for r in t.df().collect()) == [1, 3]
    # duplicate adoption rejected
    try:
        t.add_files([ext])
        return "error"
    except ValueError:
        pass
    return "pass"


@conformance_test("sql-dml")
def t_sql_dml(ctx: Ctx) -> str:
    """The reference's exact SQL statement shapes — INSERT VALUES, UPDATE,
    DELETE, MERGE with a second table — run as strings through the shim
    (iceberg_feature_tests.py:454 write-insert, :512-529 merge/update/
    delete), asserting the same row states the reference asserts."""
    from iceberg_matrix_spark.sql import IceLiteSQL  # noqa: PLC0415

    sql = IceLiteSQL(ctx.spark, ctx.catalog)
    tbl = f"local.{ctx.table_name()}"
    src = f"local.{ctx.table_name()}"
    fv = ctx.version
    sql.sql(
        f"""CREATE TABLE {tbl} (id BIGINT, val STRING)
            USING iceberg TBLPROPERTIES ('format-version'='{fv}')"""
    )
    sql.sql(f"INSERT INTO {tbl} VALUES (1,'a'),(2,'b'),(3,'c')")
    sql.sql(f"UPDATE {tbl} SET val='updated' WHERE id=1")
    assert sql.sql(f"SELECT val FROM {tbl} WHERE id=1").collect()[0][0] == "updated"
    sql.sql(f"DELETE FROM {tbl} WHERE id=2")
    assert sql.sql(f"SELECT count(*) FROM {tbl}").collect()[0][0] == 2
    sql.sql(
        f"""CREATE TABLE {src} (id BIGINT, val STRING)
            USING iceberg TBLPROPERTIES ('format-version'='{fv}')"""
    )
    sql.sql(f"INSERT INTO {src} VALUES (1,'merged'),(4,'new')")
    sql.sql(
        f"""MERGE INTO {tbl} t USING {src} s ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET t.val = s.val
            WHEN NOT MATCHED THEN INSERT *"""
    )
    assert sql.sql(f"SELECT count(*) FROM {tbl}").collect()[0][0] == 3
    assert sql.sql(f"SELECT val FROM {tbl} WHERE id=1").collect()[0][0] == "merged"
    # SHOW NAMESPACES IN <cat> (iceberg_feature_tests.py:1129-1131)
    assert len(sql.sql("SHOW NAMESPACES IN local").collect()) > 0
    # Redshift-survey time-travel spelling resolves like VERSION AS OF
    snap = sql.sql(
        f"SELECT snapshot_id FROM {tbl}.snapshots ORDER BY committed_at LIMIT 1"
    ).collect()[0][0]
    assert (
        sql.sql(
            f"SELECT count(*) FROM {tbl} FOR SYSTEM_VERSION AS OF {snap}"
        ).collect()[0][0]
        == 3
    )
    # cross-engine dialect statements, run verbatim (round 4): Flink's
    # WITH-properties CREATE + keyword-less ALTER (flink_feature_tests.py:
    # 561,975-977), the OPTIONS snapshot-id hint (:1082), DuckDB's
    # iceberg_snapshots table function (duckdb_feature_tests.py:449) and
    # AT (VERSION => N) (:453), Redshift's maintenance verbs (:1136-1139)
    dia = f"local.{ctx.table_name()}"
    sql.sql(
        f"CREATE TABLE {dia} (id BIGINT, name STRING) "
        f"WITH ('format-version'='{fv}')"
    )
    sql.sql(f"INSERT INTO {dia} VALUES (1,'a')")
    sql.sql(f"INSERT INTO {dia} VALUES (2,'b')")
    sql.sql(f"ALTER TABLE {dia} ADD (age INT)")
    sql.sql(f"ALTER TABLE {dia} RENAME name TO full_name")
    sql.sql(f"ALTER TABLE {dia} DROP age")
    first = sql.sql(
        f"SELECT snapshot_id FROM iceberg_snapshots({dia}) "
        "ORDER BY sequence_number LIMIT 1"
    ).collect()[0][0]
    assert (
        sql.sql(
            f"SELECT count(*) FROM {dia} /*+ OPTIONS('snapshot-id'='{first}') */"
        ).collect()[0][0]
        == 1
    )
    assert (
        sql.sql(f"SELECT count(*) FROM {dia} AT (VERSION => {first})").collect()[0][0]
        == 1
    )
    assert sql.sql(f"OPTIMIZE TABLE {dia}").collect()[0][
        "rewritten_data_files_count"
    ] >= 1
    if fv >= 3:
        # V3 column DEFAULT through the SQL DDL (iceberg_feature_tests.py:
        # 771-776)
        cd = f"local.{ctx.table_name()}"
        sql.sql(
            f"""CREATE TABLE {cd} (id BIGINT, val STRING DEFAULT 'hello')
                USING iceberg TBLPROPERTIES ('format-version'='3')"""
        )
        sql.sql(f"INSERT INTO {cd} (id) VALUES (1)")
        assert sql.sql(f"SELECT val FROM {cd} WHERE id=1").collect()[0][0] == "hello"
        # DuckDB's V3 DDL spelling (duckdb_feature_tests.py:718)
        sql.sql(f"ALTER TABLE {cd} ADD COLUMN region VARCHAR DEFAULT 'eu'")
        assert sql.sql(f"SELECT region FROM {cd}").collect()[0][0] == "eu"
        sql.sql(f"DROP TABLE {cd} PURGE")
    sql.sql(f"DROP TABLE {src} PURGE")
    sql.sql(f"DROP TABLE {tbl} PURGE")
    return "pass"


@conformance_test("sql-refs")
def t_sql_refs(ctx: Ctx) -> str:
    """The reference's branch/tag SQL statements, verbatim
    (iceberg_feature_tests.py:888-898): CREATE TAG AS OF VERSION, bare
    CREATE BRANCH, INSERT INTO {tbl}.branch_<name>, and suffix reads
    {tbl}.branch_<name> / {tbl}.tag_<name>, asserting the exact counts
    the reference asserts (main=1, branch=2, tag=1)."""
    from iceberg_matrix_spark.sql import IceLiteSQL, UnsupportedSQLError  # noqa: PLC0415

    sql = IceLiteSQL(ctx.spark, ctx.catalog)
    tbl = f"local.{ctx.table_name()}"
    sql.sql(
        f"""CREATE TABLE {tbl} (id BIGINT, val STRING)
            USING iceberg TBLPROPERTIES ('format-version'='{ctx.version}')"""
    )
    sql.sql(f"INSERT INTO {tbl} VALUES (1,'main')")
    snap = sql.sql(
        f"SELECT snapshot_id FROM {tbl}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).collect()[0][0]
    sql.sql(f"ALTER TABLE {tbl} CREATE TAG `v1_release` AS OF VERSION {snap}")
    sql.sql(f"ALTER TABLE {tbl} CREATE BRANCH `test_branch`")
    sql.sql(f"INSERT INTO {tbl}.branch_test_branch VALUES (2,'branch_data')")

    main_cnt = sql.sql(f"SELECT count(*) FROM {tbl}").collect()[0][0]
    assert main_cnt == 1, f"Main should have 1 row, got {main_cnt}"
    branch_cnt = sql.sql(
        f"SELECT count(*) FROM {tbl}.branch_test_branch"
    ).collect()[0][0]
    assert branch_cnt == 2, f"Branch should have 2 rows, got {branch_cnt}"
    tag_cnt = sql.sql(f"SELECT count(*) FROM {tbl}.tag_v1_release").collect()[0][0]
    assert tag_cnt == 1

    # wrong-kind and unknown refs fail loudly — never silently read main
    try:
        sql.sql(f"SELECT count(*) FROM {tbl}.tag_test_branch")
        return "fail"
    except UnsupportedSQLError:
        pass
    try:
        sql.sql(f"SELECT count(*) FROM {tbl}.branch_nope")
        return "fail"
    except UnsupportedSQLError:
        pass
    try:
        sql.sql(f"INSERT INTO {tbl}.tag_v1_release VALUES (9,'x')")
        return "fail"
    except UnsupportedSQLError:
        pass
    sql.sql(f"DROP TABLE {tbl} PURGE")
    return "pass"


@conformance_test("sql-replay")
def t_sql_replay(ctx: Ctx) -> str:
    """Mechanical statement-level parity: AST-extract the reference
    suite's literal ``spark.sql(...)`` statements (sql/replay.py) and
    run this format-version's pass of every test function through the
    facade. Pass iff every statement lands its golden outcome — all
    'ok' except the multi-arg-transform negative probe ('rejected').
    V2 replays the parameterized functions only, mirroring the
    reference's ``_v3_only_skip`` gating."""
    import os  # noqa: PLC0415

    from iceberg_matrix_spark.sql.replay import (  # noqa: PLC0415
        EXPECTED_OUTCOMES,
        REFERENCE_SUITE,
        _versions_for,
        extract_ops,
        replay_function,
    )

    if not os.path.exists(REFERENCE_SUITE):
        return ("skip", "reference suite not present")
    ext = extract_ops(REFERENCE_SUITE)
    bad = []
    for func, ops in ext.groups.items():
        if ctx.version not in _versions_for(ops):
            continue
        for o in replay_function(ctx.spark, ctx.catalog, func, ops, ctx.version):
            if o.status != EXPECTED_OUTCOMES.get(o.key(), "ok"):
                bad.append((func, o.index, o.status, o.detail))
    assert not bad, f"statements off golden outcome: {bad[:5]}"
    return "pass"


@conformance_test("sql-replay-clickhouse")
def t_sql_replay_clickhouse(ctx: Ctx) -> str:
    """The ClickHouse suite's statements verbatim: Spark fixture DDL/DML
    (CREATE ... LOCATION, MoR deletes, ALTERs) plus the icebergLocal()
    path reads with FORMAT TSV / SETTINGS iceberg_snapshot_id, checked
    against the reference's own literal expected values
    (clickhouse_feature_tests.py:188-672 via sql/replay_clickhouse.py).
    The suite is not format-version parameterized (one engine config),
    so the replay runs once on the v3 pass; v2 measures the per-feature
    behavior through the regular probes instead."""
    import os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from iceberg_matrix_spark.sql.replay_clickhouse import (  # noqa: PLC0415
        REFERENCE_SUITE,
        replay_all,
    )

    if not os.path.exists(REFERENCE_SUITE):
        return ("skip", "reference suite not present")
    if ctx.version == 2:
        return (
            "skip",
            "suite is not format-version parameterized; replayed once (v3 pass)",
        )
    summary = replay_all(ctx.spark, tempfile.mkdtemp(prefix="ch-replay-wh-"))
    assert summary["mismatches"] == [], summary["mismatches"][:5]
    assert summary["ch_statements"] == 11, summary
    return "pass"


@conformance_test("sql-replay-flink")
def t_sql_replay_flink(ctx: Ctx) -> str:
    """This format-version's pass of the Flink suite's batch statements
    (sql/replay_flink.py): the bracketed ``_run_sql`` statement lists
    verbatim — Flink DDL dialect, OPTIONS hints, backticked metadata —
    checked with the suite's OWN marker matcher against its own expected
    values. Streaming/upsert-runtime functions are excluded with reasons
    (replay_flink.EXCLUDED); where Flink itself fails (row-level DML,
    transform DDL) this engine takes the suite's primary path and the
    golden map asserts acceptance."""
    import os  # noqa: PLC0415

    from iceberg_matrix_spark.sql.replay_flink import (  # noqa: PLC0415
        GOLDEN,
        REFERENCE_SUITE,
        check_function,
        extract_batches,
        replay_function,
    )

    if not os.path.exists(REFERENCE_SUITE):
        return ("skip", "reference suite not present")
    groups = extract_batches()
    bad = []
    ran = 0
    for func, spec in GOLDEN.items():
        versions = [2, 3] if spec["versions"] == "both" else [3]
        if ctx.version not in versions:
            continue
        outs = replay_function(ctx.spark, ctx.catalog, func, groups[func], ctx.version)
        ran += len(outs)
        bad.extend(check_function(func, outs))
    assert not bad, bad[:5]
    assert ran > 0
    return "pass"


@conformance_test("sql-replay-redshift")
def t_sql_replay_redshift(ctx: Ctx) -> str:
    """The Redshift suite's literal statement lists through the facade
    (sql/replay_redshift.py): USING ICEBERG DDL, SHOW TABLE readback,
    TABLE PROPERTIES, qualified-name MERGE, transform partitioning +
    evolution, widening with narrowing refused, the multi-arg negative
    probe — checked against the suite's own substring asserts. Redshift
    is a V2-only engine (every function early-returns on v3), so the
    replay is its own v2 pass; loop-variable and env-blocked functions
    are excluded with reasons (replay_redshift.EXCLUDED)."""
    import os  # noqa: PLC0415

    from iceberg_matrix_spark.sql.replay_redshift import (  # noqa: PLC0415
        REFERENCE_SUITE,
        replay_all,
    )

    if not os.path.exists(REFERENCE_SUITE):
        return ("skip", "reference suite not present")
    if ctx.version == 3:
        return (
            "skip",
            "Redshift is a V2-only engine; its suite early-returns every "
            "v3 row (_v3_unsupported) — replayed once under the v2 pass",
        )
    summary = replay_all(ctx.spark, ctx.catalog)
    assert summary["mismatches"] == [], summary["mismatches"][:5]
    assert summary["unaccounted"] == [], summary["unaccounted"]
    return "pass"


@conformance_test("sql-replay-duckdb")
def t_sql_replay_duckdb(ctx: Ctx) -> str:
    """The DuckDB suite's literal con.execute statements through the
    facade under the suite's own catalog name ``ib``
    (sql/replay_duckdb.py): CREATE/CTAS/DML incl. the column-list-free
    MERGE INSERT VALUES, iceberg_metadata()/iceberg_snapshots()/
    duckdb_tables() functions, AT (VERSION =>) travel with the captured
    snapshot id, transform DDL + SET PARTITIONED BY evolution, V3
    GEOMETRY and column DEFAULTs — checked against the suite's own
    fetched-value asserts; test_rest_catalog runs over the real
    in-process REST server + client. The suite pins format versions
    per function (no v2/v3 matrix), so the replay runs once on the v3
    pass; MoR-default and DuckDB-introspection functions are excluded
    with reasons (replay_duckdb.EXCLUDED)."""
    import os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from iceberg_matrix_spark.sql.replay_duckdb import (  # noqa: PLC0415
        REFERENCE_SUITE,
        replay_all,
    )

    if not os.path.exists(REFERENCE_SUITE):
        return ("skip", "reference suite not present")
    if ctx.version == 2:
        return (
            "skip",
            "suite pins format-version per function; replayed once (v3 pass)",
        )
    summary = replay_all(ctx.spark, tempfile.mkdtemp(prefix="dk-replay-wh-"))
    assert summary["mismatches"] == [], summary["mismatches"][:5]
    assert summary["unaccounted"] == [], summary["unaccounted"]
    return "pass"


@conformance_test("path-read-dialect")
def t_path_read_dialect(ctx: Ctx) -> str:
    """ClickHouse's path table function, verbatim shape
    (clickhouse_feature_tests.py:209 ``SELECT count(*) FROM
    icebergLocal('<table dir>')``), plus DuckDB's ``iceberg_scan`` alias.
    Asserts the same observables the reference's ClickHouse suite checks
    through this spelling: plain read (:209), MoR position-delete read
    (:255), equality-delete read (:317), and post-evolution read with
    NULL backfill (:413)."""
    from iceberg_matrix_spark.sql import IceLiteSQL  # noqa: PLC0415

    sql = IceLiteSQL(ctx.spark, ctx.catalog)
    t = ctx.create("id bigint, val string")
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(
        ctx.spark.sql("SELECT * FROM VALUES (1,'a'),(2,'b'),(3,'c') v(id, val)")
        .coalesce(1)
    )
    loc = t.location
    n = sql.sql(f"SELECT count(*) FROM icebergLocal('{loc}')").collect()[0][0]
    assert n == 3, n
    t.delete("id = 2")  # MoR: position deletes must apply through the path read
    ids = [
        r[0]
        for r in sql.sql(
            f"SELECT id FROM icebergLocal('{loc}') ORDER BY id"
        ).collect()
    ]
    assert ids == [1, 3], ids
    t.upsert(
        ctx.spark.sql("SELECT * FROM VALUES (3,'c2') v(id, val)"), ["id"]
    )  # equality delete + replacement row in one snapshot
    got = {
        r["id"]: r["val"]
        for r in sql.sql(f"SELECT * FROM iceberg_scan('{loc}')").collect()
    }
    assert got == {1: "a", 3: "c2"}, got
    t.add_columns({"age": "int"})
    t.append(ctx.spark.sql("SELECT * FROM VALUES (4,'d',30) v(id, val, age)"))
    rows = {
        r["id"]: r["age"]
        for r in sql.sql(f"SELECT id, age FROM icebergLocal('{loc}')").collect()
    }
    assert rows == {1: None, 3: None, 4: 30}, rows
    return "pass"


@conformance_test("wap-publish")
def t_wap_publish(ctx: Ctx) -> str:
    """Write-audit-publish: stage appends on an audit branch (invisible
    to main readers), audit, then publish via CALL fast_forward; a
    rolled-back append can be re-applied with CALL cherrypick_snapshot.
    Iceberg's branch + procedures idiom end-to-end as SQL strings."""
    from iceberg_matrix_spark.sql import IceLiteSQL  # noqa: PLC0415

    sql = IceLiteSQL(ctx.spark, ctx.catalog)
    tbl = f"local.{ctx.table_name()}"
    sql.sql(
        f"""CREATE TABLE {tbl} (id BIGINT)
            USING iceberg TBLPROPERTIES ('format-version'='{ctx.version}')"""
    )
    sql.sql(f"INSERT INTO {tbl} VALUES (1)")
    sql.sql(f"ALTER TABLE {tbl} CREATE BRANCH `audit`")
    sql.sql(f"INSERT INTO {tbl}.branch_audit VALUES (2)")
    # staged write is invisible to main until published
    assert sql.sql(f"SELECT count(*) FROM {tbl}").collect()[0][0] == 1
    sql.sql(
        f"CALL local.system.fast_forward(table => '{tbl.split('.', 1)[1]}', "
        f"branch => 'main', to => 'audit')"
    )
    assert sql.sql(f"SELECT count(*) FROM {tbl}").collect()[0][0] == 2
    # roll back the publish, cherry-pick the staged append directly
    snaps = [
        r[0]
        for r in sql.sql(
            f"SELECT snapshot_id FROM {tbl}.snapshots ORDER BY committed_at"
        ).collect()
    ]
    sql.sql(
        f"CALL local.system.rollback_to_snapshot("
        f"table => '{tbl.split('.', 1)[1]}', snapshot_id => {snaps[0]})"
    )
    assert sql.sql(f"SELECT count(*) FROM {tbl}").collect()[0][0] == 1
    sql.sql(
        f"CALL local.system.cherrypick_snapshot("
        f"table => '{tbl.split('.', 1)[1]}', snapshot_id => {snaps[1]})"
    )
    got = sorted(r[0] for r in sql.sql(f"SELECT id FROM {tbl}").collect())
    assert got == [1, 2]
    sql.sql(f"DROP TABLE {tbl} PURGE")
    return "pass"


@conformance_test("sql-call-procedures")
def t_sql_call_procedures(ctx: Ctx) -> str:
    """The reference's maintenance statements, verbatim: CALL
    local.system.rewrite_data_files / expire_snapshots with named
    arguments and a TIMESTAMP literal (iceberg_feature_tests.py:853-860),
    asserting the same post-conditions (row count preserved, snapshots
    expired to 1)."""
    from datetime import datetime, timedelta, timezone  # noqa: PLC0415

    from iceberg_matrix_spark.sql import IceLiteSQL  # noqa: PLC0415

    sql = IceLiteSQL(ctx.spark, ctx.catalog)
    name = ctx.table_name()
    tbl = f"local.{name}"
    sql.sql(
        f"""CREATE TABLE {tbl} (id BIGINT, val STRING)
            USING iceberg TBLPROPERTIES ('format-version'='{ctx.version}')"""
    )
    sql.sql(f"INSERT INTO {tbl} VALUES (1,'a')")
    sql.sql(f"INSERT INTO {tbl} VALUES (2,'b')")
    sql.sql(f"INSERT INTO {tbl} VALUES (3,'c')")

    res = sql.sql(f"CALL local.system.rewrite_data_files(table => '{name}')")
    assert res.collect()[0]["rewritten_data_files_count"] == 3
    # microsecond precision + 1s forward slack: a whole-second cutoff can
    # tie with a snapshot committed in the same wall-clock second, which
    # then survives `timestamp_ms < older_than_ms` and breaks the
    # snapshots==1 assertion on fast runs
    now = (datetime.now(timezone.utc) + timedelta(seconds=1)).isoformat(
        sep=" ", timespec="microseconds"
    )
    sql.sql(
        f"""CALL local.system.expire_snapshots(
                table => '{name}',
                older_than => TIMESTAMP '{now}',
                retain_last => 1
            )"""
    )
    assert sql.sql(f"SELECT count(*) FROM {tbl}").collect()[0][0] == 3
    t = ctx.catalog.load_table(name)
    assert len(t.meta.snapshots) == 1

    # sort_order dispatch: zorder(...) and plain column lists both route
    res = sql.sql(
        f"CALL local.system.rewrite_data_files(table => '{name}', "
        f"strategy => 'sort', sort_order => 'id')"
    )
    assert res.collect()[0]["added_data_files_count"] >= 1
    res = sql.sql(f"CALL local.system.remove_orphan_files(table => '{name}')")
    assert res.collect()[0]["orphan_file_location_count"] >= 0
    sql.sql(f"DROP TABLE {tbl} PURGE")
    return "pass"


@conformance_test("streaming-upsert")
def t_streaming_upsert(ctx: Ctx) -> str:
    t = ctx.create("id bigint, v bigint")
    t.upsert(local_df(ctx.spark, [(1, 1), (2, 2)], "id bigint, v bigint"), ["id"])
    t.upsert(local_df(ctx.spark, [(1, 5)], "id bigint, v bigint"), ["id"])
    got = {r["id"]: r["v"] for r in t.df().collect()}
    assert got == {1: 5, 2: 2}  # cross-commit PK replace (flink :744-784)
    return "pass"


@conformance_test("hidden-partitioning")
def t_hidden_partitioning(ctx: Ctx) -> str:
    t = ctx.create(
        "id bigint, ts timestamp, cat string",
        partition_by=["days(ts)", "bucket(4, cat)"],
    )
    data = ctx.spark.range(6).select(
        "id",
        F.expr("timestamp'2026-01-01' + make_interval(0,0,0,CAST(id % 3 AS INT))").alias("ts"),
        F.expr("concat('c', id % 2)").alias("cat"),
    )
    t.append(data)
    head = t._current_snapshot()
    assert all(f.partition for f in head.data_files)
    assert t.df().count() == 6
    return "pass"


@conformance_test("partition-pruning")
def t_partition_pruning(ctx: Ctx) -> str:
    t = ctx.create("id bigint, ts timestamp", partition_by=["days(ts)"])
    data = ctx.spark.range(9).select(
        "id",
        F.expr("timestamp'2026-03-01' + make_interval(0,0,0,CAST(id % 3 AS INT))").alias("ts"),
    )
    t.append(data)
    head = t._current_snapshot()
    pruned = t._prune_files(
        head.data_files, [("ts", ">=", "2026-03-03 00:00:00")]
    )
    assert len(pruned) < len(head.data_files)  # source-column predicate prunes
    rows = t.df(filters=[("ts", ">=", "2026-03-03 00:00:00")]).count()
    assert rows == 3
    return "pass"


@conformance_test("partition-evolution")
def t_partition_evolution(ctx: Ctx) -> str:
    # driven through PyIceberg's `with tbl.update_spec()` idiom with a
    # transform object (pyiceberg_feature_tests.py:450-455)
    from iceberg_matrix_spark.tables import BucketTransform  # noqa: PLC0415

    t = ctx.create("id bigint, cat string")
    t.append(local_df(ctx.spark, [(1, "a")], "id bigint, cat string"))
    with t.update_spec() as update:
        update.add_field("cat", BucketTransform(4), "cat_bucket")
    assert "cat_bucket" in [f.name for f in t.spec().fields]
    t.append(local_df(ctx.spark, [(2, "b")], "id bigint, cat string"))
    assert t.df().count() == 2  # old + new spec files coexist
    with t.update_spec() as update:
        update.remove_field("cat_bucket")
    return "pass"


@conformance_test("multi-arg-transforms")
def t_multi_arg_transforms(ctx: Ctx) -> str:
    """Genuinely multi-source transform must be REJECTED (Spark/Iceberg
    reject too — iceberg_feature_tests.py:984-1037)."""
    try:
        ctx.create("a bigint, b bigint", partition_by=["bucket(4, a, b)"])
    except Exception:
        return "fail"  # measured unsupported — matches 'none'
    return "pass"


@conformance_test("schema-evolution")
def t_schema_evolution(ctx: Ctx) -> str:
    # driven through PyIceberg's literal `with tbl.update_schema()` idiom
    # (pyiceberg_feature_tests.py:343-350) on top of the same add/rename/
    # drop machinery the direct verbs use
    t = ctx.create("id bigint, a string")
    t.append(local_df(ctx.spark, [(1, "x")], "id bigint, a string"))
    with t.update_schema() as update:
        update.add_column("age", "int")
    assert t.df().filter("age IS NULL").count() == 1  # NULL back-fill
    with t.update_schema() as update:
        update.rename_column("a", "b")
    assert "b" in t.df().columns and "a" not in t.df().columns
    with t.update_schema() as update:
        update.delete_column("b")
    assert t.df().columns == ["id", "age"]
    assert "b" not in [f.name for f in t.schema().fields]
    return "pass"


@conformance_test("type-widening")
def t_type_widening(ctx: Ctx) -> str:
    t = ctx.create("id int, x float")
    t.append(local_df(ctx.spark, [(1, 1.5)], "id int, x float"))
    t.alter_column_type("id", "bigint")
    t.alter_column_type("x", "double")
    t.append(
        local_df(ctx.spark, [(1 << 40, 2.5)], "id bigint, x double")
    )
    assert t.df().filter(F.col("id") > (1 << 39)).count() == 1  # out-of-range proof
    try:
        t.alter_column_type("id", "int")  # narrowing must fail
        return "fail"
    except ValueError:
        pass
    return "pass"


@conformance_test("time-travel")
def t_time_travel(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.append(ctx.spark.range(2))
    first = t._current_snapshot().snapshot_id
    t.append(ctx.spark.range(2, 5))
    assert t.df(snapshot_id=first).count() == 2
    assert t.df().count() == 5
    return "pass"


@conformance_test("branching-tagging")
def t_branching(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.append(ctx.spark.range(3))
    # PyIceberg's builder idiom, snapshot_id first
    # (pyiceberg_feature_tests.py:552-553)
    snap_id = t.current_snapshot().snapshot_id
    t.manage_snapshots().create_tag(snap_id, "v1").create_branch(
        snap_id, "dev"
    ).commit()
    assert "dev" in t.metadata.refs and "v1" in t.metadata.refs
    t.append(ctx.spark.range(3, 10), branch="dev")
    t.refresh()
    assert t.df(ref="main").count() == 3
    assert t.df(ref="dev").count() == 10
    assert t.df(ref="v1").count() == 3
    try:
        t.append(ctx.spark.range(1), branch="v1")  # tags are immutable
        return "fail"
    except ValueError:
        pass
    return "pass"


@conformance_test("snapshot-rollback")
def t_snapshot_rollback(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.append(ctx.spark.range(3))
    first = t._current_snapshot().snapshot_id
    t.append(ctx.spark.range(3, 8))
    second = t._current_snapshot().snapshot_id
    t.rollback_to_snapshot(first)
    assert t.df().count() == 3  # reads the rolled-back head
    # the undone snapshot survives until expiry and main can roll forward
    t.set_current_snapshot(second)
    assert t.df().count() == 8
    t.rollback_to_snapshot(first)
    try:
        t.rollback_to_snapshot(second)  # not an ancestor of current head
        return "fail"
    except ValueError:
        pass
    return "pass"


@conformance_test("incremental-read")
def t_incremental(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.append(ctx.spark.range(3))
    s1 = t._current_snapshot().snapshot_id
    t.append(ctx.spark.range(10, 12))
    s2 = t._current_snapshot().snapshot_id
    inc = sorted(r["id"] for r in t.read_incremental(s1, s2).collect())
    assert inc == [10, 11]
    return "pass"


@conformance_test("streaming-tail")
def t_streaming_tail(ctx: Ctx) -> str:
    import tempfile
    import uuid as _uuid

    from iceberg_matrix_spark.streaming import read_stream

    t = ctx.create("id bigint")
    t.append(ctx.spark.range(3))
    sink = f"conf_tail_{_uuid.uuid4().hex[:8]}"
    q = (
        read_stream(ctx.spark, t.location)
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert ctx.spark.table(sink).count() == 3
    return "pass"


@conformance_test("compaction")
def t_compaction(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    for i in range(4):
        t.append(ctx.spark.range(i * 5, i * 5 + 5).coalesce(1))
    before = len(t._current_snapshot().data_files)
    result = rewrite_data_files(t)
    assert result["rewritten_data_files_count"] == before
    assert t._current_snapshot().operation == "replace"
    assert t.df().count() == 20
    return "pass"


@conformance_test("nested-types")
def t_nested_types(ctx: Ctx) -> str:
    """struct/array/map columns end to end: round-trip, nested-path
    predicates and projections, row-level DELETE/UPDATE keyed on a
    nested field, NULL back-fill for an added struct column, and footer
    min/max bounds recorded for nested LEAVES (dotted paths) — the stats
    file skipping needs at scale."""
    t = ctx.create(
        "id bigint, tags array<string>, attrs map<string,bigint>, "
        "addr struct<city:string,zip:bigint>"
    )
    t.append(
        ctx.spark.sql(
            "SELECT id, array('a','b') AS tags, map('k', id) AS attrs, "
            "named_struct('city', concat('c', id % 2), 'zip', id) AS addr "
            "FROM range(6)"
        )
    )
    got = t.df()
    assert got.schema["addr"].dataType.simpleString() == "struct<city:string,zip:bigint>"
    assert [r["city"] for r in got.filter("addr.zip = 2").select("addr.city").collect()] == ["c0"]
    t.delete("addr.zip = 1")
    assert t.df().count() == 5
    t.update({"tags": "array('z')"}, "id = 0")
    assert t.df().filter("id = 0").collect()[0]["tags"] == ["z"]
    t.add_columns({"extra": "struct<a:bigint>"})
    assert t.df().select("extra").collect()[0]["extra"] is None
    lower = t._current_snapshot().data_files[0].lower_bounds
    assert any(k.startswith("addr.") for k in lower), lower
    return "pass"


@conformance_test("cdc-apply")
def t_cdc_apply(ctx: Ctx) -> str:
    """End-to-end changelog replication: a replica table is driven ONLY
    by the source's snapshot_changes diffs (insert/delete row images)
    across a mixed append/UPDATE/DELETE/append history, and must
    converge to the exact source state after every epoch — the Iceberg
    create_changelog_view → MERGE-apply pipeline."""
    src = ctx.create("id bigint, v string")
    replica = ctx.create("id bigint, v string")

    marks = []
    src.append(
        local_df(ctx.spark, 
            [(i, f"v{i}") for i in range(1, 6)], "id bigint, v string"
        )
    )
    marks.append(src._current_snapshot().snapshot_id)
    src.update({"v": "'updated'"}, "id = 2")
    marks.append(src._current_snapshot().snapshot_id)
    src.delete("id = 4")
    marks.append(src._current_snapshot().snapshot_id)
    src.append(local_df(ctx.spark, [(6, "v6"), (7, "v7")], "id bigint, v string"))
    marks.append(src._current_snapshot().snapshot_id)

    # epoch 0: bootstrap the replica from the first snapshot's full state
    replica.append(src.df(snapshot_id=marks[0]))
    for a, b in zip(marks, marks[1:]):
        ch = src.snapshot_changes(a, b)
        inserts = ch.filter("_change_type = 'insert'").drop("_change_type")
        deleted_keys = {
            r["id"]
            for r in ch.filter("_change_type = 'delete'").select("id").collect()
        }
        inserted_keys = {r["id"] for r in inserts.select("id").collect()}
        # UPDATE rows arrive as delete+insert of the same key → upsert;
        # keys with only a delete image are true deletions
        if inserted_keys:
            replica.upsert(inserts, ["id"])
        gone = deleted_keys - inserted_keys
        if gone:
            replica.delete(f"id IN ({', '.join(str(k) for k in sorted(gone))})")
        want = sorted(
            (r["id"], r["v"]) for r in src.df(snapshot_id=b).collect()
        )
        got = sorted((r["id"], r["v"]) for r in replica.df().collect())
        assert got == want, f"replica diverged after epoch {a}->{b}"
    return "pass"


@conformance_test("write-distribution")
def t_write_distribution(ctx: Ctx) -> str:
    """write.distribution-mode: 'hash' clusters rows by partition value
    before the write (one file per partition, not one per task×partition
    — the small-files explosion at cluster scale); 'range' clusters by
    the sort order so fresh appends carry near-disjoint min/max bounds
    without any rewrite."""
    # hash mode on a partitioned table: 6 input tasks × 3 partitions
    # would write up to 18 files; hash distribution writes exactly 3
    t = ctx.catalog.create_table(
        ctx.table_name(), "id bigint, cat string", ["cat"], ctx.props()
    )
    t.set_properties({"write.distribution-mode": "hash"})
    t.append(
        ctx.spark.range(60)
        .selectExpr("id", "concat('c', id % 3) AS cat")
        .repartition(6)
    )
    files = t._current_snapshot().data_files
    assert len(files) == 3, f"hash distribution should write 3 files, got {len(files)}"
    assert len({tuple(f.partition.items()) for f in files}) == 3
    assert t.df().count() == 60

    # range mode + sort order: single shuffled append → disjoint bounds
    t2 = ctx.create("id bigint, v string")
    t2.replace_sort_order(["id"])
    t2.set_properties({"write.distribution-mode": "range"})
    t2.append(
        ctx.spark.range(100)
        .selectExpr("id", "concat('v', id) AS v")
        .repartition(5)  # round-robin scrambles before the write path
    )
    files2 = sorted(
        t2._current_snapshot().data_files, key=lambda f: f.lower_bounds["id"]
    )
    assert len(files2) >= 2
    for a, b in zip(files2, files2[1:]):
        assert a.upper_bounds["id"] < b.lower_bounds["id"]
    kept = t2._prune_files(files2, [("id", ">=", 0), ("id", "<=", 9)])
    assert len(kept) < len(files2)
    assert t2.df().count() == 100
    return "pass"


@conformance_test("sort-order-rewrite")
def t_sort_order_rewrite(ctx: Ctx) -> str:
    """replace_sort_order + rewrite_data_files(strategy='sort'): after the
    clustering rewrite, files carry DISJOINT id ranges, so manifest
    min/max pruning answers a range predicate from a fraction of the
    files — the scan-reduction Iceberg's sort compaction buys at scale."""
    t = ctx.create("id bigint, v string")
    # four stride-interleaved appends: every file spans the full id range,
    # so before clustering NO file can be pruned for any range predicate
    for i in range(4):
        t.append(
            ctx.spark.range(100)
            .filter(f"id % 4 = {i}")
            .selectExpr("id", "concat('v', id) AS v")
            .coalesce(1)
        )
    pred = [("id", ">=", 10), ("id", "<=", 19)]
    snap = t._current_snapshot()
    before = len(t._prune_files(snap.data_files, pred))
    assert before == len(snap.data_files) == 4

    t.replace_sort_order(["id"])
    assert t.sort_order_fields() == [{"column": "id", "direction": "asc"}]
    rewrite_data_files(t, target_partitions=4, strategy="sort")

    snap = t._current_snapshot()
    after = len(t._prune_files(snap.data_files, pred))
    assert len(snap.data_files) >= 2, "sort rewrite should emit multiple range files"
    assert after < before, "clustered files must prune for the range predicate"
    assert sorted(r["id"] for r in t.df().collect()) == list(range(100))
    return "pass"


@conformance_test("zorder-clustering")
def t_zorder_clustering(ctx: Ctx) -> str:
    """rewrite_data_files(strategy='zorder'): Morton-interleaved
    clustering tightens min/max bounds on BOTH dimensions, so a 2-D
    corner predicate prunes files a round-robin layout cannot."""
    t = ctx.create("x bigint, y bigint")
    grid = ctx.spark.sql(
        "SELECT id % 32 AS x, CAST(id / 32 AS bigint) AS y FROM range(1024)"
    )
    t.append(grid.repartition(4))  # round-robin: every file spans the grid
    pred = [("x", ">=", 0), ("x", "<=", 7), ("y", ">=", 0), ("y", "<=", 7)]
    snap = t._current_snapshot()
    before = len(t._prune_files(snap.data_files, pred))
    assert before == len(snap.data_files)

    rewrite_data_files(t, target_partitions=16, strategy="zorder", columns=["x", "y"])
    snap = t._current_snapshot()
    kept = t._prune_files(snap.data_files, pred)
    # the 8×8 corner is a prefix of the z-curve → a couple of files at most
    assert len(snap.data_files) >= 8
    assert len(kept) <= max(2, len(snap.data_files) // 4)
    assert t.df().count() == 1024
    # value integrity through the clustering rewrite
    got = sorted((r["x"], r["y"]) for r in t.df().collect())
    assert got == sorted((i % 32, i // 32) for i in range(1024))
    return "pass"


@conformance_test("rewrite-position-deletes")
def t_rewrite_position_deletes(ctx: Ctx) -> str:
    from iceberg_matrix_spark.tables.maintenance import rewrite_position_deletes

    t = ctx.create("id bigint")
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.append(ctx.spark.range(10).coalesce(1))
    t.delete("id = 1")
    t.delete("id = 4")
    t.delete("id = 7")
    assert len([d for d in t._current_snapshot().delete_files if d.content == 1]) == 3
    res = rewrite_position_deletes(t)
    assert res["rewritten_delete_files_count"] == 3
    assert len([d for d in t._current_snapshot().delete_files if d.content == 1]) == 1
    assert sorted(r["id"] for r in t.df().collect()) == [0, 2, 3, 5, 6, 8, 9]
    return "pass"


@conformance_test("table-statistics")
def t_table_statistics(ctx: Ctx) -> str:
    from iceberg_matrix_spark.tables.maintenance import compute_table_statistics
    from iceberg_matrix_spark.tables.metadata_tables import statistics as stats_table

    t = ctx.create("id bigint")
    t.append(ctx.spark.range(50).withColumn("id", F.col("id") % 10))
    res = compute_table_statistics(t)
    assert res["ndv"]["id"] == 10.0  # below sketch capacity → exact
    rows = stats_table(t).collect()
    assert len(rows) == 1 and rows[0]["blob_type"] == "kmv-ndv-v1"
    t.refresh()
    assert t.meta.statistics[0]["snapshot_id"] == t._current_snapshot().parent_id or \
        t.meta.statistics[0]["snapshot_id"] in {s.snapshot_id for s in t.meta.snapshots}
    return "pass"


@conformance_test("snapshot-expiry")
def t_expiry(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.append(ctx.spark.range(3))
    t.overwrite(ctx.spark.range(5))
    import time as _time

    expire_snapshots(t, older_than_ms=int(_time.time() * 1000) + 10_000, retain_last=1)
    assert len(t.refresh().meta.snapshots) == 1
    assert t.df().count() == 5
    return "pass"


@conformance_test("orphan-cleanup")
def t_orphans(ctx: Ctx) -> str:
    import os

    t = ctx.create("id bigint")
    t.append(ctx.spark.range(3))
    orphan_dir = os.path.join(t.location, "data", "c-orphan")
    os.makedirs(orphan_dir)
    with open(os.path.join(orphan_dir, "junk.parquet"), "w") as f:
        f.write("x")
    import time as _time

    # young files are protected by the 3-day grace default (in-flight
    # pre-commit writes); an explicit cutoff reclaims the fresh orphan
    assert remove_orphan_files(t, dry_run=True) == []
    removed = remove_orphan_files(
        t, older_than_ms=int(_time.time() * 1000) + 60_000
    )
    assert any("c-orphan" in p for p in removed)
    assert t.df().count() == 3
    return "pass"


@conformance_test("manifest-rewrite")
def t_manifest_rewrite(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.append(ctx.spark.range(2))
    t.append(ctx.spark.range(2))
    result = rewrite_manifests(t)
    assert result["rewritten_manifests_count"] >= 1
    assert t.refresh().df().count() == 4
    return "pass"


@conformance_test("metadata-tables")
def t_metadata_tables(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.append(ctx.spark.range(3))
    t.create_tag("v1")
    assert files(t).count() >= 1
    assert snapshots(t).count() == 1
    assert {r["name"] for r in refs(t).collect()} == {"main", "v1"}
    assert partitions(t).count() >= 1
    assert history(t).count() == 1
    from iceberg_matrix_spark.tables.metadata_tables import manifests

    m = manifests(t).collect()
    assert len(m) == 1 and m[0]["content"] == 0 and m[0]["added_files_count"] >= 1
    return "pass"


@conformance_test("column-stats")
def t_column_stats(ctx: Ctx) -> str:
    t = ctx.create("id bigint, v string")
    t.append(
        local_df(ctx.spark, 
            [(1, "a"), (9, None)], "id bigint, v string"
        )
    )
    f = t._current_snapshot().data_files[0]
    assert f.lower_bounds.get("id") == 1 and f.upper_bounds.get("id") == 9
    assert f.null_counts.get("v") == 1
    return "pass"


@conformance_test("table-properties")
def t_properties(ctx: Ctx) -> str:
    t = ctx.create("id bigint")
    t.set_properties({"write.delete.mode": "merge-on-read", "owner": "conformance"})
    t.refresh()
    assert t.properties["owner"] == "conformance"
    assert t.format_version == ctx.version
    return "pass"


@conformance_test("arrow-interchange")
def t_arrow(ctx: Ctx) -> str:
    import pyarrow as pa

    t = ctx.create("id bigint, v string")
    t.append_arrow(pa.table({"id": [1, 2], "v": ["a", "b"]}))
    out = t.to_arrow()
    assert out.num_rows == 2
    assert sorted(out.column("id").to_pylist()) == [1, 2]
    # PyIceberg's literal scan shape (pyiceberg_feature_tests.py:157-158):
    # scan(row_filter, selected_fields, snapshot_id).to_arrow()/to_pandas()
    snap1 = t.meta.snapshots[0].snapshot_id
    t.append_arrow(pa.table({"id": [3], "v": ["c"]}))
    assert t.scan().to_arrow().num_rows == 3
    assert t.scan(snapshot_id=snap1).to_arrow().num_rows == 2
    filt = t.scan(row_filter="id >= 2", selected_fields=["id"]).to_pandas()
    assert sorted(filt["id"].tolist()) == [2, 3] and list(filt.columns) == ["id"]
    assert t.scan(limit=1).to_arrow().num_rows == 1
    return "pass"


@conformance_test("bloom-filter-props")
def t_bloom_props(ctx: Ctx) -> str:
    t = ctx.create("id bigint, v string")
    t.set_properties(
        {
            "write.parquet.bloom-filter-enabled.column.id": "true",
            "write.parquet.bloom-filter-max-bytes": "131072",
        }
    )
    t.refresh().append(ctx.spark.range(100).selectExpr("id", "CAST(id AS STRING) v"))
    assert t.df().filter("id = 42").count() == 1  # point lookup correct
    # presence not observable from SQL (flink_feature_tests.py:1620-1626);
    # properties round-trip and the write honored the option
    assert t.properties["write.parquet.bloom-filter-enabled.column.id"] == "true"
    return "pass"


@conformance_test("variant-type")
def t_variant(ctx: Ctx) -> str:
    """Native VARIANT expressions (iceberg_feature_tests.py:1304-1308);
    IceLite tables store the JSON string, compute parses per query."""
    t = ctx.create("id bigint, data string")
    t.append(
        local_df(ctx.spark, 
            [(1, '{"a": {"b": 7}}'), (2, '{"a": {"b": 9}}')], "id bigint, data string"
        )
    )
    got = (
        t.df()
        .selectExpr("variant_get(parse_json(data), '$.a.b', 'int') AS b")
        .agg(F.sum("b").alias("s"))
        .collect()[0]["s"]
    )
    assert got == 16
    return "pass"


@conformance_test("geospatial-types")
def t_geospatial(ctx: Ctx) -> str:
    """Measured PARTIAL on V3: this build ships the SRID-parameterised
    GEOMETRY/GEOGRAPHY types + WKB io (st_geomfromwkb/st_asbinary/
    st_setsrid/st_srid) — probed here with a library-encoded WKB point
    round-tripping through the native type with its SRID intact, the
    reference's GEOMETRY(4326) exercise (iceberg_feature_tests.py:
    1386-1394). Constructors/predicates (ST_Point, ST_Contains) are
    absent; functions/geo.py supplies bbox semantics at the WKB level.
    V2 measures the V3-only rejection (geometry is a V3 storage type)."""
    from iceberg_matrix_spark.functions.geo import geometry_to_wkb, to_geometry, wkb_point

    if ctx.version < 3:
        return "fail"  # V3-only storage type, like the reference's skip
    # spark.sql.geospatial.enabled is set once, up front, by
    # run_conformance (probes never mutate session confs mid-pool)
    df = local_df(ctx.spark, [(3, 4)], "x long, y long").select(
        wkb_point("x", "y").alias("g")
    )
    native = df.select(to_geometry("g", srid=4326).alias("geom"))
    assert "geometry" in native.schema["geom"].dataType.simpleString().lower()
    row = native.selectExpr(
        "st_srid(geom) AS srid", "st_asbinary(geom) AS wkb"
    ).collect()[0]
    assert row["srid"] == 4326
    import struct  # noqa: PLC0415

    assert bytes(row["wkb"]) == struct.pack("<BIdd", 1, 1, 3.0, 4.0)
    # the missing half that keeps this PARTIAL, measured:
    st_point_present = True
    try:
        ctx.spark.sql("SELECT ST_Point(1.0, 2.0)").collect()
    except Exception:
        st_point_present = False
    assert not st_point_present, "ST_Point unexpectedly present — upgrade to full"
    return "pass"


@conformance_test("column-default-values")
def t_column_defaults(ctx: Ctx) -> str:
    """V3 column DEFAULTs (iceberg_feature_tests.py:771-776): old rows
    read the initial-default, writers omitting the column get the
    write-default; V2 must reject."""
    t = ctx.create("id bigint, v string")
    t.append(local_df(ctx.spark, [(1, "a")], "id bigint, v string"))
    try:
        t.add_columns({"greeting": "string"}, defaults={"greeting": "hello"})
    except ValueError:
        return "fail" if ctx.version < 3 else "error"
    if ctx.version < 3:
        return "error"  # v2 should have rejected
    # pre-existing row back-fills the initial-default on read
    assert [r["greeting"] for r in t.df().collect()] == ["hello"]
    # a writer omitting the column gets the write-default
    t.append(local_df(ctx.spark, [(2, "b")], "id bigint, v string"))
    got = {r["id"]: r["greeting"] for r in t.df().collect()}
    assert got == {1: "hello", 2: "hello"}
    return "pass"


@conformance_test("row-lineage")
def t_row_lineage(ctx: Ctx) -> str:
    """V3 row lineage (iceberg_feature_tests.py:1483-1487): _row_id is
    unique and stable per committed row; _last_updated_sequence_number
    reflects the writing commit."""
    t = ctx.create("id bigint, v bigint")
    t.append(local_df(ctx.spark, [(1, 10), (2, 20)], "id bigint, v bigint"))
    if ctx.version < 3:
        try:
            t.df(with_lineage=True).collect()
            return "error"  # v2 should have rejected
        except ValueError:
            return "fail"
    t.append(local_df(ctx.spark, [(3, 30)], "id bigint, v bigint"))
    rows = t.df(with_lineage=True).collect()
    row_ids = sorted(r["_row_id"] for r in rows)
    assert len(set(row_ids)) == 3  # globally unique
    assert all(r is not None for r in row_ids)
    seqs = {r["id"]: r["_last_updated_sequence_number"] for r in rows}
    assert seqs[3] > seqs[1]  # later commit → later sequence number
    return "pass"


@conformance_test("timestamp-ns")
def t_timestamp_ns(ctx: Ctx) -> str:
    """V3 nanosecond timestamps (iceberg_feature_tests.py:1443-1445):
    ns-precision values round-trip exactly (stored as INT64 nanos, the
    same physical encoding as parquet TIMESTAMP(NANOS)); V2 rejects the
    type."""
    ns_values = [1_700_000_000_123_456_789, 1_700_000_000_123_456_790]
    try:
        t = ctx.create("id bigint, ts timestamp_ns")
    except ValueError:
        return "fail" if ctx.version < 3 else "error"
    if ctx.version < 3:
        return "error"  # v2 should have rejected
    t.append(
        local_df(ctx.spark, 
            [(i, v) for i, v in enumerate(ns_values)], "id bigint, ts bigint"
        )
    )
    got = sorted(r["ts"] for r in t.df().collect())
    assert got == ns_values  # exact: adjacent-nanosecond values preserved
    return "pass"


@conformance_test("variant-shredding")
def t_variant_shredding(ctx: Ctx) -> str:
    """V3 shredded VARIANT (write.parquet.variant-shredding.enabled,
    iceberg_feature_tests.py:1342-1348): the physical parquet grows a
    typed sibling column; normal reads still see the variant source."""
    import pyarrow.parquet as pq

    try:
        t = ctx.create("id bigint, data variant")
    except ValueError:
        return "fail" if ctx.version < 3 else "error"
    if ctx.version < 3:
        return "error"
    t.set_properties({"write.parquet.variant-shredding.enabled": "true"})
    t.refresh().append(
        local_df(ctx.spark, 
            [(1, '{"a": 1, "b": "x"}'), (2, '{"a": 2, "b": "y"}')],
            "id bigint, data string",
        )
    )
    # physical evidence: the data file contains the shredded struct column
    f = t._current_snapshot().data_files[0]
    names = {c.split(".")[0] for c in pq.read_schema(f.path).names}
    assert "data__typed_value" in names
    # logical reads are unchanged (the sibling column is invisible)
    assert set(t.df().columns) == {"id", "data"}
    got = (
        t.df()
        .selectExpr("variant_get(parse_json(data), '$.a', 'int') AS a")
        .agg(F.sum("a").alias("s"))
        .collect()[0]["s"]
    )
    assert got == 3

    # heterogeneous shapes shred by the SUPERSET schema (fields union,
    # long+double widened), inferred from a bounded multi-row sample in
    # one job and cached in table properties — a later append with a NEW
    # shape reuses the cached schema instead of re-inferring
    t2 = ctx.create("id bigint, data variant")
    t2.set_properties({"write.parquet.variant-shredding.enabled": "true"})
    t2.refresh().append(
        local_df(ctx.spark, 
            [(1, '{"a": 1}'), (2, '{"a": 2.5, "b": "y"}')],
            "id bigint, data string",
        )
    )
    data_id = next(
        f.id for f in t2.refresh().meta.current_schema.fields if f.name == "data"
    )
    cached = t2.meta.properties.get(
        f"write.parquet.variant-shredding.schema.{data_id}"
    )
    assert cached == "struct<a:double,b:string>", cached
    shred_t = pq.read_schema(
        t2._current_snapshot().data_files[0].path
    ).field("data__typed_value").type
    leaf = {shred_t.field(i).name for i in range(shred_t.num_fields)}
    assert leaf == {"a", "b"}, leaf
    t2.append(
        local_df(ctx.spark, 
            [(3, '{"c": 9}')], "id bigint, data string"
        )
    )
    assert (
        t2.refresh().meta.properties[
            f"write.parquet.variant-shredding.schema.{data_id}"
        ]
        == cached
    )
    return "pass"


@conformance_test("drop-table-purge")
def t_drop_purge(ctx: Ctx) -> str:
    """DROP TABLE vs DROP TABLE PURGE (iceberg_feature_tests.py:221-230):
    without PURGE data files survive; with PURGE everything goes."""
    import os

    name1 = ctx.table_name()
    t1 = ctx.catalog.create_table(name1, "id bigint", properties=ctx.props())
    t1.append(ctx.spark.range(3))
    loc1 = t1.location
    ctx.catalog.drop_table(name1, purge=False)
    assert os.path.isdir(os.path.join(loc1, "data"))  # data survives
    assert not ctx.catalog.table_exists(name1)

    name2 = ctx.table_name()
    t2 = ctx.catalog.create_table(name2, "id bigint", properties=ctx.props())
    t2.append(ctx.spark.range(3))
    loc2 = t2.location
    ctx.catalog.drop_table(name2, purge=True)
    assert not os.path.isdir(loc2)  # purge removes everything
    return "pass"


@conformance_test("sqlite-catalog")
def t_sqlite_catalog(ctx: Ctx) -> str:
    """SQL-backed catalog (tables/sql_catalog.py — the reference's PyIceberg
    SqlCatalog row, implemented natively on stdlib sqlite3): transactional
    create/rename/drop, metadata pointer tracking, IceLite interop."""
    import tempfile

    from iceberg_matrix_spark.tables.sql_catalog import SqlCatalog

    cat = SqlCatalog(ctx.spark, tempfile.mkdtemp(prefix="conf-sqlcat-"))
    cat.create_namespace("db")
    cat.create_namespace("db2")
    t = cat.create_table("db.t", "id bigint, v string", properties=ctx.props())
    t.append(local_df(ctx.spark, [(1, "a"), (2, "b")], "id bigint, v string"))
    assert cat.load_table("db.t").df().count() == 2
    assert cat.metadata_location("db.t").endswith("v2.metadata.json")
    cat.rename_table("db.t", "db2.renamed")  # atomic catalog-only re-point
    assert cat.list_tables("db") == [] and cat.list_tables("db2") == ["renamed"]
    assert cat.load_table("db2.renamed").df().count() == 2
    cat.drop_table("db2.renamed", purge=True)
    assert not cat.table_exists("db2.renamed")
    return "pass"


@conformance_test("hadoop-catalog")
def t_hadoop_catalog(ctx: Ctx) -> str:
    """The reference's hadoop-catalog row (pyiceberg_feature_tests.py:
    548-554): a pure filesystem-path catalog — no service, table identity
    IS the warehouse-relative path, metadata versioning via numbered
    metadata files. IceLiteCatalog is exactly this shape; the probe pins
    the on-disk contract (namespace dir, table dir, version chain) plus
    path-based load with no catalog service involved."""
    import os as _os
    import tempfile

    from iceberg_matrix_spark.tables import IceLiteCatalog, IceLiteTable

    wh = tempfile.mkdtemp(prefix="conf-hadoopcat-")
    cat = IceLiteCatalog(ctx.spark, wh)
    cat.create_namespace("db")
    t = cat.create_table("db.t", "id bigint, v string", properties=ctx.props())
    t.append(local_df(ctx.spark, [(1, "a"), (2, "b")], "id bigint, v string"))
    # identity == path: the table lives at <warehouse>/db/t with the
    # numbered-metadata version chain
    loc = _os.path.join(wh, "db", "t")
    assert _os.path.isdir(loc)
    assert any("metadata" in f for f in _os.listdir(loc))
    # path-based open without the catalog (Iceberg's HadoopTables shape)
    assert IceLiteTable(ctx.spark, loc).df().count() == 2
    assert cat.load_table("db.t").df().count() == 2
    return "pass"


@conformance_test("rest-catalog")
def t_rest_catalog(ctx: Ctx) -> str:
    """REST catalog protocol (tables/rest_catalog.py): in-process HTTP
    server (the public Iceberg REST catalog API shape) fronting a SQL
    catalog; the client resolves tables via served metadata-location.
    A real network round-trip — only Lakekeeper/MinIO interop stays
    environment-blocked (no services)."""
    import tempfile

    from iceberg_matrix_spark.tables.rest_catalog import RestCatalog, RestCatalogServer

    with RestCatalogServer(ctx.spark, tempfile.mkdtemp(prefix="conf-rest-")) as srv:
        cat = RestCatalog(ctx.spark, srv.uri)
        cat.create_namespace("db")
        t = cat.create_table("db.t", "id bigint, v string", properties=ctx.props())
        t.append(local_df(ctx.spark, [(1, "a"), (2, "b")], "id bigint, v string"))
        assert cat.load_table("db.t").df().count() == 2
        assert cat.metadata_location("db.t").endswith("v2.metadata.json")
        cat.create_namespace("db2")
        cat.rename_table("db.t", "db2.t2")
        assert cat.load_table("db2.t2").df().count() == 2
        cat.drop_table("db2.t2", purge=True)
        assert not cat.table_exists("db2.t2")
    return "pass"


@conformance_test("metadata-location-sink")
def t_metadata_location_sink(ctx: Ctx) -> str:
    """Manifest published to an object-store URI and read back intact
    (sinks/manifest.py; reference behavior redshift_fixtures.py:224-233).
    Local backend exercised for real; the S3 backend shares the publish
    path with an injected client double (tests/test_manifest_sink.py) —
    the network call itself stays environment-blocked."""
    import tempfile

    from iceberg_matrix_spark.sinks import publish_manifest, read_manifest

    t = ctx.create("id bigint")
    t.append(ctx.spark.range(3))
    manifest = {
        "table": t.location,
        "metadata_location": f"{t.location}/metadata/v{t.version}.metadata.json",
        "snapshots": len(t.meta.snapshots),
        "format_version": ctx.version,
    }
    uri = f"file://{tempfile.mkdtemp(prefix='sink-')}/manifest.json"
    publish_manifest(manifest, uri)
    assert read_manifest(uri) == manifest
    return "pass"


def _register_skip(feature_id: str, reason: str) -> None:
    @conformance_test(feature_id)
    def t_skip(ctx: Ctx, _reason=reason) -> tuple[str, str]:
        return ("skip", _reason)


for _fid, _reason in [
    ("glue-catalog", "needs AWS credentials + Glue endpoint — no network in sandbox"),
    ("s3tables-catalog", "needs AWS S3 Tables endpoint — no network in sandbox"),
    ("hive-catalog", "needs a Hive metastore service — no services in sandbox"),
    ("nessie-catalog", "needs a Nessie service — no services in sandbox"),
    ("polaris-catalog", "needs a Polaris service — no services in sandbox"),
    ("unity-catalog", "needs a Unity catalog service — no services in sandbox"),
    ("horizon-catalog", "needs a Horizon service — no services in sandbox"),
]:
    _register_skip(_fid, _reason)


# --------------------------------------------------------------------- runner


@dataclass
class TestResult:
    feature_id: str
    version: int
    verdict: str  # pass | fail | skip | error
    expected: str  # full | partial | none | unknown
    match: bool
    detail: str = ""


def compute_match(verdict: str, expected: str) -> bool:
    """Reference rule (iceberg_feature_tests.py:1680-1694): pass must meet
    full/partial, fail must meet none/unknown; skip/error always match."""
    if verdict == "pass":
        return expected in ("full", "partial")
    if verdict == "fail":
        return expected in ("none", "unknown")
    return True


def run_conformance(
    spark: SparkSession,
    warehouse: str | None = None,
    max_workers: int | None = None,
) -> dict:
    """Run every (feature × version) probe and report the support matrix.

    Probes run CONCURRENTLY on a thread pool: the Spark driver schedules
    jobs from multiple threads fine (each py4j call is thread-safe), the
    per-probe work is dominated by fixed job-scheduling latency, and
    every probe's CATALOG state is isolated — each gets its OWN warehouse
    catalog (under ``warehouse``) plus a uuid namespace. Session-GLOBAL
    state (SQL confs, data-source registry) is shared by construction;
    confs a probe needs are therefore set deterministically up front,
    never mid-pool. Sequential wall-clock was ~6.5 min; 8 workers bring
    the suite comfortably inside the reference's 30-min CI envelope."""
    import os as _os
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    # t_geospatial needs this session conf; setting it from a pooled
    # worker would make every concurrent probe's view of it depend on
    # thread interleaving — set it once, before any probe runs, and
    # restore the caller's prior value on the way out
    _geo_conf = "spark.sql.geospatial.enabled"
    _geo_prior = spark.conf.get(_geo_conf, None)
    spark.conf.set(_geo_conf, "true")
    base_wh = warehouse or tempfile.mkdtemp(prefix="conf-wh-")
    if max_workers is None:
        # probes are fixed-latency-dominated (driver round trips + tiny
        # jobs), not CPU-bound: 16 workers measured 81 s vs 124 s at 8 on
        # local[32] (round 12), flat beyond 16 — still env-tunable for
        # smaller hosts
        max_workers = int(
            _os.environ.get(
                "SPARK_GRAFT_CONF_WORKERS", min(16, _os.cpu_count() or 4)
            )
        )
    uncovered = [f[0] for f in FEATURES if f[0] not in TESTS]
    tasks = [
        (feature_id, version)
        for feature_id, _name, _cat in FEATURES
        for version in VERSIONS
    ]

    def run_one(task: tuple) -> TestResult:
        feature_id, version = task
        fn = TESTS.get(feature_id)
        expected = support_level(feature_id, version)
        if fn is None:
            return TestResult(feature_id, version, "skip", expected, True, "no test")
        catalog = IceLiteCatalog(
            spark, tempfile.mkdtemp(prefix=f"c_{feature_id[:12]}_", dir=base_wh)
        )
        ns = f"conf_{uuid.uuid4().hex[:8]}"
        catalog.create_namespace(ns)
        ctx = Ctx(spark, catalog, version, ns)
        try:
            verdict = fn(ctx)
            detail = ""
            if isinstance(verdict, tuple):
                verdict, detail = verdict
        except AssertionError as e:
            verdict, detail = "error", f"assertion: {e}"
        except Exception as e:  # noqa: BLE001
            verdict, detail = "error", traceback.format_exception_only(type(e), e)[0].strip()
        return TestResult(
            feature_id, version, verdict, expected,
            compute_match(verdict, expected), detail,
        )

    try:
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            results = list(ex.map(run_one, tasks))
        # Shared-JVM OptionalDataException heal (round 10): the pooled
        # probes are exactly the concurrency that can corrupt a Python
        # data source wrapper's shared env-vars map mid-serialization
        # (session.py:reregister_data_sources) — and once corrupted the
        # probe fails on EVERY rerun against the same wrapper. Heal by
        # re-registering, then re-run just the flaked probes SERIALLY
        # (no pool — no concurrent serialization window). Any other
        # error verdict is left untouched.
        flaked = [
            i
            for i, r in enumerate(results)
            if r.verdict == "error"
            and "OptionalDataException" in (r.detail or "")
        ]
        if flaked:
            from iceberg_matrix_spark.session import (  # noqa: PLC0415
                reregister_data_sources,
            )

            reregister_data_sources(spark)
            for i in flaked:
                results[i] = run_one(tasks[i])
    finally:
        if _geo_prior is None:
            spark.conf.unset(_geo_conf)
        else:
            spark.conf.set(_geo_conf, _geo_prior)
    report = {
        "results": [vars(r) for r in results],
        "totals": {
            v: sum(1 for r in results if r.verdict == v)
            for v in ("pass", "fail", "skip", "error")
        },
        "discrepancies": [vars(r) for r in results if not r.match],
        "uncovered_features": uncovered,
        "ok": all(r.match for r in results)
        and not uncovered
        and not any(r.verdict == "error" for r in results),
    }
    return report


def render_markdown(report: dict) -> str:
    lines = [
        "# IceLite conformance report",
        "",
        "| feature | v2 | v3 | expected v2/v3 | match |",
        "|---|---|---|---|---|",
    ]
    by_key = {(r["feature_id"], r["version"]): r for r in report["results"]}
    for fid, name, _cat in FEATURES:
        r2, r3 = by_key[(fid, 2)], by_key[(fid, 3)]
        match = "✅" if r2["match"] and r3["match"] else "❌"
        lines.append(
            f"| {name} (`{fid}`) | {r2['verdict']} | {r3['verdict']} "
            f"| {r2['expected']}/{r3['expected']} | {match} |"
        )
    t = report["totals"]
    lines += [
        "",
        f"**{t['pass']} pass / {t['fail']} fail / {t['skip']} skip / "
        f"{t['error']} error** — "
        + ("OK" if report["ok"] else "DISCREPANCIES/ERRORS PRESENT"),
    ]
    return "\n".join(lines)


def main() -> int:
    from iceberg_matrix_spark import get_spark

    spark = get_spark(app_name="icelite-conformance", shuffle_partitions=8)
    try:
        report = run_conformance(spark)
    finally:
        spark.stop()
    with open("conformance_report.json", "w") as f:
        json.dump(report, f, indent=2)
    with open("conformance_report.md", "w") as f:
        f.write(render_markdown(report))
    print(json.dumps(report["totals"]) + (" OK" if report["ok"] else " FAILED"))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
