"""SQLite-backed catalog: transactional DDL semantics + IceLite interop."""

from __future__ import annotations

import tempfile
from concurrent.futures import ThreadPoolExecutor

import pytest

from iceberg_matrix_spark.tables.catalog import (
    IceLiteCatalog,
    NoSuchTableError,
    TableAlreadyExistsError,
)
from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.tables.sql_catalog import SqlCatalog
from iceberg_matrix_spark.tables.table import IceLiteTable


@pytest.fixture
def cat(spark):
    return SqlCatalog(spark, tempfile.mkdtemp(prefix="sqlcat-wh-"))


def test_create_load_drop_roundtrip(spark, cat):
    cat.create_namespace("db", {"owner": "tests"})
    assert cat.namespace_properties("db") == {"owner": "tests"}
    t = cat.create_table("db.t", "id bigint, v string")
    t.append(local_df(spark, [(1, "a"), (2, "b")], "id bigint, v string"))
    assert cat.list_tables("db") == ["t"]
    assert cat.load_table("db.t").df().count() == 2
    # the catalog tracks the current metadata pointer
    assert cat.metadata_location("db.t").endswith("v2.metadata.json")
    cat.drop_table("db.t")
    assert not cat.table_exists("db.t")
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.t")


def test_concurrent_create_exactly_one_winner(spark, cat):
    cat.create_namespace("db")

    def try_create(i: int) -> bool:
        try:
            cat.create_table("db.race", "id bigint")
            return True
        except TableAlreadyExistsError:
            return False

    with ThreadPoolExecutor(8) as ex:
        wins = list(ex.map(try_create, range(8)))
    assert sum(wins) == 1  # the PK arbitrates the race
    assert cat.list_tables("db") == ["race"]


def test_rename_is_catalog_only_and_guarded(spark, cat):
    cat.create_namespace("db")
    cat.create_namespace("db2")
    t = cat.create_table("db.src", "id bigint")
    t.append(spark.range(3))
    loc = t.location
    cat.rename_table("db.src", "db2.dst")
    assert not cat.table_exists("db.src")
    got = cat.load_table("db2.dst")
    assert got.location == loc  # rename re-points; data does not move
    assert got.df().count() == 3
    # renaming onto an existing identifier is rejected atomically
    cat.create_table("db.other", "id bigint")
    with pytest.raises(TableAlreadyExistsError):
        cat.rename_table("db.other", "db2.dst")
    with pytest.raises(ValueError):
        cat.rename_table("db.other", "nope.dst")


def test_register_existing_icelite_table(spark, cat):
    # a table created by the DIRECTORY catalog is adopted by identifier
    fs = IceLiteCatalog(spark, tempfile.mkdtemp(prefix="fswh-"))
    fs.create_namespace("x")
    src = fs.create_table("x.t", "id bigint")
    src.append(spark.range(4))
    cat.create_namespace("adopted")
    t = cat.register_table("adopted.t", src.location)
    assert t.df().count() == 4
    assert cat.metadata_location("adopted.t").endswith("v2.metadata.json")
    with pytest.raises(NoSuchTableError):
        cat.register_table("adopted.bad", tempfile.mkdtemp())


def test_failed_create_releases_identifier(spark, cat):
    cat.create_namespace("db")
    with pytest.raises(Exception):
        cat.create_table("db.bad", "id not_a_type")
    assert not cat.table_exists("db.bad")  # claim rolled back
    cat.create_table("db.bad", "id bigint")  # identifier reusable


def test_drop_namespace_guard_and_purge(spark, cat):
    cat.create_namespace("db")
    t = cat.create_table("db.t", "id bigint")
    t.append(spark.range(2))
    with pytest.raises(ValueError):
        cat.drop_namespace("db")
    loc = t.location
    cat.drop_table("db.t", purge=True)
    import os

    assert not os.path.isdir(loc)
    cat.drop_namespace("db")
    assert "db" not in cat.list_namespaces()


def test_tables_interop_with_directory_catalog_readers(spark, cat):
    cat.create_namespace("db")
    t = cat.create_table("db.t", "id bigint")
    t.append(spark.range(5))
    # a plain path-based reader sees the same table
    assert IceLiteTable(spark, t.location).df().count() == 5


# ----------------------------------------------------------- DB-API seam


def test_dbapi_url_factory_sqlite(spark, tmp_path):
    """The JDBC-shaped entry point with a sqlite URL exercises the SAME
    DbApiCatalog code path a Postgres deployment would use."""
    from iceberg_matrix_spark.tables.sql_catalog import dbapi_catalog_from_url

    wh = str(tmp_path / "wh")
    cat = dbapi_catalog_from_url(spark, wh, f"sqlite:///{tmp_path}/cat.db")
    cat.create_namespace("db")
    cat.create_namespace("db")  # idempotent, portable INSERT-if-absent
    t = cat.create_table("db.t", "id bigint")
    t.append(spark.range(4))
    assert cat.load_table("db.t").df().count() == 4
    cat.rename_table("db.t", "db.renamed")
    assert cat.list_tables("db") == ["renamed"]
    assert str(tmp_path / "cat.db") == cat.db_path


def test_dbapi_url_factory_postgres_env_blocked(spark, tmp_path):
    from iceberg_matrix_spark.tables.sql_catalog import (
        DriverUnavailableError,
        dbapi_catalog_from_url,
    )

    with pytest.raises(DriverUnavailableError, match="psycopg2"):
        dbapi_catalog_from_url(spark, str(tmp_path), "postgresql://localhost/ice")
    with pytest.raises(ValueError, match="scheme"):
        dbapi_catalog_from_url(spark, str(tmp_path), "mysql://localhost/ice")


def test_dbapi_paramstyle_translation():
    """pyformat drivers get %s placeholders — translation is text-level."""
    from iceberg_matrix_spark.tables.sql_catalog import DbApiCatalog

    fake = object.__new__(DbApiCatalog)
    fake._paramstyle = "pyformat"
    assert fake._sql("SELECT * FROM t WHERE a = ? AND b = ?") == (
        "SELECT * FROM t WHERE a = %s AND b = %s"
    )
    fake._paramstyle = "qmark"
    assert fake._sql("SELECT ?") == "SELECT ?"


def test_sql_facade_composes_over_sql_catalog(spark, cat):
    """The SQL front-end is catalog-agnostic: the same statements that run
    over the directory catalog run over the SQLite SqlCatalog (and by the
    same seam, any DB-API catalog) — DDL, DML, metadata suffixes, CALL."""
    from iceberg_matrix_spark.sql import IceLiteSQL

    sql = IceLiteSQL(spark, cat)
    sql.sql("CREATE NAMESPACE IF NOT EXISTS local.fc")
    sql.sql("CREATE TABLE local.fc.t (id BIGINT, val STRING) USING iceberg")
    sql.sql("INSERT INTO local.fc.t VALUES (1,'a'),(2,'b')")
    sql.sql("UPDATE local.fc.t SET val='x' WHERE id=2")
    sql.sql("DELETE FROM local.fc.t WHERE id=1")
    got = [(r["id"], r["val"]) for r in sql.sql("SELECT * FROM local.fc.t").collect()]
    assert got == [(2, "x")]
    assert sql.sql("SELECT count(*) FROM local.fc.t.snapshots").collect()[0][0] == 3
    res = sql.sql("CALL local.system.rewrite_data_files(table => 'fc.t')")
    assert "rewritten_data_files_count" in res.columns
    sql.sql("DROP TABLE local.fc.t PURGE")
    assert not cat.table_exists("fc.t")


def test_recreate_after_drop_and_rename(spark, cat):
    """Non-purge DROP and RENAME leave files at the deterministic dir;
    re-creating the identifier must allocate a fresh location instead of
    failing forever on the leftover metadata."""
    cat.create_namespace("db")
    t = cat.create_table("db.t", "id bigint")
    t.append(spark.range(3))
    cat.drop_table("db.t")  # purge=False: files stay behind
    t2 = cat.create_table("db.t", "id bigint")
    t2.append(spark.range(5))
    assert cat.load_table("db.t").df().count() == 5

    cat.create_table("db.a", "id bigint").append(spark.range(2))
    cat.rename_table("db.a", "db.b")
    a2 = cat.create_table("db.a", "id bigint")  # old dir still holds db.b
    a2.append(spark.range(7))
    assert cat.load_table("db.a").df().count() == 7
    assert cat.load_table("db.b").df().count() == 2


def test_create_namespace_conflict_on_different_properties(cat):
    from iceberg_matrix_spark.tables.catalog import TableAlreadyExistsError

    cat.create_namespace("dbp", {"a": "1"})
    cat.create_namespace("dbp", {"a": "1"})  # identical → idempotent
    with pytest.raises(TableAlreadyExistsError, match="different properties"):
        cat.create_namespace("dbp", {"a": "2"})
    assert cat.namespace_properties("dbp") == {"a": "1"}
