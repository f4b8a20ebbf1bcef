"""SQL-backed IceLite catalog over any DB-API driver (SqlCatalog analog).

The reference exercises a SQLite SqlCatalog through PyIceberg and a JDBC
catalog against Postgres (/root/reference/tests/iceberg_feature_tests.py
catalog matrix rows; flink_feature_tests.py:329-340); those service
dependencies aren't available here, but the catalog *model* is plain SQL
and worth having natively: identifiers live in database rows, so catalog
DDL gets transactional semantics the directory catalog cannot give —
concurrent CREATE resolves to exactly one winner via the primary key,
RENAME is a single-statement atomic update (a filesystem catalog would
need a non-atomic directory move), and DROP can't half-complete.

Schema (mirrors the shape PyIceberg's SqlCatalog uses):

    namespaces(namespace PK, properties_json)
    tables(namespace, name, location, metadata_location,
           PRIMARY KEY (namespace, name))

``metadata_location`` is the catalog's pointer to the table's current
metadata file, refreshed on load and after create — the audit trail a
SQL catalog adds over scanning the warehouse directory. Data and
metadata files themselves stay in the warehouse exactly as with
:class:`IceLiteCatalog`; only name resolution moves into SQL, so every
table remains readable by both catalogs.

Portability seam (:class:`DbApiCatalog`): the SQL here is ANSI +
``CREATE TABLE IF NOT EXISTS``; everything driver-specific is a
constructor parameter — connection factory, paramstyle, IntegrityError
class, per-connection init statements. :class:`SqlCatalog` is the
sqlite3 instantiation; :func:`dbapi_catalog_from_url` is the JDBC-shaped
entry point (``sqlite:///path`` works in-container; ``postgresql://``
resolves the psycopg2 driver and fails with an explicit env-blocked
error when absent — the adapter is the same class either way).
"""

from __future__ import annotations

import json
import os
import shutil
import sqlite3
from collections.abc import Callable
from contextlib import contextmanager
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from iceberg_matrix_spark.tables.catalog import (
    IceLiteCatalog,
    NoSuchTableError,
    TableAlreadyExistsError,
)
from iceberg_matrix_spark.tables.metadata import _version_path, current_version
from iceberg_matrix_spark.tables.table import IceLiteTable


class DbApiCatalog:
    """Catalog façade storing identifiers in ANY DB-API database; table IO
    delegates to the same IceLite machinery as the directory catalog."""

    # pointer catalogs can bind a name to ANY directory (the location
    # column is the identity map), so CREATE TABLE ... LOCATION works here
    # where the path-based catalog must reject it
    SUPPORTS_CUSTOM_LOCATION = True

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        connect: Callable[[], Any],
        *,
        paramstyle: str = "qmark",
        integrity_error: type[Exception],
        init_statements: tuple[str, ...] = (),
    ):
        # integrity_error is REQUIRED (no Exception default): a blanket
        # catch would swallow OperationalErrors (connection refused, DB
        # locked) as "already exists" inside create_namespace.
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self._connect = connect
        self._paramstyle = paramstyle
        self._integrity_error = integrity_error
        self._init_statements = init_statements
        # the delegate handles schema parsing/validation + metadata creation
        self._fs = IceLiteCatalog(spark, warehouse)
        with self._conn() as con:
            self._exec(
                con,
                "CREATE TABLE IF NOT EXISTS namespaces ("
                " namespace TEXT PRIMARY KEY, properties_json TEXT NOT NULL)",
            )
            self._exec(
                con,
                "CREATE TABLE IF NOT EXISTS tables ("
                " namespace TEXT NOT NULL, name TEXT NOT NULL,"
                " location TEXT NOT NULL, metadata_location TEXT,"
                " PRIMARY KEY (namespace, name),"
                " FOREIGN KEY (namespace) REFERENCES namespaces(namespace))",
            )

    # ------------------------------------------------------------- plumbing

    @contextmanager
    def _conn(self) -> Iterator[Any]:
        con = self._connect()
        try:
            for stmt in self._init_statements:
                self._exec(con, stmt)
            with con:  # transaction scope: commit on success, rollback on error
                yield con
        finally:
            con.close()

    def _sql(self, sql: str) -> str:
        """Translate qmark placeholders to the driver's paramstyle."""
        if self._paramstyle in ("format", "pyformat"):
            return sql.replace("?", "%s")
        return sql

    def _exec(self, con: Any, sql: str, params: tuple = ()):
        """Run through a DB-API cursor — ``connection.execute`` is a
        sqlite3/psycopg-3 convenience that psycopg2 connections lack; the
        cursor API is the portable spelling and carries rowcount."""
        cur = con.cursor()
        cur.execute(self._sql(sql), params)
        return cur

    @staticmethod
    def _is_fk_violation(exc: Exception) -> bool:
        return "foreign key" in str(exc).lower()

    @staticmethod
    def _split(identifier: str) -> tuple[str, str]:
        ns, _, tbl = identifier.rpartition(".")
        if not ns:
            raise ValueError(f"identifier must be namespace.table: {identifier}")
        return ns, tbl

    # ------------------------------------------------------------ namespaces

    def create_namespace(self, name: str, properties: dict[str, str] | None = None) -> None:
        # portable INSERT-if-absent: plain INSERT, swallow the PK conflict
        # (sqlite's INSERT OR IGNORE / Postgres's ON CONFLICT are dialects)
        try:
            with self._conn() as con:
                self._exec(
                    con,
                    "INSERT INTO namespaces VALUES (?, ?)",
                    (name, json.dumps(properties or {})),
                )
        except self._integrity_error as exc:
            if self._is_fk_violation(exc):
                raise
            # re-creating with IDENTICAL properties is idempotent (CREATE
            # NAMESPACE IF NOT EXISTS); different properties must conflict
            # loudly — answering success while the stored properties stay
            # unchanged would silently diverge (the REST server surfaces
            # this as the spec's 409 AlreadyExistsException)
            existing = self.namespace_properties(name)
            if existing != (properties or {}):
                from iceberg_matrix_spark.tables.catalog import (  # noqa: PLC0415
                    TableAlreadyExistsError,
                )

                raise TableAlreadyExistsError(
                    f"namespace {name} exists with different properties "
                    f"{existing}"
                ) from exc

    def namespace_properties(self, name: str) -> dict[str, str]:
        with self._conn() as con:
            row = self._exec(
                con, "SELECT properties_json FROM namespaces WHERE namespace = ?", (name,)
            ).fetchone()
        if row is None:
            raise ValueError(f"no such namespace: {name}")
        return json.loads(row[0])

    def drop_namespace(self, name: str) -> None:
        with self._conn() as con:
            n = self._exec(
                con, "SELECT COUNT(*) FROM tables WHERE namespace = ?", (name,)
            ).fetchone()[0]
            if n:
                raise ValueError(f"namespace {name} is not empty")
            self._exec(con, "DELETE FROM namespaces WHERE namespace = ?", (name,))

    def list_namespaces(self) -> list[str]:
        with self._conn() as con:
            return [r[0] for r in self._exec(
                con, "SELECT namespace FROM namespaces ORDER BY namespace")]

    def list_tables(self, namespace: str) -> list[str]:
        with self._conn() as con:
            return [r[0] for r in self._exec(
                con,
                "SELECT name FROM tables WHERE namespace = ? ORDER BY name",
                (namespace,))]

    # ---------------------------------------------------------------- tables

    def table_exists(self, identifier: str) -> bool:
        ns, tbl = self._split(identifier)
        with self._conn() as con:
            return self._exec(
                con, "SELECT 1 FROM tables WHERE namespace = ? AND name = ?", (ns, tbl)
            ).fetchone() is not None

    def _row(self, identifier: str) -> tuple[str, str, str]:
        ns, tbl = self._split(identifier)
        with self._conn() as con:
            row = self._exec(
                con,
                "SELECT namespace, name, location FROM tables"
                " WHERE namespace = ? AND name = ?",
                (ns, tbl),
            ).fetchone()
        if row is None:
            raise NoSuchTableError(identifier)
        return row

    def _claim(
        self,
        ns: str,
        tbl: str,
        location: str,
        identifier: str,
        exclusive_location: bool = False,
    ) -> None:
        """``exclusive_location=True`` (CREATE claims) makes the row the
        arbiter for the DIRECTORY too: two concurrent CREATE ... LOCATION
        '<same dir>' would both see an empty directory, so the guard is a
        single atomic ``INSERT ... SELECT ... WHERE NOT EXISTS`` — one
        statement under the DB's write lock, never a separate racy SELECT
        (stdlib sqlite3 runs bare SELECTs in autocommit). register_table
        stays non-exclusive — adopting an existing table's metadata under
        a second name is the spec's register shape."""
        try:
            with self._conn() as con:
                if exclusive_location:
                    cur = self._exec(
                        con,
                        "INSERT INTO tables (namespace, name, location) "
                        "SELECT ?, ?, ? WHERE NOT EXISTS "
                        "(SELECT 1 FROM tables WHERE location = ?)",
                        (ns, tbl, location, location),
                    )
                    if cur.rowcount == 0:
                        raise TableAlreadyExistsError(
                            f"location {location!r} is already claimed"
                        )
                else:
                    self._exec(
                        con,
                        "INSERT INTO tables (namespace, name, location) "
                        "VALUES (?, ?, ?)",
                        (ns, tbl, location),
                    )
        except self._integrity_error as exc:
            if self._is_fk_violation(exc):
                raise ValueError(f"no such namespace: {ns}") from exc
            raise TableAlreadyExistsError(identifier) from exc

    def create_table(
        self,
        identifier: str,
        schema: StructType | str,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
        defaults: dict[str, object] | None = None,
        location: str | None = None,
    ) -> IceLiteTable:
        """``location`` pins a custom table directory — the pointer-
        catalog capability behind ``CREATE TABLE ... LOCATION '<dir>'``
        (the reference's ClickHouse fixture DDL,
        clickhouse_feature_tests.py:202-206, creates by name at an
        explicit path so the path table function can read it back)."""
        ns, tbl = self._split(identifier)
        if location is not None:
            if current_version(location) != 0:
                raise TableAlreadyExistsError(
                    f"table files already present at LOCATION {location!r}"
                )
        else:
            location = os.path.join(self.warehouse, ns, tbl)
            if current_version(location) != 0:
                # the deterministic dir is occupied by a previously dropped
                # (non-purge) or renamed-away table's files — the catalog row
                # is the identity, so allocate a fresh location rather than
                # failing the re-create forever (Iceberg's non-purge DROP
                # likewise leaves files behind and re-creates elsewhere)
                import uuid as _uuid  # noqa: PLC0415

                location = f"{location}-{_uuid.uuid4().hex[:8]}"
        # claim the identifier FIRST: the primary key makes concurrent
        # creates race-free (exactly one INSERT succeeds); a CREATE's
        # claim is location-exclusive too (see _claim)
        self._claim(ns, tbl, location, identifier, exclusive_location=True)
        try:
            os.makedirs(os.path.dirname(location), exist_ok=True)
            table = self._fs.create_table(
                identifier,
                schema,
                partition_by,
                properties,
                defaults=defaults,
                location=location,
            )
        except Exception:
            with self._conn() as con:  # roll back the claim on failure
                self._exec(
                    con, "DELETE FROM tables WHERE namespace = ? AND name = ?", (ns, tbl)
                )
            raise
        self._sync_pointer(ns, tbl, location)
        return table

    def create_table_as_select(
        self,
        identifier: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
    ) -> IceLiteTable:
        table = self.create_table(identifier, df.schema, partition_by, properties)
        table.append(df)
        ns, tbl = self._split(identifier)
        self._sync_pointer(ns, tbl, table.location)
        return table

    def register_table(self, identifier: str, location: str) -> IceLiteTable:
        """Adopt an existing IceLite table directory into the catalog
        (PyIceberg register_table analog)."""
        if current_version(location) == 0:
            raise NoSuchTableError(f"no table metadata at {location}")
        ns, tbl = self._split(identifier)
        self._claim(ns, tbl, location, identifier)
        self._sync_pointer(ns, tbl, location)
        return IceLiteTable(self.spark, location)

    def load_table(self, identifier: str) -> IceLiteTable:
        ns, tbl, location = self._row(identifier)
        try:
            table = IceLiteTable(self.spark, location)
        except FileNotFoundError as exc:
            # the claim-then-write create order (race-free creates) opens
            # a window where the identifier row exists but the initial
            # metadata is not on disk yet — a concurrent reader must see
            # a TYPED not-there-yet, never a raw IO error (caught by the
            # round-7 catalog-race soak)
            raise NoSuchTableError(
                f"{identifier} is mid-creation (claimed, no metadata yet)"
            ) from exc
        self._sync_pointer(ns, tbl, location)
        return table

    def rename_table(self, identifier: str, new_identifier: str) -> None:
        """Atomic rename: one UPDATE inside a transaction — the operation
        a directory catalog can only approximate with a non-atomic move.
        The location is unchanged (Iceberg semantics: a rename re-points
        the catalog entry, it does not relocate data)."""
        ns, tbl, _ = self._row(identifier)
        new_ns, new_tbl = self._split(new_identifier)
        try:
            with self._conn() as con:
                cur = self._exec(
                    con,
                    "UPDATE tables SET namespace = ?, name = ?"
                    " WHERE namespace = ? AND name = ?",
                    (new_ns, new_tbl, ns, tbl),
                )
                if cur.rowcount == 0:
                    raise NoSuchTableError(identifier)
        except self._integrity_error as exc:
            if self._is_fk_violation(exc):
                raise ValueError(f"no such namespace: {new_ns}") from exc
            raise TableAlreadyExistsError(new_identifier) from exc

    def drop_table(self, identifier: str, purge: bool = False) -> None:
        ns, tbl, location = self._row(identifier)
        with self._conn() as con:
            self._exec(
                con, "DELETE FROM tables WHERE namespace = ? AND name = ?", (ns, tbl)
            )
        if purge:
            shutil.rmtree(location, ignore_errors=True)

    def describe(self, identifier: str) -> list[tuple[str, str]]:
        table = self.load_table(identifier)
        return [(f.name, f.type) for f in table.meta.current_schema.fields]

    def metadata_location(self, identifier: str) -> str | None:
        ns, tbl = self._split(identifier)
        with self._conn() as con:
            row = self._exec(
                con,
                "SELECT metadata_location FROM tables WHERE namespace = ? AND name = ?",
                (ns, tbl),
            ).fetchone()
        if row is None:
            raise NoSuchTableError(identifier)
        return row[0]

    def _sync_pointer(self, ns: str, tbl: str, location: str) -> None:
        version = current_version(location)
        pointer = _version_path(location, version) if version else None
        with self._conn() as con:
            self._exec(
                con,
                "UPDATE tables SET metadata_location = ?"
                " WHERE namespace = ? AND name = ?",
                (pointer, ns, tbl),
            )


class SqlCatalog(DbApiCatalog):
    """The stdlib-sqlite3 instantiation of :class:`DbApiCatalog` (the
    shape PyIceberg's SqlCatalog uses with a sqlite URI)."""

    def __init__(self, spark: SparkSession, warehouse: str, db_path: str | None = None):
        self.db_path = db_path or os.path.join(warehouse, "catalog.db")
        super().__init__(
            spark,
            warehouse,
            connect=lambda: sqlite3.connect(self.db_path, timeout=30),
            paramstyle="qmark",
            integrity_error=sqlite3.IntegrityError,
            init_statements=("PRAGMA foreign_keys = ON",),
        )


class DriverUnavailableError(RuntimeError):
    """The DB-API driver for the requested URL scheme isn't installed in
    this environment (the JDBC-catalog env-blocked signal)."""


def dbapi_catalog_from_url(
    spark: SparkSession, warehouse: str, url: str
) -> DbApiCatalog:
    """JDBC-shaped entry point: ``scheme://...`` → configured catalog.

    ``sqlite:///path/to/db`` runs on stdlib sqlite3 (proving the seam
    in-container); ``postgresql://host/db`` resolves psycopg2 and raises
    :class:`DriverUnavailableError` when it isn't installed — the honest
    env-blocked outcome, with the adapter code path identical either way
    (flink_feature_tests.py:329-340 is the Postgres JDBC exercise).
    """
    scheme, sep, rest = url.partition("://")
    if not sep:
        raise ValueError(f"not a catalog URL: {url!r}")
    if scheme == "sqlite":
        path = rest.lstrip("/")
        db_path = ("/" + path) if path else os.path.join(warehouse, "catalog.db")
        return SqlCatalog(spark, warehouse, db_path=db_path)
    if scheme in ("postgresql", "postgres"):
        try:
            import psycopg2  # noqa: PLC0415
        except ImportError as exc:
            raise DriverUnavailableError(
                "postgresql catalog needs psycopg2, which is not installed "
                "in this environment (no network/services in the sandbox)"
            ) from exc
        return DbApiCatalog(
            spark,
            warehouse,
            connect=lambda: psycopg2.connect(url),
            paramstyle="pyformat",
            integrity_error=psycopg2.IntegrityError,
        )
    raise ValueError(f"unsupported catalog URL scheme: {scheme!r}")
