"""SQL-backed IceLite catalog on stdlib sqlite3 (the SqlCatalog analog).

The reference exercises a SQLite SqlCatalog through PyIceberg
(/root/reference/tests/iceberg_feature_tests.py — catalog matrix rows);
that dependency isn't available here, but the catalog *model* is plain
SQL and worth having natively: identifiers live in database rows, so
catalog DDL gets transactional semantics the directory catalog cannot
give — concurrent CREATE resolves to exactly one winner via the primary
key, RENAME is a single-statement atomic update (a filesystem catalog
would need a non-atomic directory move), and DROP can't half-complete.

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
"""

from __future__ import annotations

import json
import os
import shutil
import sqlite3
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from iceberg_matrix_spark.tables.catalog import (
    IceLiteCatalog,
    NoSuchTableError,
    TableAlreadyExistsError,
)
from iceberg_matrix_spark.tables.metadata import _version_path, current_version
from iceberg_matrix_spark.tables.table import IceLiteTable


class SqlCatalog:
    """Catalog façade storing identifiers in SQLite; table IO delegates to
    the same IceLite machinery as the directory catalog."""

    def __init__(self, spark: SparkSession, warehouse: str, db_path: str | None = None):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self.db_path = db_path or os.path.join(warehouse, "catalog.db")
        # the delegate handles schema parsing/validation + metadata creation
        self._fs = IceLiteCatalog(spark, warehouse)
        with self._conn() as con:
            con.execute(
                "CREATE TABLE IF NOT EXISTS namespaces ("
                " namespace TEXT PRIMARY KEY, properties_json TEXT NOT NULL)"
            )
            con.execute(
                "CREATE TABLE IF NOT EXISTS tables ("
                " namespace TEXT NOT NULL, name TEXT NOT NULL,"
                " location TEXT NOT NULL, metadata_location TEXT,"
                " PRIMARY KEY (namespace, name),"
                " FOREIGN KEY (namespace) REFERENCES namespaces(namespace))"
            )

    @contextmanager
    def _conn(self) -> Iterator[sqlite3.Connection]:
        con = sqlite3.connect(self.db_path, timeout=30)
        con.execute("PRAGMA foreign_keys = ON")
        try:
            with con:  # transaction scope: commit on success, rollback on error
                yield con
        finally:
            con.close()

    @staticmethod
    def _split(identifier: str) -> tuple[str, str]:
        ns, _, tbl = identifier.rpartition(".")
        if not ns:
            raise ValueError(f"identifier must be namespace.table: {identifier}")
        return ns, tbl

    # ------------------------------------------------------------ namespaces

    def create_namespace(self, name: str, properties: dict[str, str] | None = None) -> None:
        with self._conn() as con:
            con.execute(
                "INSERT OR IGNORE INTO namespaces VALUES (?, ?)",
                (name, json.dumps(properties or {})),
            )

    def namespace_properties(self, name: str) -> dict[str, str]:
        with self._conn() as con:
            row = con.execute(
                "SELECT properties_json FROM namespaces WHERE namespace = ?", (name,)
            ).fetchone()
        if row is None:
            raise ValueError(f"no such namespace: {name}")
        return json.loads(row[0])

    def drop_namespace(self, name: str) -> None:
        with self._conn() as con:
            n = con.execute(
                "SELECT COUNT(*) FROM tables WHERE namespace = ?", (name,)
            ).fetchone()[0]
            if n:
                raise ValueError(f"namespace {name} is not empty")
            con.execute("DELETE FROM namespaces WHERE namespace = ?", (name,))

    def list_namespaces(self) -> list[str]:
        with self._conn() as con:
            return [r[0] for r in con.execute(
                "SELECT namespace FROM namespaces ORDER BY namespace")]

    def list_tables(self, namespace: str) -> list[str]:
        with self._conn() as con:
            return [r[0] for r in con.execute(
                "SELECT name FROM tables WHERE namespace = ? ORDER BY name",
                (namespace,))]

    # ---------------------------------------------------------------- tables

    def table_exists(self, identifier: str) -> bool:
        ns, tbl = self._split(identifier)
        with self._conn() as con:
            return con.execute(
                "SELECT 1 FROM tables WHERE namespace = ? AND name = ?", (ns, tbl)
            ).fetchone() is not None

    def _row(self, identifier: str) -> tuple[str, str, str]:
        ns, tbl = self._split(identifier)
        with self._conn() as con:
            row = con.execute(
                "SELECT namespace, name, location FROM tables"
                " WHERE namespace = ? AND name = ?",
                (ns, tbl),
            ).fetchone()
        if row is None:
            raise NoSuchTableError(identifier)
        return row

    def create_table(
        self,
        identifier: str,
        schema: StructType | str,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
    ) -> IceLiteTable:
        ns, tbl = self._split(identifier)
        location = os.path.join(self.warehouse, ns, tbl)
        # claim the identifier FIRST: the primary key makes concurrent
        # creates race-free (exactly one INSERT succeeds)
        try:
            with self._conn() as con:
                con.execute(
                    "INSERT INTO tables (namespace, name, location) VALUES (?, ?, ?)",
                    (ns, tbl, location),
                )
        except sqlite3.IntegrityError as exc:
            if "FOREIGN KEY" in str(exc):
                raise ValueError(f"no such namespace: {ns}") from exc
            raise TableAlreadyExistsError(identifier) from exc
        try:
            os.makedirs(os.path.dirname(location), exist_ok=True)
            table = self._fs.create_table(identifier, schema, partition_by, properties)
        except Exception:
            with self._conn() as con:  # roll back the claim on failure
                con.execute(
                    "DELETE FROM tables WHERE namespace = ? AND name = ?", (ns, tbl)
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
        try:
            with self._conn() as con:
                con.execute(
                    "INSERT INTO tables (namespace, name, location) VALUES (?, ?, ?)",
                    (ns, tbl, location),
                )
        except sqlite3.IntegrityError as exc:
            if "FOREIGN KEY" in str(exc):
                raise ValueError(f"no such namespace: {ns}") from exc
            raise TableAlreadyExistsError(identifier) from exc
        self._sync_pointer(ns, tbl, location)
        return IceLiteTable(self.spark, location)

    def load_table(self, identifier: str) -> IceLiteTable:
        ns, tbl, location = self._row(identifier)
        table = IceLiteTable(self.spark, location)
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
                cur = con.execute(
                    "UPDATE tables SET namespace = ?, name = ?"
                    " WHERE namespace = ? AND name = ?",
                    (new_ns, new_tbl, ns, tbl),
                )
                if cur.rowcount == 0:
                    raise NoSuchTableError(identifier)
        except sqlite3.IntegrityError as exc:
            if "FOREIGN KEY" in str(exc):
                raise ValueError(f"no such namespace: {new_ns}") from exc
            raise TableAlreadyExistsError(new_identifier) from exc

    def drop_table(self, identifier: str, purge: bool = False) -> None:
        ns, tbl, location = self._row(identifier)
        with self._conn() as con:
            con.execute(
                "DELETE FROM tables WHERE namespace = ? AND name = ?", (ns, tbl)
            )
        if purge:
            shutil.rmtree(location, ignore_errors=True)

    def describe(self, identifier: str) -> list[tuple[str, str]]:
        table = self.load_table(identifier)
        return [(f.name, f.type) for f in table.meta.current_schema.fields]

    def metadata_location(self, identifier: str) -> str | None:
        ns, tbl = self._split(identifier)
        with self._conn() as con:
            row = con.execute(
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
            con.execute(
                "UPDATE tables SET metadata_location = ?"
                " WHERE namespace = ? AND name = ?",
                (pointer, ns, tbl),
            )
