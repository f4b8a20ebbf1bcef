"""Verbatim replay of the reference's DuckDB suite statements.

The reference's DuckDB suite (/root/reference/tests/
duckdb_feature_tests.py) ATTACHes an Iceberg REST catalog as ``ib`` and
drives it with plain SQL (``con.execute(f"... ib.{ns}.t ...")``),
asserting on fetched values in code (``rows == [(1, "J"), (3,
"Sarah")]`` …).  This module AST-extracts every literal ``con.execute``
statement per test function, substitutes the ``{ns}`` fixture
placeholder (and the captured ``{first}`` snapshot id), and executes
them in order through :class:`~iceberg_matrix_spark.sql.facade.
IceLiteSQL` under the catalog name ``ib`` — checking the suite's own
expected values, encoded per statement in :data:`GOLDEN` with the
reference's assertion lines cited.

The facade serves the DuckDB shapes these statements need:
``iceberg_metadata()`` / ``iceberg_snapshots()`` / ``duckdb_tables()``
table functions, ``AT (VERSION => <id>)`` time travel, ``WITH
('format-version'='N')`` properties, MERGE's column-list-free ``INSERT
VALUES (...)``, V3 GEOMETRY columns and column DEFAULTs.

``test_rest_catalog`` replays over the real in-process REST catalog
(server + stdlib client, ``tables/rest_catalog.py``) — the suite's own
substrate is a REST catalog, so that one function exercises the full
HTTP round-trip; the rest run on the directory catalog (the catalog
kind is orthogonal to the statements, and conf ``rest-catalog``
measures the protocol itself).

Exclusions (reasons in :data:`EXCLUDED`): position-delete/MoR
observables depend on DuckDB's MoR-only DELETE where this engine keeps
Iceberg's copy-on-write default; the VARIANT insert uses DuckDB's
struct-literal ``{...}::VARIANT`` cast syntax; TIMESTAMP_NS literals
are nanosecond-precision (Spark SQL literals are µs — conf
``timestamp-ns`` covers the type through the table API); lineage
expects DuckDB's always-DV UPDATE encoding; catalog-integration asserts
on ``duckdb_databases()`` engine introspection.
"""

from __future__ import annotations

import ast
import re
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from iceberg_matrix_spark.sql.facade import IceLiteSQL, UnsupportedSQLError
from iceberg_matrix_spark.sql._replay_common import TestFunctionVisitor, fstring_template
from iceberg_matrix_spark.tables.catalog import IceLiteCatalog

REFERENCE_SUITE = "/root/reference/tests/duckdb_feature_tests.py"

EXCLUDED = {
    "test_position_deletes": (
        "expects POSITION_DELETES after a plain DELETE (DuckDB is "
        "MoR-only); this engine keeps Iceberg's CoW default — conf "
        "row-delete-mor/position-deletes cover the MoR path"
    ),
    "test_merge_on_read": "same MoR-default divergence; conf row-delete-mor",
    "test_variant_type": (
        "DuckDB struct-literal {..}::VARIANT cast syntax; VARIANT "
        "round-trips are conf variant-type + the Spark-suite replay"
    ),
    "test_nanosecond_timestamps": (
        "TIMESTAMP_NS literals are ns-precision; Spark SQL literals are "
        "µs — conf timestamp-ns covers the type via the table API"
    ),
    "test_lineage": (
        "expects every V3 UPDATE to encode as a puffin DV (DuckDB's only "
        "strategy); this engine's default is CoW — conf deletion-vectors "
        "covers the DV path"
    ),
    "test_catalog_integration": (
        "asserts on duckdb_databases() engine introspection (ATTACH "
        "internals); catalog protocol is conf rest-catalog"
    ),
}

# func -> {"catalog": "dir"|"rest", "checks": [(stmt_index, check)...]}
# check forms mirror the suite's own asserts (cited):
#   ("scalar", v)          single-cell equality
#   ("rows", [...])        full result equality (list of row lists)
#   ("col0", [...])        first-column equality
#   ("min_rows", n)        at least n rows
#   ("sum_col0", v)        numeric sum of first column
#   ("no_cell_substr", s)  no stringified cell contains s
#   ("any_cell_substr", s) some stringified cell contains s
GOLDEN: dict[str, dict] = {
    # :267-281 — one table left after create + CTAS + drop
    "test_table_creation": {"checks": [(3, ("scalar", 1))]},
    # :284-294
    "test_read_support": {"checks": [(2, ("scalar", 3))]},
    # :297-309
    "test_write_insert": {"checks": [(3, ("scalar", 3))]},
    # :313-334 — UPDATE+DELETE+MERGE final state rows == [(1,'J'),(3,'Sarah')]
    "test_write_merge_update_delete": {
        "checks": [(5, ("rows", [[1, "J"], [3, "Sarah"]]))]
    },
    # :390-407 — appends never create delete files
    "test_copy_on_write": {"checks": [(3, ("no_cell_substr", "DELETE"))]},
    # :411-424 — DESCRIBE column list after ADD/RENAME/DROP
    "test_schema_evolution": {"checks": [(5, ("col0", ["id", "full_name"]))]},
    # :441-462 — >=2 snapshots; AT (VERSION => first) sees 1 row, now 3
    "test_time_travel": {
        "checks": [(3, ("min_rows", 2)), (4, ("scalar", 1)), (5, ("scalar", 3))]
    },
    # :478-492 — bucket()/truncate() transform DDL + 3 rows back
    "test_hidden_partitioning": {"checks": [(2, ("scalar", 3))]},
    # :497-511 — SET PARTITIONED BY evolution, both specs read together
    "test_partition_evolution": {"checks": [(4, ("scalar", 2))]},
    # :523-536 — per-file record_count sums to 3
    "test_statistics": {"checks": [(2, ("sum_col0", 3))]},
    # :578-589 — full round-trip over the REAL REST catalog
    "test_rest_catalog": {"catalog": "rest", "checks": [(2, ("scalar", 2))]},
    # :657-669 — V3 GEOMETRY column created and described
    "test_geometry_type": {"checks": [(1, ("any_cell_substr", "geometry"))]},
    # :711-724 — DEFAULTs on CREATE and ALTER ADD applied to an (id)-only insert
    "test_column_default_values": {"checks": [(3, ("rows", [["web", "eu"]]))]},
}


@dataclass
class Stmt:
    index: int
    template: str


@dataclass
class StmtOutcome:
    func: str
    index: int
    statement: str
    status: str  # 'ok' | 'rejected' | 'error'
    rows: list = field(default_factory=list)
    detail: str = ""


def extract_statements(
    path: str = REFERENCE_SUITE,
) -> tuple[dict[str, list[Stmt]], int]:
    """Per test function (statements inside the nested ``body`` closures
    attribute to their enclosing ``test_*``): each literal
    ``con.execute(...)`` argument, in source order — plus a count of
    skipped non-literal statements (variable-built SQL), so reference
    drift that would shift GOLDEN indices is visible."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    groups: dict[str, list[Stmt]] = {}
    skipped = 0

    template = fstring_template

    class Visitor(TestFunctionVisitor):
        def visit_Call(self, node):
            nonlocal skipped
            func = self.test_func()
            f = node.func
            if (
                func
                and isinstance(f, ast.Attribute)
                and f.attr == "execute"
                and node.args
            ):
                t = template(node.args[0])
                if t is None:
                    # a non-literal statement (variable-built) would shift
                    # GOLDEN indices invisibly — count it so the summary
                    # and tests flag reference drift
                    skipped += 1
                else:
                    ops = groups.setdefault(func, [])
                    ops.append(Stmt(len(ops), " ".join(t.split())))
            self.generic_visit(node)

    Visitor().visit(tree)
    return groups, skipped


def replay_function(
    spark: SparkSession,
    catalog,
    func: str,
    stmts: list[Stmt],
) -> list[StmtOutcome]:
    shim = IceLiteSQL(spark, catalog, name="ib")
    ns = f"dk_{uuid.uuid4().hex[:8]}"
    shim.sql(f"CREATE NAMESPACE IF NOT EXISTS {ns}")
    first_snapshot: list = [None]

    def render(template: str) -> str:
        def sub(m: re.Match) -> str:
            expr = m.group(1)
            if expr == "ns":
                return ns
            if expr == "first":
                # the suite's snaps[0][0] capture (duckdb :449-451)
                if first_snapshot[0] is None:
                    raise RuntimeError("{first} referenced before snapshots")
                return str(first_snapshot[0])
            return m.group(0)

        return re.sub(r"\{([^{}]+)\}", sub, template)

    outcomes: list[StmtOutcome] = []
    for op in stmts:
        stmt = render(op.template)
        try:
            result = shim.sql(stmt)
            rows = [list(r) for r in result.collect()] if result is not None else []
            if (
                re.match(r"SELECT\s+snapshot_id\b", stmt, re.I)
                and re.search(r"iceberg_snapshots\(", stmt)
                and rows
            ):
                # capture only when the select-list IS snapshot_id (the
                # suite's own shape, :449-451) — any other projection
                # would silently record the wrong value; an uncaptured
                # {first} then fails with the clear RuntimeError below
                first_snapshot[0] = rows[0][0]
            outcomes.append(StmtOutcome(func, op.index, stmt, "ok", rows=rows))
        except (UnsupportedSQLError, ValueError) as exc:
            outcomes.append(
                StmtOutcome(func, op.index, stmt, "rejected", detail=str(exc)[:200])
            )
        except Exception as exc:  # noqa: BLE001 — harness classification
            outcomes.append(
                StmtOutcome(
                    func, op.index, stmt, "error",
                    detail=f"{type(exc).__name__}: {exc}"[:200],
                )
            )
    return outcomes


def _check(check: tuple, out: StmtOutcome) -> str | None:
    kind = check[0]
    if kind == "scalar":
        if len(out.rows) != 1 or len(out.rows[0]) != 1:
            return f"expected 1x1, got {out.rows[:3]}"
        return None if out.rows[0][0] == check[1] else (
            f"expected {check[1]!r}, got {out.rows[0][0]!r}"
        )
    if kind == "rows":
        got = [list(r) for r in out.rows]
        return None if got == check[1] else f"expected {check[1]}, got {got}"
    if kind == "col0":
        got = [r[0] for r in out.rows]
        return None if got == check[1] else f"expected {check[1]}, got {got}"
    if kind == "min_rows":
        return None if len(out.rows) >= check[1] else (
            f"expected >={check[1]} rows, got {len(out.rows)}"
        )
    if kind == "sum_col0":
        got = sum(r[0] for r in out.rows)
        return None if got == check[1] else f"expected sum {check[1]}, got {got}"
    if kind == "no_cell_substr":
        for r in out.rows:
            for v in r:
                if check[1] in str(v):
                    return f"forbidden {check[1]!r} in {r}"
        return None
    if kind == "any_cell_substr":
        for r in out.rows:
            for v in r:
                if check[1].lower() in str(v).lower():
                    return None
        return f"no cell contains {check[1]!r}: {out.rows[:4]}"
    return f"unknown check {check!r}"


def check_function(func: str, outcomes: list[StmtOutcome]) -> list[tuple]:
    idxs = [i for i, _c in GOLDEN[func]["checks"]]
    # dict() below would silently drop all but the last check per index
    assert len(idxs) == len(set(idxs)), f"duplicate check indices in {func}"
    checks = dict(GOLDEN[func]["checks"])
    bad: list[tuple] = []
    for out in outcomes:
        if out.status != "ok":
            bad.append((func, out.index, f"{out.status}: {out.detail}"))
            continue
        if out.index in checks:
            reason = _check(checks[out.index], out)
            if reason is not None:
                bad.append((func, out.index, reason))
    return bad


def replay_all(spark: SparkSession, warehouse: str) -> dict:
    groups, skipped = extract_statements()
    mismatches: list[tuple] = []
    replayed = 0
    unaccounted = [f for f in groups if f not in GOLDEN and f not in EXCLUDED]
    dir_catalog = IceLiteCatalog(spark, warehouse)
    rest_server = None
    for func, spec in GOLDEN.items():
        if func not in groups:
            mismatches.append((func, None, "not found in reference"))
            continue
        if spec.get("catalog") == "rest":
            from iceberg_matrix_spark.tables.rest_catalog import (  # noqa: PLC0415
                RestCatalog,
                RestCatalogServer,
            )

            rest_server = RestCatalogServer(spark, f"{warehouse}-rest")
            catalog = RestCatalog(spark, rest_server.uri)
        else:
            catalog = dir_catalog
        try:
            outs = replay_function(spark, catalog, func, groups[func])
        finally:
            if rest_server is not None:
                rest_server.close()
                rest_server = None
        replayed += len(outs)
        mismatches.extend(check_function(func, outs))
    return {
        "functions": len(GOLDEN),
        "excluded": len(EXCLUDED),
        "unaccounted": unaccounted,
        "skipped_nonliteral": skipped,
        "statements_replayed": replayed,
        "mismatches": mismatches,
    }
