"""Verbatim replay of the reference's ClickHouse suite statements.

The reference's ClickHouse suite (/root/reference/tests/
clickhouse_feature_tests.py) is a two-engine script: Spark creates and
mutates Iceberg tables (literal ``spark.sql(...)`` fixtures), then
ClickHouse reads them back by LOCATION through the ``icebergLocal()``
path table function and the test asserts literal values on the output
(`ids == [1, 3, 4]`, ``out.strip() == "3"`` …).  This module replays
BOTH sides through :class:`~iceberg_matrix_spark.sql.facade.IceLiteSQL`
— the facade serves the Spark statements (CREATE ... LOCATION, INSERT,
DELETE, ALTER) *and* the ClickHouse dialect (``icebergLocal('<dir>')``,
``FORMAT TSV``, ``SETTINGS iceberg_snapshot_id=<id>``) — and checks the
reference's own expected values, encoded in :data:`GOLDEN` with the
reference's assertion line cited per entry.

Extraction is mechanical (``ast``): every literal ``spark.sql(...)``
and ``_ch_query(...)`` argument inside a ``test_*`` function, in source
order, so the statements are the reference's verbatim — only the
``{table_dir}`` / ``{snapshot_id}`` fixture placeholders are
substituted, exactly as the suite's own f-strings do.  Functions with
no extracted statements are the suite's statement-free verdict stubs
(read-only-engine rows like test_table_creation,
clickhouse_feature_tests.py:675-681) — nothing to replay.

Scope notes:

* The replay runs over a :class:`SqlCatalog` because ``CREATE TABLE ...
  LOCATION '<dir>'`` is a pointer-catalog capability (the suite's
  fixture DDL, :202-206); Iceberg's HadoopCatalog rejects custom
  locations, and so does our path catalog.
* ``test_write_insert``'s ClickHouse statement (``INSERT INTO FUNCTION
  icebergLocal(...)``, :657-659) is EXPECTED to be rejected — path
  table functions are read-only in ClickHouse and here.
* The suite is not format-version parameterized (one engine config), so
  the replay is a single pass; per-version behavior for these features
  is measured by the regular conformance probes instead.
"""

from __future__ import annotations

import ast
import os
import re
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from iceberg_matrix_spark.sql.facade import IceLiteSQL, UnsupportedSQLError
from iceberg_matrix_spark.sql._replay_common import TestFunctionVisitor, fstring_template
from iceberg_matrix_spark.tables.sql_catalog import SqlCatalog

REFERENCE_SUITE = "/root/reference/tests/clickhouse_feature_tests.py"

# func -> one expectation per _ch_query statement, in order, mirroring
# the reference's OWN literal asserts (cited).  Forms:
#   ("text", "3")                  -- out.strip() == "3"            (:210)
#   ("col0", ["1","3","4"])        -- first-column values            (:259)
#   ("cell", n, r, c, "30")        -- len(rows)==n and rows[r][c]    (:417)
#   ("rejected",)                  -- statement must be refused      (:661)
GOLDEN: dict[str, list[tuple]] = {
    "test_read_support": [("text", "3")],                    # :210
    "test_position_deletes": [("col0", ["1", "3", "4"])],    # :259
    "test_equality_deletes": [("col0", ["1", "3", "4"])],    # :320
    "test_merge_on_read": [("col0", ["1", "3", "5"])],       # :370
    "test_schema_evolution": [("cell", 3, 2, 2, "30")],      # :415-417
    "test_type_promotion": [("cell", 3, 2, 1, "9999999999")],  # :464-466
    "test_hidden_partitioning": [("text", "3")],             # :512
    "test_partition_evolution": [("text", "4")],             # :556
    "test_time_travel": [("text", "2"), ("text", "4")],      # :605, :611
    "test_write_insert": [("rejected",)],                    # :657-661
}


@dataclass
class Op:
    kind: str  # 'spark' | 'ch'
    template: str


@dataclass
class ChOutcome:
    func: str
    index: int  # position among the function's ch statements
    statement: str
    status: str  # 'ok' | 'rejected' | 'error'
    rows: list = field(default_factory=list)  # stringified cells
    detail: str = ""

    def text(self) -> str:
        """The suite's ``out`` view of a result: TSV-ish lines (the
        tests split on newline / tab, clickhouse_feature_tests.py:257,
        414)."""
        return "\n".join(
            "\t".join("\\N" if v is None else str(v) for v in row)
            for row in self.rows
        )


def extract_ops(path: str = REFERENCE_SUITE) -> dict[str, list[Op]]:
    """Ordered (spark|ch) statement templates per ``test_*`` function.
    F-string interpolations render as ``{<expr>}`` placeholders."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    groups: dict[str, list[Op]] = {}

    template = fstring_template

    class Visitor(TestFunctionVisitor):
        def visit_Call(self, node):
            f = node.func
            func = self.test_func()
            if func and node.args:
                t = template(node.args[0])
                if t is not None:
                    if isinstance(f, ast.Attribute) and f.attr == "sql":
                        groups.setdefault(func, []).append(
                            Op("spark", " ".join(t.split()))
                        )
                    elif isinstance(f, ast.Name) and f.id == "_ch_query":
                        groups.setdefault(func, []).append(
                            Op("ch", " ".join(t.split()))
                        )
            self.generic_visit(node)

    Visitor().visit(tree)
    return groups


def replay_function(
    spark: SparkSession,
    shim: IceLiteSQL,
    warehouse: str,
    func: str,
    ops: list[Op],
) -> list[ChOutcome]:
    """One ordered pass of a ClickHouse-suite test function."""
    table_dir = os.path.join(warehouse, f"chdir_{uuid.uuid4().hex[:8]}")
    last_scalar: list = [None]

    def render(template: str) -> str:
        def sub(m: re.Match) -> str:
            expr = m.group(1)
            if expr == "table_dir":
                return table_dir
            if expr == "snapshot_id":
                # the suite captures it from its own earlier
                # `.snapshots ORDER BY committed_at LIMIT 1` query (:594)
                if last_scalar[0] is None:
                    raise RuntimeError("snapshot_id referenced before capture")
                return str(last_scalar[0])
            return m.group(0)  # literal braces in SQL text

        return re.sub(r"\{([^{}]+)\}", sub, template)

    outcomes: list[ChOutcome] = []
    ch_index = 0
    for op in ops:
        stmt = render(op.template)
        if op.kind == "spark":
            result = shim.sql(stmt)
            if result is not None:
                rows = result.collect()
                if len(rows) == 1 and len(rows[0]) == 1:
                    last_scalar[0] = rows[0][0]
            continue
        try:
            result = shim.sql(stmt)
            rows = [list(r) for r in result.collect()] if result is not None else []
            outcomes.append(ChOutcome(func, ch_index, stmt, "ok", rows=rows))
        except (UnsupportedSQLError, ValueError) as exc:
            outcomes.append(
                ChOutcome(func, ch_index, stmt, "rejected", detail=str(exc)[:200])
            )
        except Exception as exc:  # noqa: BLE001 — harness classification
            outcomes.append(
                ChOutcome(
                    func, ch_index, stmt, "error",
                    detail=f"{type(exc).__name__}: {exc}"[:200],
                )
            )
        ch_index += 1
    return outcomes


def check_expectation(exp: tuple, out: ChOutcome) -> str | None:
    """None when the outcome meets the reference's assert; else a reason."""
    if exp[0] == "rejected":
        return None if out.status == "rejected" else (
            f"expected clean rejection, got {out.status} {out.detail}"
        )
    if out.status != "ok":
        return f"expected ok, got {out.status}: {out.detail}"
    if exp[0] == "text":
        got = out.text().strip()
        return None if got == exp[1] else f"expected {exp[1]!r}, got {got!r}"
    if exp[0] == "col0":
        got = [str(r[0]) for r in out.rows]
        return None if got == exp[1] else f"expected {exp[1]}, got {got}"
    if exp[0] == "cell":
        _, n, r, c, val = exp
        if len(out.rows) != n:
            return f"expected {n} rows, got {len(out.rows)}"
        got = str(out.rows[r][c])
        return None if got == val else f"rows[{r}][{c}]: expected {val!r}, got {got!r}"
    return f"unknown expectation {exp!r}"


def replay_all(spark: SparkSession, warehouse: str) -> dict:
    """Replay every statement-bearing function; summarize vs GOLDEN."""
    groups = extract_ops()
    cat = SqlCatalog(spark, warehouse)
    shim = IceLiteSQL(spark, cat, name="local")
    shim.sql("CREATE NAMESPACE IF NOT EXISTS default")
    mismatches: list[tuple] = []
    replayed = 0
    for func, ops in groups.items():
        expected = GOLDEN.get(func)
        if expected is None:
            # a statement-bearing function without a golden entry means
            # the reference changed — flag for re-audit, don't skip
            mismatches.append((func, None, "no GOLDEN entry for extracted ops"))
            continue
        outs = replay_function(spark, shim, warehouse, func, ops)
        if len(outs) != len(expected):
            mismatches.append(
                (func, None, f"{len(outs)} ch statements vs {len(expected)} golden")
            )
            continue
        for exp, out in zip(expected, outs):
            replayed += 1
            reason = check_expectation(exp, out)
            if reason is not None:
                mismatches.append((func, out.index, reason))
    return {
        "functions": len(groups),
        "ch_statements": replayed,
        "mismatches": mismatches,
    }
