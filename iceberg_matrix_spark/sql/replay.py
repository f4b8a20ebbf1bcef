"""Verbatim replay of the reference suite's SQL statements.

The strongest possible parity evidence for the SQL front-end is running
the reference's OWN statements, not hand-copied approximations.  This
module extracts every literal ``spark.sql(...)`` argument from
/root/reference/tests/iceberg_feature_tests.py with the ``ast`` module
(200 statements across 29 test functions; the suite's 2 other ``sql``
call sites are the ``_drop_table`` helper — non-literal, replayed as an
op — and the ``_get_latest_snapshot`` probe, served as a live
placeholder), substitutes the suite's
fixture placeholders (``{ns}``, ``{tbl}``, ``{src}``, ``{tname}``,
``{_fmt(version)}`` and the live-snapshot specials), and executes them
IN ORDER through :class:`~iceberg_matrix_spark.sql.facade.IceLiteSQL`
against a fresh namespace — one pass per format version, exactly like
the reference parameterizes its matrix runs.

The suite's few non-``spark.sql`` fixture steps are extracted alongside,
so each function's table lifecycle is complete:

* ``df.coalesce(1).writeTo(tbl).append()`` seed writes
  (iceberg_feature_tests.py:563-564, 1524-1525) become catalog appends
  of the same literal rows;
* ``_drop_table(spark, tbl)`` helper calls (the one non-literal
  statement, ``DROP TABLE IF EXISTS ... [PURGE]``) become the
  equivalent facade statement, keeping the later ``DROP NAMESPACE``
  statements runnable exactly as written.

Honest-scope notes, so the result is not oversold:

* This measures statement ACCEPTANCE and error-free execution of the
  verbatim surface, plus result-shape visibility (row counts).  Value
  assertions (delete-file content codes, PUFFIN formats, row images)
  live in the conformance probes (``conformance.py``) and the driver
  oracle — the replay complements them by proving no reference
  statement shape falls outside the shim.
* AST extraction flattens control flow: a loop body appears once, which
  matches exactly one format-version iteration of the reference's
  ``for version in VERSIONS`` pattern, so a per-version replay preserves
  statement order and table lifecycles.  Functions whose DDL hard-codes
  ``'format-version'='3'`` (the V3-only probes, which early-return a
  skip on v2) replay as a single v3 pass.
* The reference's negative probe — ``ALTER TABLE ... ADD PARTITION
  FIELD bucket(4, a, b)`` (iceberg_feature_tests.py:1016-1031) — is
  EXPECTED to be rejected; the golden outcome map encodes that,
  mirroring the support matrix's ``none`` cell for multi-arg
  transforms.  'rejected' means a clean validation error
  (``UnsupportedSQLError`` or ``ValueError``); anything else is
  'error'.
"""

from __future__ import annotations

import ast
import re
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import SparkSession

from iceberg_matrix_spark.sql.facade import IceLiteSQL, UnsupportedSQLError
from iceberg_matrix_spark.sql._replay_common import TestFunctionVisitor, fstring_template
from iceberg_matrix_spark.tables.catalog import IceLiteCatalog

REFERENCE_SUITE = "/root/reference/tests/iceberg_feature_tests.py"

# (func, sql-statement index within the function) -> expected status.
# Every statement not listed must replay 'ok'.
EXPECTED_OUTCOMES = {
    # the multi-arg transform negative probe: measured-unsupported, like
    # Spark/Iceberg themselves (conformance SUPPORT_OVERRIDES 'none')
    ("test_multi_arg_transforms", 2): "rejected",
}


@dataclass
class Op:
    kind: str  # 'sql' | 'append' | 'drop_table'
    sql_index: int | None = None  # position among the function's sql ops
    template: str = ""  # sql
    rows: list | None = None  # append
    cols: list | None = None  # append
    var: str = ""  # append / drop_table target fixture variable


@dataclass
class Extraction:
    groups: dict[str, list[Op]]  # func -> ordered ops
    skipped_nonliteral: int


@dataclass
class Outcome:
    func: str
    version: int
    index: int  # sql-statement index (stable golden key)
    statement: str
    status: str  # 'ok' | 'rejected' | 'error'
    rows: int | None = None
    detail: str = ""
    # 1×1 results (the suite's count(*) / single-value probes) keep the
    # value, so tests can assert the reference's own expected numbers
    scalar: object = None

    def key(self) -> tuple[str, int]:
        return (self.func, self.index)


def extract_ops(path: str = REFERENCE_SUITE) -> Extraction:
    """Pull every literal ``*.sql(...)`` argument — plus the seed
    ``writeTo(...).append()`` writes and ``_drop_table`` helper calls —
    per enclosing test function, in source order.  f-string
    interpolations render as ``{<expr>}`` with the expression unparsed;
    :func:`replay_function` substitutes the known fixture names and
    leaves anything else (JSON braces in SQL literals) untouched."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    groups: dict[str, list[Op]] = {}
    skipped = 0

    template = fstring_template

    class Visitor(TestFunctionVisitor):
        def __init__(self):
            super().__init__()
            self.last_frame: tuple[list, list] | None = None  # createDataFrame literal

        def _ops(self) -> list[Op]:
            return groups.setdefault(self.test_func(), [])

        def visit_Call(self, node):
            nonlocal skipped
            f = node.func
            in_test = self.test_func() is not None
            if isinstance(f, ast.Attribute) and f.attr == "sql" and node.args:
                t = template(node.args[0])
                if t is None:
                    skipped += 1
                elif in_test:
                    ops = self._ops()
                    ops.append(
                        Op("sql",
                           sql_index=sum(o.kind == "sql" for o in ops),
                           template=" ".join(t.split()))
                    )
            elif isinstance(f, ast.Attribute) and f.attr == "createDataFrame":
                try:
                    rows = ast.literal_eval(node.args[0])
                    cols = ast.literal_eval(node.args[1])
                    self.last_frame = (rows, cols)
                except (ValueError, IndexError):
                    pass
            elif isinstance(f, ast.Attribute) and f.attr == "append" and in_test:
                # ...writeTo(<var>).append() — walk the chain for writeTo
                chain = f.value
                while isinstance(chain, ast.Call):
                    cf = chain.func
                    if (
                        isinstance(cf, ast.Attribute)
                        and cf.attr == "writeTo"
                        and chain.args
                        and isinstance(chain.args[0], ast.Name)
                        and self.last_frame
                    ):
                        rows, cols = self.last_frame
                        self._ops().append(
                            Op("append", rows=rows, cols=cols,
                               var=chain.args[0].id)
                        )
                        break
                    chain = cf.value if isinstance(cf, ast.Attribute) else None
            elif (
                isinstance(f, ast.Name)
                and f.id == "_drop_table"
                and in_test
                and len(node.args) == 2
                and isinstance(node.args[1], ast.Name)
            ):
                self._ops().append(Op("drop_table", var=node.args[1].id))
            self.generic_visit(node)

    Visitor().visit(tree)
    return Extraction(groups, skipped)


def _catalog_prefix(ops: list[Op]) -> str:
    """The catalog name the function's statements address (the hadoop
    probe uses ``hadoop_local.``; everything else ``local.``)."""
    for op in ops:
        m = re.search(r"NAMESPACE IF NOT EXISTS (\w+)\.\{ns\}", op.template)
        if m:
            return m.group(1)
    return "local"


def _versions_for(ops: list[Op]) -> list[int]:
    """[2, 3] when the function parameterizes format-version; a single
    [3] pass when its DDL hard-codes ``'format-version'='3'``."""
    if any("{_fmt(version)}" in op.template for op in ops):
        return [2, 3]
    return [3]


class _Specials:
    """Lazily evaluated placeholders that need live table state."""

    def __init__(self, shim: IceLiteSQL, tbl: str):
        self.shim = shim
        self.tbl = tbl
        self.first_snapshot: int | None = None

    def resolve(self, expr: str) -> str | None:
        if expr == "snap1":
            # the reference captures snap1 from its own earlier
            # `.snapshots ORDER BY committed_at` query (first snapshot)
            if self.first_snapshot is None:
                raise RuntimeError("snap1 referenced before snapshots query")
            return str(self.first_snapshot)
        if expr.startswith("_get_latest_snapshot"):
            rows = self.shim.sql(
                f"SELECT snapshot_id FROM {self.tbl}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1"
            ).collect()
            return str(rows[0][0])
        if expr.startswith("datetime.utcnow()"):
            return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        return None  # not a special — leave the braces verbatim

    def observe(self, statement: str, rows) -> None:
        # capture the result the reference binds to snap1
        if re.search(r"\.snapshots ORDER BY committed_at$", statement) and rows:
            self.first_snapshot = rows[0][0]


def replay_function(
    spark: SparkSession,
    catalog: IceLiteCatalog,
    func: str,
    ops: list[Op],
    version: int,
) -> list[Outcome]:
    """One ordered pass of a reference test function's statements."""
    cat_name = _catalog_prefix(ops)
    shim = IceLiteSQL(spark, catalog, name=cat_name)
    ns = f"replay_{uuid.uuid4().hex[:8]}"
    tname = f"t_{uuid.uuid4().hex[:6]}"
    subs = {
        "ns": ns,
        "tname": tname,
        "tbl": f"{cat_name}.{ns}.{tname}",
        "src": f"{cat_name}.{ns}.src_{uuid.uuid4().hex[:6]}",
        "_fmt(version)": str(version),
    }
    specials = _Specials(shim, subs["tbl"])

    def render(template: str) -> str:
        def sub(m: re.Match) -> str:
            expr = m.group(1)
            if expr in subs:
                return subs[expr]
            got = specials.resolve(expr)
            # unknown {..} = literal braces inside the SQL text (JSON
            # arguments to parse_json), not a placeholder
            return m.group(0) if got is None else got

        return re.sub(r"\{([^{}]+)\}", sub, template)

    outcomes = []
    for op in ops:
        if op.kind == "append":
            # the reference's seed write: single-file append of literal rows
            target = shim._resolve(subs.get(op.var, op.var))
            df = spark.createDataFrame(op.rows, op.cols)
            catalog.load_table(target).append(df.coalesce(1))
            continue
        if op.kind == "drop_table":
            # the `_drop_table` helper's statement (its only non-literal
            # piece is the optional PURGE flag, default off)
            shim.sql(f"DROP TABLE IF EXISTS {subs.get(op.var, op.var)}")
            continue
        try:
            stmt = render(op.template)
            result = shim.sql(stmt)
            rows = result.collect() if result is not None else None
            specials.observe(stmt, rows)
            scalar = None
            if rows is not None and len(rows) == 1 and len(rows[0]) == 1:
                scalar = rows[0][0]
            outcomes.append(
                Outcome(func, version, op.sql_index, stmt, "ok",
                        rows=None if rows is None else len(rows),
                        scalar=scalar)
            )
        except (UnsupportedSQLError, ValueError) as exc:
            outcomes.append(
                Outcome(func, version, op.sql_index, op.template, "rejected",
                        detail=str(exc)[:200])
            )
        except Exception as exc:  # noqa: BLE001 — harness classification
            outcomes.append(
                Outcome(func, version, op.sql_index, op.template, "error",
                        detail=f"{type(exc).__name__}: {exc}"[:200])
            )
    return outcomes


def replay_all(
    spark: SparkSession,
    catalog: IceLiteCatalog,
    path: str = REFERENCE_SUITE,
    versions: list[int] | None = None,
) -> dict:
    """Replay every reference test function; summarize against the golden
    outcome map.  ``unexpected`` empty == full verbatim parity.

    ``versions`` restricts each function's format-version matrix (CI-time
    control: the default pytest pass replays every statement once on the
    newest applicable version; the ``slow``-marked test runs the full
    ×{v2,v3} matrix). A function whose own matrix doesn't intersect the
    restriction still replays its LAST (newest) version, so every
    statement is always exercised at least once."""
    import os  # noqa: PLC0415
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    ext = extract_ops(path)
    tasks = []
    for func, ops in ext.groups.items():
        vs = _versions_for(ops)
        if versions is not None:
            vs = [v for v in vs if v in versions] or vs[-1:]
        tasks.extend((func, ops, version) for version in vs)

    # Replay functions concurrently (round 12 suite-budget fix, same
    # design as conformance.run_conformance's probe pool): every
    # function is self-contained (uuid namespace, own tables) and the
    # per-statement work is driver-latency-dominated. Each task gets its
    # OWN catalog under a subdirectory of the caller's warehouse so no
    # catalog-object state is shared across threads; statement ORDER
    # within a function is unchanged (the part the goldens pin).
    type_cat = type(catalog)

    def _one(task: tuple) -> list[Outcome]:
        func, ops, version = task
        cat = type_cat(
            spark, os.path.join(catalog.warehouse, f"{func}_v{version}")
        )
        return replay_function(spark, cat, func, ops, version)

    workers = int(os.environ.get("SPARK_GRAFT_REPLAY_WORKERS", "8"))
    outcomes: list[Outcome] = []
    if workers <= 1:
        for t in tasks:
            outcomes.extend(_one(t))
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            for res in pool.map(_one, tasks):
                outcomes.extend(res)
    unexpected = [
        o for o in outcomes if o.status != EXPECTED_OUTCOMES.get(o.key(), "ok")
    ]
    return {
        "statements_extracted": sum(
            sum(o.kind == "sql" for o in ops) for ops in ext.groups.values()
        ),
        "skipped_nonliteral": ext.skipped_nonliteral,
        "replayed": len(outcomes),
        "ok": sum(o.status == "ok" for o in outcomes),
        "rejected": sum(o.status == "rejected" for o in outcomes),
        "error": sum(o.status == "error" for o in outcomes),
        "unexpected": unexpected,
    }
