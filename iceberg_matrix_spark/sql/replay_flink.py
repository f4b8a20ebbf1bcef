"""Verbatim replay of the reference's Flink suite statements.

The reference's Flink suite (/root/reference/tests/flink_feature_tests.py)
drives a real Flink SQL client: each test function calls
``_run_sql(_prelude(version) + [<literal statements>])`` and asserts on
``CONCAT('MARKX=', ...)`` marker values in the client output
(``_marker`` / ``_marker_values``, :249-271).  This module replays the
bracketed statement lists through
:class:`~iceberg_matrix_spark.sql.facade.IceLiteSQL` — which serves the
Flink dialect (WITH properties, TIMESTAMP(6)/(9), keyword-less ALTERs,
``/*+ OPTIONS(...) */`` hints, backticked ``tbl$meta``) and the session
idiom (``USE CATALOG`` / ``USE db`` / bare table names) — and checks the
markers with the reference's OWN matching rules, re-implemented verbatim
(end-anchored values, echo-empty filtering).

What "golden" means here — and what it deliberately does not:

* The Flink suite measures FLINK's support matrix, which is narrower
  than this engine's: Flink has no DELETE/UPDATE, no transform DDL, no
  partition-evolution syntax, no ref-creating DDL.  Where the reference
  branches into a catalog-API fallback after a Flink parser error, THIS
  engine takes the primary path (the statements succeed), so the golden
  map replays the selected ``_run_sql`` calls (by source-order index)
  that constitute the suite's happy path, and records the divergences
  explicitly in :data:`EXCLUDED` with the reason.
* ``test_branching_tagging`` needs the suite's own out-of-band step —
  tags created through the catalog (``_rest_set_tags``, :1206) — which
  the replay mirrors through the table API between the same two
  statement batches.

Excluded functions (honest scope, each with the replacement evidence):

* the ``_upsert_delete_evidence`` family (equality/position deletes,
  CoW, deletion vectors, :744-784) — the statement lists are built
  inside a helper with control flow (conditional ``SET`` runtime-mode
  switches, same-batch branches), so mechanical extraction can't
  reproduce one faithful list.  The SEMANTICS are served: upsert-mode
  INSERT (write.upsert.enabled + PK → equality delete + append in one
  snapshot) runs the reference's statements in
  ``test_sql_facade.py::test_upsert_mode_insert``, and the delete-file
  observables are conf ``equality-deletes`` / ``deletion-vectors`` /
  ``streaming-upsert``.
* ``test_table_maintenance`` (:1100) — an unbounded datagen streaming
  job polled for an in-job rewrite commit; served by
  ``streaming/compaction.py`` + its tests.
* ``test_nanosecond_timestamps`` (:1480) — Spark SQL timestamp literals
  are microsecond-precision, so the reference's in-engine ns equality
  cannot be expressed; the V3 ``timestamp_ns`` type is measured by conf
  ``timestamp-ns`` through the table API (and TIMESTAMP(9) DDL maps to
  it rather than silently truncating — facade._norm_type).
* catalog round-trips (:1650+) — statements live in a non-test helper;
  catalog integration is measured by conf ``rest-catalog`` /
  ``sql-catalog`` / ``jdbc-catalog`` rows.
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

REFERENCE_SUITE = "/root/reference/tests/flink_feature_tests.py"

# Functions deliberately not replayed -> reason (kept in code so the
# conformance report can show them; see module docstring for detail).
EXCLUDED = {
    "test_write_insert": "streaming late-arrival probe (_submit_streaming)",
    "test_equality_deletes": "helper-built statements with control flow; semantics in test_upsert_mode_insert",
    "test_position_deletes": "helper-built statements with control flow; conf position-deletes/deletion-vectors",
    "test_merge_on_read": "helper-built statements with control flow; conf row-delete-mor",
    "test_copy_on_write": "helper-built statements with control flow; conf row-delete-cow",
    "test_deletion_vectors": "helper-built statements with control flow; conf deletion-vectors",
    "test_table_maintenance": "unbounded streaming job + poll",
    "test_nanosecond_timestamps": "Spark SQL literals are microsecond-precision",
    "test_streaming_read": "unbounded streaming (_submit_streaming)",
    "test_streaming_write": "unbounded streaming (_submit_streaming)",
    "test_cdc_read": "unbounded streaming (_submit_streaming)",
    "test_schema_evolution_mid_stream": "unbounded streaming",
}

# func -> (versions, [(run_sql_index, expected)...], hook)
#   versions: 'both' (the suite's v2/v3 matrix) or 'v3' (early _v3_only)
#   expected: list of marker strings that must ALL be present in that
#       batch's output per the reference's own asserts (cited), or the
#       literal 'ok' for batches the reference only requires to succeed
#   hook: optional name of an out-of-band catalog step to run AFTER that
#       batch (mirrors the reference's _rest_* steps)
GOLDEN: dict[str, dict] = {
    # :529-542 — markers MARKROW=a:1.5 asserted; MARKFV proves a snapshot
    "test_table_creation": {
        "versions": "both",
        "batches": [(0, ["MARKROW=a:1.5", "MARKFV=1"], None)],
    },
    # :557-580
    "test_read_support": {
        "versions": "both",
        "batches": [(0, ["MARKALL=3", "MARKPRED=2", "MARKPROJ=b"], None)],
    },
    # :708-737 — Flink FAILS these (no row-level SQL); this engine serves
    # them, so the replay asserts acceptance — the divergence is in our
    # favor and measured precisely (conf row-update / row-delete-*)
    "test_write_merge_update_delete": {
        "versions": "both",
        "batches": [(0, "ok", None), (1, "ok", None), (2, "ok", None)],
    },
    # :969-981
    "test_schema_evolution": {
        "versions": "both",
        "batches": [(0, ["MARKEVO=alice"], None)],
    },
    # :1005-1026 — MARKWIDE asserted; MARKOLD=1.5 proves the FLOAT value
    # survived the widening
    "test_type_promotion": {
        "versions": "both",
        "batches": [(0, ["MARKWIDE=9999999999", "MARKOLD=1.5"], None)],
    },
    # :1031-1044 (V3 DDL DEFAULT)
    "test_column_default_values": {
        "versions": "v3",
        "batches": [(0, ["MARKDEF=hello"], None)],
    },
    # :1058-1097 — batch 0 captures MARKSNAP (>=2) + MARKNOW=2; batch 1
    # travels to {first} via the snapshot-id hint and must see 1 row
    "test_time_travel": {
        "versions": "both",
        "batches": [(0, ["MARKNOW=2"], None), (1, ["MARKOLD=1"], None)],
    },
    # :1175-1216 — main-branch hint read, CREATE BRANCH DDL (Flink can't,
    # we can), snapshots capture, then tag reads against tags created
    # through the catalog (the suite's _rest_set_tags step, :1206)
    "test_branching_tagging": {
        "versions": "both",
        "batches": [
            (0, ["MARKREF=main:branch", "MARKBR=1"], None),
            (1, "ok", None),
            (2, "ok", "set_tags"),
            (3, ["MARKTAG=1", "MARKT2T=b"], None),
            (4, "ok", None),
        ],
    },
    # :1244-1251 — transform DDL accepted => the suite's early-pass path
    "test_hidden_partitioning": {
        "versions": "both",
        "batches": [(0, "ok", None)],
    },
    # :1312-1325 — ADD PARTITION FIELD accepted => early-pass path
    "test_partition_evolution": {
        "versions": "both",
        "batches": [(0, "ok", None), (1, "ok", None)],
    },
    # :1392-1407
    "test_variant_type": {
        "versions": "v3",
        "batches": [(0, ["MARKVAR=STORED"], None)],
    },
    # :1425-1438
    "test_shredded_variant": {
        "versions": "v3",
        "batches": [(0, ["MARKCNT=1"], None)],
    },
    # :1454-1460 — GEOMETRY column accepted on V3
    "test_geometry_type": {
        "versions": "v3",
        "batches": [(0, "ok", None)],
    },
    # :1529-1541 — V3 row lineage projectable; first-row-id starts at 0
    "test_lineage": {
        "versions": "v3",
        "batches": [(0, ["MARKLIN=0", "MARKLIN=1", "MARKLIN=2"], None)],
    },
    # :1579-1601 — record_count=3 and per-column value/null counts (2
    # columns) in the files manifest
    "test_statistics": {
        "versions": "both",
        "batches": [(0, ["MARKREC=3", "MARKVC=2", "MARKNULL=2"], None)],
    },
    # :1608-1630
    "test_bloom_filters": {
        "versions": "both",
        "batches": [(0, ["MARKCNT=2", "MARKSEL=1"], None)],
    },
}


@dataclass
class Batch:
    index: int  # source-order _run_sql position in the function
    templates: list[str] = field(default_factory=list)


@dataclass
class BatchOutcome:
    func: str
    version: int
    index: int
    status: str  # 'ok' | 'rejected' | 'error'
    out: str = ""  # concatenated stringified result cells
    detail: str = ""


def _marker_values(out: str, prefix: str) -> list[str]:
    """The reference's own matcher, verbatim semantics
    (flink_feature_tests.py:262-271): end-anchored value charset,
    empties dropped."""
    found = re.findall(rf"{prefix}=([A-Za-z0-9_:.,+-]+)", out.replace(" ", ""))
    return [v for v in found if v]


def _marker(out: str, expected: str) -> bool:
    prefix, _, value = expected.partition("=")
    return value in _marker_values(out, prefix)


def extract_batches(path: str = REFERENCE_SUITE) -> dict[str, list[Batch]]:
    """Per test function: each ``_run_sql(...)`` call's bracketed literal
    statements, in source order.  ``_prelude(...)`` contributes nothing
    (SQL-client session/config setup for a remote Flink cluster — catalog
    URI, dml-sync, runtime mode); local list variables (``setup = [...]``,
    ``setup = _prelude(v) + [...]``) are resolved."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    groups: dict[str, list[Batch]] = {}

    template = fstring_template

    def flatten(node: ast.expr, env: dict) -> list[str]:
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
            return flatten(node.left, env) + flatten(node.right, env)
        if isinstance(node, ast.List):
            out = []
            for el in node.elts:
                t = template(el)
                if t is not None:
                    out.append(" ".join(t.split()))
            return out
        if isinstance(node, ast.Name):
            return list(env.get(node.id, []))
        if isinstance(node, ast.Call):  # _prelude(...) — session setup
            return []
        return []

    class Visitor(TestFunctionVisitor):
        def __init__(self):
            super().__init__()
            # local list-variable bindings, per enclosing function
            self.envs: dict[str, dict] = {}

        def _env(self) -> dict:
            key = self._stack[-1] if self._stack else ""
            return self.envs.setdefault(key, {})

        def visit_Assign(self, node):
            if (
                self._stack
                and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
            ):
                env = self._env()
                env[node.targets[0].id] = flatten(node.value, env)
            self.generic_visit(node)

        def visit_Call(self, node):
            func = self.test_func()
            if (
                func
                and isinstance(node.func, ast.Name)
                and node.func.id == "_run_sql"
                and node.args
            ):
                batches = groups.setdefault(func, [])
                batches.append(
                    Batch(len(batches), flatten(node.args[0], self._env()))
                )
            self.generic_visit(node)

    Visitor().visit(tree)
    return groups


def replay_function(
    spark: SparkSession,
    catalog: IceLiteCatalog,
    func: str,
    batches: list[Batch],
    version: int,
) -> list[BatchOutcome]:
    """One version pass of a Flink test function's selected batches."""
    spec = GOLDEN[func]
    by_index = {b.index: b for b in batches}
    shim = IceLiteSQL(spark, catalog, name="test_catalog")
    ns = f"flink_{uuid.uuid4().hex[:8]}"
    # the prelude's session statements, as OUR facade serves them
    shim.sql("USE CATALOG test_catalog")
    shim.sql(f"CREATE DATABASE IF NOT EXISTS {ns}")
    shim.sql(f"USE {ns}")

    names: dict[str, str] = {}
    snaps: list[str] = []
    tbl_for_hook: list = [None]

    def render(template: str) -> str:
        def sub(m: re.Match) -> str:
            expr = m.group(1)
            if expr == "_fmt(version)":
                return str(version)
            if expr == "first":
                # the suite's snaps[0] capture (flink_feature_tests.py:1085)
                if not snaps:
                    raise RuntimeError("{first} referenced before snapshots")
                return snaps[0]
            if re.fullmatch(r"\w+", expr):
                if expr not in names:
                    names[expr] = f"{expr}_{uuid.uuid4().hex[:6]}"
                    tbl_for_hook[0] = tbl_for_hook[0] or names[expr]
                return names[expr]
            return m.group(0)  # literal braces (PARSE_JSON arguments)

        return re.sub(r"\{([^{}]+)\}", sub, template)

    outcomes: list[BatchOutcome] = []
    for index, _expected, hook in spec["batches"]:
        batch = by_index.get(index)
        if batch is None:
            outcomes.append(
                BatchOutcome(func, version, index, "error",
                             detail="batch not found in extraction")
            )
            continue
        cells: list[str] = []
        status, detail = "ok", ""
        for tpl in batch.templates:
            stmt = render(tpl)
            try:
                result = shim.sql(stmt)
            except (UnsupportedSQLError, ValueError) as exc:
                status, detail = "rejected", f"{stmt[:80]} -> {exc}"[:250]
                break
            except Exception as exc:  # noqa: BLE001 — harness classification
                status = "error"
                detail = f"{stmt[:80]} -> {type(exc).__name__}: {exc}"[:250]
                break
            if result is not None:
                for row in result.collect():
                    cells.extend("" if v is None else str(v) for v in row)
        out = "\n".join(cells)
        snaps.extend(_marker_values(out, "MARKSNAP"))
        outcomes.append(BatchOutcome(func, version, index, status, out, detail))
        if hook == "set_tags" and status == "ok":
            # the suite's catalog-side step (_rest_set_tags,
            # flink_feature_tests.py:1206): tag the first two snapshots.
            # A failed hook is a classified outcome, not a harness crash.
            try:
                if len(snaps) < 2:
                    raise RuntimeError(f"expected >=2 MARKSNAP captures, got {snaps}")
                t = catalog.load_table(f"{ns}.{tbl_for_hook[0]}")
                t.create_tag("tag1", snapshot_id=int(snaps[0]))
                t.create_tag("tag2", snapshot_id=int(snaps[1]))
            except Exception as exc:  # noqa: BLE001 — harness classification
                outcomes[-1] = BatchOutcome(
                    func, version, index, "error", out,
                    f"set_tags hook: {type(exc).__name__}: {exc}"[:250],
                )
    return outcomes


def check_function(
    func: str, outcomes: list[BatchOutcome]
) -> list[tuple]:
    """Mismatches between a replay pass and the golden expectations."""
    spec = GOLDEN[func]
    bad: list[tuple] = []
    for (index, expected, _hook), out in zip(spec["batches"], outcomes):
        if out.status != "ok":
            bad.append((func, out.version, index, f"{out.status}: {out.detail}"))
            continue
        if expected == "ok":
            continue
        for marker in expected:
            if not _marker(out.out, marker):
                prefix = marker.partition("=")[0]
                bad.append(
                    (func, out.version, index,
                     f"missing {marker}; saw {_marker_values(out.out, prefix)}")
                )
    return bad


def replay_all(spark: SparkSession, catalog: IceLiteCatalog) -> dict:
    groups = extract_batches()
    mismatches: list[tuple] = []
    replayed = 0
    unaccounted = [
        f for f in groups if f not in GOLDEN and f not in EXCLUDED
    ]
    import os  # noqa: PLC0415
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    tasks = []
    for func, spec in GOLDEN.items():
        if func not in groups:
            mismatches.append((func, None, None, "not found in reference"))
            continue
        versions = [2, 3] if spec["versions"] == "both" else [3]
        tasks.extend((func, version) for version in versions)

    # concurrent function replays (round 12 suite-budget fix — same pool
    # design as sql/replay.py and conformance): every function is
    # namespace-isolated (uuid) and gets its OWN catalog subdirectory,
    # so threads share no catalog object; in-function batch order is
    # unchanged (what the marker goldens pin)
    def _one(task: tuple) -> tuple:
        func, version = task
        cat = type(catalog)(
            spark, os.path.join(catalog.warehouse, f"{func}_v{version}")
        )
        outs = replay_function(spark, cat, func, groups[func], version)
        return func, outs

    workers = int(os.environ.get("SPARK_GRAFT_REPLAY_WORKERS", "8"))
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        for func, outs in pool.map(_one, tasks):
            replayed += len(outs)
            mismatches.extend(check_function(func, outs))
    return {
        "functions": len(GOLDEN),
        "excluded": len(EXCLUDED),
        "unaccounted": unaccounted,
        "batches_replayed": replayed,
        "mismatches": mismatches,
    }
