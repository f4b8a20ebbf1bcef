"""Verbatim replay of the reference's Redshift suite statements.

The reference's Redshift suite (/root/reference/tests/
redshift_feature_tests.py) submits literal statement lists through the
Redshift Data API (``_run_sql([...])``, :150-170) and asserts on
substrings of the concatenated result rows (``"3" in out``,
``"merged" in out and "third" not in out`` …).  This module replays the
same bracketed lists through
:class:`~iceberg_matrix_spark.sql.facade.IceLiteSQL` — which serves the
Redshift dialect (``USING ICEBERG``, VARCHAR/FLOAT4/FLOAT8/DECIMAL
types, ``TABLE PROPERTIES (...)``, ``SHOW TABLE`` DDL readback,
qualified-name MERGE targets, ``VERSION AS OF '<ref>'`` branch reads,
``FOR [SYSTEM_]VERSION/TIME AS OF`` spellings) — and checks the
reference's own substring asserts, cited per entry.

Faithfulness notes:

* ``{_loc(tbl)}`` renders to the empty string, exactly the suite's own
  s3tables mode (``_loc``, :232-239: "S3 Tables determines its own
  location, so the clause is omitted") — the s3buckets LOCATION clause
  names an AWS bucket that does not exist here.
* Redshift is a V2-only engine; every function early-returns
  ``_v3_unsupported`` on v3, so the replay is the suite's own v2 pass.
* Write-mode defaults DIVERGE by design: Redshift's default is
  merge-on-read, this engine's is Iceberg/Spark's copy-on-write.
  ``test_position_deletes`` / ``test_merge_on_read`` read that default
  off the snapshot summary, so they are excluded (the MoR evidence is
  conf ``row-delete-mor`` / ``position-deletes``); ``test_copy_on_write``
  — which REQUESTS CoW via table properties — replays fully, with the
  no-delete-files observable checked through our own metadata, the same
  evidence the suite reads (:946-960).
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

REFERENCE_SUITE = "/root/reference/tests/redshift_feature_tests.py"

# Functions deliberately not replayed -> reason.
EXCLUDED = {
    "test_position_deletes": (
        "observable is Redshift's MoR default; this engine defaults to "
        "Iceberg's CoW — MoR evidence is conf row-delete-mor/position-deletes"
    ),
    "test_merge_on_read": (
        "observable is Redshift's MoR default; conf row-delete-mor covers"
    ),
    "test_time_travel": (
        "attempt literals target snapshots that exist in no engine "
        "(VERSION AS OF 1, timestamps before the first commit); every "
        "spelling is facade-tested with real snapshots"
    ),
    "test_table_maintenance": (
        "statements live in a loop variable (attempts dict); the same "
        "VACUUM/OPTIMIZE/ANALYZE/CALL statements are facade-tested"
    ),
    "test_branching_tagging": (
        "statements live in a loop variable (attempts list); CREATE "
        "BRANCH/TAG and VERSION AS OF '<ref>' are facade-tested"
    ),
    "test_catalog_integration": "AWS external-schema plumbing (env-blocked)",
    # test_read_support's v3 arm reads EMR-built fixture tables
    # (_read_fixture) — env-blocked; its v2 arm IS replayed (GOLDEN)
    "test_aws_glue_catalog": (
        "the feature under test is Glue itself (env-blocked); its "
        "statements are the generic lifecycle already replayed by "
        "test_read_support"
    ),
}

# func -> list of (run_sql_source_index, check, hook)
#   check: ("ok",) | ("contains", [substr...]) | ("omits", [substr...])
#          | ("rejected",)   — 'contains'/'omits' compose when both given
#   hook: optional post-batch observable check
GOLDEN: dict[str, list[tuple]] = {
    # :601-619 — SHOW TABLE reports the DDL back
    "test_table_creation": [
        (0, ("contains", ["USING ICEBERG", "'format-version'='2'"]), None),
        (1, ("ok",), None),
    ],
    # :639-650 — three rows written and read back
    "test_read_support": [
        (0, ("contains", ["3"]), None),
        (1, ("ok",), None),
    ],
    # :659-671 — INSERT VALUES and INSERT SELECT both write
    "test_write_insert": [
        (0, ("contains", ["3"]), None),
        (1, ("ok",), None),
    ],
    # :681-701 — UPDATE/DELETE/MERGE with the qualified-name target;
    # final rows verified by the suite's own substring asserts
    "test_write_merge_update_delete": [
        (0, ("contains", ["updated", "merged"], "omits", ["third"]), None),
        (1, ("ok",), None),
    ],
    # :905-963 — CoW requested via TABLE PROPERTIES and honoured: the
    # UPDATE commits no delete files (the suite's _delete_file_evidence)
    "test_copy_on_write": [
        (0, ("ok",), None),
        (2, ("contains", ["2"]), "no_delete_files"),
        (4, ("ok",), None),
    ],
    # :996-1019
    "test_schema_evolution": [
        (0, ("contains", ["1"]), None),
        (1, ("ok",), None),
    ],
    # :1022-1061 — widening accepted, then narrowing REFUSED (the suite
    # records acceptance as a spec violation); index 1 is the
    # fail-branch DROP, never selected
    "test_type_promotion": [
        (0, ("contains", ["1", "a"]), None),
        (2, ("rejected",), None),
        (3, ("ok",), None),
    ],
    # :1354-1364 — the multi-arg transform negative probe: bucket over
    # two source columns must be rejected (support matrix 'none')
    "test_multi_arg_transforms": [
        (0, ("rejected",), None),
    ],
    # :1234-1259 — transform partitioning at CREATE, pruning filter on
    # the source column, spec reported back by SHOW TABLE
    "test_hidden_partitioning": [
        (0, ("contains", ["PARTITIONED BY", "1"]), None),
        (2, ("ok",), None),
    ],
    # :1293-1343 — ADD at CREATE-time-free table, then REPLACE + DROP
    # FIELD; rows from both specs read together
    "test_partition_evolution": [
        (0, ("contains", ["PARTITIONED BY"]), None),
        (3, ("contains", ["2"]), None),
        (4, ("ok",), None),
    ],
    # :1377-1398 — metrics written on insert; EXPLAIN plans the filter
    "test_statistics": [
        (0, ("ok",), None),
        (1, ("ok",), None),
    ],
    # :1401-1427 — bloom property accepted through TABLE PROPERTIES
    "test_bloom_filters": [
        (0, ("ok",), None),
        (1, ("ok",), None),
    ],
}


@dataclass
class Batch:
    index: int
    templates: list[str] = field(default_factory=list)


@dataclass
class BatchOutcome:
    func: str
    index: int
    status: str  # 'ok' | 'rejected' | 'error'
    out: str = ""  # rows joined the suite's way (" | " cells, newline rows)
    detail: str = ""


def extract_batches(path: str = REFERENCE_SUITE) -> dict[str, list[Batch]]:
    """Per test function: each ``_run_sql([...])`` call's literal
    statement templates, in source order.  Calls whose argument is a
    loop variable (``_run_sql([sql])``) yield an empty batch, keeping
    indices aligned with the source; GOLDEN never selects those."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    groups: dict[str, list[Batch]] = {}

    template = fstring_template

    class Visitor(TestFunctionVisitor):
        def visit_Call(self, node):
            func = self.test_func()
            if (
                func
                and isinstance(node.func, ast.Name)
                and node.func.id == "_run_sql"
                and node.args
            ):
                templates = []
                if isinstance(node.args[0], ast.List):
                    for el in node.args[0].elts:
                        t = template(el)
                        if t is not None:
                            templates.append(" ".join(t.split()))
                batches = groups.setdefault(func, [])
                batches.append(Batch(len(batches), templates))
            self.generic_visit(node)

    Visitor().visit(tree)
    return groups


def replay_function(
    spark: SparkSession,
    catalog: IceLiteCatalog,
    func: str,
    batches: list[Batch],
) -> list[BatchOutcome]:
    """The suite's v2 pass of a Redshift test function's selected batches."""
    spec = GOLDEN[func]
    by_index = {b.index: b for b in batches}
    shim = IceLiteSQL(spark, catalog)
    ns = f"rs_{uuid.uuid4().hex[:8]}"
    shim.sql(f"CREATE NAMESPACE IF NOT EXISTS {ns}")
    names: dict[str, str] = {}

    def render(template: str) -> str:
        def sub(m: re.Match) -> str:
            expr = m.group(1)
            tm = re.fullmatch(r"_table\((\w+)\)", expr)
            if tm:
                var = tm.group(1)
                if var not in names:
                    names[var] = f"{var}_{uuid.uuid4().hex[:6]}"
                return f"{ns}.{names[var]}"
            if re.fullmatch(r"_loc\(\w+\)", expr):
                return ""  # the suite's own s3tables mode (:232-239)
            return m.group(0)

        return re.sub(r"\{([^{}]+)\}", sub, template)

    outcomes: list[BatchOutcome] = []
    for index, _check, hook in spec:
        batch = by_index.get(index)
        if batch is None or not batch.templates:
            outcomes.append(
                BatchOutcome(func, index, "error",
                             detail="batch not found / non-literal")
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
                    cells.append(
                        " | ".join("" if v is None else str(v) for v in row)
                    )
        out = "\n".join(cells)
        if hook == "no_delete_files" and status == "ok":
            # the suite's _delete_file_evidence observable (:946-960):
            # with write.update.mode=copy-on-write the UPDATE must have
            # committed NO delete files
            t = catalog.load_table(f"{ns}.{names['tbl']}")
            snap = t._current_snapshot()
            if snap is not None and snap.delete_files:
                status = "error"
                detail = f"CoW table committed delete files: {snap.delete_files}"
        outcomes.append(BatchOutcome(func, index, status, out, detail))
    return outcomes


def check_function(func: str, outcomes: list[BatchOutcome]) -> list[tuple]:
    spec = GOLDEN[func]
    bad: list[tuple] = []
    for (index, check, _hook), out in zip(spec, outcomes):
        if check[0] == "rejected":
            if out.status != "rejected":
                bad.append((func, index, f"expected rejection, got {out.status}"))
            continue
        if out.status != "ok":
            bad.append((func, index, f"{out.status}: {out.detail}"))
            continue
        i = 0
        while i < len(check):
            kind = check[i]
            if kind == "ok":
                i += 1
                continue
            needles = check[i + 1]
            for needle in needles:
                hit = needle in out.out
                if kind == "contains" and not hit:
                    bad.append((func, index, f"missing {needle!r} in {out.out[:120]!r}"))
                if kind == "omits" and hit:
                    bad.append((func, index, f"forbidden {needle!r} present"))
            i += 2
    return bad


def replay_all(spark: SparkSession, catalog: IceLiteCatalog) -> dict:
    groups = extract_batches()
    mismatches: list[tuple] = []
    replayed = 0
    unaccounted = [
        f for f in groups
        if f not in GOLDEN and f not in EXCLUDED and any(
            b.templates for b in groups[f]
        )
    ]
    for func in GOLDEN:
        if func not in groups:
            mismatches.append((func, None, "not found in reference"))
            continue
        outs = replay_function(spark, catalog, func, groups[func])
        replayed += len(outs)
        mismatches.extend(check_function(func, outs))
    return {
        "functions": len(GOLDEN),
        "excluded": len(EXCLUDED),
        "unaccounted": unaccounted,
        "batches_replayed": replayed,
        "mismatches": mismatches,
    }
