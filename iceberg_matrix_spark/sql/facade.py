"""SQL-string front-end over IceLite tables.

The reference's flagship DML surface is literally ``spark.sql("MERGE INTO
... / UPDATE ... / DELETE FROM ... / INSERT INTO ...")`` against Iceberg
tables (/root/reference/tests/iceberg_feature_tests.py:454,512-529).
IceLite exposes the same operations as API calls
(tables/table.py:548,608,670); this module closes the fidelity gap with a
parse-and-dispatch shim so a user can run the reference's exact statement
shapes unchanged.

Scope is deliberate: the four DML verbs plus the DDL statements the
reference's SQL-driven tests use (CREATE/DROP NAMESPACE, CREATE TABLE
[AS SELECT], DROP TABLE [PURGE], DESCRIBE, SHOW). SELECT statements are
delegated to Spark SQL after substituting catalog identifiers with temp
views over the tables' current snapshots — reads therefore inherit the
full Catalyst plan (pushdown, pruning, AQE), and nothing here re-implements
query execution.

Parsing is a small depth-aware tokenizer (quotes + parens), not a grammar:
statements outside the supported shapes raise ``UnsupportedSQLError``
loudly rather than mis-executing.
"""

from __future__ import annotations

import json
import os
import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.tables.catalog import IceLiteCatalog, NoSuchTableError
from iceberg_matrix_spark.tables.table import IceLiteTable, _physical_type


class UnsupportedSQLError(Exception):
    """Statement shape outside the shim's supported surface."""


# --------------------------------------------------------------- tokenizing


def _scan_top(s: str):
    """Yield (index, char, depth, in_quote) for top-level structure scans."""
    depth, quote = 0, None
    for i, ch in enumerate(s):
        if quote:
            yield i, ch, depth, True
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        yield i, ch, depth, False


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren-depth 0, outside string literals."""
    parts, start = [], 0
    for i, ch, depth, quoted in _scan_top(s):
        if ch == sep and depth == 0 and not quoted:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _find_top_keyword(s: str, kw: str) -> int:
    """Index of the first top-level, unquoted, word-boundary ``kw``; -1.
    One O(|s|) depth/quote scan, not a rescan per candidate match."""
    tops = {i for i, _ch, depth, quoted in _scan_top(s) if depth == 0 and not quoted}
    pat = re.compile(rf"\b{kw}\b", re.IGNORECASE)
    for m in pat.finditer(s):
        if m.start() in tops:
            return m.start()
    return -1


def _take_parens(s: str) -> tuple[str, str]:
    """Given a string starting at '(', return (inner, remainder)."""
    s = s.lstrip()
    if not s.startswith("("):
        raise UnsupportedSQLError(f"expected '(' at: {s[:40]!r}")
    for i, ch, depth, quoted in _scan_top(s):
        if ch == ")" and depth == 0 and not quoted:
            return s[1:i], s[i + 1 :]
    raise UnsupportedSQLError("unbalanced parentheses")


def _rewrite_aliases(expr: str, mapping: dict[str, str]) -> str:
    """Rewrite ``alias.`` qualifiers simultaneously (handles t/s swaps).
    Quote-aware: a literal like ``'tgt.archived'`` is data, not a
    qualifier — rewriting inside it would corrupt the written value."""
    if not mapping:
        return expr
    # longest keys first: the full spelling 'schema.tbl' must win over
    # the short default alias 'tbl' at the same position, or
    # 'schema.tbl.id' would rewrite to 'schema.t.id'
    keys = sorted(mapping, key=len, reverse=True)
    pat = re.compile(
        r"\b(" + "|".join(re.escape(a) for a in keys) + r")\s*\.", re.IGNORECASE
    )
    tops = {i for i, _c, _d, quoted in _scan_top(expr) if not quoted}
    out, last = [], 0
    for m in pat.finditer(expr):
        if m.start() not in tops:
            continue
        out.append(expr[last : m.start()])
        out.append(mapping[m.group(1).lower()] + ".")
        last = m.end()
    out.append(expr[last:])
    return "".join(out)


def _lit_type(v) -> str:
    """Spark DDL type for a CALL-result scalar (bool before int: bool is
    an int subclass)."""
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    return "string"


_IDENT = r"[A-Za-z_][\w.$]*|`[^`]+`(?:\.`?[^`.]+`?)*"

# Engine-dialect type spellings → Spark logical types, so the reference's
# Flink/Redshift/DuckDB ALTER statements run unchanged (VARCHAR,
# flink :975; FLOAT8, redshift :1034).
_TYPE_ALIASES = {
    "varchar": "string",
    "text": "string",
    "float8": "double",
    "float4": "float",
    "real": "float",
    "int8": "bigint",
    "int4": "int",
    "int2": "smallint",
    "integer": "int",
    "long": "bigint",
    "bool": "boolean",
}


def _norm_type(t: str) -> str:
    tl = t.strip().lower()
    # Flink's TIMESTAMP(p) = timestamp without time zone for p<=6;
    # TIMESTAMP(9) is the V3 nanosecond type (flink_feature_tests.py:
    # 1482-1487); other precisions must not silently truncate to micros.
    # Normalized here so EVERY DDL path (CREATE and ALTER ADD/MODIFY)
    # maps it; a raw 'timestamp(6)' committed to metadata makes the table
    # unreadable at the next scan's StructType.fromDDL
    tm = re.fullmatch(r"timestamp\s*\((\d+)\)", tl)
    if tm:
        p = int(tm.group(1))
        if p <= 6:
            return "timestamp_ntz"
        if p == 9:
            return "timestamp_ns"
        raise UnsupportedSQLError(
            f"unsupported TIMESTAMP precision {p} (use <=6 or 9)"
        )
    return _TYPE_ALIASES.get(tl, tl)

# Recognized named arguments per CALL procedure. Checked up front so a
# typo'd argument fails BEFORE the procedure executes (Iceberg validates
# named args at parse time; expire_snapshots must never run first).
_PROC_ARGS: dict[str, set[str]] = {
    "rewrite_data_files": {"table", "strategy", "sort_order", "target_partitions"},
    "expire_snapshots": {"table", "older_than", "retain_last"},
    "remove_orphan_files": {"table", "older_than", "dry_run"},
    "rewrite_manifests": {"table"},
    "rewrite_position_delete_files": {"table"},
    "compute_table_stats": {"table", "columns"},
    # snapshot management (Iceberg's spark procedures surface)
    "rollback_to_snapshot": {"table", "snapshot_id"},
    "rollback_to_timestamp": {"table", "timestamp"},
    "set_current_snapshot": {"table", "snapshot_id"},
    "cherrypick_snapshot": {"table", "snapshot_id"},
    "fast_forward": {"table", "branch", "to"},
    "ancestors_of": {"table", "snapshot_id"},
    "add_files": {"table", "source_table"},
}

# Positional-argument order per procedure (Iceberg's CALL surface accepts
# both `CALL system.rollback_to_snapshot('db.t', 123)` and named args;
# the positional order matches the Iceberg procedure signatures).
_PROC_POSITIONAL: dict[str, list[str]] = {
    "rewrite_data_files": ["table", "strategy", "sort_order"],
    "expire_snapshots": ["table", "older_than", "retain_last"],
    "remove_orphan_files": ["table", "older_than", "dry_run"],
    "rewrite_manifests": ["table"],
    "rewrite_position_delete_files": ["table"],
    "compute_table_stats": ["table", "columns"],
    "rollback_to_snapshot": ["table", "snapshot_id"],
    "rollback_to_timestamp": ["table", "timestamp"],
    "set_current_snapshot": ["table", "snapshot_id"],
    "cherrypick_snapshot": ["table", "snapshot_id"],
    "fast_forward": ["table", "branch", "to"],
    "ancestors_of": ["table", "snapshot_id"],
    "add_files": ["table", "source_table"],
}


class IceLiteSQL:
    """Parse-and-dispatch SQL shim over an :class:`IceLiteCatalog`.

    ``name`` is the catalog prefix stripped from identifiers, so the
    reference's three-part ``local.ns.tbl`` names resolve to this
    catalog's ``ns.tbl`` (iceberg_feature_tests.py:368-375 configures the
    filesystem catalog under the name ``local``).
    """

    def __init__(self, spark: SparkSession, catalog: IceLiteCatalog, name: str = "local"):
        self.spark = spark
        self.catalog = catalog
        self.name = name
        # session current namespace, set by USE <ns> — the Flink/Spark
        # session idiom (flink_feature_tests.py:345-348: USE CATALOG
        # test_catalog; USE test_db; then bare table names throughout).
        # None = bare names are rejected, the pre-round-4 behavior.
        self.default_ns: str | None = None

    # ----------------------------------------------------------- dispatch

    def sql(self, statement: str) -> DataFrame | None:
        """Execute one statement. Queries return a DataFrame; DML/DDL None."""
        stmt = statement.strip().rstrip(";").strip()
        head = stmt.split(None, 2)
        verb = head[0].upper() if head else ""
        two = f"{verb} {head[1].upper()}" if len(head) > 1 else verb
        if verb == "ALTER":
            return self._alter_table(stmt)
        if two in ("CREATE NAMESPACE", "CREATE DATABASE", "CREATE SCHEMA"):
            return self._create_namespace(stmt)
        if two in ("DROP NAMESPACE", "DROP DATABASE", "DROP SCHEMA"):
            return self._drop_namespace(stmt)
        if verb == "USE":
            return self._use(stmt)
        if two == "CREATE TABLE":
            return self._create_table(stmt)
        if two == "DROP TABLE":
            return self._drop_table(stmt)
        if verb == "INSERT":
            return self._insert(stmt)
        if verb == "UPDATE":
            return self._update(stmt)
        if verb == "DELETE":
            return self._delete(stmt)
        if verb == "MERGE":
            return self._merge(stmt)
        if verb in ("SELECT", "WITH", "VALUES"):
            return self._run_select(stmt)
        if verb == "CALL":
            return self._call(stmt)
        if verb in ("DESCRIBE", "DESC"):
            return self._describe(stmt)
        if verb == "SHOW":
            return self._show(stmt)
        if verb in ("VACUUM", "OPTIMIZE", "ANALYZE"):
            return self._maintenance_verb(verb, stmt)
        if verb == "EXPLAIN":
            return self._explain(stmt)
        raise UnsupportedSQLError(f"unsupported statement: {stmt[:60]!r}")

    def _maintenance_verb(self, verb: str, stmt: str) -> DataFrame:
        """The engine-survey maintenance spellings
        (redshift_feature_tests.py:1136-1139): ``VACUUM t`` → orphan-file
        cleanup, ``OPTIMIZE [TABLE] t`` → binpack compaction (also
        ClickHouse's spelling), ``ANALYZE [TABLE] t [COMPUTE
        STATISTICS]`` → NDV statistics — each the same operation its
        CALL system.* procedure runs."""
        from iceberg_matrix_spark.tables import maintenance as maint  # noqa: PLC0415

        m = re.match(
            rf"{verb}\s+(?:TABLE\s+)?({_IDENT})(\s+COMPUTE\s+STATISTICS)?\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise UnsupportedSQLError(stmt)
        if m.group(2) and verb != "ANALYZE":
            # "VACUUM t COMPUTE STATISTICS" reads as a stats request — it
            # must never silently run a destructive file cleanup
            raise UnsupportedSQLError(
                f"COMPUTE STATISTICS is an ANALYZE clause, not {verb}"
            )
        t = self.table(m.group(1))
        if verb == "VACUUM":
            removed = maint.remove_orphan_files(t, dry_run=False)
            result: dict = {"orphan_file_location_count": len(removed)}
        elif verb == "OPTIMIZE":
            result = dict(maint.rewrite_data_files(t))
        else:
            result = dict(maint.compute_table_statistics(t))
        return self._result_df(result)

    def _result_df(self, result: dict) -> DataFrame:
        """One-row frame from a procedure result dict (shared by the CALL
        surface and the VACUUM/OPTIMIZE/ANALYZE verb spellings, so both
        spellings of an operation return identically-shaped rows)."""
        row = {
            k: (v if isinstance(v, (bool, int, float, str)) or v is None else json.dumps(v))
            for k, v in sorted(result.items())
        }
        return local_df(
            self.spark,
            [tuple(row.values())],
            ", ".join(f"`{k}` {_lit_type(v)}" for k, v in row.items()),
        )

    def _explain(self, stmt: str) -> DataFrame:
        """EXPLAIN SELECT ... — the Redshift suite's planner probe
        (redshift_feature_tests.py:1386). Returns Spark's plan as a
        1-column frame, after the same identifier substitution as any
        read."""
        m = re.match(r"EXPLAIN\s+(EXTENDED\s+|FORMATTED\s+)?(.*)$", stmt, re.I | re.S)
        if not m:
            raise UnsupportedSQLError(stmt)
        body = m.group(2).strip()
        if not re.match(r"(SELECT|WITH|VALUES)\b", body, re.I):
            raise UnsupportedSQLError(f"EXPLAIN supports queries only: {body[:40]!r}")
        mode = (m.group(1) or "simple").strip().lower()
        df = self._run_select(body)
        jmode = self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            {"extended": "extended", "formatted": "formatted"}.get(mode, "simple")
        )
        plan = df._jdf.queryExecution().explainString(jmode)
        return local_df(self.spark, [(plan,)], "plan string")

    # -------------------------------------------------------- identifiers

    def _table_exists(self, ident: str) -> bool:
        try:
            return self.catalog.table_exists(self._resolve(ident))
        except UnsupportedSQLError:
            return False

    def _resolve(self, ident: str) -> str:
        parts = [p.strip("`") for p in ident.strip().split(".")]
        if len(parts) >= 3 and parts[0].lower() == self.name.lower():
            parts = parts[1:]
        if len(parts) == 1 and self.default_ns:
            # bare names resolve in the USE'd namespace (Flink/Spark
            # session semantics, flink_feature_tests.py:345-348)
            parts = [self.default_ns, parts[0]]
        if len(parts) < 2:
            raise UnsupportedSQLError(
                f"identifier must be [{self.name}.]namespace.table: {ident!r}"
            )
        joined = ".".join(parts)
        if not self.catalog.table_exists(joined):
            # identifiers are case-insensitive everywhere in the facade
            # (Spark SQL semantics) — canonicalize against the catalog
            lower = joined.lower()
            for ns in self.catalog.list_namespaces():
                for tbl in self.catalog.list_tables(ns):
                    if f"{ns}.{tbl}".lower() == lower:
                        return f"{ns}.{tbl}"
        return joined

    def _resolve_ns(self, ident: str) -> str:
        parts = [p.strip("`") for p in ident.strip().split(".")]
        if len(parts) >= 2 and parts[0].lower() == self.name.lower():
            parts = parts[1:]
        return ".".join(parts)

    def table(self, ident: str) -> IceLiteTable:
        return self.catalog.load_table(self._resolve(ident))

    # ------------------------------------------------------------ queries

    def _view_name(self, identifier: str, suffix: str = "") -> str:
        # the readable mangling alone can collide ("a.b_c" vs "a_b.c");
        # a short digest of the exact identifier disambiguates
        import hashlib  # noqa: PLC0415

        digest = hashlib.md5((identifier + suffix).encode()).hexdigest()[:8]
        return "icelite_" + re.sub(r"\W", "_", identifier + suffix) + "_" + digest

    # Shared snapshot/timestamp/ref view builders: every dialect spelling
    # of the same read (VERSION AS OF / AT (VERSION =>) / OPTIONS hint /
    # suffix identifier) must resolve through ONE implementation so the
    # semantics and error contract can't drift between spellings.

    def _snapshot_view(self, ident: str, val: str) -> str:
        raw = str(val).strip()
        bare = raw.strip("'")
        if raw.startswith("'") and raw.endswith("'") and re.fullmatch(
            r"[\w.-]+", bare
        ):
            # Iceberg Spark semantics: a QUOTED VERSION AS OF value is a
            # REF name first (branch or tag — the Redshift suite's
            # branch-read spelling, redshift_feature_tests.py:1172); a
            # ref literally named '123' wins over snapshot id 123. Only
            # when no such ref exists does an all-digit string fall back
            # to a snapshot id.
            t = self.catalog.load_table(ident)
            r = t.meta.refs.get(bare)
            if r is not None:
                return self._ref_read_view(ident, r.type, bare)
            if not bare.isdigit():
                raise UnsupportedSQLError(f"unknown ref {bare!r} on {ident}")
        try:
            sid = int(bare)
        except ValueError:
            raise UnsupportedSQLError(
                f"snapshot id must be an integer or a quoted ref name: {val!r}"
            ) from None
        view = self._view_name(ident, f"_v{sid}")
        self.catalog.load_table(ident).df(snapshot_id=sid).createOrReplaceTempView(view)
        return view

    def _timestamp_view(self, ident: str, val: str) -> str:
        try:
            dt = datetime.fromisoformat(str(val).strip().strip("'"))
        except ValueError:
            raise UnsupportedSQLError(
                f"time-travel timestamp must be ISO format: {val!r}"
            ) from None
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        ms = int(dt.timestamp() * 1000)
        view = self._view_name(ident, f"_t{ms}")
        self.catalog.load_table(ident).df(
            as_of_timestamp_ms=ms
        ).createOrReplaceTempView(view)
        return view

    def _ref_read_view(self, ident: str, kind: str, refname: str) -> str:
        t = self.catalog.load_table(ident)
        r = t.meta.refs.get(refname)
        # "main" is implicitly a branch even before refs materialize
        if not (kind == "branch" and refname == "main"):
            if r is None:
                raise UnsupportedSQLError(f"unknown {kind} {refname!r} on {ident}")
            if r.type != kind:
                raise UnsupportedSQLError(
                    f"{refname!r} on {ident} is a {r.type}, referenced as {kind}"
                )
        view = self._view_name(ident, f"_r_{kind}_{refname}")
        t.df(ref=refname).createOrReplaceTempView(view)
        return view

    def _sub_unquoted(self, text: str, pat: re.Pattern, repl) -> str:
        """re.sub that skips matches inside string literals — substituting
        a table name inside ``WHERE v = 'ns.t'`` would silently corrupt
        the literal. ``repl`` is a function of the match."""
        out, last = [], 0
        tops = {
            i for i, _c, _d, quoted in _scan_top(text) if not quoted
        }
        for m in pat.finditer(text):
            if m.start() not in tops:
                continue
            out.append(text[last : m.start()])
            out.append(repl(m))
            last = m.end()
        out.append(text[last:])
        return "".join(out)

    def _substitute_views(self, text: str) -> str:
        """Register a temp view per referenced catalog table; rewrite names.

        Time travel: ``tbl VERSION AS OF <snapshot-id>`` and
        ``tbl TIMESTAMP AS OF '<ts>'`` (iceberg_feature_tests.py:820)
        resolve to snapshot-pinned views before the plain-name pass.
        All passes are quote-aware: identifiers inside string literals
        stay untouched.

        Identifier-driven: dotted tokens are extracted from the statement
        first and only those that name catalog tables get the regex
        passes — O(#referenced tables × |stmt|), not
        O(|catalog| × |stmt|); a thousand-table catalog costs one set
        lookup per token, not a thousand regex scans."""
        # lowercase → canonical spelling, so NS.T / ns.t both resolve (the
        # substitution passes below are compiled with re.I; the gate must
        # be case-insensitive too)
        known = {
            f"{ns}.{tbl}".lower(): f"{ns}.{tbl}"
            for ns in self.catalog.list_namespaces()
            for tbl in self.catalog.list_tables(ns)
        }
        # ClickHouse's path table function (clickhouse_feature_tests.py:
        # 189,209: SELECT ... FROM icebergLocal('<table dir>')) — the only
        # engine dialect in the reference that addresses a table by
        # LOCATION instead of catalog identifier. Resolved through the
        # same read-only location ctor the path-based scan uses, so MoR
        # deletes / schema evolution / type promotion behave identically
        # to a catalog read (the exact features the reference's ClickHouse
        # suite checks through this spelling, :243-470). DuckDB's
        # path spelling ``iceberg_scan('<path>')``
        # (duckdb_feature_tests.py:11) is the same shape.
        # ClickHouse's trailing output-format clause (``... FORMAT TSV``,
        # clickhouse_feature_tests.py:255). Wire formatting only — it
        # never changes WHICH rows come back, so accepting-and-ignoring
        # cannot mis-execute; the caller renders the DataFrame however it
        # likes. Restricted to known ClickHouse format names so another
        # dialect's FORMAT keyword is never silently swallowed.
        fm = re.search(r"\bFORMAT\s+(\w+)\s*$", text, re.I)
        if fm and fm.group(1).upper() in {
            "TSV", "TABSEPARATED", "CSV", "CSVWITHNAMES", "JSON",
            "JSONEACHROW", "PRETTY", "VALUES", "VERTICAL",
        }:
            text = text[: fm.start()].rstrip()

        # ClickHouse's time-travel spelling for path reads: a trailing
        # ``SETTINGS iceberg_snapshot_id=<id>`` clause
        # (clickhouse_feature_tests.py:601-604). Parsed here, applied to
        # the path-function views below; any other SETTINGS key — or a
        # pin on a statement with no path read — is rejected rather than
        # silently ignored (ignoring a time-travel request would return
        # CURRENT data labeled as historical). The end anchor keeps
        # string literals safe: a quoted literal always ends in a quote.
        snapshot_pin: int | None = None
        sm = re.search(r"\bSETTINGS\s+(\w+)\s*=\s*(\d+)\s*$", text, re.I)
        if sm:
            if sm.group(1).lower() != "iceberg_snapshot_id":
                raise UnsupportedSQLError(
                    f"unsupported SETTINGS key: {sm.group(1)!r}"
                )
            snapshot_pin = int(sm.group(2))
            text = text[: sm.start()].rstrip()
        pin_used = False

        def _path_func_view(m: re.Match) -> str:
            nonlocal pin_used
            path, extra = m.group(2), (m.group(3) or "").strip(" ,")
            # DuckDB's allow_moved_paths flag is a no-op here (IceLite
            # metadata stores absolute paths that are never relocated);
            # any OTHER extra argument is rejected rather than silently
            # dropped — dropping a read option would mis-execute.
            if extra and not re.fullmatch(
                r"allow_moved_paths\s*=>\s*(true|false)", extra, re.I
            ):
                raise UnsupportedSQLError(
                    f"unsupported {m.group(1)} argument(s): {extra!r}"
                )
            t = IceLiteTable(self.spark, path)
            view = self._view_name(path, "_pathfn")
            t.df(snapshot_id=snapshot_pin).createOrReplaceTempView(view)
            pin_used = snapshot_pin is not None
            return view

        text = self._sub_unquoted(
            text,
            re.compile(
                r"\b(icebergLocal|iceberg_scan)\s*\(\s*'([^']+)'\s*(,[^)]*)?\)",
                re.I,
            ),
            _path_func_view,
        )
        if snapshot_pin is not None and not pin_used:
            raise UnsupportedSQLError(
                "SETTINGS iceberg_snapshot_id applies to "
                "icebergLocal()/iceberg_scan() path reads only"
            )

        # DuckDB's catalog introspection function duckdb_tables()
        # (duckdb_feature_tests.py:275-277: count tables per schema_name)
        def _duckdb_tables_view(_m: re.Match) -> str:
            rows = [
                (ns, t)
                for ns in self.catalog.list_namespaces()
                for t in self.catalog.list_tables(ns)
            ]
            view = self._view_name("__duckdb_tables__")
            local_df(
                self.spark, rows, "schema_name string, table_name string"
            ).createOrReplaceTempView(view)
            return view

        text = self._sub_unquoted(
            text,
            re.compile(r"\bduckdb_tables\s*\(\s*\)", re.I),
            _duckdb_tables_view,
        )

        tops = {i for i, _c, _d, quoted in _scan_top(text) if not quoted}
        referenced: set[str] = set()
        # trailing segments may start with a digit (ns.2024data); the
        # leading segment's letter-start anchor keeps numeric literals
        # (1.5) from matching
        for m in re.finditer(r"\b[A-Za-z_][\w$]*(?:\.[\w$]+)+", text):
            if m.start() not in tops:
                continue
            # cut a Trino-style $metadata suffix before matching (tbl$snapshots)
            parts = m.group(0).split("$")[0].split(".")
            if parts[0].lower() == self.name.lower():
                parts = parts[1:]
            for k in range(2, len(parts) + 1):
                prefix = ".".join(parts[:k]).lower()
                if prefix in known:
                    referenced.add(known[prefix])
        if self.default_ns:
            # bare names after USE <ns> (Flink session idiom): only
            # tokens that name an actual table in the current namespace
            # count — keywords/columns can't collide unless the user
            # names a column after a table, the same ambiguity Spark's
            # own current-database resolution has
            ns_tables = {
                t.lower(): f"{self.default_ns}.{t}"
                for t in self.catalog.list_tables(self.default_ns)
            }
            for m in re.finditer(r"\b[A-Za-z_]\w*", text):
                if m.start() in tops and m.group(0).lower() in ns_tables:
                    referenced.add(ns_tables[m.group(0).lower()])
        for ident in sorted(referenced):
                spellings = [
                    rf"\b(?:{re.escape(self.name)}\.)?{re.escape(ident)}"
                ]
                ns_part, _, tbl_part = ident.rpartition(".")
                if self.default_ns and ns_part.lower() == self.default_ns.lower():
                    # the bare spelling; the lookbehind keeps it from
                    # matching the tail of some_other_ns.tbl
                    spellings.append(rf"(?<![\w.$]){re.escape(tbl_part)}")
                base = rf"(?:{'|'.join(spellings)})"

                # metadata-table suffix FIRST (the plain-name pass below
                # would otherwise swallow the base name out of
                # ``ns.tbl.snapshots``) — the reference's
                # SELECT ... FROM {tbl}.snapshots / .files / ... idiom
                # (iceberg_feature_tests.py:394-398,815,1053-1068)
                def _meta_view(m: re.Match, _ident=ident) -> str:
                    from iceberg_matrix_spark.tables import (  # noqa: PLC0415
                        metadata_tables as mt,
                    )

                    suffix = m.group(1).lower()
                    view = self._view_name(_ident, f"_m_{suffix}")
                    getattr(mt, suffix)(
                        self.catalog.load_table(_ident)
                    ).createOrReplaceTempView(view)
                    return view

                # "." is the Spark/Iceberg spelling; "$" is the Trino/
                # Athena spelling the reference's engine survey probes
                # (redshift_feature_tests.py:1096)
                text = self._sub_unquoted(
                    text,
                    re.compile(
                        base
                        + r"[.$](snapshots|all_data_files|all_delete_files|all_files|"
                        r"data_files|delete_files|files|"
                        r"partitions|refs|history|metadata_log_entries|"
                        r"statistics|manifests)\b",
                        re.I,
                    ),
                    _meta_view,
                )

                # DuckDB's table-function spellings
                # (duckdb_feature_tests.py:346,449): iceberg_metadata(t)
                # — per-file rows with content 'EXISTING' /
                # 'POSITION_DELETES' / 'EQUALITY_DELETES', lowercase
                # file_format, record_count — and iceberg_snapshots(t)
                def _func_view(m: re.Match, _ident=ident) -> str:
                    func = m.group(1).lower()
                    t = self.catalog.load_table(_ident)
                    view = self._view_name(_ident, f"_f_{func}")
                    if func == "iceberg_snapshots":
                        from iceberg_matrix_spark.tables import (  # noqa: PLC0415
                            metadata_tables as mt,
                        )

                        mt.snapshots(t).createOrReplaceTempView(view)
                        return view
                    snap = t._current_snapshot()
                    rows = []
                    if snap is not None:
                        for f in snap.data_files:
                            rows.append(
                                (f.path, "EXISTING", "parquet", f.record_count)
                            )
                        for d in snap.delete_files:
                            content = (
                                "POSITION_DELETES"
                                if d.content == 1
                                else "EQUALITY_DELETES"
                            )
                            rows.append(
                                (d.path, content, d.file_format.lower(), d.record_count)
                            )
                    local_df(
                        self.spark,
                        rows,
                        "file_path string, content string, "
                        "file_format string, record_count long",
                    ).createOrReplaceTempView(view)
                    return view

                text = self._sub_unquoted(
                    text,
                    re.compile(
                        r"(iceberg_metadata|iceberg_snapshots)\s*\(\s*"
                        rf"(?:{re.escape(self.name)}\.)?{re.escape(ident)}\s*\)",
                        re.I,
                    ),
                    _func_view,
                )

                # DuckDB's AT (VERSION => N) / AT (TIMESTAMP => 'ts')
                # time-travel spelling (duckdb_feature_tests.py:453)
                def _at_view(m: re.Match, _ident=ident) -> str:
                    kind, val = m.group(1).upper(), m.group(2).strip()
                    if kind == "VERSION":
                        return self._snapshot_view(_ident, val)
                    return self._timestamp_view(_ident, val)

                text = self._sub_unquoted(
                    text,
                    re.compile(
                        base
                        + r"\s+AT\s*\(\s*(VERSION|TIMESTAMP)\s*=>\s*([^)]+)\)",
                        re.I,
                    ),
                    _at_view,
                )

                # Flink's read-hint spelling: FROM tbl /*+ OPTIONS(
                # 'snapshot-id'='N' | 'branch'='b' | 'tag'='t' |
                # 'start-tag'='a','end-tag'='b') */
                # (flink_feature_tests.py:1082,1185,1209-1211)
                def _hint_view(m: re.Match, _ident=ident) -> str:
                    opts = dict(
                        re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group(1))
                    )
                    t = self.catalog.load_table(_ident)
                    unknown = set(opts) - {
                        "snapshot-id", "branch", "tag", "start-tag", "end-tag",
                    }
                    if unknown:
                        raise UnsupportedSQLError(
                            f"unsupported OPTIONS hint keys: {sorted(unknown)}"
                        )
                    # exactly ONE read selector: snapshot-id / branch /
                    # tag / the start-tag+end-tag pair. Before this
                    # check, OPTIONS('snapshot-id'=..,'branch'=..)
                    # silently read the snapshot and IGNORED the branch
                    # — ambiguous hints must reject, not guess (the
                    # OPTIONS fuzz, round 7; Flink validates the same).
                    selectors = [
                        s
                        for s in (
                            ["snapshot-id"] if "snapshot-id" in opts else [],
                            ["branch"] if "branch" in opts else [],
                            ["tag"] if "tag" in opts else [],
                            ["start-tag/end-tag"]
                            if ("start-tag" in opts or "end-tag" in opts)
                            else [],
                        )
                        if s
                    ]
                    if len(selectors) > 1:
                        raise UnsupportedSQLError(
                            "conflicting OPTIONS hint selectors: "
                            + ", ".join(s[0] for s in selectors)
                        )
                    if "start-tag" in opts or "end-tag" in opts:
                        if not ("start-tag" in opts and "end-tag" in opts):
                            raise UnsupportedSQLError(
                                "incremental hint needs BOTH start-tag and end-tag"
                            )
                        ref_map = t.meta.refs
                        for k in ("start-tag", "end-tag"):
                            r = ref_map.get(opts[k])
                            if r is None:
                                raise UnsupportedSQLError(
                                    f"unknown tag {opts[k]!r} on {_ident}"
                                )
                            if r.type != "tag":
                                # a branch head MOVES — an incremental
                                # range between branches is not the
                                # tag-to-tag contract; reject, don't guess
                                raise UnsupportedSQLError(
                                    f"{opts[k]!r} on {_ident} is a "
                                    f"{r.type}, hinted as tag"
                                )
                        start = ref_map[opts["start-tag"]].snapshot_id
                        end = ref_map[opts["end-tag"]].snapshot_id
                        view = self._view_name(_ident, f"_inc{start}_{end}")
                        t.read_incremental(start, end).createOrReplaceTempView(view)
                        return view
                    if "snapshot-id" in opts:
                        return self._snapshot_view(_ident, opts["snapshot-id"])
                    if not opts:
                        raise UnsupportedSQLError("empty OPTIONS hint")
                    kind = "branch" if "branch" in opts else "tag"
                    return self._ref_read_view(_ident, kind, opts[kind])

                text = self._sub_unquoted(
                    text,
                    re.compile(
                        base + r"\s*/\*\+\s*OPTIONS\s*\(([^)]*)\)\s*\*/", re.I
                    ),
                    _hint_view,
                )

                # branch/tag suffix reads — the reference's
                # SELECT ... FROM {tbl}.branch_<name> / {tbl}.tag_<name>
                # idiom (iceberg_feature_tests.py:895-898). Must run before
                # the plain-name pass, which would otherwise swallow the
                # base name and silently read `main` — wrong DATA, not an
                # error.
                def _ref_view(m: re.Match, _ident=ident) -> str:
                    return self._ref_read_view(_ident, m.group(1).lower(), m.group(2))

                text = self._sub_unquoted(
                    text,
                    re.compile(base + r"\.(branch|tag)_(\w+)", re.I),
                    _ref_view,
                )

                def _tt_view(m: re.Match, _ident=ident) -> str:
                    return self._snapshot_view(_ident, m.group(1))

                # VERSION AS OF plus the Redshift/engine-survey spellings
                # FOR [SYSTEM_]VERSION AS OF (redshift_feature_tests.py:
                # 1091-1097); the value is a snapshot id OR a quoted ref
                # name (Iceberg Spark semantics; the Redshift suite's
                # branch-read spelling, :1172) — _snapshot_view dispatches
                text = self._sub_unquoted(
                    text,
                    re.compile(
                        base
                        + r"\s+(?:FOR\s+)?(?:SYSTEM_)?VERSION\s+AS\s+OF\s+"
                        r"(\d+|'[\w.-]+')",
                        re.I,
                    ),
                    _tt_view,
                )

                def _ts_view(m: re.Match, _ident=ident) -> str:
                    return self._timestamp_view(_ident, m.group(1))

                # TIMESTAMP AS OF plus FOR [SYSTEM_TIME|TIMESTAMP] AS OF
                text = self._sub_unquoted(
                    text,
                    re.compile(
                        base
                        + r"\s+(?:FOR\s+)?(?:SYSTEM_TIME|TIMESTAMP)"
                        r"\s+AS\s+OF\s+(?:TIMESTAMP\s+)?'([^']+)'",
                        re.I,
                    ),
                    _ts_view,
                )

                def _plain_view(_m: re.Match, _ident=ident) -> str:
                    view = self._view_name(_ident)
                    t = self.catalog.load_table(_ident)
                    # Hidden-column semantics for V3 row lineage: _row_id /
                    # _last_updated_sequence_number resolve only when the
                    # statement references them (Spark's metadata-column
                    # rule; the reference reads them with a plain SELECT,
                    # iceberg_feature_tests.py:1575-1580) — SELECT * stays
                    # lineage-free. V2 leaves them out, so the reference's
                    # V2 expectation (unresolved column) holds too.
                    # quote-aware like every other scan pass: a string
                    # literal mentioning _row_id must not change the
                    # SELECT * result shape
                    lineage_tops = {
                        i for i, _c, _d, q in _scan_top(text) if not q
                    }
                    wants_lineage = t.format_version >= 3 and any(
                        mm.start() in lineage_tops
                        for c in ("_row_id", "_last_updated_sequence_number")
                        for mm in re.finditer(rf"\b{c}\b", text)
                    )
                    t.df(with_lineage=wants_lineage).createOrReplaceTempView(view)
                    return view

                text = self._sub_unquoted(
                    text, re.compile(base + r"\b", re.I), _plain_view
                )
        return text

    def _run_select(self, stmt: str) -> DataFrame:
        return self.spark.sql(self._substitute_views(stmt))

    def _describe(self, stmt: str) -> DataFrame:
        m = re.match(rf"(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?({_IDENT})\s*$", stmt, re.I)
        if not m:
            raise UnsupportedSQLError(stmt)
        rows = self.catalog.describe(self._resolve(m.group(1)))
        return local_df(self.spark, rows, "col_name string, data_type string")

    def _show(self, stmt: str) -> DataFrame:
        nm = re.match(
            rf"SHOW\s+NAMESPACES(?:\s+(?:IN|FROM)\s+({_IDENT}))?\s*$", stmt, re.I
        )
        if nm:
            # SHOW NAMESPACES IN <cat> (iceberg_feature_tests.py:1129-1131)
            if nm.group(1) and nm.group(1).strip("`") != self.name:
                raise UnsupportedSQLError(
                    f"unknown catalog {nm.group(1)!r} (this is {self.name!r})"
                )
            return local_df(
                self.spark,
                [(n,) for n in self.catalog.list_namespaces()],
                "namespace string",
            )
        m = re.match(rf"SHOW\s+TABLES\s+(?:IN|FROM)\s+({_IDENT})\s*$", stmt, re.I)
        if m:
            ns = self._resolve_ns(m.group(1))
            return local_df(
                self.spark,
                [(ns, t) for t in self.catalog.list_tables(ns)],
                "namespace string, tableName string",
            )
        m = re.match(rf"SHOW\s+TBLPROPERTIES\s+({_IDENT})\s*$", stmt, re.I)
        if m:
            # the reference reads bloom-filter props back through this
            # exact statement (iceberg_feature_tests.py:1097)
            props = self.table(m.group(1)).properties
            return local_df(
                self.spark,
                sorted((k, str(v)) for k, v in props.items()),
                "key string, value string",
            )
        m = re.match(
            rf"SHOW\s+(?:CREATE\s+)?TABLE\s+({_IDENT})\s*$", stmt, re.I
        )
        if m:
            # DDL readback: Redshift's SHOW TABLE (the suite greps it for
            # 'USING ICEBERG', 'format-version' and 'PARTITIONED BY',
            # redshift_feature_tests.py:604-610,1260) / Spark's SHOW
            # CREATE TABLE — one synthesized CREATE statement per row set
            ident = self._resolve(m.group(1))
            t = self.catalog.load_table(ident)
            cols = ", ".join(
                f"{f.name} {f.type}" for f in t.meta.current_schema.fields
            )
            ddl = f"CREATE TABLE {self.name}.{ident} ({cols}) USING ICEBERG"
            if t.meta.partition_spec:
                # canonical spec strings, not the user's raw spelling —
                # 'BUCKET( 4 , id )' reads back as 'bucket(4, id)'
                # (found by the round-9 CREATE TABLE grammar fuzz)
                from iceberg_matrix_spark.tables.transforms import (  # noqa: PLC0415
                    parse_transform,
                )

                spec = ", ".join(
                    parse_transform(s).spec_string()
                    for s in t.meta.partition_spec
                )
                ddl += f" PARTITIONED BY ({spec})"
            props = {
                "format-version": str(t.format_version),
                **{k: str(v) for k, v in t.properties.items()},
            }
            ddl += " TBLPROPERTIES (" + ", ".join(
                f"'{k}'='{v}'" for k, v in sorted(props.items())
            ) + ")"
            return local_df(self.spark, [(ddl,)], "createtab_stmt string")
        raise UnsupportedSQLError(stmt)

    # --------------------------------------------------------------- DDL

    def _create_namespace(self, stmt: str) -> None:
        # DATABASE/SCHEMA are the Flink/Spark synonyms for NAMESPACE
        # (flink_feature_tests.py:347: CREATE DATABASE IF NOT EXISTS)
        m = re.match(
            rf"CREATE\s+(?:NAMESPACE|DATABASE|SCHEMA)\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise UnsupportedSQLError(stmt)
        self.catalog.create_namespace(self._resolve_ns(m.group(2)))

    def _drop_namespace(self, stmt: str) -> None:
        m = re.match(
            rf"DROP\s+(?:NAMESPACE|DATABASE|SCHEMA)\s+(IF\s+EXISTS\s+)?({_IDENT})\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise UnsupportedSQLError(stmt)
        ns = self._resolve_ns(m.group(2))
        if m.group(1) and ns not in self.catalog.list_namespaces():
            return
        self.catalog.drop_namespace(ns)

    def _use(self, stmt: str) -> None:
        """``USE CATALOG <cat>`` / ``USE <ns>`` — session state, the
        Flink SQL-client prelude (flink_feature_tests.py:345-348). After
        ``USE <ns>``, bare table names resolve inside that namespace in
        every statement path (DML, DDL and reads)."""
        m = re.match(rf"USE\s+(CATALOG\s+)?({_IDENT})\s*$", stmt, re.I)
        if not m:
            raise UnsupportedSQLError(stmt)
        token = m.group(2).strip().strip("`")
        if m.group(1):
            if token.lower() != self.name.lower():
                raise UnsupportedSQLError(
                    f"unknown catalog {token!r}; this session serves {self.name!r}"
                )
            return
        ns = self._resolve_ns(token)
        if ns not in self.catalog.list_namespaces():
            raise UnsupportedSQLError(f"USE: no such namespace {ns!r}")
        self.default_ns = ns

    def _parse_tblproperties(self, text: str) -> dict[str, str]:
        return {
            k: v
            for k, v in re.findall(r"'([^']+)'\s*=\s*'([^']*)'", text)
        }

    def _create_table(self, stmt: str) -> None:
        m = re.match(
            rf"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*(.*)$",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise UnsupportedSQLError(stmt)
        if_not_exists, ident, rest = m.group(1), self._resolve(m.group(2)), m.group(3)
        if if_not_exists and self.catalog.table_exists(ident):
            return

        schema_ddl = None
        rest = rest.strip()
        if rest.startswith("("):
            schema_ddl, rest = _take_parens(rest)

        # Every clause (PARTITIONED BY / TBLPROPERTIES / WITH / USING)
        # belongs to the statement HEAD, before any top-level AS — search
        # only there, so a CTAS body's literals ('PARTITIONED BY',
        # 'USING parquet') and CTEs (`AS WITH x AS (...)`) are never
        # touched.
        as_pos = _find_top_keyword(rest, "AS")
        head, body = (rest, "") if as_pos < 0 else (rest[:as_pos], rest[as_pos:])

        partition_by = None
        pm = re.search(r"\bPARTITIONED\s+BY\b", head, re.I)
        if pm:
            inner, after = _take_parens(head[pm.end() :])
            partition_by = _split_top(inner)
            head = head[: pm.start()] + after

        # Explicit table location — the ClickHouse suite's fixture DDL
        # (clickhouse_feature_tests.py:202-206: CREATE TABLE ... USING
        # iceberg LOCATION '<dir>'), so the path table function can
        # address the same table by directory afterwards.
        location = None
        lm = re.search(r"\bLOCATION\s+'([^']+)'", head, re.I)
        if lm:
            location = lm.group(1)
            head = head[: lm.start()] + head[lm.end() :]

        properties = None
        tm = re.search(r"\bTBLPROPERTIES\b", head, re.I)
        if tm:
            inner, after = _take_parens(head[tm.end() :])
            properties = self._parse_tblproperties(inner)
            head = head[: tm.start()] + after

        # Flink's property spelling: CREATE TABLE t (...) WITH ('k'='v')
        # (flink_feature_tests.py:561)
        wm = re.search(r"\bWITH\b", head, re.I)
        if wm:
            inner, after = _take_parens(head[wm.end() :])
            properties = {**(properties or {}), **self._parse_tblproperties(inner)}
            head = head[: wm.start()] + after

        # Redshift's spelling: ... TABLE PROPERTIES ('k'='v')
        # (redshift_feature_tests.py:938-941,1407-1408)
        rp = re.search(r"\bTABLE\s+PROPERTIES\b", head, re.I)
        if rp:
            inner, after = _take_parens(head[rp.end() :])
            properties = {**(properties or {}), **self._parse_tblproperties(inner)}
            head = head[: rp.start()] + after

        head = re.sub(r"\bUSING\s+\w+\b", "", head, flags=re.I).strip()
        rest = (head + " " + body).strip() if body else head
        am = re.match(r"AS\s+(.*)$", rest, re.I | re.S)
        if am:
            if location is not None:
                raise UnsupportedSQLError(
                    "LOCATION is not supported on CREATE TABLE ... AS SELECT"
                )
            df = self._run_select(am.group(1))
            self.catalog.create_table_as_select(ident, df, partition_by, properties)
            return
        if rest:
            raise UnsupportedSQLError(f"unparsed CREATE TABLE tail: {rest[:60]!r}")
        if schema_ddl is None:
            raise UnsupportedSQLError("CREATE TABLE needs (schema) or AS SELECT")
        schema_ddl, defaults = self._strip_column_defaults(schema_ddl)
        schema_ddl, pk_cols = self._normalize_schema_ddl(schema_ddl)
        kwargs = {"defaults": defaults or None}
        if location is not None:
            # Iceberg semantics: custom table locations are a POINTER-
            # catalog capability (SQL/REST/Glue track a location column);
            # a path catalog derives location from the identifier, and
            # HadoopCatalog likewise rejects LOCATION rather than writing
            # a table its own load path can never find again.
            if not getattr(self.catalog, "SUPPORTS_CUSTOM_LOCATION", False):
                raise UnsupportedSQLError(
                    "LOCATION requires a pointer catalog (SqlCatalog); the "
                    "path-based catalog derives table locations from names"
                )
            kwargs["location"] = location
        t = self.catalog.create_table(
            ident, schema_ddl, partition_by, properties, **kwargs
        )
        if pk_cols:
            # Flink's PRIMARY KEY (id) NOT ENFORCED column-list clause maps
            # to Iceberg identifier fields (flink_feature_tests.py:769)
            t.set_identifier_fields(pk_cols)

    @staticmethod
    def _normalize_schema_ddl(schema_ddl: str) -> tuple[str, list[str]]:
        """Engine-dialect column lists → Spark DDL: extract a ``PRIMARY
        KEY (...) [NOT ENFORCED]`` clause (Flink's upsert-key spelling)
        and normalize single-word dialect types (VARCHAR, FLOAT8,
        TIMESTAMP(6)). Multi-word type tails pass through untouched."""
        pk: list[str] = []
        cleaned = []
        for coldef in _split_top(schema_ddl):
            cd = coldef.strip()
            pm = re.match(r"PRIMARY\s+KEY\s*(\(.*)$", cd, re.I | re.S)
            if pm:
                inner, tail = _take_parens(pm.group(1))
                if tail.strip() and not re.match(
                    r"NOT\s+ENFORCED\s*$", tail.strip(), re.I
                ):
                    raise UnsupportedSQLError(f"bad PRIMARY KEY clause: {cd!r}")
                pk = [c.strip().strip("`") for c in _split_top(inner)]
                continue
            # ANY whitespace separates name and type (newline/tab are
            # legal SQL — the recurring partition(" ") bug class, found
            # here by the CREATE fuzz's whitespace mangling)
            bits = cd.split(None, 1)
            name, typ = (bits[0], bits[1].strip()) if len(bits) == 2 else (cd, "")
            if typ and re.fullmatch(r"timestamp\s*\(\d+\)", typ, re.I):
                # precision-aware mapping shared with the ALTER paths
                cd = f"{name} {_norm_type(typ)}"
            elif typ and re.fullmatch(r"\w+", typ):
                cd = f"{name} {_norm_type(typ)}"
            cleaned.append(cd)
        return ", ".join(cleaned), pk

    @staticmethod
    def _strip_column_defaults(schema_ddl: str) -> tuple[str, dict[str, object]]:
        """Parse ``col TYPE DEFAULT <lit>`` out of a CREATE TABLE column
        list — the reference's V3 DDL (iceberg_feature_tests.py:771-776).
        Returns the DDL without the DEFAULT clauses plus {col: value}."""
        defaults: dict[str, object] = {}
        cleaned = []
        for coldef in _split_top(schema_ddl):
            cd = coldef.strip()
            dm = re.search(r"\s+DEFAULT\s+(.+)$", cd, re.I | re.S)
            if dm:
                col = cd.split()[0].strip("`")
                defaults[col] = IceLiteSQL._call_value(dm.group(1).strip())
                cd = cd[: dm.start()]
            cleaned.append(cd)
        return ", ".join(cleaned), defaults

    def _drop_table(self, stmt: str) -> None:
        m = re.match(
            rf"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?({_IDENT})(\s+PURGE)?\s*$", stmt, re.I
        )
        if not m:
            raise UnsupportedSQLError(stmt)
        ident = self._resolve(m.group(2))
        try:
            self.catalog.drop_table(ident, purge=bool(m.group(3)))
        except NoSuchTableError:
            if not m.group(1):
                raise

    def _alter_table(self, stmt: str) -> None:
        """ALTER TABLE verbs the reference's SQL tests exercise
        (iceberg_feature_tests.py:708-745 schema evolution, :888-889
        tags/branches, :968 partition fields, property round-trips)."""
        m = re.match(rf"ALTER\s+TABLE\s+({_IDENT})\s+(.*)$", stmt, re.I | re.S)
        if not m:
            raise UnsupportedSQLError(stmt)
        t = self.catalog.load_table(self._resolve(m.group(1)))
        body = m.group(2).strip()

        # ADD COLUMN(S) — plus Flink's keyword-less parenthesized form
        # ``ALTER TABLE t ADD (age INT)`` (flink_feature_tests.py:975) and
        # DuckDB's ``ADD COLUMN region VARCHAR DEFAULT 'eu'``
        # (duckdb_feature_tests.py:718)
        am = re.match(r"ADD\s+COLUMNS?\s*(.*)$", body, re.I | re.S) or re.match(
            r"ADD\s*(\(.*)$", body, re.I | re.S
        )
        if am:
            cols_text = am.group(1).strip()
            if cols_text.startswith("("):
                cols_text, rest = _take_parens(cols_text)
                if rest.strip():
                    raise UnsupportedSQLError(f"trailing ALTER text: {rest!r}")
            cols_text, defaults = self._strip_column_defaults(cols_text)
            cols = {}
            parts = [p for p in _split_top(cols_text) if p.strip()]
            if not parts:
                # ADD COLUMNS () used to commit an empty no-op evolution
                raise UnsupportedSQLError("ADD COLUMNS with no columns")
            for part in parts:
                # ANY whitespace separates name and type — a newline or
                # tab here used to fail the parse (found by the ALTER fuzz)
                bits = part.strip().split(None, 1)
                if len(bits) != 2:
                    raise UnsupportedSQLError(f"bad column def: {part!r}")
                name, typ = bits
                norm = _norm_type(typ)
                # validate BEFORE committing: a type Spark can't parse
                # would make every subsequent scan of the table fail at
                # StructType.fromDDL — fail the DDL, not the reads. The
                # PHYSICAL type is what scans parse (logical V3 types
                # like timestamp_ns/geometry store as bigint/binary —
                # same rule as the CREATE path, tables/catalog.py)
                try:
                    from pyspark.sql.types import StructType  # noqa: PLC0415

                    from iceberg_matrix_spark.tables.table import (  # noqa: PLC0415
                        _physical_type,
                    )

                    StructType.fromDDL(f"`{name.strip('`')}` {_physical_type(norm)}")
                except Exception:
                    raise UnsupportedSQLError(
                        f"unsupported column type in ADD COLUMN: {typ!r}"
                    ) from None
                if name.strip("`") in cols:
                    # a dict would silently last-wins the duplicate
                    raise UnsupportedSQLError(
                        f"duplicate column in ADD COLUMNS: {name!r}"
                    )
                cols[name.strip("`")] = norm
            t.add_columns(cols, defaults=defaults or None)
            return
        # RENAME COLUMN a TO b — COLUMN keyword optional (Flink dialect,
        # flink_feature_tests.py:976)
        rm = re.match(r"RENAME\s+(?:COLUMN\s+)?(\w+)\s+TO\s+(\w+)\s*$", body, re.I)
        if rm:
            t.rename_column(rm.group(1), rm.group(2))
            return
        dm = re.match(r"DROP\s+COLUMN\s+(\w+)\s*$", body, re.I)
        if dm:
            t.drop_column(dm.group(1))
            return
        # ALTER COLUMN c TYPE T — engine type aliases normalize (Redshift's
        # FLOAT8, redshift_feature_tests.py:1034); MODIFY c T is Flink's
        # spelling of the same verb (flink_feature_tests.py:1011-1012)
        cm = re.match(r"ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(\w+)\s*$", body, re.I) or re.match(
            r"MODIFY\s+(\w+)\s+(\w+)\s*$", body, re.I
        )
        if cm:
            t.alter_column_type(cm.group(1), _norm_type(cm.group(2)))
            return
        # SET PARTITIONED BY (...) — whole-spec replacement (DuckDB suite,
        # duckdb_feature_tests.py:505); must match before the generic SET
        fm = re.match(r"SET\s+PARTITIONED\s+BY\s*(.*)$", body, re.I | re.S)
        if fm:
            inner, rest = _take_parens(fm.group(1))
            if rest.strip():
                raise UnsupportedSQLError(f"trailing ALTER text: {rest!r}")
            t.set_partition_fields(_split_top(inner))
            return
        # SET TBLPROPERTIES (...) — plus Flink's keyword-less
        # ``SET ('k'='v')`` (flink_feature_tests.py:994)
        pm = re.match(r"SET\s+TBLPROPERTIES\s*(.*)$", body, re.I | re.S) or re.match(
            r"SET\s*(\(.*)$", body, re.I | re.S
        )
        if pm:
            inner, _rest = _take_parens(pm.group(1))
            t.set_properties(self._parse_tblproperties(inner))
            return
        fm = re.match(r"ADD\s+PARTITION\s+FIELD\s+(.+?)\s*$", body, re.I)
        if fm:
            t.add_partition_field(fm.group(1))
            return
        fm = re.match(r"DROP\s+PARTITION\s+FIELD\s+(.+?)\s*$", body, re.I)
        if fm:
            t.drop_partition_field(fm.group(1))
            return
        # REPLACE PARTITION FIELD <old> WITH <new> — the reference's
        # partition-evolution statement (clickhouse_feature_tests.py:552,
        # redshift_feature_tests.py:1327)
        fm = re.match(
            r"REPLACE\s+PARTITION\s+FIELD\s+(.+?)\s+WITH\s+(.+?)\s*$", body, re.I
        )
        if fm:
            t.replace_partition_field(fm.group(1), fm.group(2))
            return
        bm = re.match(
            r"CREATE\s+(TAG|BRANCH)\s+`?([\w.-]+)`?"
            r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*$",
            body,
            re.I,
        )
        if bm:
            sid = int(bm.group(3)) if bm.group(3) else None
            if bm.group(1).upper() == "TAG":
                t.create_tag(bm.group(2), sid)
            else:
                t.create_branch(bm.group(2), sid)
            return
        # Iceberg's write-layout DDL: WRITE ORDERED BY sets the sort order
        # AND range distribution; WRITE LOCALLY ORDERED BY sets only the
        # local sort; WRITE DISTRIBUTED BY PARTITION sets hash clustering.
        wm = re.match(
            r"WRITE\s+(LOCALLY\s+)?ORDERED\s+BY\s*(.*)$", body, re.I | re.S
        )
        if wm:
            cols_text = wm.group(2).strip()
            if cols_text.startswith("("):
                cols_text, rest = _take_parens(cols_text)
                if rest.strip():
                    raise UnsupportedSQLError(f"trailing ALTER text: {rest!r}")
            cols = [c.strip().strip("`") for c in _split_top(cols_text)]
            t.replace_sort_order(cols)
            if not wm.group(1):
                t.set_properties({"write.distribution-mode": "range"})
            return
        if re.match(r"WRITE\s+DISTRIBUTED\s+BY\s+PARTITION\s*$", body, re.I):
            t.set_properties({"write.distribution-mode": "hash"})
            return
        im = re.match(r"SET\s+IDENTIFIER\s+FIELDS\s+(.+?)\s*$", body, re.I)
        if im:
            t.set_identifier_fields(
                [c.strip().strip("`") for c in _split_top(im.group(1))]
            )
            return
        # Flink's keyword-less column drop (``ALTER TABLE t DROP age``,
        # flink_feature_tests.py:977) — LAST, so the worded DROP
        # COLUMN / DROP PARTITION FIELD forms above are never shadowed
        dm = re.match(r"DROP\s+(\w+)\s*$", body, re.I)
        if dm and dm.group(1).upper() not in ("COLUMN", "PARTITION"):
            t.drop_column(dm.group(1))
            return
        raise UnsupportedSQLError(f"unsupported ALTER TABLE clause: {body[:60]!r}")

    # --------------------------------------------------------------- DML

    def _aligned(self, table: IceLiteTable, df: DataFrame, cols: list[str] | None) -> DataFrame:
        """Positionally align an input frame to the table schema, casting
        to physical types; unspecified columns fill with write-default."""
        fields = table.meta.current_schema.fields
        targets = cols if cols is not None else [f.name for f in fields]
        if len(df.columns) != len(targets):
            raise UnsupportedSQLError(
                f"INSERT supplies {len(df.columns)} columns, expected {len(targets)}"
            )
        # Spark resolves identifiers case-insensitively: (ID, VAL) binds
        # to columns id/val — and the duplicate check must use the SAME
        # folding, or (id, ID) would slip past a case-sensitive set and
        # silently bind two values to one column (INSERT-list fuzz,
        # round 7; DDL validates names the same way in _evolve_schema).
        if len({c.lower() for c in targets}) != len(targets):
            raise UnsupportedSQLError(
                f"INSERT column list repeats a column: {targets}"
            )
        by_lower = {f.name.lower(): f.name for f in fields}
        unknown = [c for c in targets if c.lower() not in by_lower]
        if unknown:
            raise UnsupportedSQLError(
                f"INSERT column list names unknown columns {unknown}; "
                f"table has {[f.name for f in fields]}"
            )
        targets = [by_lower[c.lower()] for c in targets]
        by_pos = dict(zip(targets, df.columns))
        dtypes = dict(df.dtypes)
        out = []
        for f in fields:
            if f.name in by_pos:
                col = F.col(by_pos[f.name])
                if f.type == "timestamp_ns" and dtypes.get(
                    by_pos[f.name], ""
                ).startswith("timestamp"):
                    # timestamp→bigint casts to SECONDS; route through
                    # micros to the nanos physical value (same rule as
                    # IceLiteTable._align)
                    col = F.unix_micros(col.cast("timestamp")) * F.lit(1000)
                out.append(col.cast(_physical_type(f.type)).alias(f.name))
            else:
                out.append(
                    F.lit(f.write_default).cast(_physical_type(f.type)).alias(f.name)
                )
        return df.select(*out)

    def _insert(self, stmt: str) -> None:
        if re.match(r"INSERT\s+(?:INTO|OVERWRITE)\s+FUNCTION\b", stmt, re.I):
            # ClickHouse's INSERT INTO FUNCTION icebergLocal(...) — the
            # reference's read-only negative probe
            # (clickhouse_feature_tests.py:657-659): path table functions
            # never write (no catalog to commit through)
            raise UnsupportedSQLError(
                "path table functions (icebergLocal/iceberg_scan) are read-only"
            )
        m = re.match(
            rf"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?({_IDENT})\s*(.*)$",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise UnsupportedSQLError(stmt)
        mode, raw, body = m.group(1).upper(), m.group(2), m.group(3).strip()
        # INSERT INTO tbl.branch_<name> — write to a branch, the
        # reference's idiom (iceberg_feature_tests.py:890). tag_ is
        # read-only: writing to a tag must fail, not silently hit main.
        branch = "main"
        rm = re.match(r"(.*)\.(branch|tag)_(\w+)$", raw.strip().strip("`"))
        if rm and rm.group(1).count(".") >= 1 and not self._table_exists(raw):
            # only a ref-suffix if the literal name is NOT a real table
            # (a user may legitimately name a table branch_foo)
            if rm.group(2).lower() == "tag":
                raise UnsupportedSQLError(
                    f"cannot write to a tag: {raw.strip()!r} (tags are immutable)"
                )
            raw, branch = rm.group(1), rm.group(3)
        ident = self._resolve(raw)
        cols = None
        if body.startswith("("):
            inner, body = _take_parens(body)
            cols = [c.strip().strip("`") for c in _split_top(inner)]
            body = body.strip()
        if re.match(r"VALUES\b", body, re.I):
            # a literal VALUES batch is tiny by construction — write it
            # as ONE file, like every engine's SQL client does (the
            # Flink suite reads record_count=3 off a single file after
            # INSERT VALUES of 3 rows, flink_feature_tests.py:1583-1586);
            # one file per value-row bloats the manifest for no gain
            df = self.spark.sql(f"SELECT * FROM {body}").coalesce(1)
        else:
            df = self._run_select(body)
        table = self.catalog.load_table(ident)
        if branch != "main":
            # the append path would auto-create an unknown branch — a
            # typo'd branch name must fail loudly (like the read path and
            # Iceberg itself), not land data on a ghost branch
            ref = table.meta.refs.get(branch)
            if ref is None:
                raise UnsupportedSQLError(f"unknown branch {branch!r} on {ident}")
            if ref.type != "branch":
                raise UnsupportedSQLError(
                    f"cannot write to a tag: {branch!r} on {ident} (tags are immutable)"
                )
        aligned = self._aligned(table, df, cols)
        if mode == "OVERWRITE":
            if branch != "main":
                raise UnsupportedSQLError(
                    "INSERT OVERWRITE to a branch is not supported"
                )
            table.overwrite(aligned)
            return
        upsert_on = (
            str(table.meta.properties.get("write.upsert.enabled", "")).lower()
            == "true"
        )
        if upsert_on:
            # Flink's upsert-mode INSERT (flink_feature_tests.py:764-784):
            # with write.upsert.enabled and a PK, INSERT replaces by key —
            # equality delete + append in one snapshot. A missing PK must
            # fail (Flink requires one), never silently append duplicates.
            if not table.identifier_fields():
                raise UnsupportedSQLError(
                    "write.upsert.enabled needs identifier fields "
                    "(PRIMARY KEY ... NOT ENFORCED or SET IDENTIFIER FIELDS)"
                )
            if branch != "main":
                raise UnsupportedSQLError(
                    "upsert-mode INSERT to a branch is not supported"
                )
            table.upsert(aligned)
            return
        table.append(aligned, branch=branch)

    def _update(self, stmt: str) -> None:
        m = re.match(rf"UPDATE\s+({_IDENT})\s+SET\s+(.*)$", stmt, re.I | re.S)
        if not m:
            raise UnsupportedSQLError(stmt)
        ident, body = self._resolve(m.group(1)), m.group(2)
        w = _find_top_keyword(body, "WHERE")
        where = "true"
        if w >= 0:
            where = body[w + len("WHERE") :].strip()
            body = body[:w]
        sets = {}
        for assign in _split_top(body):
            lhs, eq, rhs = assign.partition("=")
            if not eq:
                raise UnsupportedSQLError(f"bad SET clause: {assign!r}")
            col = lhs.strip().strip("`")
            col = col.split(".")[-1]  # accept tbl-qualified LHS
            sets[col] = rhs.strip()
        self.catalog.load_table(ident).update(sets, where=where)

    def _delete(self, stmt: str) -> None:
        m = re.match(
            rf"DELETE\s+FROM\s+({_IDENT})(?:\s+WHERE\s+(.*))?$", stmt, re.I | re.S
        )
        if not m:
            raise UnsupportedSQLError(stmt)
        ident = self._resolve(m.group(1))
        self.catalog.load_table(ident).delete(where=(m.group(2) or "true").strip())

    # -------------------------------------------------------------- MERGE

    def _merge(self, stmt: str) -> None:
        m = re.match(
            rf"MERGE\s+INTO\s+({_IDENT})(?:\s+AS)?(?:\s+(\w+))?\s+USING\s+(.*)$",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise UnsupportedSQLError(f"unsupported MERGE shape: {stmt[:80]!r}")
        target_id = self._resolve(m.group(1))
        t_alias = (m.group(2) or m.group(1).split(".")[-1]).lower()
        rest = m.group(3).strip()

        if rest.startswith("("):
            inner, rest = _take_parens(rest)  # nested-paren-safe subquery
            source = self._run_select(inner)
            src_name = None
        else:
            sm = re.match(rf"({_IDENT})(.*)$", rest, re.S)
            if not sm:
                raise UnsupportedSQLError(f"bad MERGE source: {rest[:60]!r}")
            src_name = sm.group(1)
            source = self.catalog.load_table(self._resolve(src_name)).df()
            rest = sm.group(2)
        am = re.match(r"\s*(?:AS\s+)?(\w+)?\s*ON\s+(.*)$", rest, re.I | re.S)
        if not am:
            raise UnsupportedSQLError(f"expected [alias] ON ...: {rest[:60]!r}")
        s_alias = (am.group(1) or "").lower()
        tail = am.group(2)
        if not s_alias:
            if src_name is None:
                raise UnsupportedSQLError("MERGE subquery source needs an alias")
            s_alias = src_name.split(".")[-1].lower()
        w = _find_top_keyword(tail, "WHEN")
        if w < 0:
            raise UnsupportedSQLError("MERGE needs at least one WHEN clause")
        on_text, whens_text = tail[:w], tail[w:]

        # IceLiteTable.merge hard-codes aliases t/s (tables/table.py:670);
        # rewrite the user's qualifiers simultaneously so swaps are safe.
        if t_alias == s_alias:
            # e.g. MERGE INTO ns.items USING staging.items — both default
            # aliases are 'items'; one amap key would rewrite EVERY
            # qualifier to one side and silently mis-match
            raise UnsupportedSQLError(
                f"ambiguous MERGE: target and source both answer to "
                f"{t_alias!r}; give explicit aliases"
            )
        amap = {t_alias: "t", s_alias: "s"}
        # an unaliased target may be referenced by its FULL spelling in
        # ON/SET — the Redshift suite's MERGE does exactly this
        # (redshift_feature_tests.py:685-689: ON schema.tbl.id = src.id)
        full_t = m.group(1).strip().strip("`").lower()
        if full_t not in amap:
            amap[full_t] = "t"
        if src_name:
            full_s = src_name.strip().strip("`").lower()
            if full_s not in amap:
                amap[full_s] = "s"
        on = _rewrite_aliases(on_text.strip(), amap)

        matched_clauses: list[tuple[str | None, tuple]] = []
        nmbs_clauses: list[tuple[str | None, tuple]] = []
        insert_when_not_matched = False
        insert_condition: str | None = None
        reshape: dict[str, str] = {}

        def _set_map(text: str) -> dict[str, str]:
            out: dict[str, str] = {}
            for assign in _split_top(text):
                lhs, eq, rhs = assign.partition("=")
                if not eq:
                    raise UnsupportedSQLError(f"bad MERGE SET: {assign!r}")
                col = lhs.strip().strip("`").split(".")[-1]
                out[col] = _rewrite_aliases(rhs.strip(), amap)
            return out

        def _cond(text: str | None) -> str | None:
            return _rewrite_aliases(text.strip(), amap) if text else None

        for clause in self._split_whens(whens_text):
            cm = re.match(
                r"MATCHED\s+(?:AND\s+(.*?)\s+)?THEN\s+UPDATE\s+SET\s+(.*)$",
                clause,
                re.I | re.S,
            )
            if cm:
                matched_clauses.append(
                    (_cond(cm.group(1)), ("update", _set_map(cm.group(2))))
                )
                continue
            dm = re.match(
                r"MATCHED\s+(?:AND\s+(.*?)\s+)?THEN\s+DELETE\s*$", clause, re.I | re.S
            )
            if dm:
                matched_clauses.append((_cond(dm.group(1)), ("delete",)))
                continue
            sm2 = re.match(
                r"NOT\s+MATCHED\s+BY\s+SOURCE\s+(?:AND\s+(.*?)\s+)?THEN\s+"
                r"(DELETE\s*$|UPDATE\s+SET\s+(.*)$)",
                clause,
                re.I | re.S,
            )
            if sm2:
                # NOT MATCHED BY SOURCE conditions see TARGET columns only
                action = (
                    ("delete",)
                    if sm2.group(2).strip().upper().startswith("DELETE")
                    else ("update", _set_map(sm2.group(3)))
                )
                nmbs_clauses.append((_cond(sm2.group(1)), action))
                continue
            # INSERT\b\s* (not \s+): 'INSERT(cols)' with no space before
            # the paren must still land here — if this regex misses it,
            # the im/bm regexes below (whose AND groups are
            # non-capturing) would swallow a WHEN ... AND condition and
            # run the insert unconditionally. Belt: the guard after im.
            nm = re.match(
                r"NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?(?:AND\s+(.*?)\s+)?THEN\s+INSERT\b\s*(.*)$",
                clause,
                re.I | re.S,
            )
            if nm and insert_when_not_matched:
                raise UnsupportedSQLError(
                    "multiple NOT MATCHED INSERT clauses are not supported"
                )
            ins_cond = _cond(nm.group(1)) if nm else None
            if nm and re.match(r"\*\s*$", nm.group(2)):
                insert_when_not_matched = True
                insert_condition = ins_cond
                continue
            im = re.match(
                r"NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?(?:AND\s+.*?\s+)?THEN\s+"
                r"INSERT\s*\((.*?)\)\s*VALUES\s*\((.*)\)\s*$",
                clause,
                re.I | re.S,
            )
            if im is None:
                # DuckDB's column-list-free form: INSERT VALUES (a, b) —
                # positional against the target schema
                # (duckdb_feature_tests.py:318-324)
                bm = re.match(
                    r"NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?(?:AND\s+.*?\s+)?THEN\s+"
                    r"INSERT\s+VALUES\s*\((.*)\)\s*$",
                    clause,
                    re.I | re.S,
                )
                if bm:
                    tgt_cols = [
                        f.name
                        for f in self.catalog.load_table(target_id)
                        .meta.current_schema.fields
                    ]
                    vals = _split_top(bm.group(1))
                    if len(vals) != len(tgt_cols):
                        raise UnsupportedSQLError(
                            f"MERGE INSERT VALUES supplies {len(vals)} values, "
                            f"target has {len(tgt_cols)} columns"
                        )
                    im = re.match(
                        r"NOT\s+MATCHED\s+THEN\s+INSERT\s*\((.*?)\)\s*VALUES\s*\((.*)\)\s*$",
                        "NOT MATCHED THEN INSERT ("
                        + ", ".join(tgt_cols)
                        + ") VALUES ("
                        + bm.group(1)
                        + ")",
                        re.I | re.S,
                    )
            if (
                im
                and ins_cond is None
                and re.match(
                    r"NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?AND\s+", clause, re.I
                )
            ):
                # reject-loudly contract: the clause carries an AND
                # condition that nm failed to capture — executing the
                # insert unconditionally would silently change semantics
                raise UnsupportedSQLError(
                    f"WHEN NOT MATCHED clause carries a condition the "
                    f"parser could not capture: WHEN {clause[:60]!r}"
                )
            if im:
                cols = [c.strip().strip("`") for c in _split_top(im.group(1))]
                exprs = [_rewrite_aliases(e, amap) for e in _split_top(im.group(2))]
                # Supported mapping: simple s.col references — reshape the
                # source so merge()'s INSERT-by-name path picks them up.
                names = []
                for e in exprs:
                    em = re.match(r"s\.(\w+)$", e.strip(), re.I)
                    if not em:
                        raise UnsupportedSQLError(
                            f"MERGE INSERT VALUES supports s.col refs only: {e!r}"
                        )
                    names.append(em.group(1))
                source = source.select(
                    *[F.col(n).alias(c) for n, c in zip(names, cols)]
                )
                reshape = dict(zip(names, cols))
                insert_when_not_matched = True
                insert_condition = ins_cond
                continue
            raise UnsupportedSQLError(f"unsupported MERGE clause: WHEN {clause[:60]!r}")

        # Spark's clause-order rule: within each WHEN family, every clause
        # but the LAST must carry an AND condition — an unconditional
        # clause shadows everything after it, so accepting one silently
        # would make the later clauses dead code the user asked for.
        for fam, clauses in (
            ("MATCHED", matched_clauses),
            ("NOT MATCHED BY SOURCE", nmbs_clauses),
        ):
            for cond, _action in clauses[:-1]:
                if cond is None:
                    raise UnsupportedSQLError(
                        f"only the last WHEN {fam} clause may omit its AND "
                        "condition (an unconditional clause shadows the rest)"
                    )

        if reshape:
            # The reshaped source carries target column names; rewrite the
            # ON condition (and any UPDATE exprs) to the new names. A
            # reference to a source column the INSERT list dropped cannot
            # resolve — fail loudly rather than mis-plan.
            def _remap(expr: str) -> str:
                def sub(mm: re.Match) -> str:
                    name = mm.group(1)
                    if name not in reshape:
                        raise UnsupportedSQLError(
                            f"s.{name} not in MERGE INSERT column mapping"
                        )
                    return "s." + reshape[name]

                return re.sub(r"\bs\.(\w+)", sub, expr)

            on = _remap(on)
            matched_clauses = [
                (
                    _remap(cond) if cond else cond,
                    ("update", {c: _remap(e) for c, e in a[1].items()})
                    if a[0] == "update"
                    else a,
                )
                for cond, a in matched_clauses
            ]
            if insert_condition:
                insert_condition = _remap(insert_condition)

        self.catalog.load_table(target_id).merge(
            source,
            on=on,
            insert_when_not_matched=insert_when_not_matched,
            matched_clauses=matched_clauses,
            not_matched_by_source_clauses=nmbs_clauses,
            insert_condition=insert_condition,
        )

    # --------------------------------------------------------------- CALL

    def _call(self, stmt: str) -> DataFrame:
        """``CALL <cat>.system.<proc>(name => value, ...)`` — the
        reference's maintenance surface, statement-for-statement
        (iceberg_feature_tests.py:853-860). Returns the procedure's
        summary as a one-row DataFrame, like Iceberg's CALL output."""
        m = re.match(rf"CALL\s+({_IDENT})\s*\((.*)\)\s*$", stmt, re.I | re.S)
        if not m:
            raise UnsupportedSQLError(f"unsupported CALL shape: {stmt[:60]!r}")
        parts = [p.strip("`") for p in m.group(1).strip().split(".")]
        if parts and parts[0] == self.name:
            parts = parts[1:]
        if len(parts) != 2 or parts[0].lower() != "system":
            raise UnsupportedSQLError(
                f"procedures live under [{self.name}.]system: {m.group(1)!r}"
            )
        proc = parts[1].lower()
        args: dict[str, str] = {}
        if m.group(2).strip():
            items = [i.strip() for i in _split_top(m.group(2).strip())]
            named = [re.match(r"(\w+)\s*=>\s*(.+)$", i, re.S) for i in items]
            if all(named):
                for am in named:
                    key = am.group(1).lower()
                    if key in args:
                        # last-wins would silently honor whichever copy
                        # came later — e.g. two table => arguments pick an
                        # arbitrary victim for a destructive procedure
                        raise UnsupportedSQLError(
                            f"duplicate CALL argument: {key}"
                        )
                    args[key] = am.group(2).strip()
            elif not any(named):
                # positional form (Iceberg accepts both):
                # CALL system.rollback_to_snapshot('db.t', 123)
                order = _PROC_POSITIONAL.get(proc)
                if order is None:
                    raise UnsupportedSQLError(f"unknown procedure: system.{proc}")
                if len(items) > len(order):
                    raise UnsupportedSQLError(
                        f"{proc} takes at most {len(order)} positional "
                        f"argument(s), got {len(items)}"
                    )
                args = dict(zip(order, items))
            else:
                raise UnsupportedSQLError(
                    "CALL arguments must be all named (name => value) or "
                    f"all positional: {m.group(2).strip()[:60]!r}"
                )

        from iceberg_matrix_spark.tables import maintenance as maint  # noqa: PLC0415

        # Validate the argument set BEFORE executing anything: a typo'd or
        # unknown argument must fail loudly up front (Iceberg rejects unknown
        # named args at parse time), never after a destructive procedure ran.
        allowed = _PROC_ARGS.get(proc)
        if allowed is None:
            raise UnsupportedSQLError(f"unknown procedure: system.{proc}")
        extra = set(args) - allowed
        if extra:
            raise UnsupportedSQLError(
                f"unsupported argument(s) for {proc}: {sorted(extra)}"
            )

        table_arg = args.pop("table", None)
        if table_arg is None:
            raise UnsupportedSQLError(f"CALL {proc} needs table => '...'")
        t = self.table(str(self._call_value(table_arg)))

        def _req(name: str) -> str:
            # a missing required argument is a user error → typed rejection,
            # not a raw KeyError escaping the facade
            try:
                return args.pop(name)
            except KeyError:
                raise UnsupportedSQLError(
                    f"CALL {proc} needs {name} => ..."
                ) from None

        if proc == "rewrite_data_files":
            strategy = str(self._call_value(args.pop("strategy", "'binpack'"))).lower()
            columns = None
            sort_order = args.pop("sort_order", None)
            if sort_order is not None:
                so = str(self._call_value(sort_order)).strip()
                zm = re.match(r"zorder\s*\((.*)\)\s*$", so, re.I)
                if zm:
                    strategy = "zorder"
                    columns = [c.strip() for c in zm.group(1).split(",")]
                else:
                    strategy = "sort"
                    columns = [c.strip() for c in so.split(",")]
            tp = args.pop("target_partitions", None)
            result = maint.rewrite_data_files(
                t,
                target_partitions=self._call_int(tp, "target_partitions") if tp else None,
                strategy=strategy,
                columns=columns,
            )
        elif proc == "expire_snapshots":
            older = args.pop("older_than", None)
            result = maint.expire_snapshots(
                t,
                older_than_ms=self._call_int(older, "older_than") if older else None,
                retain_last=self._call_int(args.pop("retain_last", "1"), "retain_last"),
            )
        elif proc == "remove_orphan_files":
            older = args.pop("older_than", None)
            removed = maint.remove_orphan_files(
                t,
                dry_run=self._call_bool(args.pop("dry_run", "false"), "dry_run"),
                older_than_ms=self._call_int(older, "older_than") if older else None,
            )
            result = {"orphan_file_location_count": len(removed)}
        elif proc == "rewrite_manifests":
            result = maint.rewrite_manifests(t)
        elif proc == "rewrite_position_delete_files":
            result = maint.rewrite_position_deletes(t)
        elif proc == "compute_table_stats":
            cols = args.pop("columns", None)
            result = maint.compute_table_statistics(
                t, columns=self._call_value(cols) if cols else None
            )
        elif proc == "rollback_to_snapshot":
            prev = t.meta.current_snapshot_id
            sid = self._call_int(_req("snapshot_id"), "snapshot_id")
            t.rollback_to_snapshot(sid)
            result = {"previous_snapshot_id": prev, "current_snapshot_id": sid}
        elif proc == "rollback_to_timestamp":
            prev = t.meta.current_snapshot_id
            ts = self._call_int(_req("timestamp"), "timestamp")
            sid = t.rollback_to_timestamp(ts)
            result = {"previous_snapshot_id": prev, "current_snapshot_id": sid}
        elif proc == "set_current_snapshot":
            prev = t.meta.current_snapshot_id
            sid = self._call_int(_req("snapshot_id"), "snapshot_id")
            t.set_current_snapshot(sid)
            result = {"previous_snapshot_id": prev, "current_snapshot_id": sid}
        elif proc == "cherrypick_snapshot":
            src = self._call_int(_req("snapshot_id"), "snapshot_id")
            new = t.cherrypick_snapshot(src)
            result = {"source_snapshot_id": src, "current_snapshot_id": new}
        elif proc == "fast_forward":
            branch = str(self._call_value(_req("branch")))
            to = str(self._call_value(_req("to")))
            prev, new = t.fast_forward(branch, to)
            result = {"branch_updated": branch, "previous_ref": prev, "updated_ref": new}
        elif proc == "ancestors_of":
            sid_arg = args.pop("snapshot_id", None)
            chain = t.ancestors_of(
                self._call_int(sid_arg, "snapshot_id") if sid_arg else None
            )
            return local_df(
                self.spark, chain, "snapshot_id long, timestamp long"
            )
        elif proc == "add_files":
            src_tbl = str(self._call_value(_req("source_table")))
            pm = re.match(r"`?parquet`?\s*\.\s*`([^`]+)`\s*$", src_tbl, re.I)
            if not pm:
                raise UnsupportedSQLError(
                    "add_files supports source_table => '`parquet`.`<path>`'"
                )
            import glob as _glob  # noqa: PLC0415

            root = pm.group(1)
            paths = sorted(_glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True))
            n = t.add_files(paths)
            result = {"added_files_count": n}
        else:  # pragma: no cover — _PROC_ARGS gate rejects unknown procs above
            raise UnsupportedSQLError(f"unknown procedure: system.{proc}")
        return self._result_df(result)

    @staticmethod
    def _call_int(text: str, param: str) -> int:
        """Coerce one CALL argument to an integer (TIMESTAMP literals
        arrive as epoch millis from _call_value). Booleans and other
        non-integers are rejected — int(True) is 1 in Python, so e.g.
        older_than => true would silently become a 1-millisecond cutoff
        and expire everything."""
        v = IceLiteSQL._call_value(text)
        if isinstance(v, bool) or not isinstance(v, int):
            raise UnsupportedSQLError(
                f"{param} expects an integer, got: {text.strip()[:40]!r}"
            )
        return v

    @staticmethod
    def _call_bool(text: str, param: str) -> bool:
        """Coerce one CALL argument to a boolean, accepting unquoted
        true/false and the quoted spellings 'true'/'false' (case-
        insensitive). Anything else is rejected — bool('false') is True
        in Python, and silently flipping e.g. dry_run would turn a real
        orphan cleanup into a no-op (or vice versa)."""
        v = IceLiteSQL._call_value(text)
        if isinstance(v, bool):
            return v
        if isinstance(v, str) and v.lower() in ("true", "false"):
            return v.lower() == "true"
        raise UnsupportedSQLError(
            f"{param} expects a boolean, got: {text.strip()[:40]!r}"
        )

    @staticmethod
    def _call_value(text: str):
        """One CALL argument value: string / number / boolean / TIMESTAMP
        (→ UTC epoch millis, matching the reference's utcnow literals) /
        array('a','b') (→ list of strings)."""
        v = text.strip()
        tm = re.match(r"TIMESTAMP\s*'([^']+)'\s*$", v, re.I)
        if tm:
            dt = datetime.fromisoformat(tm.group(1))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return int(dt.timestamp() * 1000)
        am = re.match(r"array\s*\((.*)\)\s*$", v, re.I | re.S)
        if am:
            return [IceLiteSQL._call_value(p) for p in _split_top(am.group(1))]
        if len(v) >= 2 and v[0] == "'" and v[-1] == "'":
            return v[1:-1].replace("''", "'")
        if v.lower() in ("true", "false"):
            return v.lower() == "true"
        if re.fullmatch(r"-?\d+", v):
            return int(v)
        if re.fullmatch(r"-?\d+\.\d+", v):
            return float(v)
        raise UnsupportedSQLError(f"unsupported CALL value: {v[:40]!r}")

    def _split_whens(self, text: str) -> list[str]:
        """Split the WHEN-clause tail into clauses at top-level WHENs."""
        starts = []
        pat = re.compile(r"\bWHEN\b", re.I)
        tops = {i for i, _c, d, q in _scan_top(text) if d == 0 and not q}
        for mm in pat.finditer(text):
            if mm.start() in tops:
                starts.append(mm.start())
        if not starts or starts[0] != 0:
            raise UnsupportedSQLError(f"expected WHEN clauses: {text[:60]!r}")
        starts.append(len(text))
        return [
            text[starts[i] + 4 : starts[i + 1]].strip() for i in range(len(starts) - 1)
        ]
