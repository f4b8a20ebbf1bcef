"""Cross-engine interop: a second engine reads IceLite's live files.

The reference's §5.6 pattern is write-here/read-there — one engine writes
an Iceberg table, another reads it and must see the same rows
(/root/reference/tests/daft_feature_tests.py:210-226 reads a table with
PyIceberg-written position deletes; the ClickHouse suite is built
entirely on this; the DuckDB suite explicitly includes foreign engines
reading equality deletes, duckdb_feature_tests.py:358-368). DuckDB is the
in-container second engine (it is already the correctness oracle), so the
helpers here export a table's live-file manifest — data files WITH their
sequence numbers, position-delete files, and equality-delete files from
the current snapshot — and have DuckDB reconstruct the table state from
the raw parquet alone:

    read_parquet(data, filename, file_row_number, union_by_name)
      ANTI JOIN read_parquet(pos_deletes) ON (file, position)
      minus, per equality-delete file d with sequence S_d:
        rows whose data-file sequence < S_d matching d's key columns

``union_by_name`` handles add-column schema evolution (older files lack
the column → NULL back-fill, the same read-side semantics IceLite's own
scan applies). Equality-delete key columns are resolved by FIELD ID to
the current schema names (renames after the delete was written still
target the right column), exactly like tables/table.py's own MoR read.
"""

from __future__ import annotations

import glob as _glob
import os

from iceberg_matrix_spark.tables.table import IceLiteTable


def _expand(entry_path: str) -> list[str]:
    if os.path.isdir(entry_path):
        return sorted(_glob.glob(os.path.join(entry_path, "*.parquet")))
    return [entry_path]


_DUCK_TYPES = {
    "boolean": "BOOLEAN",
    "int": "INTEGER",
    "integer": "INTEGER",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "date": "DATE",
    "string": "VARCHAR",
    "binary": "BLOB",
    "uuid": "UUID",
}


def _duck_type(t: str) -> str:
    """IceLite field type → DuckDB type (zero-row typed projections)."""
    tl = str(t).strip().lower()
    if tl.startswith("decimal"):
        return tl.upper()
    if tl.startswith("timestamp"):  # timestamp / timestamptz / timestamp_ns
        return "TIMESTAMP"
    return _DUCK_TYPES.get(tl, "VARCHAR")


def _duck_lit(v) -> str:
    """Python value → DuckDB literal (V3 initial_default backfill)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _norm(path: str) -> str:
    """file:/... / file:///... URI → bare path (DuckDB's filename col)."""
    while path.startswith("file:/") :
        path = "/" + path[len("file:/"):].lstrip("/")
    return path


def _duck_path(path: str) -> str:
    """Path → quoted DuckDB string literal (a directory like /o'brien/
    would otherwise terminate the literal early)."""
    return "'" + path.replace("'", "''") + "'"


def live_file_manifest(table: IceLiteTable, ref: str = "main") -> dict:
    """Current-snapshot file lists, resolved to concrete parquet paths.

    Returns::

        {"data": [paths],                      # flat, all data files
         "data_entries": [{"paths": [...], "seq": n}],
         "position_deletes": [paths],
         "equality_deletes": [{"paths": [...], "seq": n,
                               "file_cols": [...], "key_cols": [...]}]}

    ``file_cols`` are the write-time column names stored IN the delete
    parquet; ``key_cols`` are the same keys under the CURRENT schema
    names (field-id resolved) — a foreign engine selects file_cols and
    compares against key_cols.
    """
    snap = table._resolve_snapshot(ref=ref)
    if snap is None:
        return {
            "data": [],
            "data_entries": [],
            "position_deletes": [],
            "equality_deletes": [],
        }

    data: list[str] = []
    data_entries: list[dict] = []
    current = table.meta.current_schema
    for f in snap.data_files:
        paths = _expand(f.path)
        data.extend(paths)
        data_entries.append(
            {"paths": paths, "seq": f.sequence_number, "schema_id": f.schema_id}
        )

    # per write-schema projection to the CURRENT schema, field-id resolved
    # — the same rename/backfill semantics tables/table.py:_read_files
    # applies (rename after write → old name in the file; column added
    # after write → NULL / V3 initial_default)
    scan_groups: list[dict] = []
    for schema_id in sorted({e["schema_id"] for e in data_entries}):
        file_schema = table.meta.schema_by_id(schema_id)
        by_fid = {fld.id: fld.name for fld in file_schema.fields}
        select = [
            {
                "src": by_fid.get(cf.id),
                "dst": cf.name,
                "default": getattr(cf, "initial_default", None),
            }
            for cf in current.fields
        ]
        entries = [e for e in data_entries if e["schema_id"] == schema_id]
        scan_groups.append(
            {
                "paths": [p for e in entries for p in e["paths"]],
                "select": select,
            }
        )

    pos_deletes: list[str] = []
    eq_deletes: list[dict] = []
    by_id = {fld.id: fld.name for fld in table.meta.current_schema.fields}
    for d in snap.delete_files:
        if d.content == 1:
            pos_deletes.extend(_expand(d.path))
        elif d.content == 2:
            if d.equality_ids:
                missing = [i for i in d.equality_ids if i not in by_id]
                if missing:
                    raise ValueError(
                        f"equality delete {d.path} references dropped field "
                        f"id(s) {missing}; cannot export a correct manifest"
                    )
                key_cols = [by_id[i] for i in d.equality_ids]
            else:  # legacy entries: name-addressed
                key_cols = list(d.equality_columns)
            eq_deletes.append(
                {
                    "paths": _expand(d.path),
                    "seq": d.sequence_number,
                    "file_cols": list(d.equality_columns),
                    "key_cols": key_cols,
                }
            )
        else:
            raise NotImplementedError(
                f"unknown delete content={d.content} in {d.path}"
            )
    return {
        "data": data,
        "data_entries": data_entries,
        "scan_groups": scan_groups,
        "position_deletes": pos_deletes,
        "equality_deletes": eq_deletes,
    }


def duckdb_scan_sql(table: IceLiteTable, ref: str = "main") -> str:
    """DuckDB SQL reconstructing the table's current rows from raw files."""
    manifest = live_file_manifest(table, ref=ref)
    if not manifest["data"]:
        # zero rows but the REAL schema: cross-engine comparisons check
        # column names/types, not just counts
        typed = ", ".join(
            f'CAST(NULL AS {_duck_type(f.type)}) AS "{f.name}"'
            for f in table.meta.current_schema.fields
        )
        return f"SELECT {typed} WHERE false"
    cols = ", ".join(f'"{c}"' for c in table.meta.current_schema.names())
    # Spark records URIs as file:/... (sometimes file:///...); DuckDB's
    # filename column is a bare path — normalize both to bare paths.
    norm = "regexp_replace({x}, '^file:/+', '/')"
    # one scan per write-schema group, projected to the current names
    # (rename → alias; added-later column → NULL / initial_default);
    # UNION ALL coerces widened numeric types to the common widest
    group_sql: list[str] = []
    for g in manifest["scan_groups"]:
        paths = ", ".join(_duck_path(p) for p in g["paths"])
        sel = ", ".join(
            (
                f'"{s["src"]}" AS "{s["dst"]}"'
                if s["src"] is not None
                else f'{_duck_lit(s["default"])} AS "{s["dst"]}"'
            )
            for s in g["select"]
        )
        # union_by_name even within one schema group: V3 variant shredding
        # appends a per-commit __typed_value sibling column whose struct
        # shape is inferred per write, so files sharing a schema_id can
        # still diverge physically (table.py:_write_data_files)
        group_sql.append(
            f"SELECT {sel}, {norm.format(x='filename')} AS __fname, "
            f"file_row_number AS __pos "
            f"FROM read_parquet([{paths}], filename=true, "
            f"file_row_number=true, union_by_name=true)"
        )
    scan = " UNION ALL ".join(group_sql)
    ctes = [f"data AS ({scan})"]
    live = "data"

    if manifest["position_deletes"]:
        del_list = ", ".join(_duck_path(p) for p in manifest["position_deletes"])
        ctes.append(
            f"pdels AS (SELECT {norm.format(x='file_path')} AS __fname, "
            f"pos AS __pos FROM read_parquet([{del_list}]))"
        )
        ctes.append(
            f"pos_kept AS (SELECT * FROM {live} "
            f"ANTI JOIN pdels USING (__fname, __pos))"
        )
        live = "pos_kept"

    eq_conds: list[str] = []
    if manifest["equality_deletes"]:
        # per-concrete-file sequence numbers: equality deletes apply only
        # to rows written BEFORE the delete (data_seq < delete_seq) — the
        # same scoping tables/table.py applies on its own MoR read
        seq_rows = ", ".join(
            f"({_duck_path(_norm(p))}, {e['seq']})"
            for e in manifest["data_entries"]
            for p in e["paths"]
        )
        ctes.append(f"seqs(__fname, __seq) AS (VALUES {seq_rows})")
        ctes.append(
            f"seq_live AS (SELECT {live}.*, __seq FROM {live} "
            f"JOIN seqs USING (__fname))"
        )
        live = "seq_live"
        for i, e in enumerate(manifest["equality_deletes"]):
            paths = ", ".join(_duck_path(p) for p in e["paths"])
            sel = ", ".join(
                f'"{fc}" AS "__k_{j}"' for j, fc in enumerate(e["file_cols"])
            )
            ctes.append(f"ed_{i} AS (SELECT {sel} FROM read_parquet([{paths}]))")
            # IS NOT DISTINCT FROM: spec equality deletes match null-safely
            # (a delete row carrying NULL matches data rows with NULL)
            match = " AND ".join(
                f'e."__k_{j}" IS NOT DISTINCT FROM {live}."{kc}"'
                for j, kc in enumerate(e["key_cols"])
            )
            eq_conds.append(
                f"NOT (__seq < {e['seq']} AND "
                f"EXISTS (SELECT 1 FROM ed_{i} e WHERE {match}))"
            )

    where = (" WHERE " + " AND ".join(eq_conds)) if eq_conds else ""
    return f"WITH {', '.join(ctes)} SELECT {cols} FROM {live}{where}"


def read_with_duckdb(table: IceLiteTable, ref: str = "main"):
    """Execute the reconstruction scan in DuckDB → pyarrow Table."""
    import duckdb  # noqa: PLC0415

    con = duckdb.connect()
    try:
        return con.execute(duckdb_scan_sql(table, ref=ref)).arrow()
    finally:
        con.close()
