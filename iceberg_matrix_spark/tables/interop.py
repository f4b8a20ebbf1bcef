"""Cross-engine interop: a second engine reads IceLite's live files.

The reference's §5.6 pattern is write-here/read-there — one engine writes
an Iceberg table, another reads it and must see the same rows
(/root/reference/tests/daft_feature_tests.py:210-226 reads a table with
PyIceberg-written position deletes; the ClickHouse suite is built
entirely on this). DuckDB is the in-container second engine (it is
already the correctness oracle), so the probe here exports a table's
live-file manifest — data files plus position-delete files from the
current snapshot, post-MoR-delete and post-schema-evolution — and has
DuckDB reconstruct the table state from the raw parquet alone:

    read_parquet(data, filename, file_row_number, union_by_name)
      ANTI JOIN read_parquet(deletes) ON (file, position)

``union_by_name`` handles add-column schema evolution (older files lack
the column → NULL back-fill, the same read-side semantics IceLite's own
scan applies). Scope is deliberate: position deletes only — equality
deletes carry sequence-number scoping a bare parquet read can't express,
so the helper fails loudly rather than approximating.
"""

from __future__ import annotations

import glob as _glob
import os

from iceberg_matrix_spark.tables.table import IceLiteTable


def live_file_manifest(table: IceLiteTable, ref: str = "main") -> dict:
    """Current-snapshot file lists, resolved to concrete parquet paths.

    Returns {"data": [paths], "position_deletes": [paths]} — the export a
    foreign engine needs to scan the table without IceLite.
    """
    snap = table._resolve_snapshot(ref=ref)
    if snap is None:
        return {"data": [], "position_deletes": []}

    def expand(entry_path: str) -> list[str]:
        if os.path.isdir(entry_path):
            return sorted(_glob.glob(os.path.join(entry_path, "*.parquet")))
        return [entry_path]

    data: list[str] = []
    for f in snap.data_files:
        data.extend(expand(f.path))
    deletes: list[str] = []
    for d in snap.delete_files:
        if d.content != 1:
            raise NotImplementedError(
                "live_file_manifest exports position deletes only; equality "
                "deletes need sequence-number scoping a bare parquet read "
                "cannot express"
            )
        deletes.extend(expand(d.path))
    return {"data": data, "position_deletes": deletes}


def duckdb_scan_sql(table: IceLiteTable, ref: str = "main") -> str:
    """DuckDB SQL reconstructing the table's current rows from raw files."""
    manifest = live_file_manifest(table, ref=ref)
    if not manifest["data"]:
        return "SELECT 1 WHERE false"
    cols = ", ".join(table.meta.current_schema.names())
    data_list = ", ".join(f"'{p}'" for p in manifest["data"])
    # Spark records URIs as file:/... (sometimes file:///...); DuckDB's
    # filename column is a bare path — normalize both to bare paths.
    norm = "regexp_replace({x}, '^file:/+', '/')"
    scan = (
        f"SELECT *, {norm.format(x='filename')} AS __fname, "
        f"file_row_number AS __pos "
        f"FROM read_parquet([{data_list}], filename=true, "
        f"file_row_number=true, union_by_name=true)"
    )
    if not manifest["position_deletes"]:
        return f"SELECT {cols} FROM ({scan})"
    del_list = ", ".join(f"'{p}'" for p in manifest["position_deletes"])
    return f"""
    WITH data AS ({scan}),
    dels AS (
      SELECT {norm.format(x="file_path")} AS __fname, pos AS __pos
      FROM read_parquet([{del_list}])
    )
    SELECT {cols} FROM data ANTI JOIN dels USING (__fname, __pos)
    """


def read_with_duckdb(table: IceLiteTable, ref: str = "main"):
    """Execute the reconstruction scan in DuckDB → pyarrow Table."""
    import duckdb  # noqa: PLC0415

    con = duckdb.connect()
    try:
        return con.execute(duckdb_scan_sql(table, ref=ref)).arrow()
    finally:
        con.close()
