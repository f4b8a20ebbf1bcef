"""Daft's lazy read/write API shape over IceLite tables.

The reference's Daft suite drives Iceberg through exactly three
entry points (/root/reference/tests/daft_feature_tests.py):

- ``daft.read_iceberg(tbl[, snapshot_id=...])`` → a LAZY dataframe
  (:166-167, :435 time travel);
- ``df.write_iceberg(tbl, mode="append"|"overwrite")`` (:191, :280 —
  overwrite replaces all rows, CoW semantics :284);
- ``daft.from_pydict({col: [values, ...]})`` to build the frame (:184).

Spark DataFrames are lazy by construction, so ``read_iceberg`` is the
native shape: nothing materializes until an action, and every
transformation stacked on the result stays one Catalyst plan over the
snapshot scan (pushdown/pruning included). The functions are free —
they exist so a Daft user's program structure maps 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iceberg_matrix_spark.tables.table import IceLiteTable


def read_iceberg(table: IceLiteTable, snapshot_id: int | None = None) -> DataFrame:
    """Lazy scan of the table's current (or pinned) snapshot
    (daft_feature_tests.py:166, :435). MoR deletes apply — the Daft
    suite's read checks position deletes written by another engine
    (:210-226)."""
    return table.df(snapshot_id=snapshot_id)


def write_iceberg(df: DataFrame, table: IceLiteTable, mode: str = "append") -> None:
    """``df.write_iceberg(tbl, mode=...)`` (daft_feature_tests.py:191,280).

    ``append`` adds a snapshot; ``overwrite`` replaces ALL rows in one
    new snapshot (the suite's copy-on-write check, :273-284). Anything
    else fails loudly, like Daft's own mode validation."""
    if mode == "append":
        table.append(df)
    elif mode == "overwrite":
        table.overwrite(df)
    else:
        raise ValueError(f"write_iceberg mode must be append|overwrite, got {mode!r}")


def from_pydict(spark: SparkSession, data: dict[str, list]) -> DataFrame:
    """``daft.from_pydict({'id': [1,2], ...})`` (daft_feature_tests.py:184):
    a columnar dict of driver-local lists → DataFrame.

    Driver-built rows are driver-scale by definition, so the frame is
    ONE slice (session.local_df rationale): 32 Python-backed partitions
    for a 2-row literal costs seconds per downstream touch."""
    from iceberg_matrix_spark.session import local_df  # noqa: PLC0415

    cols = list(data)
    lens = {c: len(v) for c, v in data.items()}
    if len(set(lens.values())) > 1:
        raise ValueError(f"from_pydict column lengths differ: {lens}")
    n = next(iter(lens.values()), 0)
    rows = [tuple(data[c][i] for c in cols) for i in range(n)]
    if not rows:
        raise ValueError("from_pydict needs at least one row to infer types")
    all_none = [c for c in cols if all(v is None for v in data[c])]
    if all_none:
        # Spark's sampling inference would otherwise fail deep inside
        # createDataFrame with "Some of types cannot be determined"
        raise ValueError(
            f"from_pydict cannot infer a type for all-None column(s) {all_none}; "
            "build the frame with an explicit schema instead"
        )
    return local_df(spark, rows, cols)
