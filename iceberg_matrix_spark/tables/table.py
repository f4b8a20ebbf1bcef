"""IceLiteTable: snapshot-versioned table operations in pure PySpark.

Implements the reference's Iceberg operation surface (SURVEY.md §2.9,
§2.11–§2.13): append/overwrite writes, row-level DELETE/UPDATE/MERGE in
both copy-on-write and merge-on-read modes (position-delete files; V3
emits consolidated "PUFFIN"-tagged deletion-vector files —
/root/reference/tests/iceberg_feature_tests.py:1517-1555), equality
deletes for streaming upsert (flink suite :744-808), hidden
partitioning, time travel (:820), branches/tags (:888-898), incremental
reads (flink :1184-1211), schema evolution with field-ID resolution
(:702-750).

Scale design notes
- All data movement is DataFrame work on executors; the driver touches
  only file *lists* and JSON metadata (manifest-scale, like Iceberg's
  planning path).
- MoR reads resolve position deletes with an anti-join on
  (_metadata.file_path, _metadata.row_index) — a broadcast-able join
  because delete files are small relative to data.
- CoW DML rewrites only the files that contain matching rows (file set
  discovered by a metadata-column aggregate, pruned before rewrite).
- Parquet footer statistics are collected on executors
  (sc.parallelize over the new file list), not the driver.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import replace

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import types as T
from pyspark.sql.types import StructType

from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.tables.metadata import (
    CommitConflict,
    DataFileEntry,
    DeleteFileEntry,
    Ref,
    SchemaField,
    Snapshot,
    TableMetadata,
    TableSchema,
    commit_metadata,
    load_metadata,
)
from iceberg_matrix_spark.tables.transforms import (
    Transform,
    parse_transform,
    transform_spec,
)

_META_FILE = "__file"
_META_POS = "__pos"
_META_SEQ = "__seq"

# int→bigint / float→double widening per the reference's type-promotion
# probes (/root/reference/tests/iceberg_feature_tests.py:738-750)
_WIDENINGS = {
    ("int", "bigint"),
    ("float", "double"),
    ("int", "double"),
}


# Variant shredding: bounded sample size for shred-schema inference and
# the table-property prefix the inferred DDL is cached under (re-inferred
# only when absent — one extra Spark job on the FIRST shredded append,
# zero afterwards).
_VARIANT_SAMPLE_ROWS = 256
_VARIANT_SCHEMA_PROP = "write.parquet.variant-shredding.schema."


def _py_json_type(v) -> "T.DataType":
    """Spark type of one parsed JSON value (driver-side, no Spark jobs)."""
    if v is None:
        return T.NullType()
    if isinstance(v, bool):  # before int — bool subclasses int
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, str):
        return T.StringType()
    if isinstance(v, list):
        elem: T.DataType = T.NullType()
        for x in v:
            elem = _merge_json_type(elem, _py_json_type(x))
        return T.ArrayType(elem if not isinstance(elem, T.NullType) else T.StringType())
    if isinstance(v, dict):
        return T.StructType(
            [T.StructField(k, _py_json_type(x)) for k, x in v.items()]
        )
    return T.StringType()


def _strip_null_leaves(t: "T.DataType") -> "T.DataType":
    """Replace any remaining NullType leaf with string. A JSON field that
    is null in every sampled row merges to NullType; parquet cannot write
    a void column, and the DDL is cached per field id — so one all-null
    sample would otherwise poison every later append on the table."""
    if isinstance(t, T.NullType):
        return T.StringType()
    if isinstance(t, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _strip_null_leaves(f.dataType), f.nullable)
                for f in t.fields
            ]
        )
    if isinstance(t, T.ArrayType):
        return T.ArrayType(_strip_null_leaves(t.elementType), t.containsNull)
    if isinstance(t, T.MapType):
        return T.MapType(
            _strip_null_leaves(t.keyType),
            _strip_null_leaves(t.valueType),
            t.valueContainsNull,
        )
    return t


def _merge_json_type(a: "T.DataType", b: "T.DataType") -> "T.DataType":
    """Least-upper-bound of two inferred JSON shapes: struct fields
    union-merge (the SUPERSET schema), long+double widen to double,
    otherwise fall back to string — mirroring spark.read.json's merge
    rules without running a Spark job."""
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if a == b:
        return a
    if {type(a), type(b)} == {T.LongType, T.DoubleType}:
        return T.DoubleType()
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        fields = {f.name: f.dataType for f in a.fields}
        order = [f.name for f in a.fields]
        for f in b.fields:
            if f.name in fields:
                fields[f.name] = _merge_json_type(fields[f.name], f.dataType)
            else:
                fields[f.name] = f.dataType
                order.append(f.name)
        return T.StructType([T.StructField(n, fields[n]) for n in order])
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_merge_json_type(a.elementType, b.elementType))
    return T.StringType()


def _now_ms() -> int:
    import time

    return int(time.time() * 1000)


class _Inspect:
    """PyIceberg-shaped metadata accessor: each method returns the
    matching metadata table as a DataFrame. Defined by delegation so the
    single source of truth stays tables/metadata_tables.py."""

    _TABLES = (
        "snapshots", "files", "data_files", "all_data_files", "all_files",
        "all_delete_files", "delete_files", "partitions", "refs", "history",
        "metadata_log_entries", "statistics", "manifests",
    )

    def __init__(self, table: "IceLiteTable"):
        self._table = table

    def __getattr__(self, name: str):
        if name not in self._TABLES:
            raise AttributeError(f"no metadata table {name!r}")
        from iceberg_matrix_spark.tables import metadata_tables as mt  # noqa: PLC0415

        fn = getattr(mt, name)
        return lambda *a, **kw: fn(self._table, *a, **kw)

    def __dir__(self):
        return list(self._TABLES)


class TableScan:
    """Lazy scan handle mirroring PyIceberg's DataScan materializers."""

    def __init__(self, df: DataFrame):
        self._df = df

    def to_df(self) -> DataFrame:
        return self._df

    def to_arrow(self):
        return self._df.toArrow()

    def to_pandas(self):
        return self._df.toPandas()


def _type_str(t) -> str:
    """Coerce a type given as a DDL string or a PyIceberg/PySpark-style
    ``*Type()`` object/class into our logical type string."""
    if isinstance(t, str):
        return t.strip().lower()
    name = t.__name__ if isinstance(t, type) else type(t).__name__
    name = name.removesuffix("Type").lower()
    return {"long": "bigint", "integer": "int"}.get(name, name)


class _UpdateSchema:
    """PyIceberg's schema-evolution idiom, literally
    (pyiceberg_feature_tests.py:343-350, update_column :371-372)::

        with tbl.update_schema() as u:
            u.add_column("new_col", StringType())

    Ops batch and land as ONE schema commit on context exit (or an
    explicit ``.commit()``). Types may be DDL strings or ``*Type()``
    objects; later ops see earlier ops' effects (rename-then-drop works).
    """

    def __init__(self, table: "IceLiteTable"):
        self._table = table
        self._ops: list = []
        self._committed = False

    def add_column(self, name, field_type, doc=None, required=False, default=None):
        dtype = _type_str(field_type)
        if default is not None and self._table.format_version < 3:
            raise ValueError("column DEFAULT values require format-version 3")
        if dtype in ("timestamp_ns", "variant", "geometry") and (
            self._table.format_version < 3
        ):
            # same V3 gate as CREATE (catalog.py): adding a V3-only type
            # to a v2 table would commit spec-invalid metadata
            raise ValueError(
                f"type {dtype!r} requires format-version 3 (column {name!r})"
            )

        def op(meta, fields):
            if any(f.name == name for f in fields):
                raise ValueError(f"column already exists: {name}")
            meta.last_field_id += 1
            fields.append(
                SchemaField(
                    id=meta.last_field_id,
                    name=name,
                    type=dtype,
                    nullable=not required,
                    initial_default=default,
                    write_default=default,
                )
            )
            return fields

        self._ops.append(op)
        return self

    def rename_column(self, old: str, new: str):
        def op(meta, fields):
            for f in fields:
                if f.name == old:
                    f.name = new
                    return fields
            raise KeyError(old)

        self._ops.append(op)
        return self

    def delete_column(self, name: str):
        def op(meta, fields):
            out = [f for f in fields if f.name != name]
            if len(out) == len(fields):
                raise KeyError(name)
            return out

        self._ops.append(op)
        return self

    def update_column(self, name: str, field_type):
        new_type = _type_str(field_type)

        def op(meta, fields):
            for f in fields:
                if f.name == name:
                    if (f.type, new_type) not in _WIDENINGS:
                        raise ValueError(
                            f"narrowing/unsupported: {f.type} → {new_type}"
                        )
                    f.type = new_type
                    return fields
            raise KeyError(name)

        self._ops.append(op)
        return self

    def commit(self) -> None:
        if self._committed:
            raise RuntimeError("update_schema already committed")
        self._committed = True
        if not self._ops:
            return
        ops = self._ops

        def build(meta, fields):
            for op in ops:
                fields = op(meta, fields)
            return fields

        self._table._evolve_schema(build)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None and not self._committed:
            self.commit()
        return False


class _UpdateSpec:
    """PyIceberg's partition-spec evolution idiom
    (pyiceberg_feature_tests.py:450-452)::

        with tbl.update_spec() as u:
            u.add_field("ts", HourTransform(), "ts_hour")

    Partition field names are derived (``{source}_{kind}``, Iceberg's own
    default); a caller-supplied name must match the derived one. All ops
    land as one metadata commit.
    """

    def __init__(self, table: "IceLiteTable"):
        self._table = table
        self._adds: list[str] = []
        self._removes: list[str] = []
        self._committed = False

    def add_field(self, source_column_name: str, transform, partition_field_name=None):
        spec = transform_spec(source_column_name, transform)
        t = parse_transform(spec)
        if partition_field_name and partition_field_name != t.field_name:
            raise ValueError(
                "custom partition field names are unsupported; the derived "
                f"name for {spec!r} is {t.field_name!r}"
            )
        self._adds.append(spec)
        return self

    def remove_field(self, name: str):
        """``name`` is the partition field name ("ts_hour") or a spec
        string ("hour(ts)")."""
        self._removes.append(name)
        return self

    def commit(self) -> None:
        if self._committed:
            raise RuntimeError("update_spec already committed")
        self._committed = True
        if not (self._adds or self._removes):
            return
        adds = list(self._adds)
        for spec in adds:
            parse_transform(spec)  # validate before committing anything
        by_name = {t.field_name: t.spec_string() for t in self._table._transforms()}
        remove_specs = []
        for name in self._removes:
            if name in by_name:
                remove_specs.append(by_name[name])
            else:
                remove_specs.append(parse_transform(name).spec_string())

        def mutate(meta: TableMetadata) -> TableMetadata:
            for norm in remove_specs:
                for i, existing in enumerate(meta.partition_spec):
                    if parse_transform(existing).spec_string() == norm:
                        meta.partition_spec.pop(i)
                        break
                else:
                    raise KeyError(norm)
            meta.partition_spec.extend(adds)
            return meta

        self._table._commit(mutate)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None and not self._committed:
            self.commit()
        return False


class _ManageSnapshots:
    """PyIceberg's snapshot-management builder
    (pyiceberg_feature_tests.py:522,552-553 — note snapshot_id comes
    FIRST in this idiom, unlike :meth:`IceLiteTable.create_branch`)::

        tbl.manage_snapshots().create_branch(snap_id, "dev").commit()
    """

    def __init__(self, table: "IceLiteTable"):
        self._table = table
        self._ops: list = []

    def create_branch(self, snapshot_id: int, branch_name: str):
        self._ops.append(
            lambda: self._table.create_branch(branch_name, snapshot_id)
        )
        return self

    def create_tag(self, snapshot_id: int, tag_name: str):
        self._ops.append(lambda: self._table.create_tag(tag_name, snapshot_id))
        return self

    def remove_branch(self, branch_name: str):
        self._ops.append(lambda: self._table.drop_ref(branch_name))
        return self

    def remove_tag(self, tag_name: str):
        self._ops.append(lambda: self._table.drop_ref(tag_name))
        return self

    def commit(self) -> None:
        ops, self._ops = self._ops, []
        for op in ops:
            op()


class PartitionSpecView:
    """PyIceberg's tbl.spec() shape: ``.fields`` with ``.name``
    (pyiceberg_feature_tests.py:453-455)."""

    def __init__(self, fields: list[Transform]):
        self.fields = fields


class IceLiteTable:
    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location
        self.refresh()

    # ------------------------------------------------------------------ meta

    def refresh(self) -> "IceLiteTable":
        self.meta, self.version = load_metadata(self.location)
        return self

    @property
    def properties(self) -> dict[str, str]:
        return self.meta.properties

    @property
    def format_version(self) -> int:
        return self.meta.format_version

    def _transforms(self) -> list[Transform]:
        return [parse_transform(s) for s in self.meta.partition_spec]

    @property
    def inspect(self) -> "_Inspect":
        """PyIceberg's inspect accessor — ``tbl.inspect.manifests()``
        (pyiceberg_feature_tests.py:652) and the rest of the metadata-
        table family, as DataFrames (tables/metadata_tables.py)."""
        return _Inspect(self)

    # ---- PyIceberg-shaped accessors & evolution idioms -------------------

    @property
    def metadata(self) -> TableMetadata:
        """PyIceberg's ``tbl.metadata`` (``.refs`` / ``.snapshots`` live
        here — pyiceberg_feature_tests.py:446,554-556)."""
        return self.meta

    def current_snapshot(self, ref: str = "main") -> Snapshot | None:
        """PyIceberg's ``tbl.current_snapshot()``
        (pyiceberg_feature_tests.py:523)."""
        return self._current_snapshot(ref)

    def schema(self) -> TableSchema:
        """PyIceberg's ``tbl.schema()`` — ``.fields`` / ``find_field`` /
        ``as_arrow`` (pyiceberg_feature_tests.py:351,373,519)."""
        return self.meta.current_schema

    def spec(self) -> PartitionSpecView:
        """PyIceberg's ``tbl.spec()`` — field names follow Iceberg's
        derived naming (pyiceberg_feature_tests.py:453-455)."""
        return PartitionSpecView(self._transforms())

    def update_schema(self) -> _UpdateSchema:
        """``with tbl.update_schema() as u: u.add_column(...)`` —
        PyIceberg's batched-single-commit evolution idiom
        (pyiceberg_feature_tests.py:343-350)."""
        return _UpdateSchema(self)

    def update_spec(self) -> _UpdateSpec:
        """``with tbl.update_spec() as u: u.add_field(...)``
        (pyiceberg_feature_tests.py:450-452)."""
        return _UpdateSpec(self)

    def manage_snapshots(self) -> _ManageSnapshots:
        """``tbl.manage_snapshots().create_branch(id, name).commit()``
        (pyiceberg_feature_tests.py:522)."""
        return _ManageSnapshots(self)

    # Commit retry budget: under N concurrent writers one loser can lose
    # every round until the others drain, so the budget must exceed any
    # realistic writer fan-in (Iceberg's default is 4 with exponential
    # backoff; heavy streaming fan-in needs more). Jittered backoff keeps
    # racing writers from re-colliding in lockstep.
    _COMMIT_RETRIES = 20

    def _commit(self, mutate) -> None:
        """Optimistic commit loop: re-read + re-apply on conflict. The
        mutation runs on a deep copy so a mid-mutate failure can't leave
        the in-memory metadata half-updated."""
        import copy
        import random
        import time

        for attempt in range(self._COMMIT_RETRIES):
            try:
                meta = mutate(copy.deepcopy(self.meta))
                self.version = commit_metadata(self.location, meta, self.version)
                self.meta = meta
                return
            except CommitConflict:
                self.refresh()
                time.sleep(random.uniform(0, 0.02 * min(attempt + 1, 5)))
        raise CommitConflict(
            f"gave up after {self._COMMIT_RETRIES} retries: {self.location}"
        )

    # ------------------------------------------------------------------ util

    def _current_snapshot(self, ref: str = "main") -> Snapshot | None:
        return _head(self.meta, ref)

    def _spark_schema(self, ts: TableSchema) -> StructType:
        # logical V3 types map to their physical storage type: timestamp_ns
        # is an INT64 nanos column (Spark has no ns timestamp), variant is
        # the JSON source string (shredding adds typed sibling columns).
        ddl = ", ".join(f"{f.name} {_physical_type(f.type)}" for f in ts.fields)
        return StructType.fromDDL(ddl)

    def _align(self, df: DataFrame, ts: TableSchema) -> DataFrame:
        """Project/cast an incoming DataFrame to the table schema; a
        missing column takes its V3 write-default (falling back to the
        initial-default, then NULL)."""
        cols = []
        dtypes = dict(df.dtypes)
        for f in ts.fields:
            pt = _physical_type(f.type)
            if f.name in df.columns:
                col = F.col(f.name)
                if f.type == "timestamp_ns" and dtypes.get(f.name, "").startswith(
                    "timestamp"
                ):
                    # a plain cast timestamp→bigint yields SECONDS —
                    # silently destroying sub-second precision; convert
                    # through microseconds to the nanos physical value
                    col = F.unix_micros(col.cast("timestamp")) * F.lit(1000)
                cols.append(col.cast(pt).alias(f.name))
            else:
                dflt = f.write_default if f.write_default is not None else f.initial_default
                cols.append(F.lit(dflt).cast(pt).alias(f.name))
        return df.select(*cols)

    # ---------------------------------------------------------------- writes

    def _infer_variant_shred_schemas(
        self, out: DataFrame, vcols: list[str]
    ) -> dict[str, str]:
        """Shred-schema DDL per variant column from ONE bounded-sample job
        covering every column at once: up to _VARIANT_SAMPLE_ROWS rows
        (filtered to rows where at least one variant column is non-null)
        are collected, their JSON shapes parsed driver-side and merged to
        the superset schema (struct fields union, long+double → double —
        _merge_json_type). Columns whose merged shape is scalar are not
        shreddable (from_json needs struct/array) and are skipped, as are
        columns with no parseable sample."""
        import json as _json  # noqa: PLC0415

        cond = None
        for c in vcols:
            p = F.col(c).isNotNull()
            cond = p if cond is None else (cond | p)
        rows = out.select(*vcols).filter(cond).limit(_VARIANT_SAMPLE_ROWS).collect()
        result: dict[str, str] = {}
        for c in vcols:
            merged: T.DataType = T.NullType()
            for r in rows:
                if r[c] is None:
                    continue
                try:
                    merged = _merge_json_type(merged, _py_json_type(_json.loads(r[c])))
                except ValueError:
                    continue
            if isinstance(merged, (T.StructType, T.ArrayType)):
                result[c] = _strip_null_leaves(merged).simpleString()
        return result

    def _write_data_files(
        self,
        df: DataFrame,
        schema_id: int,
        sequence_number: int,
        meta: "TableMetadata | None" = None,
    ) -> list[DataFileEntry]:
        """Write df as parquet data files; return manifest entries with
        executor-collected footer stats. ``meta`` is the metadata object
        the enclosing commit is mutating; inferred variant-shred schemas
        are cached into its properties so they ride the same commit."""
        ts = self.meta.schema_by_id(schema_id)
        out = self._align(df, ts)
        # V3 shredded VARIANT (write.parquet.variant-shredding.enabled,
        # iceberg_feature_tests.py:1342-1348): materialize a typed sibling
        # column per variant field so engines can project/push down typed
        # paths without re-parsing JSON. The shred schema is inferred once
        # from a bounded multi-row sample (superset shape across rows, ONE
        # extra job for all variant columns together), cached in table
        # properties, and only re-inferred when absent; the shredding
        # itself runs JVM-side. Readers project by the table field list,
        # so the sibling column is invisible to normal scans.
        if (
            self.format_version >= 3
            and str(
                self.meta.properties.get("write.parquet.variant-shredding.enabled", "")
            ).lower()
            == "true"
        ):
            props = (meta or self.meta).properties
            # cache keyed by FIELD ID, not name: a dropped-then-recreated
            # (or renamed-onto) variant column must never inherit the old
            # column's shred schema — the same id-resolution rule the
            # equality-delete and identifier-field paths follow
            vfields = [f_ for f_ in ts.fields if f_.type == "variant"]
            fid = {f_.name: f_.id for f_ in vfields}
            shred = {
                f_.name: props[_VARIANT_SCHEMA_PROP + str(f_.id)]
                for f_ in vfields
                if _VARIANT_SCHEMA_PROP + str(f_.id) in props
            }
            missing = [f_.name for f_ in vfields if f_.name not in shred]
            if missing:
                inferred = self._infer_variant_shred_schemas(out, missing)
                shred.update(inferred)
                if meta is not None:
                    for c, ddl in inferred.items():
                        meta.properties[_VARIANT_SCHEMA_PROP + str(fid[c])] = ddl
            for c, ddl in shred.items():
                out = out.withColumn(
                    f"{c}__typed_value", F.from_json(F.col(c), ddl)
                )
        commit_dir = os.path.join(self.location, "data", f"c-{uuid.uuid4().hex[:12]}")
        transforms = self._transforms()
        dtypes = dict(out.dtypes)
        # bloom-filter write properties (iceberg_feature_tests.py:1087-1094):
        # write.parquet.bloom-filter-enabled.column.<col>=true → the parquet
        # writer's per-column bloom option. Like the reference notes
        # (flink_feature_tests.py:1620-1626), presence isn't observable from
        # SQL — the option is honored at the file level.
        bloom_opts = {
            f"parquet.bloom.filter.enabled#{prop.rsplit('.', 1)[1]}": "true"
            for prop, val in self.meta.properties.items()
            if prop.startswith("write.parquet.bloom-filter-enabled.column.")
            and str(val).lower() == "true"
        }
        if transforms:
            # identity transforms partition on an aliased copy (__p_<col>):
            # partitionBy strips the partition column from the data files,
            # and the source column must survive in the data.
            pcols = {
                (f"__p_{t.source}" if t.kind == "identity" else t.field_name): t.apply_typed(
                    dtypes[t.source]
                )
                for t in transforms
            }
            (
                out.withColumns(pcols)
                .write.options(**bloom_opts)
                .partitionBy(*pcols.keys())
                .parquet(commit_dir)
            )
        else:
            out.write.options(**bloom_opts).parquet(commit_dir)

        paths = []
        for root, _dirs, names in os.walk(commit_dir):
            for n in names:
                if n.endswith(".parquet"):
                    paths.append(os.path.join(root, n))
        stats = _collect_file_stats(self.spark, paths)
        entries = []
        for p in sorted(paths):
            st = stats[p]
            if st["rows"] == 0:
                # Iceberg never commits empty data files; drop the part
                # files Spark's empty input partitions produce.
                os.remove(p)
                continue
            partition = _partition_from_path(os.path.relpath(p, commit_dir))
            entries.append(
                DataFileEntry(
                    path=p,
                    record_count=st["rows"],
                    partition=partition,
                    schema_id=schema_id,
                    sequence_number=sequence_number,
                    file_size_bytes=st["size"],
                    lower_bounds=st["lower"],
                    upper_bounds=st["upper"],
                    null_counts=st["nulls"],
                    value_counts=st["values"],
                )
            )
        return entries

    def _write_delete_file(
        self, df: DataFrame, content: int, sequence_number: int, equality_columns=()
    ) -> DeleteFileEntry:
        by_name = {f.name: f.id for f in self.meta.current_schema.fields}
        unknown = [c for c in equality_columns if c not in by_name]
        if unknown:
            raise ValueError(
                f"equality delete key column(s) {unknown} not in the current "
                f"schema — refusing to write a delete file whose equality_ids "
                f"would not cover its key columns"
            )
        equality_ids = [by_name[c] for c in equality_columns]
        ddir = os.path.join(self.location, "deletes")
        name = f"delete-{uuid.uuid4().hex[:12]}"
        path = os.path.join(ddir, name)
        df.coalesce(1).write.parquet(path)
        files = [
            os.path.join(path, n) for n in os.listdir(path) if n.endswith(".parquet")
        ]
        stats = _collect_file_stats(self.spark, files)
        rows = sum(s["rows"] for s in stats.values())
        # V3 MoR position deletes are deletion vectors in Puffin files in
        # real Iceberg (iceberg_feature_tests.py:1533-1537); IceLite emits
        # one consolidated parquet per commit and tags it PUFFIN to model
        # the same observable.
        fmt = "PUFFIN" if (content == 1 and self.format_version >= 3) else "PARQUET"
        return DeleteFileEntry(
            path=path,
            content=content,
            record_count=rows,
            sequence_number=sequence_number,
            file_format=fmt,
            equality_columns=list(equality_columns),
            equality_ids=equality_ids,
        )

    def _snapshot(
        self,
        meta: TableMetadata,
        operation: str,
        data_files: list[DataFileEntry],
        delete_files: list[DeleteFileEntry],
        parent: Snapshot | None,
        branch: str = "main",
        extra_summary: dict | None = None,
    ) -> TableMetadata:
        sid = meta.new_snapshot_id()
        meta.last_snapshot_id = sid
        if meta.format_version >= 3:
            # V3 row lineage: newly committed files get a first_row_id;
            # rows read back first_row_id + position. Files carried over
            # from the parent keep theirs.
            for f in data_files:
                if f.first_row_id is None:
                    f.first_row_id = meta.next_row_id
                    meta.next_row_id += f.record_count
        total = sum(f.record_count for f in data_files)
        prev_files = {f.path for f in parent.data_files} if parent else set()
        added = [f for f in data_files if f.path not in prev_files]
        removed = prev_files - {f.path for f in data_files}
        summary = {
            "operation": operation,
            "added-data-files": len(added),
            "deleted-data-files": len(removed),
            "added-records": sum(f.record_count for f in added),
            "total-records": total,
            "total-data-files": len(data_files),
            "total-delete-files": len(delete_files),
            "total-position-deletes": sum(
                d.record_count for d in delete_files if d.content == 1
            ),
            "total-equality-deletes": sum(
                d.record_count for d in delete_files if d.content == 2
            ),
        }
        summary.update(extra_summary or {})
        snap = Snapshot(
            snapshot_id=sid,
            parent_id=parent.snapshot_id if parent else None,
            sequence_number=meta.last_sequence_number,
            timestamp_ms=_now_ms(),
            operation=operation,
            data_files=data_files,
            delete_files=delete_files,
            summary=summary,
            schema_id=meta.current_schema_id,
        )
        existing = meta.refs.get(branch)
        if existing is not None and existing.type == "tag":
            raise ValueError(f"cannot write to tag {branch!r}")
        meta.snapshots.append(snap)
        meta.refs[branch] = Ref(snapshot_id=sid, type="branch")
        return meta

    def _distribute_for_write(self, df: DataFrame) -> DataFrame:
        """Honor ``write.distribution-mode`` (none | hash | range) like
        Iceberg's writer. ``hash`` clusters rows by the partition
        transforms so each task writes one file per partition instead of
        EVERY task writing to every partition — the small-files
        explosion that kills 1000-executor writes. ``range`` range-
        partitions on partition transforms + sort order so fresh files
        carry tight, near-disjoint min/max bounds (clustered-on-write,
        no rewrite needed). Any registered sort order is also applied as
        the local in-partition sort, both modes."""
        mode = str(
            self.meta.properties.get("write.distribution-mode", "none")
        ).lower()
        if mode not in ("none", "hash", "range"):
            raise ValueError(f"bad write.distribution-mode: {mode!r}")
        dtypes = dict(df.dtypes)
        order = [
            F.col(f["column"]).desc() if f["direction"] == "desc" else F.col(f["column"]).asc()
            for f in self.sort_order_fields()
            if f["column"] in dtypes
        ]
        pexprs = [
            t.apply_typed(dtypes[t.source])
            for t in self._transforms()
            if t.source in dtypes
        ]
        if mode == "hash" and pexprs:
            df = df.repartition(*pexprs)
        elif mode == "range" and (pexprs or order):
            df = df.repartitionByRange(*pexprs, *order)
        if order:
            df = df.sortWithinPartitions(*order)
        return df

    def append(
        self,
        df: DataFrame,
        branch: str = "main",
        extra_summary: dict | None = None,
    ) -> None:
        """Append-only write → one new snapshot (one commit per write, the
        invariant the reference's streaming tests count on).
        ``extra_summary`` rides along in the same atomic commit — the
        streaming sink stores its epoch bookkeeping there so a crash
        between "write" and "record batch id" is impossible."""
        df = self._distribute_for_write(df)

        def mutate(meta: TableMetadata) -> TableMetadata:
            meta.last_sequence_number += 1
            entries = self._write_data_files(
                df, meta.current_schema_id, meta.last_sequence_number, meta=meta
            )
            parent = _head(meta, branch)
            data = (parent.data_files if parent else []) + entries
            deletes = parent.delete_files if parent else []
            return self._snapshot(
                meta, "append", data, deletes, parent, branch,
                extra_summary=extra_summary,
            )

        self._commit(mutate)

    def add_files(self, paths: list[str], branch: str = "main") -> int:
        """Iceberg's ``add_files`` procedure shape: adopt EXISTING parquet
        files as data files WITHOUT rewriting — the manifest entries point
        at the files in place, so a foreign writer's output (DuckDB, a
        bulk loader) becomes table data with a metadata-only commit. The
        inverse of tables/interop.py's export direction.

        Scope guards, loudly enforced: unpartitioned tables only (adopted
        files carry no partition values); every file must share at least
        one column with the current schema (missing columns read as NULL
        through the schema'd scan, extra columns are ignored); a path
        already referenced by the head snapshot is rejected (Iceberg's
        duplicate check). Returns the number of files adopted; zero-row
        files are skipped but never deleted — they aren't ours.
        """
        import pyarrow.parquet as pq  # noqa: PLC0415

        if self._transforms():
            raise ValueError(
                "add_files supports unpartitioned tables only (adopted "
                "files carry no partition values)"
            )
        resolved: list[str] = []
        for p in paths:
            if os.path.isdir(p):
                resolved.extend(
                    sorted(
                        os.path.join(root, n)
                        for root, _d, names in os.walk(p)
                        for n in names
                        if n.endswith(".parquet")
                    )
                )
            else:
                resolved.append(p)
        if not resolved:
            raise ValueError("add_files: no parquet files at the given paths")
        # intra-call dedupe (a directory expansion can overlap an explicit
        # file): adopting the same file twice would silently double every
        # row it contains on all subsequent scans
        seen: set[str] = set()
        resolved = [
            p for p in resolved
            if not (_file_uri(p) in seen or seen.add(_file_uri(p)))
        ]
        current_cols = set(self.meta.current_schema.names())
        for p in resolved:
            cols = set(pq.read_schema(p).names)
            if not (cols & current_cols):
                raise ValueError(
                    f"add_files: {p} shares no columns with the table "
                    f"schema {sorted(current_cols)}"
                )
        stats = _collect_file_stats(self.spark, resolved)
        adopted = [p for p in resolved if stats[p]["rows"] > 0]

        def mutate(meta: TableMetadata) -> TableMetadata:
            parent = _head(meta, branch)
            existing = {_file_uri(f.path) for f in (parent.data_files if parent else [])}
            dupes = [p for p in adopted if _file_uri(p) in existing]
            if dupes:
                raise ValueError(f"add_files: already referenced: {dupes}")
            meta.last_sequence_number += 1
            seq = meta.last_sequence_number
            entries = [
                DataFileEntry(
                    path=p,
                    record_count=stats[p]["rows"],
                    schema_id=meta.current_schema_id,
                    sequence_number=seq,
                    file_size_bytes=stats[p]["size"],
                    lower_bounds=stats[p]["lower"],
                    upper_bounds=stats[p]["upper"],
                    null_counts=stats[p]["nulls"],
                    value_counts=stats[p]["values"],
                )
                for p in adopted
            ]
            data = (parent.data_files if parent else []) + entries
            deletes = parent.delete_files if parent else []
            return self._snapshot(
                meta,
                "append",
                data,
                deletes,
                parent,
                branch,
                {"added-files-via-add-files": len(entries)},
            )

        self._commit(mutate)
        return len(adopted)

    def append_arrow(self, arrow_table, branch: str = "main") -> None:
        """Append a pyarrow Table (PyIceberg's ``tbl.append(pa.table)``
        surface, /root/reference/tests/pyiceberg_feature_tests.py:155-158).
        Arrow → DataFrame conversion is zero-copy batch transfer."""
        self.append(self.spark.createDataFrame(arrow_table), branch=branch)

    def to_arrow(self, **read_kwargs):
        """Scan to a pyarrow Table (``tbl.scan().to_arrow()`` parity)."""
        return self.df(**read_kwargs).toArrow()

    def scan(
        self,
        row_filter: str | None = None,
        selected_fields=None,
        limit: int | None = None,
        **read_kwargs,
    ) -> "TableScan":
        """PyIceberg's scan shape, literally — the reference calls
        ``tbl.scan(...).to_arrow()`` throughout its PyIceberg suite
        (pyiceberg_feature_tests.py:157-158,495 with snapshot_id).
        ``row_filter`` is a SQL predicate string; time-travel kwargs
        (snapshot_id / as_of_timestamp_ms / ref) pass through to df()."""
        df = self.df(**read_kwargs)
        if row_filter:
            df = df.filter(row_filter)
        if selected_fields:
            df = df.select(*selected_fields)
        if limit is not None:
            df = df.limit(limit)
        return TableScan(df)

    def overwrite(self, df: DataFrame, branch: str = "main") -> None:
        """Full-table INSERT OVERWRITE (flink suite :640,892)."""
        df = self._distribute_for_write(df)

        def mutate(meta: TableMetadata) -> TableMetadata:
            meta.last_sequence_number += 1
            entries = self._write_data_files(
                df, meta.current_schema_id, meta.last_sequence_number, meta=meta
            )
            parent = _head(meta, branch)
            return self._snapshot(meta, "overwrite", entries, [], parent, branch)

        self._commit(mutate)

    # ----------------------------------------------------------------- reads

    def _resolve_snapshot(
        self,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
        ref: str = "main",
    ) -> Snapshot | None:
        if snapshot_id is not None:
            return self.meta.snapshot_by_id(snapshot_id)
        if as_of_timestamp_ms is not None:
            eligible = [
                s for s in self.meta.snapshots if s.timestamp_ms <= as_of_timestamp_ms
            ]
            if not eligible:
                raise ValueError(f"no snapshot at or before {as_of_timestamp_ms}")
            return max(eligible, key=lambda s: (s.timestamp_ms, s.snapshot_id))
        r = self.meta.refs.get(ref)
        if r is None:
            if ref == "main":
                return None
            raise KeyError(f"unknown ref {ref}")
        return self.meta.snapshot_by_id(r.snapshot_id)

    def df(
        self,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
        ref: str = "main",
        filters: list[tuple] | None = None,
        with_lineage: bool = False,
    ) -> DataFrame:
        """Snapshot read (time travel via snapshot_id / timestamp / ref —
        the VERSION AS OF / TIMESTAMP AS OF / branch_x surface).

        ``with_lineage=True`` (V3 only) appends the hidden row-lineage
        columns ``_row_id`` and ``_last_updated_sequence_number``
        (iceberg_feature_tests.py:1483-1487)."""
        snap = self._resolve_snapshot(snapshot_id, as_of_timestamp_ms, ref)
        # Iceberg time-travel semantics: a snapshot/timestamp-pinned read
        # returns the SNAPSHOT's schema (a later drop_column must not
        # erase history; later adds must not appear). Branch/ref reads
        # keep the current schema, also like Iceberg.
        project_to = None
        if (
            (snapshot_id is not None or as_of_timestamp_ms is not None)
            and snap is not None
            and snap.schema_id is not None
        ):
            project_to = self.meta.schema_by_id(snap.schema_id)
        if not with_lineage:
            return self._read_snapshot(snap, filters=filters, project_to=project_to)
        if self.format_version < 3:
            raise ValueError("row lineage requires format-version 3")
        out = self._read_snapshot(snap, filters=filters, with_meta=True)
        fr_map = local_df(
            self.spark,
            [
                (_file_uri(f.path), f.first_row_id)
                for f in (snap.data_files if snap else [])
            ]
            or [("", None)],
            f"{_META_FILE} string, __first_row_id long",
        )
        return (
            out.join(F.broadcast(fr_map), _META_FILE, "left")
            .withColumn("_row_id", F.col("__first_row_id") + F.col(_META_POS))
            .withColumn("_last_updated_sequence_number", F.col(_META_SEQ))
            .drop(_META_FILE, _META_POS, _META_SEQ, "__first_row_id")
        )

    def read_incremental(self, start_snapshot_id: int, end_snapshot_id: int) -> DataFrame:
        """Append-only incremental read of rows added in (start, end] —
        Spark's start-snapshot-id/end-snapshot-id options (flink's
        start-tag/end-tag hints, :1208-1211).

        The range must contain only appends, and that is VALIDATED:
        a CoW rewrite inside the range re-sequences pre-existing
        surviving rows, which would surface as "newly added" — Iceberg
        likewise raises on non-append snapshots in an incremental scan.
        Use :meth:`snapshot_changes` for ranges with row-level changes."""
        start = self.meta.snapshot_by_id(start_snapshot_id)
        end = self.meta.snapshot_by_id(end_snapshot_id)
        lo, hi = start.sequence_number, end.sequence_number
        non_append = [
            s.operation
            for s in self.meta.snapshots
            if lo < s.sequence_number <= hi and s.operation != "append"
        ]
        if non_append:
            raise ValueError(
                f"incremental read range contains non-append operation(s) "
                f"{sorted(set(non_append))}; rewritten files would surface "
                f"old rows as new — use snapshot_changes for CDC"
            )
        files = [f for f in end.data_files if lo < f.sequence_number <= hi]
        return self._read_files(files, with_meta=False)

    def snapshot_changes(
        self, start_snapshot_id: int, end_snapshot_id: int
    ) -> DataFrame:
        """CDC changelog between two snapshots: the table rows plus a
        ``_change_type`` column ('insert' | 'delete') — Iceberg's
        create_changelog_view shape, expressed Spark-first as a MULTISET
        state diff: inserts = state@end ∖ state@start, deletes =
        state@start ∖ state@end (``exceptAll``, so duplicate rows diff by
        multiplicity). Works across any operation mix — appends, CoW/MoR
        DELETE/UPDATE, MERGE — because it diffs materialized states
        rather than replaying operation metadata; an UPDATE surfaces as
        its delete+insert pair. Scale: two MoR-resolved scans + two
        hash-distinct-style shuffles on the full row, the same cost
        class as the DISTINCT the diff semantics require."""
        # both states project to the CURRENT schema (not each snapshot's
        # own, as time travel now does): the diff needs ONE row shape,
        # and a changelog feeds a replica of the current table
        before = self._read_snapshot(self.meta.snapshot_by_id(start_snapshot_id))
        after = self._read_snapshot(self.meta.snapshot_by_id(end_snapshot_id))
        return after.exceptAll(before).withColumn(
            "_change_type", F.lit("insert")
        ).unionAll(
            before.exceptAll(after).withColumn("_change_type", F.lit("delete"))
        )

    def _prune_files(
        self, files: list[DataFileEntry], filters: list[tuple]
    ) -> list[DataFileEntry]:
        return prune_files(files, filters, self._transforms())

    def _read_files(
        self,
        files: list[DataFileEntry],
        with_meta: bool,
        project_to: "TableSchema | None" = None,
    ) -> DataFrame:
        """Read a data-file list, resolving schema evolution by field ID.
        ``project_to`` overrides the projection target (time-travel reads
        use the SNAPSHOT's schema, like Iceberg's VERSION AS OF)."""
        current = project_to if project_to is not None else self.meta.current_schema
        if not files:
            base = self.spark.createDataFrame([], self._spark_schema(current))
            if with_meta:
                base = base.withColumns(
                    {
                        _META_FILE: F.lit(None).cast("string"),
                        _META_POS: F.lit(None).cast("long"),
                        _META_SEQ: F.lit(None).cast("long"),
                    }
                )
            return base

        by_schema: dict[int, list[DataFileEntry]] = {}
        for f in files:
            by_schema.setdefault(f.schema_id, []).append(f)

        parts = []
        for schema_id, group in by_schema.items():
            file_schema = self.meta.schema_by_id(schema_id)
            reader = self.spark.read.schema(self._spark_schema(file_schema))
            raw = reader.parquet(*[f.path for f in group])
            # field-ID projection: rename/cast/backfill to current schema
            by_id = {f.id: f for f in file_schema.fields}
            cols = []
            for cf in current.fields:
                old = by_id.get(cf.id)
                if old is not None:
                    cols.append(F.col(old.name).cast(_physical_type(cf.type)).alias(cf.name))
                else:
                    # field added after this file was written: V3 columns
                    # with an initial-default read that value, others NULL
                    cols.append(
                        F.lit(cf.initial_default).cast(_physical_type(cf.type)).alias(cf.name)
                    )
            if with_meta:
                cols += [
                    F.col("_metadata.file_path").alias(_META_FILE),
                    F.col("_metadata.row_index").alias(_META_POS),
                ]
            parts.append(raw.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if with_meta:
            seq_map = local_df(
                self.spark,
                [(_file_uri(f.path), f.sequence_number) for f in files],
                f"{_META_FILE} string, {_META_SEQ} long",
            )
            out = out.join(F.broadcast(seq_map), _META_FILE, "left")
        return out

    def _read_snapshot(
        self,
        snap: Snapshot | None,
        with_meta: bool = False,
        filters: list[tuple] | None = None,
        project_to: "TableSchema | None" = None,
    ) -> DataFrame:
        if snap is None:
            return self._read_files([], with_meta, project_to=project_to)
        files = snap.data_files
        if filters:
            files = self._prune_files(files, filters)
        df = self._read_files(files, with_meta=True, project_to=project_to)

        pos_deletes = [d for d in snap.delete_files if d.content == 1]
        if pos_deletes:
            dels = self.spark.read.parquet(*[d.path for d in pos_deletes]).select(
                F.col("file_path").alias(_META_FILE), F.col("pos").alias(_META_POS)
            )
            df = df.join(F.broadcast(dels), [_META_FILE, _META_POS], "left_anti")

        for d in (d for d in snap.delete_files if d.content == 2):
            # resolve the delete key by FIELD ID so renames after the
            # delete was written still target the right column; the
            # parquet delete file itself carries the write-time names
            if d.equality_ids:
                proj = project_to if project_to is not None else self.meta.current_schema
                by_id = {f.id: f.name for f in proj.fields}
                missing = [i for i in d.equality_ids if i not in by_id]
                if missing:
                    raise ValueError(
                        f"equality delete {d.path} references field id(s) "
                        f"{missing} that no longer exist in the current "
                        f"schema — an equality-key column was dropped after "
                        f"the delete was written; the delete cannot be "
                        f"applied correctly"
                    )
                cur_cols = [by_id[i] for i in d.equality_ids]
            else:  # legacy entries: name-addressed
                cur_cols = list(d.equality_columns)
            keys = self.spark.read.parquet(d.path).select(
                *d.equality_columns
            ).toDF(*cur_cols)
            # equality deletes apply only to rows written BEFORE the
            # delete, and match NULL-SAFELY: the Iceberg reader treats a
            # delete row carrying NULL as matching data rows with NULL in
            # that column (spec §Equality Delete Files; the reference's
            # writers key on PK fields, flink_feature_tests.py:769-776,
            # but the spec semantics are <=> not =)
            cond = None
            for c in cur_cols:
                piece = F.col(f"__eqdata.{c}").eqNullSafe(F.col(f"__eqdel.{c}"))
                cond = piece if cond is None else (cond & piece)
            doomed = (
                df.filter(F.col(_META_SEQ) < F.lit(d.sequence_number))
                .alias("__eqdata")
                .join(F.broadcast(keys.alias("__eqdel")), cond, "left_semi")
                .select(_META_FILE, _META_POS)
            )
            df = df.join(doomed, [_META_FILE, _META_POS], "left_anti")

        if not with_meta:
            df = df.drop(_META_FILE, _META_POS, _META_SEQ)
        if filters:
            for col, op, val in filters:
                df = df.filter(F.expr(f"{col} {'==' if op == '=' else op} {_sql_lit(val)}"))
        return df

    # ------------------------------------------------------------------- DML

    def _dml_mode(self, op: str) -> str:
        return self.meta.properties.get(f"write.{op}.mode", "copy-on-write")

    def delete(
        self,
        where: str | None = None,
        branch: str = "main",
        delete_filter: str | None = None,
    ) -> None:
        """DELETE FROM ... WHERE (iceberg_feature_tests.py:516).

        ``delete_filter`` is PyIceberg's keyword for the same predicate —
        the reference calls ``tbl.delete(delete_filter="id == 2")``
        (pyiceberg_feature_tests.py:214); ``==`` is valid Spark SQL so
        the string passes through unchanged.

        MoR writes position-delete files (single PUFFIN-tagged DV file on
        V3); CoW rewrites only the files containing matches, leaving the
        rest untouched (:553-585, :667-680)."""
        if where is None:
            where = delete_filter
        if where is None:
            raise ValueError("delete needs a predicate (where= or delete_filter=)")
        cond = F.expr(where)
        mode = self._dml_mode("delete")
        if self._current_snapshot(branch) is None:
            if branch != "main" and branch not in self.meta.refs:
                # a typo'd/never-created branch must fail loudly, never
                # silently swallow the write as an empty-table no-op
                raise ValueError(f"unknown branch {branch!r}")
            # Iceberg semantics: DELETE on a table with no snapshots
            # matches nothing and commits nothing (the reference runs
            # DELETE right after CREATE in its MoR probes).
            return

        def mutate(meta: TableMetadata) -> TableMetadata:
            parent = _head(meta, branch)
            if parent is None:
                raise ValueError("delete on empty table")
            live = self._read_snapshot(parent, with_meta=True)
            meta.last_sequence_number += 1
            seq = meta.last_sequence_number
            if mode == "merge-on-read":
                hits = live.filter(cond).select(
                    F.col(_META_FILE).alias("file_path"), F.col(_META_POS).alias("pos")
                )
                entry = self._write_delete_file(hits, content=1, sequence_number=seq)
                if entry.record_count == 0:
                    # Iceberg never commits empty delete files — each one
                    # would tax EVERY future read with a no-op anti-join
                    # (an idempotent cleanup job could accrete hundreds)
                    import shutil as _shutil  # noqa: PLC0415

                    _shutil.rmtree(entry.path, ignore_errors=True)
                    return self._snapshot(
                        meta, "delete", parent.data_files, parent.delete_files,
                        parent, branch,
                    )
                return self._snapshot(
                    meta,
                    "delete",
                    parent.data_files,
                    parent.delete_files + [entry],
                    parent,
                    branch,
                    {"added-position-deletes": entry.record_count},
                )
            # copy-on-write: rewrite only affected files
            affected = {
                r[0]
                for r in live.filter(cond).select(_META_FILE).distinct().collect()
            }
            if not affected:
                return self._snapshot(
                    meta, "delete", parent.data_files, parent.delete_files, parent, branch
                )
            keep_files = [
                f for f in parent.data_files if _file_uri(f.path) not in affected
            ]
            # keep rows where the predicate is NOT TRUE (null-safe): a plain
            # `~cond` maps NULL→NULL and filter drops it — silently deleting
            # rows the predicate didn't match. SQL DELETE removes TRUE only.
            survivors = live.filter(
                F.col(_META_FILE).isin(list(affected)) & ~(cond.eqNullSafe(F.lit(True)))
            ).drop(_META_FILE, _META_POS, _META_SEQ)
            new_entries = self._write_data_files(survivors, meta.current_schema_id, seq, meta=meta)
            return self._snapshot(
                meta,
                "delete",
                keep_files + new_entries,
                parent.delete_files,
                parent,
                branch,
            )

        self._commit(mutate)

    def update(self, set_exprs: dict[str, str], where: str = "true", branch: str = "main") -> None:
        """UPDATE ... SET ... WHERE (iceberg_feature_tests.py:512)."""
        cond = F.expr(where)
        mode = self._dml_mode("update")
        if self._current_snapshot(branch) is None:
            if branch != "main" and branch not in self.meta.refs:
                raise ValueError(f"unknown branch {branch!r}")
            return  # no snapshots → nothing to update, nothing committed

        def mutate(meta: TableMetadata) -> TableMetadata:
            parent = _head(meta, branch)
            if parent is None:
                raise ValueError("update on empty table")
            live = self._read_snapshot(parent, with_meta=True)
            meta.last_sequence_number += 1
            seq = meta.last_sequence_number
            schema_cols = self.meta.current_schema.names()

            def apply_set(df: DataFrame) -> DataFrame:
                return df.withColumns({c: F.expr(e) for c, e in set_exprs.items()})

            if mode == "merge-on-read":
                matched = live.filter(cond)
                dels = matched.select(
                    F.col(_META_FILE).alias("file_path"), F.col(_META_POS).alias("pos")
                )
                dentry = self._write_delete_file(dels, content=1, sequence_number=seq)
                updated = apply_set(matched.drop(_META_FILE, _META_POS, _META_SEQ))
                added = self._write_data_files(updated, meta.current_schema_id, seq, meta=meta)
                return self._snapshot(
                    meta,
                    "overwrite",
                    parent.data_files + added,
                    parent.delete_files + [dentry],
                    parent,
                    branch,
                    {"added-position-deletes": dentry.record_count},
                )
            affected = {
                r[0]
                for r in live.filter(cond).select(_META_FILE).distinct().collect()
            }
            if not affected:
                return self._snapshot(
                    meta, "overwrite", parent.data_files, parent.delete_files, parent, branch
                )
            keep_files = [
                f for f in parent.data_files if _file_uri(f.path) not in affected
            ]
            scoped = live.filter(F.col(_META_FILE).isin(list(affected)))
            rewritten = (
                scoped.withColumns(
                    {
                        c: F.when(cond, F.expr(e)).otherwise(F.col(c))
                        for c, e in set_exprs.items()
                    }
                )
                .select(*schema_cols)
            )
            new_entries = self._write_data_files(rewritten, meta.current_schema_id, seq, meta=meta)
            return self._snapshot(
                meta, "overwrite", keep_files + new_entries, parent.delete_files, parent, branch
            )

        self._commit(mutate)

    def merge(
        self,
        source: DataFrame,
        on: str,
        matched_update: dict[str, str] | None = None,
        matched_delete: bool = False,
        insert_when_not_matched: bool = True,
        branch: str = "main",
        matched_clauses: list[tuple[str | None, tuple]] | None = None,
        not_matched_by_source_clauses: list[tuple[str | None, tuple]] | None = None,
        insert_condition: str | None = None,
    ) -> None:
        """MERGE INTO t USING s ON <cond> — CoW plan, same full-outer
        equi-join Spark uses (iceberg_feature_tests.py:525-529).

        ``on`` references aliases ``t`` (target) and ``s`` (source);
        ``matched_update`` maps target column → expression over t/s.

        Full clause grammar (round 8): ``matched_clauses`` /
        ``not_matched_by_source_clauses`` are ORDERED lists of
        ``(condition | None, action)`` with action ``("update", {col:
        expr})`` or ``("delete",)`` — per row, the first clause whose
        condition holds applies, later clauses are dead for that row
        (Spark's WHEN ... AND semantics). The legacy single-action
        kwargs remain as the unconditional one-clause special case.
        ``insert_condition`` guards the NOT MATCHED [BY TARGET] INSERT.
        """
        if matched_clauses is None:
            matched_clauses = []
            if matched_delete:
                matched_clauses.append((None, ("delete",)))
            elif matched_update is not None:
                matched_clauses.append((None, ("update", matched_update)))
        nmbs_clauses = not_matched_by_source_clauses or []

        src = source.withColumn("__s_present", F.lit(1))

        def mutate(meta: TableMetadata) -> TableMetadata:
            import dataclasses as _dc  # noqa: PLC0415

            parent = _head(meta, branch)
            live = self._read_snapshot(parent, with_meta=True)
            meta.last_sequence_number += 1
            seq = meta.last_sequence_number
            schema_cols = meta.current_schema.names()

            t, s = live.alias("t"), src.alias("s")
            t_present = F.col(f"t.{_META_FILE}").isNotNull()
            s_marker = F.col("s.__s_present").isNotNull()

            # Pass 1 (narrow): match-count per target row identity
            # (file, pos). Feeds BOTH the cardinality gate and victim-file
            # capture. Catalyst prunes the join inputs to the `on` keys +
            # meta columns, so at scale this pass shuffles a few bytes per
            # row, never the payload.
            joined = t.join(s, F.expr(on), "full_outer")
            match_stats = (
                joined.filter(t_present & s_marker)
                .groupBy(
                    F.col(f"t.{_META_FILE}").alias("__f"),
                    F.col(f"t.{_META_POS}").alias("__p"),
                )
                .agg(F.count(F.lit(1)).alias("__n"))
                .groupBy("__f")
                .agg(F.max("__n").alias("__max_n"))
                .collect()
            )
            if any(r["__max_n"] > 1 for r in match_stats):
                raise ValueError(
                    "MERGE cardinality violation: a target row matches more "
                    "than one source row (Iceberg raises here; dedupe the "
                    "source or use upsert() for last-writer-wins)"
                )
            affected = {r["__f"] for r in match_stats}
            if nmbs_clauses:
                # NOT MATCHED BY SOURCE can touch any target row, so
                # every live file is a rewrite candidate (Spark/Iceberg
                # CoW does the same file-level scoping)
                affected = {
                    _file_uri(f.path) for f in (parent.data_files if parent else [])
                }
            keep_files = [
                f for f in (parent.data_files if parent else []) if _file_uri(f.path) not in affected
            ]

            new_entries = []
            if affected or insert_when_not_matched:
                # Pass 2 (the only full-width join): victim files ⋈ source.
                # Every source row that matches ANY target row matches one
                # in an affected file (that is the definition of affected),
                # so unmatched-source detection against the SCOPED target is
                # exact — the rewrite never rescans unaffected files, and
                # the old second+third executions of the target×source join
                # (separate scoped/insert branches unioned) collapse into
                # one join consumed by a single filter + per-column CASE.
                if parent is not None and len(affected) < len(parent.data_files):
                    scoped_snap = _dc.replace(
                        parent,
                        data_files=[
                            f
                            for f in parent.data_files
                            if _file_uri(f.path) in affected
                        ],
                    )
                    t_scoped = self._read_snapshot(scoped_snap, with_meta=True)
                else:
                    t_scoped = live
                j2 = t_scoped.alias("t").join(src.alias("s"), F.expr(on), "full_outer")

                insert_rows = (~t_present) & s_marker
                if insert_condition:
                    insert_rows = insert_rows & F.expr(insert_condition).eqNullSafe(
                        F.lit(True)
                    )
                if not insert_when_not_matched:
                    insert_rows = F.lit(False)
                out = j2.filter(t_present | insert_rows)

                # Ordered first-match-wins clause resolution: one WHEN
                # chain assigns each row its clause index (matched and
                # not-matched-by-source rows are disjoint by marker, so a
                # single chain keeps each family's own ordering). Insert
                # rows (t side null) never satisfy a clause marker.
                all_clauses = [
                    (t_present & s_marker, cond, action)
                    for cond, action in matched_clauses
                ] + [
                    (t_present & ~s_marker, cond, action)
                    for cond, action in nmbs_clauses
                ]
                act = None
                for i, (mk, cond, _action) in enumerate(all_clauses):
                    full = mk & (F.expr(cond) if cond else F.lit(True))
                    act = (
                        F.when(full, F.lit(i))
                        if act is None
                        else act.when(full, F.lit(i))
                    )
                act = act.otherwise(F.lit(-1)) if act is not None else F.lit(-1)
                out = out.withColumn("__act", act)
                del_ids = [
                    i
                    for i, (_m, _c, a) in enumerate(all_clauses)
                    if a[0] == "delete"
                ]
                if del_ids:
                    out = out.filter(~F.col("__act").isin(del_ids))

                def _col_out(c: str) -> F.Column:
                    expr = None
                    for i, (_m, _c, a) in enumerate(all_clauses):
                        if a[0] != "update":
                            continue
                        e = F.expr(a[1].get(c, f"t.{c}"))
                        expr = (
                            F.when(F.col("__act") == i, e)
                            if expr is None
                            else expr.when(F.col("__act") == i, e)
                        )
                    base = F.col(f"t.{c}")
                    t_val = expr.otherwise(base) if expr is not None else base
                    s_val = (
                        F.col(f"s.{c}") if c in source.columns else F.lit(None)
                    )
                    return F.when(~t_present, s_val).otherwise(t_val).alias(c)

                out = out.select(*[_col_out(c) for c in schema_cols])
                new_entries = self._write_data_files(
                    out, meta.current_schema_id, seq, meta=meta
                )
            return self._snapshot(
                meta,
                "merge",
                keep_files + new_entries,
                parent.delete_files if parent else [],
                parent,
                branch,
            )

        self._commit(mutate)

    def set_identifier_fields(self, columns: list[str]) -> None:
        """ALTER TABLE ... SET IDENTIFIER FIELDS — declare the row-identity
        key (Iceberg schema identifier-field-ids). Stored as field IDS,
        so later RENAME COLUMN keeps the identity intact. ``upsert``
        defaults its key to these fields."""
        by_name = {f.name: f.id for f in self.meta.current_schema.fields}
        ids = []
        for c in columns:
            if c not in by_name:
                raise KeyError(f"identifier field not in schema: {c}")
            ids.append(by_name[c])

        def mutate(meta: TableMetadata) -> TableMetadata:
            meta.identifier_field_ids = ids
            return meta

        self._commit(mutate)

    def identifier_fields(self) -> list[str]:
        """Current NAMES of the identifier fields (resolved by ID)."""
        by_id = {f.id: f.name for f in self.meta.current_schema.fields}
        return [by_id[i] for i in self.meta.identifier_field_ids if i in by_id]

    def upsert(
        self,
        source: DataFrame,
        key_columns: list[str] | None = None,
        branch: str = "main",
        extra_summary: dict | None = None,
        order_by: str | None = None,
    ) -> None:
        """Streaming-style PK upsert via equality deletes + append in ONE
        snapshot (flink write.upsert.enabled, :764-784): new rows carry
        the same sequence number as the delete, so the equality delete
        only affects older files. ``key_columns`` defaults to the
        table's identifier fields (set_identifier_fields).

        Same-batch duplicate keys: a DataFrame has no inherent row order,
        so "last" is ill-defined without one — pass ``order_by`` (a
        column whose max identifies the winner, e.g. an event timestamp)
        for deterministic last-writer-wins; without it ONE ARBITRARY row
        per key is kept (dropDuplicates), matching what Flink's upsert
        gives only when the batch carries at most one row per key."""
        if key_columns is None:
            key_columns = self.identifier_fields()
            if not key_columns:
                raise ValueError(
                    "upsert needs key_columns or table identifier fields "
                    "(set_identifier_fields)"
                )

        def mutate(meta: TableMetadata) -> TableMetadata:
            parent = _head(meta, branch)
            meta.last_sequence_number += 1
            seq = meta.last_sequence_number
            if order_by is not None:
                w = Window.partitionBy(*key_columns).orderBy(
                    F.col(order_by).desc()
                )
                dedup = (
                    source.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            else:
                dedup = source.dropDuplicates(key_columns)
            keys = dedup.select(*key_columns)
            dentry = self._write_delete_file(
                keys, content=2, sequence_number=seq, equality_columns=key_columns
            )
            added = self._write_data_files(dedup, meta.current_schema_id, seq, meta=meta)
            return self._snapshot(
                meta,
                "overwrite",
                (parent.data_files if parent else []) + added,
                (parent.delete_files if parent else []) + [dentry],
                parent,
                branch,
                {"added-equality-deletes": dentry.record_count, **(extra_summary or {})},
            )

        self._commit(mutate)

    # ------------------------------------------------------- schema evolution

    def _evolve_schema(self, build) -> None:
        def mutate(meta: TableMetadata) -> TableMetadata:
            current = meta.current_schema
            new_fields = build(meta, [SchemaField(**vars(f)) for f in current.fields])
            # every evolution path (add / rename / future ones) funnels
            # through here: duplicate field names would commit fine and
            # make every later read ambiguous — reject before the commit
            # (case-insensitive, matching Spark's resolution)
            seen: set[str] = set()
            for f in new_fields:
                low = f.name.lower()
                if low in seen:
                    raise ValueError(f"duplicate column name: {f.name!r}")
                seen.add(low)
            new_schema = TableSchema(
                schema_id=current.schema_id + 1, fields=new_fields
            )
            meta.schemas.append(new_schema)
            meta.current_schema_id = new_schema.schema_id
            return meta

        self._commit(mutate)

    def add_columns(
        self, columns: dict[str, str], defaults: dict[str, object] | None = None
    ) -> None:
        """ALTER TABLE ADD COLUMNS — old rows read NULL, or the V3
        initial-default when one is given (iceberg_feature_tests.py:708-711
        and :771-776 `val STRING DEFAULT 'hello'`)."""
        if defaults and self.format_version < 3:
            raise ValueError("column DEFAULT values require format-version 3")
        for name, dtype in columns.items():
            if dtype in ("timestamp_ns", "variant", "geometry") and (
                self.format_version < 3
            ):
                # same V3 gate as CREATE (catalog.py): evolving a V3-only
                # type onto a v2 table would commit spec-invalid metadata
                raise ValueError(
                    f"type {dtype!r} requires format-version 3 (column {name!r})"
                )

        def build(meta, fields):
            for name, dtype in columns.items():
                meta.last_field_id += 1
                dflt = (defaults or {}).get(name)
                fields.append(
                    SchemaField(
                        id=meta.last_field_id,
                        name=name,
                        type=dtype,
                        initial_default=dflt,
                        write_default=dflt,
                    )
                )
            return fields

        self._evolve_schema(build)

    def rename_column(self, old: str, new: str) -> None:
        def build(meta, fields):
            for f in fields:
                if f.name == old:
                    f.name = new
                    return fields
            raise KeyError(old)

        self._evolve_schema(build)

    def drop_column(self, name: str) -> None:
        def build(meta, fields):
            out = [f for f in fields if f.name != name]
            if len(out) == len(fields):
                raise KeyError(name)
            return out

        self._evolve_schema(build)

    def alter_column_type(self, name: str, new_type: str) -> None:
        """Type widening only (int→bigint, float→double, int→double)."""

        def build(meta, fields):
            for f in fields:
                if f.name == name:
                    if (f.type, new_type) not in _WIDENINGS:
                        raise ValueError(f"narrowing/unsupported: {f.type} → {new_type}")
                    f.type = new_type
                    return fields
            raise KeyError(name)

        self._evolve_schema(build)

    # --------------------------------------------------- partition evolution

    def _validate_partition_source(self, spec: str) -> None:
        """The transform's source column must exist NOW: a spec
        referencing a ghost column would commit fine and then brick every
        subsequent write with a raw KeyError at partition-value compute
        time (found by the ALTER fuzz, tests/test_sql_facade_properties)."""
        src = parse_transform(spec).source
        if src not in self.meta.current_schema.names():
            raise ValueError(
                f"partition transform source column not in schema: {src!r}"
            )

    def add_partition_field(self, spec: str) -> None:
        """ALTER TABLE ADD PARTITION FIELD (iceberg_feature_tests.py:968) —
        metadata-only; existing files keep their old layout."""
        self._validate_partition_source(spec)

        def mutate(meta: TableMetadata) -> TableMetadata:
            meta.partition_spec.append(spec)
            return meta

        self._commit(mutate)

    def drop_partition_field(self, spec: str) -> None:
        def mutate(meta: TableMetadata) -> TableMetadata:
            normalized = parse_transform(spec).spec_string()
            for i, existing in enumerate(meta.partition_spec):
                if parse_transform(existing).spec_string() == normalized:
                    meta.partition_spec.pop(i)
                    return meta
            raise KeyError(spec)

        self._commit(mutate)

    def replace_partition_field(self, old: str, new: str) -> None:
        """REPLACE PARTITION FIELD (redshift suite :1308-1328). The new
        spec is validated BEFORE the drop commits — otherwise a bad new
        field would leave the old one dropped and nothing added."""
        self._validate_partition_source(new)
        self.drop_partition_field(old)
        self.add_partition_field(new)

    def set_partition_fields(self, specs: list[str]) -> None:
        """Replace the ENTIRE partition spec in one metadata commit — the
        DuckDB suite's ``ALTER TABLE ... SET PARTITIONED BY (bucket(8,
        id))`` (duckdb_feature_tests.py:505). Existing files keep their
        old layout, like any spec evolution."""
        for s in specs:
            self._validate_partition_source(s)  # all validated before any commit

        def mutate(meta: TableMetadata) -> TableMetadata:
            meta.partition_spec = list(specs)
            return meta

        self._commit(mutate)

    # ------------------------------------------------------- sort order

    def replace_sort_order(self, columns: list[str]) -> None:
        """ALTER TABLE ... WRITE ORDERED BY — metadata-only commit that
        registers a new sort order and makes it the default. Columns may
        carry a direction suffix ("col desc"); default is ascending.
        Existing files keep their layout; `rewrite_data_files(strategy=
        "sort")` and range-distributed writes consult this order."""
        schema_names = set(self.meta.current_schema.names())
        fields = []
        for c in columns:
            parts = c.split()
            name = parts[0]
            direction = parts[1].lower() if len(parts) > 1 else "asc"
            if name not in schema_names:
                raise KeyError(f"sort column not in schema: {name}")
            if direction not in ("asc", "desc"):
                raise ValueError(f"bad sort direction: {c!r}")
            fields.append({"column": name, "direction": direction})

        def mutate(meta: TableMetadata) -> TableMetadata:
            order_id = max((o["order_id"] for o in meta.sort_orders), default=0) + 1
            meta.sort_orders.append({"order_id": order_id, "fields": fields})
            meta.default_sort_order_id = order_id
            return meta

        self._commit(mutate)

    def sort_order_fields(self) -> list[dict]:
        """The default sort order's fields ([] when unsorted)."""
        if self.meta.default_sort_order_id == 0:
            return []
        for o in self.meta.sort_orders:
            if o["order_id"] == self.meta.default_sort_order_id:
                return list(o["fields"])
        return []

    # ------------------------------------------------------------- refs

    def create_branch(self, name: str, snapshot_id: int | None = None) -> None:
        self._create_ref(name, "branch", snapshot_id)

    def create_tag(self, name: str, snapshot_id: int | None = None) -> None:
        """CREATE TAG ... AS OF VERSION (iceberg_feature_tests.py:888-889)."""
        self._create_ref(name, "tag", snapshot_id)

    def _create_ref(self, name: str, kind: str, snapshot_id: int | None) -> None:
        def mutate(meta: TableMetadata) -> TableMetadata:
            sid = snapshot_id if snapshot_id is not None else meta.current_snapshot_id
            if sid is None:
                raise ValueError("cannot create ref on empty table")
            meta.snapshot_by_id(sid)  # existence check
            meta.refs[name] = Ref(snapshot_id=sid, type=kind)
            return meta

        self._commit(mutate)

    def rollback_to_snapshot(self, snapshot_id: int) -> None:
        """Move ``main`` back to an ANCESTOR snapshot (the Iceberg
        ``rollback_to_snapshot`` procedure contract — arbitrary jumps go
        through :meth:`set_current_snapshot`). Later snapshots stay in
        metadata (and remain tag/branch-addressable) until
        ``expire_snapshots`` removes them."""

        def mutate(meta: TableMetadata) -> TableMetadata:
            meta.snapshot_by_id(snapshot_id)  # existence check
            by_id = {s.snapshot_id: s for s in meta.snapshots}
            sid = meta.current_snapshot_id
            while sid is not None and sid != snapshot_id:
                # stop cleanly if the chain crosses an expired snapshot —
                # the walk must end in the documented ValueError, not a
                # KeyError from the missing intermediate
                parent = by_id.get(sid)
                sid = parent.parent_id if parent is not None else None
            if sid != snapshot_id:
                raise ValueError(
                    f"snapshot {snapshot_id} is not an ancestor of the current "
                    "main head; use set_current_snapshot for non-linear jumps"
                )
            meta.refs["main"] = Ref(snapshot_id=snapshot_id, type="branch")
            return meta

        self._commit(mutate)

    def set_current_snapshot(self, snapshot_id: int) -> None:
        """Point ``main`` at ANY existing snapshot (Iceberg's
        ``set_current_snapshot`` procedure) — e.g. rolling forward again
        after a rollback."""

        def mutate(meta: TableMetadata) -> TableMetadata:
            meta.snapshot_by_id(snapshot_id)
            meta.refs["main"] = Ref(snapshot_id=snapshot_id, type="branch")
            return meta

        self._commit(mutate)

    def rollback_to_timestamp(self, timestamp_ms: int) -> int:
        """Move ``main`` back to the LATEST ancestor committed strictly
        before ``timestamp_ms`` (Iceberg's ``rollback_to_timestamp``
        procedure). Returns the snapshot id rolled back to."""
        target: list[int] = []

        def mutate(meta: TableMetadata) -> TableMetadata:
            by_id = {s.snapshot_id: s for s in meta.snapshots}
            sid = meta.current_snapshot_id
            while sid is not None:
                snap = by_id.get(sid)
                if snap is None:
                    break
                if snap.timestamp_ms < timestamp_ms:
                    meta.refs["main"] = Ref(snapshot_id=sid, type="branch")
                    target.append(sid)
                    return meta
                sid = snap.parent_id
            raise ValueError(
                f"no ancestor of main committed before {timestamp_ms}"
            )

        self._commit(mutate)
        # [-1]: _commit re-runs mutate on conflict retry; only the LAST
        # attempt's value is the committed one
        return target[-1]

    def fast_forward(self, branch: str, to: str) -> tuple[int | None, int]:
        """Fast-forward ``branch`` to another ref's head (Iceberg's
        ``fast_forward`` procedure — the publish step of the
        write-audit-publish pattern: stage commits on an audit branch,
        then fast-forward main). Requires ``branch``'s head to be an
        ancestor of ``to``'s head — a true fast-forward, never a merge.
        Returns (previous_head, new_head)."""
        out: list[tuple[int | None, int]] = []

        def mutate(meta: TableMetadata) -> TableMetadata:
            to_ref = meta.refs.get(to)
            if to_ref is None:
                raise ValueError(f"unknown ref {to!r}")
            cur = meta.refs.get(branch)
            if cur is not None and cur.type != "branch":
                raise ValueError(f"{branch!r} is a {cur.type}, not a branch")
            head = cur.snapshot_id if cur is not None else None
            # ancestry check: branch head must be on to-head's parent chain
            if head is not None:
                by_id = {s.snapshot_id: s for s in meta.snapshots}
                sid = to_ref.snapshot_id
                while sid is not None and sid != head:
                    s = by_id.get(sid)
                    sid = s.parent_id if s is not None else None
                if sid != head:
                    raise ValueError(
                        f"cannot fast-forward {branch!r}: its head {head} is "
                        f"not an ancestor of {to!r} ({to_ref.snapshot_id})"
                    )
            meta.refs[branch] = Ref(snapshot_id=to_ref.snapshot_id, type="branch")
            out.append((head, to_ref.snapshot_id))
            return meta

        self._commit(mutate)
        return out[-1]

    def cherrypick_snapshot(self, snapshot_id: int) -> int:
        """Re-apply an APPEND snapshot's added files on top of the current
        main head (Iceberg's ``cherrypick_snapshot`` — e.g. publishing one
        staged/rolled-back append without replaying history). Non-append
        snapshots are rejected, matching Iceberg's own restriction.
        Returns the new snapshot id."""
        out: list[int] = []

        def mutate(meta: TableMetadata) -> TableMetadata:
            src = meta.snapshot_by_id(snapshot_id)
            if src.operation != "append":
                raise ValueError(
                    f"cherrypick_snapshot supports append snapshots only; "
                    f"{snapshot_id} is {src.operation!r}"
                )
            by_id = {s.snapshot_id: s for s in meta.snapshots}
            src_parent = by_id.get(src.parent_id) if src.parent_id else None
            prev = {f.path for f in src_parent.data_files} if src_parent else set()
            added = [f for f in src.data_files if f.path not in prev]
            parent = _head(meta, "main")
            cur_paths = {f.path for f in parent.data_files} if parent else set()
            dup = [f.path for f in added if f.path in cur_paths]
            if dup:
                raise ValueError(
                    f"cherrypick would re-add files already live: {dup[:3]}"
                )
            meta.last_sequence_number += 1
            new_entries = [replace(f, sequence_number=meta.last_sequence_number) for f in added]
            data = (parent.data_files if parent else []) + new_entries
            deletes = parent.delete_files if parent else []
            m2 = self._snapshot(
                meta, "append", data, deletes, parent, "main",
                extra_summary={"source-snapshot-id": str(snapshot_id)},
            )
            out.append(m2.current_snapshot_id)
            return m2

        self._commit(mutate)
        return out[-1]

    def ancestors_of(self, snapshot_id: int | None = None) -> list[tuple[int, int]]:
        """(snapshot_id, timestamp_ms) for the parent chain starting at
        ``snapshot_id`` (default: current main head), newest first —
        Iceberg's ``ancestors_of`` procedure output."""
        meta = self.meta
        by_id = {s.snapshot_id: s for s in meta.snapshots}
        sid = snapshot_id if snapshot_id is not None else meta.current_snapshot_id
        if sid is not None and sid not in by_id:
            raise ValueError(f"unknown snapshot {sid}")
        chain: list[tuple[int, int]] = []
        while sid is not None:
            s = by_id.get(sid)
            if s is None:
                break
            chain.append((s.snapshot_id, s.timestamp_ms))
            sid = s.parent_id
        return chain

    def drop_ref(self, name: str) -> None:
        def mutate(meta: TableMetadata) -> TableMetadata:
            if name == "main":
                raise ValueError("cannot drop main")
            del meta.refs[name]
            return meta

        self._commit(mutate)

    def set_properties(self, props: dict[str, str]) -> None:
        """ALTER TABLE ... SET TBLPROPERTIES (flink :994)."""

        def mutate(meta: TableMetadata) -> TableMetadata:
            meta.properties.update(props)
            return meta

        self._commit(mutate)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _head(meta: TableMetadata, ref: str = "main") -> Snapshot | None:
    r = meta.refs.get(ref)
    return meta.snapshot_by_id(r.snapshot_id) if r else None


# V3 logical types → physical storage type (Spark simpleString).
_PHYSICAL_TYPES = {
    "timestamp_ns": "bigint",
    "variant": "string",
    # V3 geometry: WKB bytes physically (functions/geo.py is the codec);
    # the typed column is the Flink-DDL surface, flink_feature_tests.py:1459
    "geometry": "binary",
}


def _physical_type(logical: str) -> str:
    return _PHYSICAL_TYPES.get(logical, logical)


def prune_files(
    files: list[DataFileEntry], filters: list[tuple], transforms: list[Transform]
) -> list[DataFileEntry]:
    """Manifest-level file skipping: partition-transform projection +
    column min/max bounds (SURVEY §4). ``filters`` are simple
    conjunctive predicates (col, op, literal); anything not prunable
    is left to the parquet scan's pushdown. Standalone so the batch
    Python DataSource (sources/batch_source.py) can prune without a
    SparkSession."""
    by_source = {t.source: t for t in transforms}
    kept = []
    for f in files:
        alive = True
        for col, op, val in filters:
            # partition projection
            t = by_source.get(col)
            if t is not None and t.field_name in f.partition:
                pv = f.partition[t.field_name]
                proj = t.project_value(val)
                if proj is not None and pv is not None:
                    # identity: partition value IS the column value, so
                    # strict ops prune strictly; other transforms map a
                    # range of column values onto one partition value, so
                    # a file at the boundary must be kept
                    ident = t.kind == "identity"
                    if op == "=" and not _cmp_ok(pv, "=", proj):
                        alive = False
                    elif op in (">", ">=") and not _cmp_ok(
                        pv, op if ident else ">=", proj
                    ):
                        alive = False
                    elif op in ("<", "<=") and not _cmp_ok(
                        pv, op if ident else "<=", proj
                    ):
                        alive = False
            # column bounds
            lo = f.lower_bounds.get(col)
            hi = f.upper_bounds.get(col)
            if lo is not None and hi is not None:
                if op == "=" and not (_cmp_ok(hi, ">=", val) and _cmp_ok(lo, "<=", val)):
                    alive = False
                elif op in (">", ">=") and not _cmp_ok(hi, ">=", val):
                    alive = False
                elif op in ("<", "<=") and not _cmp_ok(lo, "<=", val):
                    alive = False
        if alive:
            kept.append(f)
    return kept


def _file_uri(path: str) -> str:
    """Spark's _metadata.file_path form for a local path (Hadoop-style
    single-slash scheme: ``file:/tmp/...``)."""
    return path if path.startswith("file:") else f"file:{path}"


def _sql_lit(val) -> str:
    if isinstance(val, str):
        escaped = val.replace("'", "''")
        return f"'{escaped}'"
    return str(val)


def _cmp_ok(a, op: str, b) -> bool:
    try:
        a2, b2 = _coerce(a, b)
        if op == "=":
            return a2 == b2
        if op == ">=":
            return a2 >= b2
        if op == "<=":
            return a2 <= b2
        if op == ">":
            return a2 > b2
        if op == "<":
            return a2 < b2
    except TypeError:
        return True  # incomparable → keep the file (pruning must be safe)
    return True


def _coerce(a, b):
    # Only compare like with like: coercing a numeric to str made range
    # pruning lexicographic ('10.5' < '9.0') and wrongly dropped files.
    # Cross-type pairs are incomparable → TypeError → caller keeps the file.
    num = (int, float)
    if isinstance(a, str) and isinstance(b, str):
        return a, b
    if isinstance(a, num) and isinstance(b, num) and not isinstance(a, bool) and not isinstance(b, bool):
        return a, b
    if type(a) is type(b):
        return a, b
    raise TypeError(f"incomparable partition/bound types: {type(a)} vs {type(b)}")


def _partition_from_path(rel_path: str) -> dict[str, object]:
    """Parse hive-style dirs (``name=value/...``) into partition values.

    Directory values are Hive-ESCAPED by the writer (':' → '%3A' etc.);
    unescape them, or prune_files would compare the escaped string
    against the raw filter literal and silently skip matching files
    (e.g. every identity partition on a timestamp-like string)."""
    from urllib.parse import unquote  # noqa: PLC0415

    out: dict[str, object] = {}
    for seg in rel_path.split(os.sep)[:-1]:
        if "=" not in seg:
            continue
        name, _, raw = seg.partition("=")
        raw = unquote(raw)
        if name.startswith("__p_"):
            name = name[4:]
        if raw == "__HIVE_DEFAULT_PARTITION__":
            out[name] = None
            continue
        try:
            out[name] = int(raw)
        except ValueError:
            try:
                out[name] = float(raw)  # identity-partitioned float/double cols
            except ValueError:
                out[name] = raw
    return out


# Below this many files a commit reads parquet footers in-process; above
# it the read fans out to executors. Footers are a few KB each, so the
# crossover is dominated by fixed job cost, not bytes: an RDD job with
# Python workers costs ~0.2-0.4 s regardless of size, while a driver
# footer read is ~1 ms/file — measured round 11 on the bench DML quartet
# (merge/wap/zorder/branch), whose commits write 1-2 files each. At
# production commit sizes (thousands of files per commit) the distributed
# path engages unchanged. Env-tunable for cluster profiles where driver
# I/O is remote (object store): set to 0 to always distribute.
_STATS_DRIVER_FILE_CUTOFF = int(
    os.environ.get("IMX_STATS_DRIVER_FILE_CUTOFF", "32")
)


def _collect_file_stats(spark: SparkSession, paths: list[str]) -> dict[str, dict]:
    """Parquet footer stats per file — executor-side for large commits,
    in-process below ``_STATS_DRIVER_FILE_CUTOFF`` files (same pyarrow
    footer walk either way; the dict is identical by construction)."""
    if not paths:
        return {}
    sc = spark.sparkContext
    n = max(1, min(len(paths), 32))

    def read_footers(it):
        import os as _os

        import pyarrow.parquet as pq

        for p in it:
            md = pq.ParquetFile(p).metadata
            lower: dict = {}
            upper: dict = {}
            nulls: dict = {}
            values: dict = {}
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    name = col.path_in_schema
                    # parquet num_values counts every value incl. nulls —
                    # exactly Iceberg's value_counts semantics
                    values[name] = values.get(name, 0) + col.num_values
                    st = col.statistics
                    if st is None:
                        continue
                    nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
                    if st.has_min_max:
                        mn, mx = _plain(st.min), _plain(st.max)
                        if name not in lower or _lt(mn, lower[name]):
                            lower[name] = mn
                        if name not in upper or _lt(upper[name], mx):
                            upper[name] = mx
            yield (
                p,
                {
                    "rows": md.num_rows,
                    "size": _os.path.getsize(p),
                    "lower": lower,
                    "upper": upper,
                    "nulls": nulls,
                    "values": values,
                },
            )

    if len(paths) <= _STATS_DRIVER_FILE_CUTOFF:
        return dict(read_footers(paths))
    return dict(sc.parallelize(paths, n).mapPartitions(read_footers).collect())


def _plain(v):
    import datetime as _dt

    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return v.hex()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return v


def _lt(a, b) -> bool:
    try:
        return a < b
    except TypeError:
        return str(a) < str(b)
