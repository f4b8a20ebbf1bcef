"""IceLite table metadata model + atomic commit protocol.

Mirrors the Iceberg metadata concepts the reference inspects — snapshots
with operation + summary counters (/root/reference/tests/
iceberg_feature_tests.py:577-580), delete-file content codes 1=position /
2=equality (flink suite :744-757), refs for branches/tags (:888-898),
schema list with field IDs for evolution (:702-750), metadata_log
(redshift fixtures :144).

Commit protocol: each commit writes ``metadata/v{N}.metadata.json`` with
``open(..., 'x')`` (create-exclusive). A concurrent writer racing to the
same N loses and must re-read + retry — optimistic concurrency like
Iceberg's catalog swap, with the filesystem as the arbiter.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field


class CommitConflict(Exception):
    """Another writer committed the same version first."""


@dataclass
class DataFileEntry:
    path: str
    record_count: int
    partition: dict[str, object] = field(default_factory=dict)
    schema_id: int = 0
    sequence_number: int = 0
    file_size_bytes: int = 0
    # V3 row lineage: _row_id of the file's first row; rows get
    # first_row_id + position (Iceberg's manifest-inherited row ids)
    first_row_id: int | None = None
    # column stats for manifest-level file skipping (SURVEY §4)
    lower_bounds: dict[str, object] = field(default_factory=dict)
    upper_bounds: dict[str, object] = field(default_factory=dict)
    null_counts: dict[str, int] = field(default_factory=dict)
    # Iceberg's value_counts: total values per column incl. nulls — the
    # reference reads it off `.files` (iceberg_feature_tests.py:1056-1068)
    value_counts: dict[str, int] = field(default_factory=dict)


@dataclass
class DeleteFileEntry:
    path: str
    content: int  # 1 = position deletes, 2 = equality deletes
    record_count: int
    sequence_number: int
    file_format: str = "PARQUET"  # "PUFFIN" marks V3 deletion vectors
    equality_columns: list[str] = field(default_factory=list)
    # FIELD IDS of the equality columns (Iceberg's equality_ids): the
    # names above are the write-time names; application resolves ids →
    # CURRENT names so RENAME COLUMN can't detach a delete from its key
    equality_ids: list[int] = field(default_factory=list)


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    sequence_number: int
    timestamp_ms: int
    operation: str  # append | overwrite | delete | replace | merge
    data_files: list[DataFileEntry]
    delete_files: list[DeleteFileEntry]
    summary: dict[str, object] = field(default_factory=dict)
    # the TABLE schema current when this snapshot committed: time-travel
    # reads project to it, like Iceberg (None on pre-upgrade snapshots →
    # readers fall back to the current schema)
    schema_id: int | None = None


@dataclass
class SchemaField:
    id: int
    name: str
    type: str  # logical type: Spark simpleString, or timestamp_ns/variant (V3)
    nullable: bool = True
    # V3 column defaults: initial-default back-fills pre-existing rows on
    # read; write-default fills the column when a writer omits it.
    initial_default: object = None
    write_default: object = None

    # PyIceberg's field attribute name (schema().find_field(c).field_type,
    # pyiceberg_feature_tests.py:373-375) — here the logical type string.
    @property
    def field_type(self) -> str:
        return self.type


@dataclass
class TableSchema:
    schema_id: int
    fields: list[SchemaField]

    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def spark_ddl(self) -> str:
        return ", ".join(f"{f.name} {f.type}" for f in self.fields)

    def find_field(self, name: str) -> SchemaField:
        """PyIceberg's schema().find_field(name)
        (pyiceberg_feature_tests.py:373)."""
        for f in self.fields:
            if f.name == name:
                return f
        raise ValueError(f"no field named {name!r}")

    def as_arrow(self):
        """pyarrow schema — PyIceberg casts arrow batches to
        ``tbl.schema().as_arrow()`` before append
        (pyiceberg_feature_tests.py:519). Raises for logical types with
        no direct Spark DDL spelling (timestamp_ns, variant)."""
        from pyspark.sql.pandas.types import to_arrow_schema  # noqa: PLC0415
        from pyspark.sql.types import StructType  # noqa: PLC0415

        return to_arrow_schema(StructType.fromDDL(self.spark_ddl()))


@dataclass
class Ref:
    snapshot_id: int
    type: str  # "branch" | "tag"


@dataclass
class TableMetadata:
    table_uuid: str
    location: str
    format_version: int
    current_schema_id: int
    schemas: list[TableSchema]
    partition_spec: list[str]  # transform spec strings
    properties: dict[str, str]
    refs: dict[str, Ref]
    snapshots: list[Snapshot]
    last_sequence_number: int = 0
    last_snapshot_id: int = 0
    last_field_id: int = 0
    # V3 row lineage: next _row_id to assign (advanced per committed file)
    next_row_id: int = 0
    metadata_log: list[dict] = field(default_factory=list)
    # Iceberg-style table statistics: one entry per analyzed snapshot
    # ({"snapshot_id", "statistics_path", "blob_type", "columns"}), the
    # metadata.json `statistics` list that CALL compute_table_stats
    # maintains. Absent in pre-statistics metadata files → default [].
    statistics: list[dict] = field(default_factory=list)
    # Iceberg sort orders (metadata.json `sort-orders` +
    # `default-sort-order-id`): each entry is {"order_id": N, "fields":
    # [{"column": c, "direction": "asc"|"desc"}, ...]}. Order id 0 is the
    # implicit unsorted order, so 0 here means "no sort order set".
    sort_orders: list[dict] = field(default_factory=list)
    default_sort_order_id: int = 0
    # Iceberg identifier fields (schema `identifier-field-ids`): the
    # row-identity key upsert paths default to. Stored as FIELD IDS so
    # renames track automatically.
    identifier_field_ids: list[int] = field(default_factory=list)

    # ---- accessors --------------------------------------------------------

    @property
    def current_snapshot_id(self) -> int | None:
        ref = self.refs.get("main")
        return ref.snapshot_id if ref else None

    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        raise KeyError(f"no snapshot {snapshot_id}")

    def schema_by_id(self, schema_id: int) -> TableSchema:
        for s in self.schemas:
            if s.schema_id == schema_id:
                return s
        raise KeyError(f"no schema {schema_id}")

    @property
    def current_schema(self) -> TableSchema:
        return self.schema_by_id(self.current_schema_id)

    def new_snapshot_id(self) -> int:
        return self.last_snapshot_id + 1

    # ---- (de)serialization ------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=1, default=str)

    @staticmethod
    def from_json(text: str) -> "TableMetadata":
        raw = json.loads(text)
        raw["schemas"] = [
            TableSchema(
                schema_id=s["schema_id"],
                fields=[SchemaField(**f) for f in s["fields"]],
            )
            for s in raw["schemas"]
        ]
        raw["refs"] = {k: Ref(**v) for k, v in raw["refs"].items()}
        raw["snapshots"] = [
            Snapshot(
                **{
                    **s,
                    "data_files": [DataFileEntry(**f) for f in s["data_files"]],
                    "delete_files": [DeleteFileEntry(**f) for f in s["delete_files"]],
                }
            )
            for s in raw["snapshots"]
        ]
        return TableMetadata(**raw)


def new_table_metadata(
    location: str,
    schema: TableSchema,
    partition_spec: list[str],
    properties: dict[str, str],
) -> TableMetadata:
    return TableMetadata(
        table_uuid=str(uuid.uuid4()),
        location=location,
        format_version=int(properties.get("format-version", "2")),
        current_schema_id=schema.schema_id,
        schemas=[schema],
        partition_spec=list(partition_spec),
        properties=dict(properties),
        refs={},
        snapshots=[],
        last_field_id=max((f.id for f in schema.fields), default=0),
    )


# ---------------------------------------------------------------------------
# Version-file persistence
# ---------------------------------------------------------------------------


def metadata_dir(table_location: str) -> str:
    return os.path.join(table_location, "metadata")


def _version_path(table_location: str, version: int) -> str:
    return os.path.join(metadata_dir(table_location), f"v{version}.metadata.json")


def current_version(table_location: str) -> int:
    """Highest committed version, 0 if none (listing beats a hint file —
    the hint can lag after a crashed writer)."""
    mdir = metadata_dir(table_location)
    if not os.path.isdir(mdir):
        return 0
    best = 0
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".metadata.json"):
            try:
                best = max(best, int(name[1:].split(".")[0]))
            except ValueError:
                continue
    return best


def load_metadata(table_location: str) -> tuple[TableMetadata, int]:
    version = current_version(table_location)
    if version == 0:
        raise FileNotFoundError(f"no table at {table_location}")
    with open(_version_path(table_location, version)) as fh:
        return TableMetadata.from_json(fh.read()), version


def commit_metadata(
    table_location: str, meta: TableMetadata, expected_version: int
) -> int:
    """Atomically commit metadata as version ``expected_version + 1``.

    Raises :class:`CommitConflict` if a concurrent writer won the race.
    """
    os.makedirs(metadata_dir(table_location), exist_ok=True)
    new_version = expected_version + 1
    meta.metadata_log.append(
        {"version": new_version, "timestamp_ms": int(time.time() * 1000)}
    )
    path = _version_path(table_location, new_version)
    # Write-temp-then-link so a crash mid-write can never leave a truncated
    # v{N}.metadata.json as the table head (Iceberg writes temp + atomic
    # rename). os.link fails with FileExistsError if a concurrent writer
    # won — the same exclusive-create semantics open(path, "x") gave us.
    tmp = os.path.join(
        metadata_dir(table_location), f".tmp-v{new_version}-{uuid.uuid4().hex}.json"
    )
    with open(tmp, "w") as fh:
        fh.write(meta.to_json())
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError as exc:
        raise CommitConflict(
            f"version {new_version} already committed at {table_location}"
        ) from exc
    finally:
        os.unlink(tmp)
    return new_version
