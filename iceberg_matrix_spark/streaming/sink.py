"""IceLite streaming sinks: one snapshot per micro-batch epoch.

Mirrors the reference's checkpoint-driven commit loop — an unbounded
INSERT produces one Iceberg snapshot per checkpoint, with rows readable
mid-flight (/root/reference/tests/flink_feature_tests.py:663-697) — and
the PK upsert mode (:744-784).

Exactly-once: Structured Streaming replays a micro-batch after failure
with the SAME batch id. Each commit stores
``streaming.query-id``/``streaming.batch-id`` in the snapshot summary
*inside the same atomic metadata commit as the data*, so the sink can
recognize and skip an already-committed epoch on replay — the same
idempotence protocol Iceberg's Spark sink uses.

Scale: foreachBatch bodies are plain distributed writes (df partitions →
parquet files on executors); the driver only commits a JSON metadata
version per epoch, so commit cost is independent of batch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from iceberg_matrix_spark.tables.table import IceLiteTable

_QID = "streaming.query-id"
_BID = "streaming.batch-id"


def last_committed_batch(table: IceLiteTable, query_id: str) -> int:
    """Highest batch id this query has committed to the table, else -1."""
    table.refresh()
    best = -1
    for s in table.meta.snapshots:
        if s.summary.get(_QID) == query_id and s.summary.get(_BID) is not None:
            best = max(best, int(s.summary[_BID]))
    return best


def _checkpoint_query_id(checkpoint_dir: str) -> str:
    """The query id Spark stores in ``<checkpoint>/metadata`` — the same
    id Iceberg's sink keys its idempotence on. It lives WITH the
    checkpoint: clearing the checkpoint (which restarts batch ids at 0)
    produces a fresh id, so old high batch ids in the table can never
    shadow the new run's epochs."""
    import json
    import os

    with open(os.path.join(checkpoint_dir, "metadata")) as fh:
        return str(json.load(fh)["id"])


def _epoch_writer(location: str, query_id: str | None, checkpoint_dir: str, commit):
    """foreachBatch body: skip replayed epochs, commit data + batch id
    atomically. ``query_id=None`` (the default) resolves to the
    checkpoint-scoped id at first batch — a STATIC default here would
    silently drop every epoch up to the historical max batch id after a
    checkpoint reset."""
    resolved = {"qid": query_id}

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if resolved["qid"] is None:
            resolved["qid"] = _checkpoint_query_id(checkpoint_dir)
        table = IceLiteTable(batch_df.sparkSession, location)
        if batch_id <= last_committed_batch(table, resolved["qid"]):
            return  # replay of an epoch that already committed
        commit(table, batch_df, {_QID: resolved["qid"], _BID: int(batch_id)})

    return write


def append_stream(
    stream_df: DataFrame,
    location: str,
    checkpoint_dir: str,
    query_id: str | None = None,
    trigger: dict | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """writeStream → IceLite appends, one snapshot per epoch.

    ``trigger`` passes through to ``DataStreamWriter.trigger`` (e.g.
    ``{"processingTime": "2 seconds"}`` or ``{"availableNow": True}``).
    """
    writer = stream_df.writeStream.foreachBatch(
        _epoch_writer(
            location,
            query_id,
            checkpoint_dir,
            lambda t, df, summary: t.append(df, extra_summary=summary),
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()


def upsert_stream(
    stream_df: DataFrame,
    location: str,
    key_columns: list[str],
    checkpoint_dir: str,
    query_id: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Streaming PK upsert: each epoch commits equality deletes + new rows
    in one snapshot (Flink write.upsert.enabled parity, :744-784)."""
    writer = stream_df.writeStream.foreachBatch(
        _epoch_writer(
            location,
            query_id,
            checkpoint_dir,
            lambda t, df, summary: t.upsert(df, key_columns, extra_summary=summary),
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
