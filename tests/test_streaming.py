"""Structured Streaming parity tests (SURVEY §2.10, Flink-suite semantics).

Covers: checkpoint-per-epoch snapshot commits with mid-flight reads
(flink :663-697), exactly-once epoch replay, the icelite_stream tail
source delivering post-start commits (flink :582-628), streaming PK
upsert (flink :744-784), event-time windows vs batch ground truth, a
custom stateful operator, and in-job compaction (flink :1100-1172).
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

import pyspark.sql.functions as F
import pytest

from iceberg_matrix_spark.streaming import (
    CompactionScheduler,
    append_stream,
    last_committed_batch,
    read_stream,
    stateful_user_stats,
    tumbling_window_counts,
    upsert_stream,
)
from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.streaming.sink import _epoch_writer
from iceberg_matrix_spark.tables.catalog import IceLiteCatalog
from iceberg_matrix_spark.tables.table import IceLiteTable


def _tmp(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=prefix)


def _wait(cond, timeout_s: float = 90.0, poll_s: float = 0.5, q=None) -> bool:
    """Poll ``cond``; when a streaming query handle is passed, a stream
    that DIED raises its own exception instead of letting the poll time
    out into an opaque assert False — the failure text then carries the
    real cause (load-bearing for the jvm_flake_retry signature match)."""
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if q is not None and q.exception() is not None:
            raise q.exception()
        if cond():
            return True
        time.sleep(poll_s)
    return False


@pytest.fixture
def warehouse(spark):
    cat = IceLiteCatalog(spark, _tmp("icelite-wh-"))
    cat.create_namespace("stream")
    return cat


def _rate_stream(spark, rows_per_second: int = 20):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("value").alias("id"),
            (F.col("value") % 5).alias("k"),
            F.col("timestamp").alias("ts"),
        )
    )


@pytest.mark.jvm_flake_retry
def test_append_stream_commits_epoch_snapshots_readable_midflight(spark, warehouse):
    """≥3 append snapshots land while the query runs; rows are readable
    between commits (flink :663-697)."""
    t = warehouse.create_table(
        "stream.epochs", "id bigint, k bigint, ts timestamp"
    )
    q = append_stream(
        _rate_stream(spark),
        t.location,
        _tmp("ckpt-"),
        query_id="epochs",
        trigger={"processingTime": "1 second"},
    )
    try:
        assert _wait(
            lambda: len(IceLiteTable(spark, t.location).meta.snapshots) >= 3
        ), "expected >= 3 snapshots while streaming"
        live = IceLiteTable(spark, t.location)
        assert live.df().count() > 0  # mid-flight read
        snaps = live.meta.snapshots
        assert all(s.operation == "append" for s in snaps)
        batch_ids = [int(s.summary["streaming.batch-id"]) for s in snaps]
        assert batch_ids == sorted(batch_ids)
    finally:
        q.stop()


def test_epoch_replay_is_skipped(spark, warehouse):
    """Replaying an already-committed batch id is a no-op (exactly-once)."""
    t = warehouse.create_table("stream.replay", "id bigint")
    write = _epoch_writer(
        t.location, "q1", "/nonexistent-ckpt", lambda tb, df, s: tb.append(df, extra_summary=s)
    )
    one = spark.range(3)
    write(one, 0)
    write(one, 1)
    write(one, 1)  # replay
    write(one, 0)  # late replay of an older epoch
    table = IceLiteTable(spark, t.location)
    assert len(table.meta.snapshots) == 2
    assert table.df().count() == 6
    assert last_committed_batch(table, "q1") == 1


@pytest.mark.jvm_flake_retry
def test_icelite_tail_source_delivers_post_start_commits(spark, warehouse):
    """readStream tail sees rows committed BEFORE start and rows appended
    AFTER the query is running (flink :582-628)."""
    t = warehouse.create_table("stream.tail", "id bigint, v string")
    t.append(local_df(spark, [(1, "a"), (2, "b")], "id bigint, v string"))

    sink = f"tail_{uuid.uuid4().hex[:8]}"
    q = (
        read_stream(spark, t.location)
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", _tmp("ckpt-"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        assert _wait(lambda: spark.table(sink).count() >= 2, q=q)
        # commit after the stream started — must flow through
        t.append(local_df(spark, [(3, "c")], "id bigint, v string"))
        assert _wait(lambda: spark.table(sink).count() >= 3, q=q)
        got = {(r["id"], r["v"]) for r in spark.table(sink).collect()}
        assert got == {(1, "a"), (2, "b"), (3, "c")}
    finally:
        q.stop()


@pytest.mark.jvm_flake_retry
def test_tail_source_skips_non_append_snapshots(spark, warehouse):
    """Compaction rewrites don't re-deliver rows through the tail."""
    t = warehouse.create_table("stream.tailskip", "id bigint")
    for i in range(4):
        t.append(spark.range(i * 10, i * 10 + 5))
    from iceberg_matrix_spark.tables.maintenance import rewrite_data_files

    rewrite_data_files(t.refresh())
    t.refresh().append(spark.range(100, 105))

    sink = f"tailskip_{uuid.uuid4().hex[:8]}"
    q = (
        read_stream(spark, t.location)
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", _tmp("ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(90)
    got = sorted(r["id"] for r in spark.table(sink).collect())
    # every appended row exactly once, nothing duplicated by the rewrite
    assert got == list(range(0, 5)) + list(range(10, 15)) + list(
        range(20, 25)
    ) + list(range(30, 35)) + list(range(100, 105))


@pytest.mark.jvm_flake_retry
def test_upsert_stream_latest_per_key_wins(spark, warehouse):
    """Two waves of file-source data upserted by key: final table holds
    the last value per key (flink write.upsert.enabled, :744-784)."""
    t = warehouse.create_table("stream.upsert", "id bigint, v bigint")
    src_dir = _tmp("upsert-src-")
    local_df(spark, 
        [(1, 10), (2, 20), (3, 30)], "id bigint, v bigint"
    ).write.mode("append").parquet(src_dir)
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    local_df(spark, 
        [(2, 21), (3, 31), (4, 41)], "id bigint, v bigint"
    ).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema("id bigint, v bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = upsert_stream(
        stream, t.location, ["id"], _tmp("ckpt-"), trigger={"availableNow": True}
    )
    q.awaitTermination(120)
    final = {r["id"]: r["v"] for r in IceLiteTable(spark, t.location).df().collect()}
    assert final == {1: 10, 2: 21, 3: 31, 4: 41}
    # equality-delete evidence: content=2 delete files exist
    table = IceLiteTable(spark, t.location)
    eq = [d for s in table.meta.snapshots for d in s.delete_files if d.content == 2]
    assert eq


def test_tumbling_windows_stream_matches_batch(spark, sf_dir):
    """Streaming windowed agg (availableNow, complete mode) equals the
    batch plan of the same operator."""
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    from iceberg_matrix_spark.sources.testdata import normalize_events_ts

    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir),
        to="timestamp",
    )
    sink = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_window_counts(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", _tmp("ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = normalize_events_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), to="timestamp"
    )
    expect = {
        (r["window_start"], r["event_type"], r["n_events"], r["max_value"])
        for r in tumbling_window_counts(batch).collect()
    }
    got = {
        (r["window_start"], r["event_type"], r["n_events"], r["max_value"])
        for r in spark.table(sink).collect()
    }
    assert got == expect


def test_stateful_user_stats_accumulates_across_batches(spark):
    """applyInPandasWithState keeps running per-user totals across
    micro-batches (update mode: last emission per user = final total)."""
    src_dir = _tmp("state-src-")
    local_df(spark, 
        [(1, 1.0), (1, 2.0), (2, 5.0)], "user_id bigint, value double"
    ).write.mode("append").parquet(src_dir)
    time.sleep(1.1)
    local_df(spark, 
        [(1, 3.0), (2, 5.0)], "user_id bigint, value double"
    ).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sink = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        stateful_user_stats(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", _tmp("ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(sink).collect()
    last = {}
    for r in rows:  # memory sink appends update emissions in batch order
        last[r["user_id"]] = (r["n_events"], r["total_value"])
    assert last == {1: (3, 6.0), 2: (2, 10.0)}


@pytest.mark.jvm_flake_retry
def test_compaction_scheduler_during_stream(spark, warehouse):
    """rewrite_data_files lands a replace snapshot among streaming appends
    without losing rows (flink in-job compaction, :1100-1172)."""
    t = warehouse.create_table("stream.compact", "id bigint, k bigint, ts timestamp")
    sched = CompactionScheduler(spark, t.location, interval_s=2.0, min_files=4).start()
    q = append_stream(
        _rate_stream(spark, rows_per_second=50),
        t.location,
        _tmp("ckpt-"),
        query_id="compact",
        trigger={"processingTime": "1 second"},
    )
    try:
        assert _wait(lambda: sched.rewrites >= 1, timeout_s=120, q=q)
    finally:
        q.stop()
        sched.stop()
    assert not sched.errors, sched.errors
    table = IceLiteTable(spark, t.location)
    ops = {s.operation for s in table.meta.snapshots}
    assert "replace" in ops and "append" in ops
    # row count equals the max id + 1 committed (rate source is gapless)
    vals = sorted(r["id"] for r in table.df().collect())
    assert vals == list(range(len(vals)))


def test_append_stream_restart_from_checkpoint_no_duplicates(spark, warehouse):
    """Stop a query, restart from the SAME checkpoint: already-processed
    files are not re-read, batch ids continue, rows land exactly once."""
    t = warehouse.create_table("stream.restart", "id bigint")
    src_dir = _tmp("restart-src-")
    ckpt = _tmp("ckpt-")
    spark.range(0, 5).coalesce(1).write.mode("append").parquet(src_dir)

    def run_once():
        q = append_stream(
            spark.readStream.schema("id bigint").parquet(src_dir),
            t.location,
            ckpt,
            query_id="restart",
            trigger={"availableNow": True},
        )
        q.awaitTermination(90)

    run_once()
    assert IceLiteTable(spark, t.location).df().count() == 5
    time.sleep(1.1)
    spark.range(100, 103).coalesce(1).write.mode("append").parquet(src_dir)
    run_once()  # same checkpoint → only the new file is processed
    table = IceLiteTable(spark, t.location)
    got = sorted(r["id"] for r in table.df().collect())
    assert got == list(range(0, 5)) + list(range(100, 103))
    batch_ids = sorted(
        int(s.summary["streaming.batch-id"])
        for s in table.meta.snapshots
        if s.summary.get("streaming.query-id") == "restart"
    )
    assert batch_ids == [0, 1]  # ids continue across the restart


def test_foreachbatch_idempotent_sink_exactly_once_across_crash_replay(spark):
    """foreachBatch + per-batch overwrite = exactly-once even when a batch
    is REPLAYED: simulate a crash between the sink write and the commit
    (delete the checkpoint commit marker), restart, and verify the replay
    overwrote rather than duplicated. Then verify normal restart progress
    (new file → new batch id, old batches untouched)."""
    src_dir = _tmp("feb-src-")
    out_dir = _tmp("feb-out-")
    ckpt = _tmp("feb-ckpt-")
    spark.range(0, 5).coalesce(1).write.mode("append").parquet(src_dir)

    calls: list[int] = []

    def sink(batch_df, batch_id: int) -> None:
        calls.append(batch_id)
        # idempotence contract: output keyed by batch_id, overwrite mode —
        # a replayed batch rewrites its own output instead of appending
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    def run_once() -> None:
        q = (
            spark.readStream.schema("id bigint")
            .parquet(src_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(90)

    def result() -> list[int]:
        return sorted(r["id"] for r in spark.read.parquet(out_dir).collect())

    run_once()
    assert result() == list(range(5)) and calls == [0]

    # crash simulation: sink wrote, commit marker lost → restart replays 0
    # (the .crc checksum sidecar must go with it, as a real crash-before-
    # commit would leave neither)
    os.remove(os.path.join(ckpt, "commits", "0"))
    os.remove(os.path.join(ckpt, "commits", ".0.crc"))
    run_once()
    assert calls == [0, 0]  # batch 0 re-ran ...
    assert result() == list(range(5))  # ... but output is still exactly-once

    # normal progress: new file → batch 1; batch 0 not re-invoked
    time.sleep(1.1)
    spark.range(100, 103).coalesce(1).write.mode("append").parquet(src_dir)
    run_once()
    assert calls == [0, 0, 1]
    assert result() == list(range(5)) + list(range(100, 103))


def test_checkpoint_scoped_query_id_survives_reset(spark, warehouse, tmp_path):
    """A cleared/fresh checkpoint restarts batch ids at 0; the sink's
    idempotence key must reset WITH it, or every epoch up to the old max
    batch id is silently dropped."""
    import json as _json

    from iceberg_matrix_spark.streaming.sink import _epoch_writer

    t = warehouse.create_table("stream.ckptreset", "id bigint")

    def ckpt(name, qid):
        d = tmp_path / name
        d.mkdir()
        (d / "metadata").write_text(_json.dumps({"id": qid}))
        return str(d)

    one = spark.range(2)
    w1 = _epoch_writer(t.location, None, ckpt("c1", "run-1"),
                       lambda tb, df, s: tb.append(df, extra_summary=s))
    w1(one, 0)
    w1(one, 1)
    # checkpoint cleared → new query id, batch numbering restarts at 0
    w2 = _epoch_writer(t.location, None, ckpt("c2", "run-2"),
                       lambda tb, df, s: tb.append(df, extra_summary=s))
    w2(one, 0)  # MUST commit, not be shadowed by run-1's batch 1
    table = IceLiteTable(spark, t.location)
    assert table.df().count() == 6
    assert len(table.meta.snapshots) == 3


@pytest.mark.jvm_flake_retry
def test_stream_tail_survives_schema_evolution(spark, warehouse):
    """Files written before an add/rename are field-ID projected to the
    stream's pinned schema instead of crashing the micro-batch."""
    t = warehouse.create_table("stream.evolve", "id bigint, v string")
    t.append(local_df(spark, [(1, "a")], "id bigint, v string"))
    t.rename_column("v", "val")
    t.add_columns({"extra": "bigint"})
    t.append(
        local_df(spark, [(2, "b", 9)], "id bigint, val string, extra bigint")
    )
    from iceberg_matrix_spark.streaming.source import read_stream

    q = (
        read_stream(spark, t.location, starting="earliest")
        .writeStream.format("memory")
        .queryName("evolve_tail")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{t.location}/_ckpt_evolve")
        .start()
    )
    q.awaitTermination(60)
    rows = {
        (r["id"], r["val"], r["extra"])
        for r in spark.sql("SELECT * FROM evolve_tail").collect()
    }
    assert rows == {(1, "a", None), (2, "b", 9)}


def test_datasource_reregistration_heals_cleanly(spark, warehouse):
    """The OptionalDataException heal path (round 10): re-registering
    the Python data sources under their existing names must replace the
    JVM wrappers without disturbing semantics — a tail read works
    before AND after, and the heal reports the sources it replaced."""
    from iceberg_matrix_spark.session import reregister_data_sources
    from iceberg_matrix_spark.streaming.source import SOURCE_NAME, read_stream

    t = warehouse.create_table("ns.heal_t", "id bigint")
    t.append(spark.range(3))

    def tail_count():
        import tempfile
        import uuid

        sink = f"heal_{uuid.uuid4().hex[:8]}"
        q = (
            read_stream(spark, t.location)
            .writeStream.format("memory")
            .queryName(sink)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(60)
        return spark.table(sink).count()

    assert tail_count() == 3
    healed = reregister_data_sources(spark)
    assert SOURCE_NAME in healed
    assert tail_count() == 3
