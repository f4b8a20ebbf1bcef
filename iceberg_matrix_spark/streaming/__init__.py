"""Structured Streaming parity with the reference's Flink suite (SURVEY §2.10).

- sink.py: checkpoint-per-epoch IceLite appends and PK upserts via
  foreachBatch, exactly-once through snapshot-summary batch bookkeeping.
- source.py: 'icelite_stream' — a Python Data Source API streaming source
  that tails a table's append snapshots (Flink's continuous Iceberg read,
  /root/reference/tests/flink_feature_tests.py:582-628).
- windows.py: event-time operators — watermarked tumbling windows, session
  windows, stateful custom aggregation.
- maintenance.py: in-job compaction scheduler alongside a running query
  (/root/reference/tests/flink_feature_tests.py:1100-1172).
"""

from iceberg_matrix_spark.streaming.maintenance import CompactionScheduler
from iceberg_matrix_spark.streaming.sink import (
    append_stream,
    last_committed_batch,
    upsert_stream,
)
from iceberg_matrix_spark.streaming.source import (
    IceLiteStreamDataSource,
    read_stream,
    register_stream_source,
)
from iceberg_matrix_spark.streaming.windows import (
    session_window_counts,
    stateful_user_stats,
    tumbling_window_counts,
)

__all__ = [
    "CompactionScheduler",
    "IceLiteStreamDataSource",
    "append_stream",
    "last_committed_batch",
    "read_stream",
    "register_stream_source",
    "session_window_counts",
    "stateful_user_stats",
    "tumbling_window_counts",
    "upsert_stream",
]
