"""Event-time streaming operators over the `events` stream.

The reference's Flink suite never exercises watermarks or windows
(SURVEY §2.10 — "not present anywhere in the reference"), but a
training-data pipeline tails event streams constantly, so these are
first-class here: tumbling windows, session windows, and a custom
stateful aggregation — all on native Structured Streaming operators.

Scale: windowed aggregations shuffle once on (group keys) and keep
per-window partial state in the state store; the watermark bounds state
size. ``applyInPandasWithState`` state is per user_id — key-partitioned,
Arrow-batched, never driver-side.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Per event_type tumbling-window counts with a watermark for late
    data. Works on both batch and streaming DataFrames (same plan)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "max_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session windows (30-min inactivity gap — the streaming
    twin of the batch q_sessionize operator)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


_STATE_SCHEMA = "n_events bigint, total_value double"
_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


def _user_stats_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user totals across micro-batches (custom stateful op)."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Arbitrary stateful aggregation via applyInPandasWithState: emits
    the running (n_events, total_value) per user after each batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
