"""Time-series operators: bucketed rollups with gap-fill, forward-fill.

The hypertable-rollup family from the build brief: continuous aggregates
over time buckets (with a DENSE grid — empty buckets appear as zero
rows, which is what makes a rollup chartable/joinable downstream) and
last-observation-carried-forward interpolation.

Scale design:
- the bucket grid is derived from a one-row MIN/MAX aggregate and a
  ``sequence`` explode — grid size is (range / bucket) × #series, bounded
  by definition of a rollup, never by the fact-table row count; it
  broadcasts.
- the rollup aggregate is ONE shuffle on (bucket, series); at 100 TB
  that's the same partial-agg shape as any groupBy.
- forward-fill is a single user-partitioned ordered window — one shuffle,
  and the running ``last(ignorenulls)`` state is O(1) per row.

Both operators are exactly SQL-oracle-able (DuckDB: generate_series grid,
``last_value(... IGNORE NULLS)``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_matrix_spark.queries.registry import DEC_SUM_SQL, register
from iceberg_matrix_spark.sources.testdata import load_table

_DEC_SUM = DEC_SUM_SQL


def time_bucket_rollup_gapfilled(
    ev: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hourly rollup per series over a DENSE hour grid spanning the
    table's [min, max] timestamps; empty cells are zero-filled.

    The fact table is scanned ONCE: the grid bounds and the series set
    are re-derived from the (tiny) rollup frame itself — every event
    lands in some bucket, so min/max over rollup buckets equal min/max
    over event timestamps truncated, and the rollup's distinct series
    are exactly the table's."""
    bucket = F.date_trunc("hour", F.col(ts_col))
    agg = ev.groupBy(
        bucket.alias("bucket"), F.col(series_col).alias("series")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )
    # three consumers (bounds, series, the outer join) would each re-run
    # the fact scan; checkpointing the rollup — small by definition, it's
    # bucket×series cardinality — makes the scan happen once. eager
    # localCheckpoint (not persist): the materialized blocks are released
    # by the ContextCleaner when this frame is garbage collected, so
    # repeated invocations don't accumulate cache entries for the
    # session's lifetime.
    agg = agg.localCheckpoint(eager=True)
    bounds = agg.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    series = agg.select("series").distinct()
    dense = grid.crossJoin(F.broadcast(series)).join(
        agg, ["bucket", "series"], "left"
    )
    return dense.select(
        "bucket",
        "series",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@register(
    "q_time_rollup_gapfill",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds
    ),
    series AS (SELECT DISTINCT event_type AS series FROM events),
    agg AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type AS series,
             COUNT(*) AS n_events,
             {_DEC_SUM.format(x="value")} AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT g.bucket, s.series,
           COALESCE(a.n_events, 0) AS n_events,
           COALESCE(a.sum_value, 0.0) AS sum_value
    FROM grid g CROSS JOIN series s
    LEFT JOIN agg a ON a.bucket = g.bucket AND a.series = s.series
    """,
)
def q_time_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly rollup (count + exact sum) per event type, zero rows
    for empty hours."""
    ev = load_table(spark, sf_dir, "events")
    return time_bucket_rollup_gapfilled(ev)


def forward_fill(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: F.Column,
    out_col: str = "filled_value",
) -> DataFrame:
    """Last-observation-carried-forward: within each key, ordered by the
    (total) order columns, carry the latest non-null observation. One
    shuffle on the key; O(1) running state per row."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


@register(
    "q_timeseries_ffill",
    oracle="""
    SELECT user_id, event_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM events
    """,
)
def q_timeseries_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill the latest purchase value across each user's event
    stream (NULL until the first purchase). The carried value is copied,
    not recomputed, so cross-engine equality is exact."""
    ev = load_table(spark, sf_dir, "events")
    obs = F.when(F.col("event_type") == "purchase", F.col("value"))
    return forward_fill(ev, "user_id", ["ts", "event_id"], obs).select(
        "user_id", "event_id", "filled_value"
    )
