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


# ---------------------------------------------------------------------------
# Funnel analysis (ordered event-sequence conversion)
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ("signup", "click", "purchase")


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = _FUNNEL_STEPS,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel conversion: (step, step_name, n_users) where a user
    reaches step k iff they have a step-k event STRICTLY after their
    earliest qualifying step-(k−1) time (the standard product-analytics
    funnel; strict ordering makes ties a defined non-conversion).

    Plan: one narrow (user, ts) aggregate per step — step k's input is
    pre-filtered to its event type (the filter reaches the scan), joined
    to the ≤|users| frontier of step k−1, so each stage shuffles rows ∝
    that step's events, never the whole table per step. The frontier
    frame is two longs per user.
    """
    frontier = None
    counts = []
    for i, s in enumerate(steps):
        stage = events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        if frontier is None:
            frontier = stage.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            frontier = (
                stage.join(frontier, "__u")
                .filter(F.col("__ts") > F.col("__t"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        counts.append(
            frontier.agg(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(s).alias("step_name"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def _funnel_oracle(steps: tuple[str, ...]) -> str:
    ctes = []
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(
                f"f0 AS (SELECT user_id AS u, MIN(ts) AS t FROM events "
                f"WHERE event_type = '{s}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"f{i} AS (SELECT e.user_id AS u, MIN(e.ts) AS t FROM events e "
                f"JOIN f{i - 1} p ON p.u = e.user_id "
                f"WHERE e.event_type = '{s}' AND e.ts > p.t GROUP BY e.user_id)"
            )
    selects = [
        f"SELECT CAST({i + 1} AS INT) AS step, '{s}' AS step_name, "
        f"COUNT(*) AS n_users FROM f{i}"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


@register("q_event_funnel", oracle=_funnel_oracle(_FUNNEL_STEPS))
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → click → purchase funnel: users reaching each step in
    strict timestamp order."""
    ev = load_table(spark, sf_dir, "events")
    return event_funnel(ev)


@register(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(CAST(date_trunc('week', MIN(ts)) AS DATE) AS VARCHAR) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(datediff('day', CAST(f.cohort_week AS DATE),
                           CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT)
               AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-event week, the
    distinct (user, week-offset) activity grid counted per cohort — the
    classic retention triangle.

    Plan: one (user → first week) aggregate (two longs per user,
    broadcastable at any realistic user count), one distinct over the
    user-week grid, one count — every stage keyed on user_id so the
    partitioning is reused. Integer week offsets (day-diff of
    Monday-truncated dates, floor-divided by 7) are engine-exact; the
    cohort week is emitted as its ISO string (the repo's date-out rule —
    queries/relational.py module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).cast("string").alias("cohort_week")
    )
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr(
                "CAST(datediff(to_date(date_trunc('week', ts)), to_date(cohort_week)) DIV 7 AS INT)"
            ).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "q_event_paths",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             array_to_string(
               list_slice(array_agg(event_type ORDER BY ts, event_id), 1, 5),
               '>') AS path
      FROM events GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users
    FROM seqs GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user journeys: each user's first five event types in
    (ts, event_id) order joined with '>' (the path-analysis staple next
    to funnel/retention), counted across users.

    Plan note (VERDICT r7 #2): only the FIRST FIVE events per user are
    ever needed, so a ``row_number() ≤ 5`` window filter runs BEFORE the
    aggregate — Spark rewrites it to WindowGroupLimit, which prunes each
    partition to 5 rows per user ahead of the exchange, so a hot key
    (bot account, null user) can never materialize its full event
    history as one giant array row. The aggregate then sorts the ≤5
    surviving structs (collect_list order is nondeterministic; struct
    comparison gives the same total order DuckDB's ``array_agg(...
    ORDER BY ts, event_id)`` uses), making the path strings
    engine-exact. The top-20 is TakeOrderedAndProject, never a global
    sort. The sessionize family's audit: q_sessionize aggregates
    per-SESSION (gap-bounded, self-capping) and q_running_total carries
    scalars per row, so neither builds a per-user array — this was the
    only unbounded collect."""
    return user_event_paths(load_table(spark, sf_dir, "events"))


def user_event_paths(ev: DataFrame, first_n: int = 5, top: int = 20) -> DataFrame:
    """Top-``top`` user journeys over an events frame (see
    q_event_paths for the plan contract; factored out so the scale
    sweep measures the exact registered plan)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = ev.select(
        "user_id", "ts", "event_id", "event_type"
    ).withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= first_n)
    seqs = firsts.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        seqs.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(top)
    )


@register(
    "q_value_histogram",
    oracle="""
    WITH stats AS (
      SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
      FROM events GROUP BY event_type
    ),
    binned AS (
      SELECT e.event_type,
             CASE WHEN s.mx = s.mn THEN 0
                  ELSE CAST(least(19, CAST(floor((e.value - s.mn) /
                       ((s.mx - s.mn) / 20.0)) AS BIGINT)) AS INT)
             END AS bin,
             s.mn, s.mx
      FROM events e JOIN stats s USING (event_type)
    )
    SELECT event_type, bin,
           mn + bin * ((mx - mn) / 20.0) AS bin_lo,
           COUNT(*) AS n
    FROM binned GROUP BY event_type, bin, mn, mx
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 20-bin value histogram per event type — the
    profile-a-column staple. Two aggregates: per-group min/max (tiny,
    broadcast back), then the bin counts; bin edges are the same
    left-associated float expression on both engines, constant-dimension
    groups (mx = mn) pin to bin 0 rather than dividing by zero."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(20.0)
    bin_ = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(19),
            F.floor((F.col("value") - F.col("mn")) / width).cast("bigint"),
        )
    ).cast("int")
    binned = ev.join(F.broadcast(stats), "event_type").select(
        "event_type", bin_.alias("bin"), "mn", "mx"
    )
    return binned.groupBy("event_type", "bin", "mn", "mx").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "event_type",
        "bin",
        (F.col("mn") + F.col("bin") * ((F.col("mx") - F.col("mn")) / F.lit(20.0))).alias("bin_lo"),
        "n",
    )


def event_funnel_windowed(
    events: DataFrame,
    steps: tuple[str, ...] = _FUNNEL_STEPS,
    window: str = "1 hour",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-bounded funnel: step k counts only when it lands strictly
    after step k−1 AND within ``window`` of it (the "converted within an
    hour" product-analytics form; the unbounded funnel is
    :func:`event_funnel`). Same per-step frontier plan — the deadline is
    one extra predicate on the frontier join."""
    frontier = None
    counts = []
    for i, s in enumerate(steps):
        stage = events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        if frontier is None:
            frontier = stage.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            frontier = (
                stage.join(frontier, "__u")
                .filter(
                    (F.col("__ts") > F.col("__t"))
                    & (F.col("__ts") <= F.col("__t") + F.expr(f"INTERVAL {window}"))
                )
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        counts.append(
            frontier.agg(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(s).alias("step_name"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def _funnel_windowed_oracle(steps: tuple[str, ...]) -> str:
    ctes = []
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(
                f"w0 AS (SELECT user_id AS u, MIN(ts) AS t FROM events "
                f"WHERE event_type = '{s}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"w{i} AS (SELECT e.user_id AS u, MIN(e.ts) AS t FROM events e "
                f"JOIN w{i - 1} p ON p.u = e.user_id "
                f"WHERE e.event_type = '{s}' AND e.ts > p.t "
                f"AND e.ts <= p.t + INTERVAL 1 HOUR GROUP BY e.user_id)"
            )
    selects = [
        f"SELECT CAST({i + 1} AS INT) AS step, '{s}' AS step_name, "
        f"COUNT(*) AS n_users FROM w{i}"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


@register("q_event_funnel_windowed", oracle=_funnel_windowed_oracle(_FUNNEL_STEPS))
def q_event_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → click → purchase funnel with a 1-hour conversion window
    per step."""
    ev = load_table(spark, sf_dir, "events")
    return event_funnel_windowed(ev)
