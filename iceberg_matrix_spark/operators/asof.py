"""As-of join: each left row matched to the latest right row at-or-before
its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the brief's prescribed
approach for operators Spark lacks is composition of existing DataFrame
ops. This is the union + ordered-window formulation:

1. tag right rows 0 and left rows 1, union by name;
2. one window per key ordered by (time, tag) carries the right side's
   payload forward with ``last(..., ignorenulls=True)``;
3. keep the left rows.

Cost: ONE shuffle on the key (the window partition) for any number of
left and right rows — versus a naive inequality join's per-key cross
product. Tie semantics match DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``:
a right row at exactly the left timestamp is visible (tag 0 sorts before
tag 1).

At 100 TB: the key-partitioned window is the same shuffle a repartitioned
merge would need; skewed keys (one user = half the events) salt the same
way aggregations do, at the cost of per-salt boundary stitching.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_matrix_spark.queries.registry import register
from iceberg_matrix_spark.sources.testdata import load_table


def _asof_carry(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    descending: bool,
) -> DataFrame:
    """Shared union+window engine for both as-of directions.

    The right side's payload is carried as a STRUCT of the value columns,
    not the raw columns: the struct is non-null for every right row, so a
    matched right row whose value is NULL is carried faithfully instead
    of being skipped by ``last(..., ignorenulls=True)`` in favor of a
    farther row — matching DuckDB ASOF / pandas merge_asof semantics for
    nullable payloads."""
    l_tag = left.withColumn("__side", F.lit(1))
    # NULL by-keys never match in SQL equality (DuckDB ASOF ... ON l.k =
    # r.k; pandas merge_asof likewise) — but Window.partitionBy groups
    # NULLs together, so a NULL-key right row would wrongly carry onto
    # NULL-key left rows. Dropping those right rows yields exactly the
    # no-match (NULL payload) result for NULL-key left rows.
    null_key = None
    for b in by:
        c = F.col(b).isNull()
        null_key = c if null_key is None else (null_key | c)
    r_src = right.filter(~null_key) if null_key is not None else right
    r_tag = r_src.select(*by, on, *value_cols).withColumn("__side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    order = F.col(on).desc() if descending else F.col(on).asc()
    w = (
        Window.partitionBy(*by)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    payload = F.struct(*[F.col(v) for v in value_cols])
    carried = unioned.select(
        "*",
        F.last(F.when(F.col("__side") == 0, payload), ignorenulls=True)
        .over(w)
        .alias("__asof"),
    )
    keep = [c for c in left.columns]
    return carried.filter(F.col("__side") == 1).select(
        *keep, *[F.col(f"__asof.{v}").alias(v) for v in value_cols]
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: for each left row, the latest right values with
    ``right.on <= left.on`` within the same ``by`` key (NULL if none)."""
    return _asof_carry(left, right, on, by, value_cols, descending=False)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right values with
    ``right.on >= left.on`` within the same ``by`` key (NULL if none).
    Same single-shuffle union+window shape as backward, traversed in
    descending time: the carried ``last`` is then the nearest later
    right row. Tie semantics mirror DuckDB's ``ASOF ... ON l.ts <=
    r.ts`` (a right row exactly at the left timestamp is visible)."""
    return _asof_carry(left, right, on, by, value_cols, descending=True)


@register(
    "q_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      -- one row per (user, ts): equal-timestamp ties would otherwise be
      -- resolved arbitrarily by both engines
      SELECT user_id, ts, MAX(value) AS purchase_value FROM events
      WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.user_id, c.event_id, CAST(c.ts AS TIMESTAMP) AS ts,
           p.purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click annotated with the user's most recent purchase value
    at-or-before the click — checked against DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join_backward(
        clicks, purchases, on="ts", by=["user_id"], value_cols=["purchase_value"]
    )


@register(
    "q_asof_join_forward",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, MAX(value) AS next_purchase_value FROM events
      WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.user_id, c.event_id, CAST(c.ts AS TIMESTAMP) AS ts,
           p.next_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click annotated with the user's NEXT purchase value at-or-
    after the click — the forward as-of direction, checked against
    DuckDB's native ASOF JOIN with the inequality flipped."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("next_purchase_value"))
    )
    return asof_join_forward(
        clicks, purchases, on="ts", by=["user_id"], value_cols=["next_purchase_value"]
    )


# ---------------------------------------------------------------------------
# Range (interval) join via bucket binning
# ---------------------------------------------------------------------------


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    by: list[str],
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join without a theta join.

    Naive containment is an inequality join — a per-key cross product.
    Binning makes it an EQUI-join: intervals explode into the coarse time
    buckets they span, points compute their single bucket, the join runs
    on (keys..., bucket), and the exact containment predicate filters the
    bucket-collision candidates. Shuffle is proportional to candidate
    pairs (interval_span/bucket per interval), not |points| x |intervals|.
    """
    b = F.lit(bucket_seconds).cast("long")
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / b).cast("long"),
                (F.unix_timestamp(end_col) / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "__bucket", (F.unix_timestamp(point_ts) / b).cast("long")
    )
    return pts.join(ivals, [*by, "__bucket"]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    ).drop("__bucket")


@register(
    "q_range_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    ivals AS (
      SELECT user_id, ts AS start_ts, ts + INTERVAL 2 HOUR AS end_ts,
             MAX(value) OVER (PARTITION BY user_id, ts) AS purchase_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
           COUNT(*) AS n_intervals,
           CAST(MAX(i.purchase_value) AS DOUBLE) AS max_value
    FROM clicks c JOIN ivals i
      ON c.user_id = i.user_id AND c.ts >= i.start_ts AND c.ts <= i.end_ts
    GROUP BY 1, 2, 3
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks inside the 2-hour window after any purchase by the same
    user: binned equi-join + exact containment filter, aggregated per
    click — checked against DuckDB's inequality join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    ivals = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        F.max("value")
        .over(Window.partitionBy("user_id", "ts"))
        .alias("purchase_value"),
    )
    matched = range_join_binned(
        clicks, ivals, by=["user_id"], bucket_seconds=3600
    )
    return matched.groupBy("event_id", "user_id", "ts").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.max("purchase_value").cast("double").alias("max_value"),
    )
