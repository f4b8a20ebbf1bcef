"""Skew and co-location primitives for the 100 TB tier.

Two techniques the build brief calls out explicitly:

- **Salting**: a skewed aggregation key (one tenant owning half the rows)
  pins its whole key on one reducer. ``salted_aggregate`` splits every
  key across N salt buckets for the first (heavy) aggregation and
  combines the N partials in a second (tiny) one — identical results,
  bounded per-reducer load. AQE's skew-join handling covers joins at
  runtime; salting covers aggregations and pre-AQE plans.
- **Bucketing**: ``write_bucketed`` persists a table hash-bucketed (and
  sorted) by its join key; two tables bucketed the same way equi-join
  with NO shuffle on either side — the co-located join for repeated
  fact-fact joins. Verified by plan shape in tests/test_scale.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_matrix_spark.queries.registry import register
from iceberg_matrix_spark.sources.testdata import load_table

_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partials
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output column → (fn, input column) with fn in
    {sum, count, min, max} (the self-combining aggregates; avg = sum/count
    at the call site). Stage 1 groups by (keys, salt) — the heavy shuffle,
    now spread over ``salt_buckets`` reducers per key; stage 2 combines
    the ≤ |keys|·buckets partial rows.
    """
    # any salt assignment works (stage 2 combines every bucket); this one
    # is cheap and spreads rows evenly without a rand() non-determinism
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_PARTIAL[fn](col).alias(out) for out, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[fn](out).alias(out) for out, (fn, col) in aggs.items()]
    )


def write_bucketed(
    df: DataFrame, name: str, key: str, buckets: int = 8, path: str | None = None
) -> None:
    """Persist hash-bucketed + sorted by the join key (saveAsTable — the
    bucket metadata lives in the session catalog; ``path`` makes the
    table external so tests keep data out of spark-warehouse)."""
    w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).format("parquet")
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)


def bucketed_equijoin(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with matching
    bucket specs Spark plans a shuffle-free sort-merge join. The merge
    hint pins the strategy fact-fact joins get at scale anyway (at test
    sizes Catalyst would otherwise broadcast)."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), key)


# ---------------------------------------------------------------------------
# Registered query: salted aggregation over the (skewed) returnflag key
# ---------------------------------------------------------------------------


@register(
    "q_skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation on l_returnflag (3 heavy keys): identical
    results to a plain groupBy, load spread across 16 salt buckets."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__qty_dec", F.col("l_quantity").cast("decimal(12,4)")
    )
    out = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "n_rows": ("count", "l_returnflag"),
            "sum_qty_dec": ("sum", "__qty_dec"),
            "max_price": ("max", "l_extendedprice"),
        },
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        F.col("sum_qty_dec").cast("string").cast("double").alias("sum_qty"),
        "max_price",
    )
