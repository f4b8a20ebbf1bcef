"""Extended SQL-semantics coverage: percentiles, pivot/unpivot, correlated
subqueries, multiset set-ops, statistical moments.

Widens §2.6–§2.8 beyond the reference's own query list with the SQL
surface a migrating user reaches for next. Same determinism contract as
relational.py (module docstring there): exact DECIMAL staging for sums,
no double ROUND, total orders under LIMIT.

Percentile note: exact ``percentile`` (not approx_percentile) at quarter
points over the integer-valued quantity column — the interpolation
fractions (.25/.5/.75) are exact binary, operands are small integers, so
Spark's and DuckDB's interpolation formulas produce bit-identical doubles.
approx_percentile/t-digest would be the 100 TB path when exactness isn't
required, but it is not cross-engine reproducible, so the registered
(oracle-checked) operator is the exact one.

Moments note: variance/stddev/correlation are NOT computed with the
built-in aggregates — their merge-formula results depend on partition
splits (float accumulation order). Instead: exact DECIMAL power sums
(Sx, Sxx, Sxy — partial-aggregated, one shuffle, same plan shape as any
sum), cast once to double, then the same closed-form expression on both
engines → bit-identical. This is also the scale-correct answer: power
sums combine associatively, so map-side combine stays effective.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_matrix_spark.queries.registry import DEC_SUM_SQL, register
from iceberg_matrix_spark.sources.testdata import load_table

_DEC_SUM = DEC_SUM_SQL


@register(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of order quantity per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.50)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
      CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS a_count,
      CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_count,
      CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r_count,
      CAST(CAST(SUM(CASE WHEN l_returnflag = 'A'
            THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
          AS VARCHAR) AS DOUBLE) AS a_qty,
      CAST(CAST(SUM(CASE WHEN l_returnflag = 'N'
            THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
          AS VARCHAR) AS DOUBLE) AS n_qty,
      CAST(CAST(SUM(CASE WHEN l_returnflag = 'R'
            THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
          AS VARCHAR) AS DOUBLE) AS r_qty
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: return-flag columns per line status (count + exact qty sum).

    The pivot values are declared explicitly — an undeclared pivot does a
    distinct-collect to the driver first, which is the anti-pattern at
    scale. Plan = one hash aggregate, same as a CASE-WHEN conditional agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"),
        )
    )
    return piv.select(
        "l_linestatus",
        F.coalesce("A_count", F.lit(0)).alias("a_count"),
        F.coalesce("N_count", F.lit(0)).alias("n_count"),
        F.coalesce("R_count", F.lit(0)).alias("r_count"),
        F.coalesce("A_qty", F.lit(0.0)).alias("a_qty"),
        F.coalesce("N_qty", F.lit(0.0)).alias("n_qty"),
        F.coalesce("R_qty", F.lit(0.0)).alias("r_qty"),
    )


_UNPIVOT_ORACLE = """
    WITH wide AS (
      SELECT r_name,
        COUNT(DISTINCT n.n_nationkey) AS n_nations,
        COUNT(DISTINCT c.c_custkey) AS n_customers
      FROM region r
      JOIN nation n ON n.n_regionkey = r.r_regionkey
      LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      GROUP BY r_name
    )
    SELECT r_name, 'n_nations' AS metric, n_nations AS value FROM wide
    UNION ALL
    SELECT r_name, 'n_customers' AS metric, n_customers AS value FROM wide
"""


@register("q_unpivot", oracle=_UNPIVOT_ORACLE)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: wide per-region metrics melted to (region, metric, value)
    rows — the long-format feed for metric stores. Narrow generator op,
    no extra shuffle beyond the aggregate that built the wide frame."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    wide = (
        region.join(
            F.broadcast(nation), nation.n_regionkey == region.r_regionkey
        )
        .join(customer, customer.c_nationkey == nation.n_nationkey, "left")
        .groupBy("r_name")
        .agg(
            F.countDistinct("n_nationkey").alias("n_nations"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )
    return wide.unpivot(
        ["r_name"], ["n_nations", "n_customers"], "metric", "value"
    )


@register(
    "q_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '5-LOW')
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS — Catalyst decorrelates to a
    left-semi ⨝ left-anti pair (verified by tests/test_plans.py), so the
    100 TB plan is two hash joins, not a per-row subquery loop."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '5-LOW')
        """
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey,
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c
    WHERE c_acctbal > (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             / COUNT(*)
      FROM customer)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (broadcast single-row threshold) +
    correlated scalar subquery (decorrelated to an aggregate-then-join)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
          FROM customer)
        """
    )


@register(
    "q_set_ops_all",
    oracle="""
    WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
    finished AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
    both_ AS (SELECT o_custkey FROM urgent INTERSECT ALL SELECT o_custkey FROM finished),
    only_urgent AS (SELECT o_custkey FROM urgent EXCEPT ALL SELECT o_custkey FROM finished)
    SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS multiplicity
    FROM both_ GROUP BY o_custkey
    UNION ALL
    SELECT 'except_all' AS op, o_custkey, COUNT(*) AS multiplicity
    FROM only_urgent GROUP BY o_custkey
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-ops (INTERSECT ALL / EXCEPT ALL) — multiplicity
    preserved, unlike the distinct variants in q_set_ops."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    both_ = urgent.intersectAll(finished).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("multiplicity")
    )
    only_ = urgent.exceptAll(finished).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("multiplicity")
    )
    return both_.select(F.lit("intersect_all").alias("op"), "o_custkey", "multiplicity").unionByName(
        only_.select(F.lit("except_all").alias("op"), "o_custkey", "multiplicity")
    )


_MOMENTS_ORACLE = f"""
    WITH sums AS (
      SELECT l_returnflag,
        COUNT(*) AS n,
        {_DEC_SUM.format(x='l_quantity')} AS sx,
        {_DEC_SUM.format(x='l_quantity * l_quantity')} AS sxx,
        {_DEC_SUM.format(x='l_extendedprice')} AS sy,
        {_DEC_SUM.format(x='l_extendedprice * l_extendedprice')} AS syy,
        {_DEC_SUM.format(x='l_quantity * l_extendedprice')} AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
      (sxx - sx * sx / n) / (n - 1) AS var_qty,
      sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
      (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_qty_price
    FROM sums
"""


@register("q_stats_moments", oracle=_MOMENTS_ORACLE)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / Pearson correlation from exact DECIMAL
    power sums (see module docstring — built-in var_samp/corr are not
    partition-order-reproducible; power sums are, and combine
    associatively for map-side partials)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,4)")
    p = F.col("l_extendedprice").cast("decimal(18,4)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(18,4)")).cast("double").alias("sxx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(18,4)")).cast("double").alias("syy"),
        F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(18,4)")).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    var_qty = (sxx - sx * sx / n) / (n - 1)
    return sums.select(
        "l_returnflag",
        "n",
        var_qty.alias("var_qty"),
        F.sqrt(var_qty).alias("stddev_qty"),
        ((sxy - sx * sy / n) / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))).alias(
            "corr_qty_price"
        ),
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped breadth: scalar agg, join ratio, having + semi-join,
# disjunctive multi-column predicates
# ---------------------------------------------------------------------------


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                        * CAST(l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: fully-pushable conjunctive filter + single scalar
    aggregate — the canonical 'scan should do all the work' query; every
    predicate reaches the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,4)")
            * F.col("l_discount").cast("decimal(8,4)")
        ).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT
      CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
            THEN CAST(l_extendedprice AS DECIMAL(12,4))
                 * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))
            ELSE CAST(0 AS DECIMAL(22,8)) END) AS VARCHAR) AS DOUBLE)
      / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                 * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE)
        * 100 AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact-dimension join + conditional-over-total
    ratio. Scale: part is the smaller side — size-gated broadcast via
    load_dim keeps the lineitem side shuffle-free at test scale and lets
    AQE decide at 100 TB."""
    from iceberg_matrix_spark.sources.testdata import load_dim

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    part = load_dim(spark, sf_dir, "part")
    disc = F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(8,4)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(
        F.lit(0).cast("decimal(22,8)")
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.sum(promo).cast("double") / F.sum(disc).cast("double") * 100
        ).alias("promo_revenue_pct")
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 212
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_totalprice,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate feeding a semi-join-like
    reduction, then re-join for detail. Scale: the `big` set is tiny after
    HAVING, so the orders join broadcasts it; the second lineitem agg
    shuffles only matching orders. Total order under LIMIT (price desc,
    orderkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    from iceberg_matrix_spark.sources.testdata import load_dim

    cust = load_dim(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,4)")).alias("__q"))
        .filter(F.col("__q") > 212)
        .select(F.col("l_orderkey").alias("__big_orderkey"))
    )
    joined = (
        orders.join(F.broadcast(big), orders.o_orderkey == F.col("__big_orderkey"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
    )
    return (
        joined.groupBy(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,4)")).cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — the predicate
    can't be fully pushed to either scan, so the optimizer must extract
    the common per-side residuals and evaluate the disjunction post-join."""
    from iceberg_matrix_spark.sources.testdata import load_dim

    li = load_table(spark, sf_dir, "lineitem")
    part = load_dim(spark, sf_dir, "part")
    joined = li.join(part, part.p_partkey == li.l_partkey)
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm("Brand#34", 35, 20, 30)
    return joined.filter(cond).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,4)")
            * (F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(8,4)"))
        ).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q_null_semantics",
    oracle=f"""
    WITH v AS (
      SELECT NULLIF(event_type, 'error') AS etype,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS val,
             user_id
      FROM events
    )
    SELECT etype,
           COUNT(*) AS n_rows,
           COUNT(val) AS n_nonnull,
           CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           {_DEC_SUM.format(x="COALESCE(val, 0)")} AS sum_val,
           MIN(val) AS min_val,
           COUNT(DISTINCT user_id) AS n_users
    FROM v GROUP BY etype
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface in one query: a NULL grouping key (SQL
    groups NULLs together), null-skipping COUNT(col)/MIN, explicit
    IS NULL counting, and COALESCE defaulting — the semantics the CoW
    DELETE fix (tables/table.py) depends on, exercised on the query side.

    Scale: one groupBy shuffle; NULL handling is free in codegen."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.nullif("event_type", F.lit("error")).alias("etype"),
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("val"),
        "user_id",
    )
    return v.groupBy("etype").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_nonnull"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null"),
        F.sum(F.coalesce(F.col("val"), F.lit(0)).cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_val"),
        F.min("val").alias("min_val"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           levenshtein(c_name, c_mktsegment) AS lev_dist,
           split_part(c_name, '#', 2) AS cust_num,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           reverse(c_mktsegment) AS seg_reversed,
           repeat(substring(c_mktsegment, 1, 1), 3) AS seg_initial3,
           CAST(instr(c_name, '0') AS BIGINT) AS first_zero_pos,
           CAST(ascii(c_mktsegment) AS BIGINT) AS seg_first_byte
    FROM customer
    WHERE c_custkey < 200
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth (§2.17): edit distance, field splitting,
    padding, character translation, reverse/repeat/position/codepoint —
    the manipulation surface ETL jobs lean on. All JVM-side codegen; the
    scan reads 3 columns and the filter pushes down."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return cust.select(
        "c_custkey",
        F.levenshtein("c_name", "c_mktsegment").alias("lev_dist"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.reverse("c_mktsegment").alias("seg_reversed"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("seg_initial3"),
        F.instr("c_name", "0").cast("bigint").alias("first_zero_pos"),
        F.ascii("c_mktsegment").cast("bigint").alias("seg_first_byte"),
    )


@register(
    "q_array_agg",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           list_sort(list(DISTINCT o_orderstatus))[1] AS first_status
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregation: collect_set sorted into a canonical array
    (collect_list/set order is partition-dependent — array_sort makes the
    result deterministic under ANY partitioning, which is the only safe
    way to emit collected arrays at scale), joined to a string + element
    access."""
    orders = load_table(spark, sf_dir, "orders")
    sorted_set = F.array_sort(F.collect_set("o_orderstatus"))
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(sorted_set, ",").alias("statuses"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.element_at(sorted_set, 1).alias("first_status"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH AS plus_3_months,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS week,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
             AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function breadth (§2.17): month arithmetic with
    end-of-month clamping, last_day, day-of-week (Spark's 1=Sunday
    convention; the oracle shifts DuckDB's 0=Sunday), ISO week number,
    day differences."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        # timestampadd preserves time-of-day AND clamps end-of-month,
        # matching DuckDB's + INTERVAL 3 MONTH for any input; add_months
        # returns DATE (drops time), which only coincided while testdata
        # order dates were all midnight.
        F.expr("timestampadd(MONTH, 3, o_orderdate)")
        .cast("timestamp_ntz")
        .alias("plus_3_months"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.weekofyear("o_orderdate").cast("int").alias("week"),
        F.datediff(
            "o_orderdate", F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
        ).cast("int").alias("days_since_epoch_start"),
    )


# ---------------------------------------------------------------------------
# §2.17 geospatial: WKB round-trip + bounding-box predicate
# ---------------------------------------------------------------------------


@register(
    "q_geo_bbox",
    oracle="""
    SELECT c_custkey,
           CAST(c_custkey % 360 - 180 AS DOUBLE) AS x,
           CAST((c_nationkey * 7) % 180 - 90 AS DOUBLE) AS y
    FROM customer
    WHERE (c_custkey % 360 - 180) BETWEEN -60 AND 60
      AND ((c_nationkey * 7) % 180 - 90) BETWEEN -45 AND 45
    """,
)
def q_geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial surface (reference GEOMETRY exercise,
    iceberg_feature_tests.py:1386-1394): derive deterministic integer
    lon/lat per customer, encode them as REAL little-endian WKB point
    bytes (functions/geo.py, byte-pinned vs struct.pack in
    tests/test_geo.py), then run a bounding-box predicate that decodes
    the doubles back OUT of the WKB — the query output only matches the
    oracle if the encode→decode round-trip is bit-exact. All JVM-side
    (reflect-based bit twiddling, functions/geo.py module docstring); no
    Python worker, and the expression trees stay small enough for
    whole-stage codegen."""
    from iceberg_matrix_spark.functions.geo import bbox_contains, wkb_point, wkb_x, wkb_y

    # the WKB encode→decode codec is per-row-heavy (reflect-based bit
    # twiddling) and a single-file scan plans it as ONE task (round 11:
    # 2 single-task stages measured); round-robin no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    cust = ensure_compute_parallelism(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ).select(
        "c_custkey",
        (F.col("c_custkey") % 360 - 180).alias("__ix"),
        ((F.col("c_nationkey").cast("long") * 7) % 180 - 90).alias("__iy"),
    )
    geo = cust.select("c_custkey", wkb_point("__ix", "__iy").alias("g"))
    return geo.filter(bbox_contains("g", -60.0, -45.0, 60.0, 45.0)).select(
        "c_custkey",
        wkb_x("g").alias("x"),
        wkb_y("g").alias("y"),
    )


@register(
    "q_geo_distance_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST(c_custkey % 97 AS DOUBLE) AS x,
             CAST((c_custkey * 31) % 89 AS DOUBLE) AS y
      FROM customer WHERE c_custkey <= 2000
    )
    SELECT a.id AS id_a, b.id AS id_b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4.0
    """,
)
def q_geo_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial distance self-join via GRID BUCKETING — the spatial
    analog of the LSH band join (operators/similarity.py): each point
    lands in one ⌈d⌉-sized grid cell; the LEFT side explodes to its 3×3
    neighbor cells, so every pair within distance d shares ≥1 join key
    and the join is a plain equi-join on the cell id, never an all-pairs
    cross product. Exact distance verifies candidates; id ordering
    dedupes. At 100 TB this is the standard distributed spatial-join
    plan: shuffle ∝ points×9, per-cell work bounded by local density.
    The oracle is the brute-force O(n²) inequality join DuckDB can
    afford at sf0.01. Integer coordinates → exact double arithmetic."""
    d = 2.0
    cell = int(d)  # grid pitch ≥ d so neighbors cover the radius
    pts = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 2000)
        .select(
            F.col("c_custkey").alias("id"),
            (F.col("c_custkey") % 97).cast("double").alias("x"),
            ((F.col("c_custkey") * 31) % 89).cast("double").alias("y"),
        )
    )
    with_cell = pts.withColumn(
        "cx", F.floor(F.col("x") / cell)
    ).withColumn("cy", F.floor(F.col("y") / cell))
    offsets = spark.range(9).select(
        (F.col("id") % 3 - 1).alias("ox"),
        (F.floor(F.col("id") / 3) - 1).cast("long").alias("oy"),
    )
    left = (
        with_cell.crossJoin(F.broadcast(offsets))
        .withColumn("jx", F.col("cx") + F.col("ox"))
        .withColumn("jy", F.col("cy") + F.col("oy"))
        .select("id", "x", "y", "jx", "jy")
    )
    right = with_cell.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist_sq = (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb")) + (
        F.col("y") - F.col("yb")
    ) * (F.col("y") - F.col("yb"))
    return (
        left.join(right, ["jx", "jy"])
        .filter((F.col("id") < F.col("id_b")) & (dist_sq <= F.lit(4.0)))
        .select(
            F.col("id").alias("id_a"),
            "id_b",
            dist_sq.alias("dist_sq"),
        )
    )
