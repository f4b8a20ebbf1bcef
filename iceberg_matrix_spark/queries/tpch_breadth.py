"""TPC-H-shaped breadth, part 2: correlated subqueries, outer-join
distributions, global-threshold selections, multi-EXISTS anti-joins.

Widens §2.5–§2.7 with the decision-support shapes (Q4/Q7/Q10/Q11/Q13/
Q15/Q17/Q21/Q22 analogs, adapted to the driver's slimmer star schema —
no partsupp/commitdate/shipmode columns) that exercise Catalyst's
decorrelation, outer-join, and scalar-subquery machinery. Reference
parity anchor: the reference's engines are exercised with aggregate +
join + subquery SQL shapes (tests/iceberg_feature_tests.py DML/query
probes); these queries are the standard OLAP canon a migrating user
brings with them.

Determinism contract (same as relational.py / sqlcov.py): every float
aggregate is staged through exact DECIMAL sums and cast to double once;
thresshold comparisons are either exact-decimal or single-IEEE-op double
expressions computed from identical operands on both engines; every
LIMIT sits under a total order.

Scale notes per query in the docstrings — the common theme: correlated
EXISTS/NOT EXISTS decorrelate to semi/anti hash joins (no per-row
loops), scalar subqueries become one-row broadcasts, and the only
all-table shuffles are the groupBys the semantics require.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_matrix_spark.queries.registry import DEC_SUM_SQL, register
from iceberg_matrix_spark.sources.testdata import load_dim, load_table

_DEC_SUM = DEC_SUM_SQL

_REV_DEC = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))"
)
_REV_SUM = f"CAST(CAST(SUM({_REV_DEC}) AS VARCHAR) AS DOUBLE)"


def _rev_col() -> F.Column:
    """Spark twin of _REV_DEC: exact decimal revenue term."""
    return F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(8,4)")
    )


@register(
    "q4_priority_returns",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-windowed orders with a correlated EXISTS on
    lineitem, counted per priority. Catalyst decorrelates to a left-semi
    hash join; at 100 TB that's one shuffle on orderkey (both sides
    date/flag-filtered first, pushed to the scans)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP_NTZ '1997-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           EXTRACT(year FROM l.l_shipdate) AS ship_year,
           {_REV_SUM} AS volume,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name IN ('NATION_0', 'NATION_1')
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between customer and supplier
    nations by year. Five-way star join: nation/supplier/customer get
    size-gated broadcast hints (load_dim), so at test scale the lineitem
    side never shuffles until the final groupBy; at 100 TB AQE picks the
    strategy. The nation filter semi-reduces customers before the fact
    join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_dim(spark, sf_dir, "customer")
    supp = load_dim(spark, sf_dir, "supplier")
    nation = load_dim(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_0", "NATION_1"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cn, cust.c_nationkey == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, supp.s_nationkey == F.col("sn_key"))
    )
    return joined.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").cast("bigint").alias("ship_year")
    ).agg(
        F.sum(_rev_col()).cast("double").alias("volume"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           {_REV_SUM} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.
    The returnflag + date filters push to both scans before the joins;
    the final ORDER BY ... LIMIT is a TakeOrderedAndProject (no global
    sort materialization). Total order via (revenue DESC, custkey)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_dim(spark, sf_dir, "nation")
    joined = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(nation, nation.n_nationkey == cust.c_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS v
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS total_value,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM pv
    )
    SELECT l_partkey, CAST(CAST(v AS VARCHAR) AS DOUBLE) AS part_value
    FROM pv, tot
    WHERE CAST(CAST(v AS VARCHAR) AS DOUBLE) * n_parts * 10 > total_value * 12
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds 1.2× the mean
    part share (expressed as value·n·10 > total·12 — integer scaling, no
    inexact literals). The threshold is a one-row aggregate broadcast
    into the filter; both operands are exact-decimal sums cast to double
    once, so the comparison is the same IEEE op on both engines. Scale:
    lineitem is scanned ONCE — the global total and part count are
    re-aggregated from the tiny per-part frame (exact: decimal sums
    combine associatively), then broadcast as a one-row threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("v")
    )
    tot = pv.agg(
        F.sum("v").cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .withColumn("part_value", F.col("v").cast("double"))
        .filter(F.col("part_value") * F.col("n_parts") * 10 > F.col("total_value") * 12)
        .select("l_partkey", "part_value")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY n_orders
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count histogram through a LEFT
    OUTER join with a join-side predicate (customers with zero matching
    orders must survive with count 0). Two shuffles by construction
    (custkey, then n_orders — the second is tiny)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({_REV_DEC}) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(CAST(rev.r AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev ON rev.l_suppkey = s.s_suppkey
    WHERE rev.r = (SELECT MAX(r) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — a self-referential scalar threshold (revenue = MAX over
    the same aggregate). The comparison stays in exact DECIMAL (cast to
    double only for output), so ties are exact, not float-fuzzy. Scale:
    the rev aggregate is one suppkey shuffle; MAX(r) is a one-row
    broadcast; supplier join is broadcast at test scale (load_dim)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    supp = load_dim(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_col()).alias("r"))
    max_r = rev.agg(F.max("r").alias("max_r"))
    best = rev.crossJoin(F.broadcast(max_r)).filter(F.col("r") == F.col("max_r"))
    return supp.join(best, best.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey,
             {_DEC_SUM.format(x="l_quantity")} AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {_DEC_SUM.format(x="l.l_extendedprice")} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#12', 'Brand#23', 'Brand#34')
      AND l.l_quantity * 5 * pa.cnt < pa.sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders — each line
    compared against 20% of its part's average quantity. The correlated
    scalar AVG is decorrelated by hand into a per-part aggregate joined
    back (the plan Catalyst produces for the subquery form anyway, but
    explicit so both engines evaluate the identical exact predicate:
    qty·5·cnt < sum_qty in integer-valued doubles < 2^53). Scale: one
    partkey-shuffle aggregate + one partkey join; the brand filter
    prunes the part side at the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_dim(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    joined = (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(pa, F.col("pa_partkey") == li.l_partkey)
        .filter(F.col("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
    )
    return joined.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q20_excess_stock_suppliers",
    oracle=f"""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             {_DEC_SUM.format(x="l_quantity")} AS qty_ps
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ), pp AS (
      SELECT l_partkey,
             CAST(CAST(SUM(CAST(qty_ps AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
               AS qty_p,
             CAST(COUNT(*) AS BIGINT) AS n_supp
      FROM supply GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS n_excess_parts
    FROM supplier s
    JOIN supply sp ON sp.l_suppkey = s.s_suppkey
    JOIN pp ON pp.l_partkey = sp.l_partkey
    WHERE sp.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND 2 * sp.qty_ps * pp.n_supp > pp.qty_p
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    shipped volume of a name-filtered part in the window exceeds half the
    part's AVERAGE per-supplier volume — the doubly-nested IN + correlated
    aggregate subquery, hand-decorrelated like Catalyst would: one
    (part, supplier) aggregate, one per-part re-aggregate of THAT, a
    semi-filter on the part name list, and an exact integer-domain
    comparison (2·qty_ps·n_supp > qty_p — all integer-valued doubles
    < 2^53, so both engines evaluate it exactly; no 0.5·avg float).
    The testdata has no partsupp table, so lineitem's (part, supplier)
    pairs play the supply relation. Scale: two shuffles on l_partkey
    (the second over already-aggregated pairs), part names broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    # single-file scan → the semi-join + partial agg ran on one core
    # (round 11); round-robin the slim projection — no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    li = ensure_compute_parallelism(
        li.select("l_partkey", "l_suppkey", "l_quantity")
    )
    small_parts = load_dim(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    supply = (
        li.join(small_parts, small_parts.p_partkey == li.l_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("qty_ps")
        )
    )
    pp = supply.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum(F.col("qty_ps").cast("decimal(18,4)")).cast("double").alias("qty_p"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    supplier = load_dim(spark, sf_dir, "supplier")
    excess = supply.join(pp, F.col("pp_partkey") == supply.l_partkey).filter(
        2 * F.col("qty_ps") * F.col("n_supp") > F.col("qty_p")
    )
    return (
        excess.join(supplier, supplier.s_suppkey == excess.l_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_excess_parts"))
    )


@register(
    "q21_sole_return_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 25
    """,
)
def q21_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for returns in
    multi-supplier finished orders — EXISTS + NOT EXISTS, both
    correlated with an inequality on top of the equality key. Catalyst
    decorrelates to a semi + anti join pair on orderkey (the inequality
    rides along as a join condition); no per-row subquery execution.
    Total order under LIMIT via (numwait DESC, s_name)."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 25
        """
    )


@register(
    "q22_dormant_customers",
    oracle=f"""
    WITH pos AS (
      SELECT {_DEC_SUM.format(x="c_acctbal")} AS pos_sum,
             CAST(COUNT(*) AS BIGINT) AS pos_cnt
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment, COUNT(*) AS n_customers,
           {_DEC_SUM.format(x="c.c_acctbal")} AS total_bal
    FROM customer c, pos
    WHERE c.c_acctbal * pos.pos_cnt > pos.pos_sum
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no recent orders —
    an uncorrelated scalar threshold (average positive balance, in
    multiply-through form: bal·cnt > sum, one IEEE op per row on
    identical operands) plus a correlated NOT EXISTS (anti join against
    date-filtered orders). Scale: customer scans once; the threshold is
    a one-row broadcast; the anti join shuffles only the date-filtered
    slice of orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("pos_sum"),
        F.count(F.lit(1)).alias("pos_cnt"),
    )
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("c_acctbal") * F.col("pos_cnt") > F.col("pos_sum")
    )
    dormant = rich.join(
        orders, orders.o_custkey == rich.c_custkey, "left_anti"
    )
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("total_bal"),
    )


@register(
    "q_window_funcs",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LEAD(o_orderkey) OVER w AS next_orderkey,
           LAG(o_orderkey, 2) OVER w AS prev2_orderkey,
           NTILE(4) OVER w AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           FIRST_VALUE(o_orderkey) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function breadth (§2.7): LEAD/LAG offsets, NTILE
    quartiles, percent_rank/cume_dist ratios, FIRST_VALUE over an
    explicit ROWS frame — all under a TOTAL order (date, unique key), so
    every engine computes identical results. percent_rank/cume_dist are
    exact small-integer ratios → bit-identical doubles.

    Scale: one shuffle on o_custkey serves every function (same window
    spec reused); no global sort."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.lag("o_orderkey", 2).over(w).alias("prev2_orderkey"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first("o_orderkey").over(wrows).alias("first_orderkey"),
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS order_year,
             sn.n_name AS supp_nation,
             {_REV_DEC} AS v
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT order_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN v
                              ELSE CAST(0 AS DECIMAL(22,8)) END) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM vol GROUP BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of the volume sold into one
    region's customers, per year — a conditional-over-total ratio on top
    of a six-way star join. Dimensions broadcast (size-gated); the ratio
    divides two exact decimal sums cast to double once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_dim(spark, sf_dir, "customer")
    supp = load_dim(spark, sf_dir, "supplier")
    nation = load_dim(spark, sf_dir, "nation")
    region = load_dim(spark, sf_dir, "region")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cn, cust.c_nationkey == F.col("cn_key"))
        .join(region, region.r_regionkey == F.col("cn_region"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, supp.s_nationkey == F.col("sn_key"))
        .filter(F.col("r_name") == "ASIA")
    )
    v = _rev_col()
    nation_v = F.when(F.col("supp_nation") == "NATION_1", v).otherwise(
        F.lit(0).cast("decimal(22,8)")
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            (F.sum(nation_v).cast("double") / F.sum(v).cast("double")).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           EXTRACT(year FROM o.o_orderdate) AS order_year,
           CAST(CAST(SUM(
             CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))
             - CAST(l_quantity AS DECIMAL(12,4)) * CAST(p_retailprice AS DECIMAL(12,4))
               * CAST(0.1 AS DECIMAL(2,1))
           ) AS VARCHAR) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_type = 'PROMO'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a 10%-of-retail cost model —
    the schema has no partsupp) on promo parts per supplier nation and
    year. All money math stays in exact DECIMAL until the single output
    cast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_dim(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_dim(spark, sf_dir, "supplier")
    nation = load_dim(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    profit_term = _rev_col() - (
        F.col("l_quantity").cast("decimal(12,4)")
        * F.col("p_retailprice").cast("decimal(12,4)")
        * F.lit(0.1).cast("decimal(2,1)")
    )
    joined = (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, supp.s_nationkey == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return joined.groupBy(
        "supp_nation", F.year("o_orderdate").cast("bigint").alias("order_year")
    ).agg(F.sum(profit_term).cast("double").alias("profit"))


@register(
    "q12_priority_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag: the schema has no
    l_shipmode): high- vs low-priority line counts per flag in a ship
    year. One fact-fact join + conditional counters."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 15, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
      )
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per excluded-filtered
    part group, minus a NOT IN supplier blacklist. Catalyst plans the
    NOT IN as a null-aware anti join (s_suppkey is non-null, so it
    degenerates to a plain anti join — no per-row subquery)."""
    # dims go through load_dim so the size-gated broadcast hint survives
    # into the temp views (same scale contract as q7/q8/q9)
    load_dim(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_dim(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 5, 9, 15, 23, 36, 45, 49)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
          )
        GROUP BY 1, 2, 3
        """
    )


@register(
    "q2a_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
      FROM lineitem GROUP BY 1, 2
    ),
    elig AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
             n.n_name, c.cost
      FROM part p
      JOIN costs c   ON c.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n  ON n.n_nationkey = s.s_nationkey
      JOIN region r  ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_size <= 10 AND p.p_type = 'SMALL'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
    FROM elig e
    WHERE cost = (
      SELECT MIN(e2.cost) FROM elig e2 WHERE e2.p_partkey = e.p_partkey
    )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2a_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for small parts, the EUROPE
    supplier(s) achieving the minimum observed unit price, with the
    correlated-MIN predicate. The oracle states it as the literal Q2
    correlated subquery; the Spark plan decorrelates it to a single
    window MIN over the eligible rows — one partkey-partitioned pass, no
    second scan of the fact aggregate (the classic Q2 trap is
    recomputing the eligible join under the subquery). Cost is
    MIN(l_extendedprice) — a raw-column MIN, exact and identical across
    engines (no decimal-division scale divergence). Scale: one
    (partkey, suppkey) fact shuffle; dims broadcast via load_dim; the
    window repartitions by partkey only."""
    from pyspark.sql import Window  # noqa: PLC0415

    li = load_table(spark, sf_dir, "lineitem")
    part = load_dim(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "SMALL")
    )
    supp = load_dim(spark, sf_dir, "supplier")
    nation = load_dim(spark, sf_dir, "nation")
    region = load_dim(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    elig = (
        part.join(costs, costs.l_partkey == part.p_partkey)
        .join(supp, supp.s_suppkey == costs.l_suppkey)
        .join(nation, nation.n_nationkey == supp.s_nationkey)
        .join(region, region.r_regionkey == nation.n_regionkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "cost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        elig.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
