"""Core relational operator inventory (SURVEY.md §2.2–§2.8).

Each query exercises one operator family from the reference's surface —
scans with pushdown (§2.4), the MERGE equi-join family (§2.5),
aggregations incl. conditional aggs from the app's computeComparison
(/root/reference/src/utils/comparison.ts:4-30) (§2.6), sorts/top-k (§2.7),
set ops (§2.8) — expressed with the DataFrame API so Catalyst plans them
(pushdown, pruning, broadcast joins).

Determinism contract with the DuckDB oracle (driver hash-matches values):

- Never ``SUM``/``AVG`` doubles directly — summation order differs between
  engines. Cast to DECIMAL first (exact), then cast the exact result to
  DOUBLE (correctly-rounded in both engines → bit-identical).
- Never ``ROUND`` a double — Spark rounds via BigDecimal string repr,
  DuckDB via ``round(x*10^k)/10^k``; they disagree on ties. Division of
  bit-identical doubles by identical counts is exact IEEE → safe for avg.
- Every LIMIT query carries a total order (unique tiebreaker column).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_matrix_spark.operators.scale import gather_futures
from iceberg_matrix_spark.storage import scratch_dir
from iceberg_matrix_spark.queries.registry import register
from iceberg_matrix_spark.sources.testdata import load_dim, load_table


def _dec(col: str) -> F.Column:
    """Exact-arithmetic staging type for double money/quantity columns.

    Precisions are sized so chained products stay within Spark's 38-digit
    decimal cap WITHOUT scale reduction: (12,4)×(9,4)→(22,8), ×(9,4)→(32,12).
    Overflow would trigger engine-specific rounding and break oracle parity.
    """
    return F.col(col).cast("decimal(12,4)")


def _rate(col: str) -> F.Column:
    """Small-rate columns (discount/tax)."""
    return F.col(col).cast("decimal(8,4)")


def _one() -> F.Column:
    """Literal 1 as DECIMAL(5,4) (keeps products inside the 38-digit cap)."""
    return F.lit(1).cast("decimal(5,4)")


# ---------------------------------------------------------------------------
# §2.6 aggregation — flagship: TPC-H Q1-style pricing summary
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))
               * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: single-pass hash aggregate over lineitem.

    Scale: partial aggregation (map-side combine) runs before the shuffle;
    the shuffle carries only |returnflag × linestatus| ≈ 6 groups per
    partition. The shipdate filter is pushed to the parquet scan.
    ensure_compute_parallelism: the sf-scale lineitem is ONE parquet file
    → one scan split → the whole decimal-heavy partial aggregate ran on a
    single core (round 11, measured 1.45 s exec / 5 tasks); the
    round-robin exchange carries only the 6 projected columns and is a
    no-op at scale where the scan already has ≥ cores splits. Decimal
    sums and counts are order-independent, so results are unchanged.
    """
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    li = ensure_compute_parallelism(
        li.select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        )
    )
    qty, price, disc, tax = (
        _dec("l_quantity"),
        _dec("l_extendedprice"),
        _rate("l_discount"),
        _rate("l_tax"),
    )
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (_one() - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (_one() - disc) * (_one() + tax)).cast("double").alias("sum_charge"),
        (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
        (F.sum(price).cast("double") / cnt).alias("avg_price"),
        cnt.alias("count_order"),
    )


# ---------------------------------------------------------------------------
# §2.4 projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "q2_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_quantity > 45
    """,
)
def q2_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective scan: range + comparison predicates and column pruning.

    Mirrors the reference's filtered-count read assertions
    (/root/reference/tests/iceberg_feature_tests.py:457-459). Both the
    shipdate range and the quantity predicate reach the parquet scan as
    PushedFilters; only 4 of 11 columns are read (ReadSchema).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_quantity") > 45)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


@register(
    "q_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey = 777
    """,
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on the key column (the bloom-filter probe shape,
    /root/reference/tests/iceberg_feature_tests.py:1101). Equality predicate
    pushed to parquet; row-group stats skip everything else."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 777)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


@register(
    "q_in_list",
    oracle="""
    SELECT l_orderkey, l_suppkey, l_extendedprice
    FROM lineitem WHERE l_suppkey IN (1, 3, 5, 7)
    """,
)
def q_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate (/root/reference/tests/clickhouse_feature_tests.py:365)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey").isin(1, 3, 5, 7))
        .select("l_orderkey", "l_suppkey", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# §2.5 joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l.l_orderkey AS orderkey,
      CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
      strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
      o.o_orderpriority AS order_priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way equi-join → agg → top-k.

    Scale: customer (filtered on segment) gets a size-gated broadcast
    hint (load_dim) — broadcast at test scale, AQE-planned at 100 TB; the
    orders⋈lineitem join shuffles on orderkey. Top-k is
    TakeOrderedAndProject (no global sort).
    """
    cust = load_dim(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp_ntz")
    )
    # single-file scan → one split → the broadcast joins + partial agg
    # all ran on one core (round 11); round-robin no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    li = ensure_compute_parallelism(
        li.select("l_orderkey", "l_extendedprice", "l_discount")
    )
    price, disc = _dec("l_extendedprice"), _rate("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(F.sum(price * (_one() - disc)).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "order_date", "order_priority")
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT
      n.n_name AS nation,
      CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a co-nation constraint.

    Scale: region/nation are bounded dims → always broadcast;
    customer/supplier get size-gated hints (load_dim) — broadcast at test
    scale, AQE decides at 100 TB where customer is not broadcastable. The
    co-location predicate (s_nationkey = c_nationkey) rides the join
    condition either way.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_dim(spark, sf_dir, "customer")
    supp = load_dim(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # single-file scan → one split → the whole star-join + partial agg
    # ran on one core (round 11); round-robin no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    li = ensure_compute_parallelism(
        li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    )
    price, disc = _dec("l_extendedprice"), _rate("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(price * (_one() - disc)).cast("double").alias("revenue"))
    )


@register(
    "q_semi_join",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with any large order. The semi
    join never materializes order columns — payload stays one-sided."""
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


@register(
    "q_merge_preview",
    oracle="""
    SELECT
      COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
      COALESCE(s.c_name, t.c_name) AS c_name,
      CASE WHEN s.c_custkey IS NOT NULL
           THEN CAST(CAST(CAST(s.c_acctbal AS DECIMAL(18,4)) * 2 AS VARCHAR) AS DOUBLE)
           ELSE t.c_acctbal END AS c_acctbal,
      CASE WHEN s.c_custkey IS NOT NULL AND t.c_custkey IS NOT NULL THEN 'updated'
           WHEN s.c_custkey IS NOT NULL THEN 'inserted'
           ELSE 'unchanged' END AS merge_action
    FROM customer t
    FULL OUTER JOIN (
      SELECT c_custkey, c_name, c_acctbal
      FROM customer WHERE c_acctbal > 5000
    ) s ON t.c_custkey = s.c_custkey
    """,
)
def q_merge_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics as a pure query: WHEN MATCHED THEN UPDATE /
    WHEN NOT MATCHED THEN INSERT, planned as the same full-outer equi-join
    Spark uses for MERGE INTO (reference MERGE:
    /root/reference/tests/iceberg_feature_tests.py:525-529). The stateful
    version lives in the IceLite table layer."""
    target = load_table(spark, sf_dir, "customer")
    source = target.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    t, s = target.alias("t"), source.alias("s")
    matched = F.col("s.c_custkey").isNotNull()
    return t.join(s, F.col("t.c_custkey") == F.col("s.c_custkey"), "full_outer").select(
        F.coalesce(F.col("s.c_custkey"), F.col("t.c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("s.c_name"), F.col("t.c_name")).alias("c_name"),
        F.when(
            matched,
            (F.col("s.c_acctbal").cast("decimal(18,4)") * 2).cast("double"),
        )
        .otherwise(F.col("t.c_acctbal"))
        .alias("c_acctbal"),
        F.when(matched & F.col("t.c_custkey").isNotNull(), F.lit("updated"))
        .when(matched, F.lit("inserted"))
        .otherwise(F.lit("unchanged"))
        .alias("merge_action"),
    )


@register(
    "q_merge_sql",
    oracle="""
    WITH src AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000
      UNION ALL
      SELECT c_custkey + 10000000 AS c_custkey, c_name, c_acctbal
      FROM customer WHERE c_acctbal > 5000
    )
    SELECT t.c_custkey, t.c_name,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal * 2
                ELSE t.c_acctbal END AS c_acctbal
    FROM customer t LEFT JOIN src s ON t.c_custkey = s.c_custkey
    UNION ALL
    SELECT s.c_custkey, s.c_name, s.c_acctbal
    FROM src s LEFT JOIN customer t ON t.c_custkey = s.c_custkey
    WHERE t.c_custkey IS NULL
    """,
)
def q_merge_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful MERGE INTO driven by the literal SQL string the reference
    runs (/root/reference/tests/iceberg_feature_tests.py:525-529): CTAS a
    real IceLite table from customer, execute the MERGE through the SQL
    front-end (sql/facade.py), and return the table's post-merge state.
    Matched rows double their balance; unmatched source rows (key-offset
    twins of the high-balance customers) insert. The oracle recomputes the
    final state relationally over the raw parquet."""
    return _merge_sql_exec(_merge_sql_setup(spark, sf_dir))


def _merge_sql_setup(spark: SparkSession, sf_dir: str):
    """The CTAS phase of q_merge_sql (two table builds) — split out so
    bench.py can time setup and MERGE separately; a MERGE regression must
    not hide inside CTAS noise."""

    from iceberg_matrix_spark.sql import IceLiteSQL  # noqa: PLC0415
    from iceberg_matrix_spark.tables.catalog import IceLiteCatalog  # noqa: PLC0415

    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    wh = scratch_dir("icelite-sql-merge-wh-")
    sql = IceLiteSQL(spark, IceLiteCatalog(spark, wh))
    sql.sql("CREATE NAMESPACE IF NOT EXISTS local.dml")
    target = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
    )
    source = target.filter(F.col("c_acctbal") > 5000)
    # two independent CTAS builds on disjoint locations — overlap them
    # (guide §2.6); final table state identical either way
    with ThreadPoolExecutor(max_workers=2) as pool:
        ft = pool.submit(
            sql.catalog.create_table_as_select, "dml.customer_t", target
        )
        fs = pool.submit(
            sql.catalog.create_table_as_select,
            "dml.customer_src",
            source.unionAll(
                source.withColumn(
                    "c_custkey", F.col("c_custkey") + F.lit(10000000)
                )
            ),
        )
        gather_futures(ft, fs)
    return sql


def _merge_sql_exec(sql) -> DataFrame:
    """The measured phase of q_merge_sql: the MERGE statement + read-back."""
    sql.sql(
        """MERGE INTO local.dml.customer_t t USING local.dml.customer_src s
           ON t.c_custkey = s.c_custkey
           WHEN MATCHED THEN UPDATE SET t.c_acctbal = s.c_acctbal * 2
           WHEN NOT MATCHED THEN INSERT *"""
    )
    return sql.sql("SELECT c_custkey, c_name, c_acctbal FROM local.dml.customer_t")


@register(
    "q_incremental_read",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_custkey % 3 = 1
    """,
)
def q_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-range incremental read certified through the driver gate
    (the conformance probe `incremental-read` covers the mechanics; this
    adds a value-level oracle): three commits land thirds of customer,
    and read_incremental over (snap1, snap2] must return EXACTLY the
    second batch — not the first, not the third
    (tables/table.py:read_incremental; flink start/end-tag hints)."""

    from iceberg_matrix_spark.tables.catalog import IceLiteCatalog  # noqa: PLC0415

    wh = scratch_dir("icelite-incr-wh-")
    cat = IceLiteCatalog(spark, wh)
    cat.create_namespace("incr")
    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    t = cat.create_table("incr.customer_t", "c_custkey bigint, c_acctbal double")
    for rem in (0, 1, 2):
        t.append(base.filter(F.col("c_custkey") % 3 == rem))
    snaps = [s.snapshot_id for s in t.meta.snapshots]
    return t.read_incremental(snaps[0], snaps[1])


@register(
    "q_metadata_tables",
    oracle="""
    WITH thirds AS (
      SELECT c_custkey % 3 AS rem, COUNT(*) AS n_rows,
             MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
      FROM customer GROUP BY c_custkey % 3
    )
    SELECT rem + 1 AS commit_seq, 'append' AS operation,
           CAST(1 AS BIGINT) AS n_files, n_rows,
           CAST(min_key AS VARCHAR) AS lower_key,
           CAST(max_key AS VARCHAR) AS upper_key
    FROM thirds
    """,
)
def q_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-table surface certified at the VALUE level (the
    conformance probes cover mechanics; this puts bounds math under the
    driver oracle): three single-file commits land thirds of customer,
    then `snapshots` ⋈ `files` must report per commit exactly one file,
    the third's row count, and footer lower/upper bounds equal to the
    third's true MIN/MAX key (tables/metadata_tables.py:21,40 — the
    bounds come from executor-collected parquet footer stats, so this
    also oracles the stats collector end to end)."""

    from iceberg_matrix_spark.tables import metadata_tables as mt  # noqa: PLC0415
    from iceberg_matrix_spark.tables.catalog import IceLiteCatalog  # noqa: PLC0415

    wh = scratch_dir("icelite-meta-wh-")
    cat = IceLiteCatalog(spark, wh)
    cat.create_namespace("meta")
    base = load_table(spark, sf_dir, "customer").select("c_custkey")
    t = cat.create_table("meta.customer_t", "c_custkey bigint")
    for rem in (0, 1, 2):
        t.append(base.filter(F.col("c_custkey") % 3 == rem).coalesce(1))
    snaps = mt.snapshots(t).select("sequence_number", "operation")
    fl = mt.files(t).select(
        "sequence_number",
        "record_count",
        F.col("lower_bounds")["c_custkey"].alias("lower_key"),
        F.col("upper_bounds")["c_custkey"].alias("upper_key"),
    )
    return (
        snaps.join(fl, "sequence_number")
        .groupBy("sequence_number", "operation", "lower_key", "upper_key")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("record_count").alias("n_rows"),
        )
        .select(
            F.col("sequence_number").alias("commit_seq"),
            "operation",
            "n_files",
            "n_rows",
            "lower_key",
            "upper_key",
        )
    )


@register(
    "q_cdc_changelog",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_acctbal FROM customer
    ), final AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal > 5000 THEN c_acctbal * 2
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_acctbal >= 0
    )
    SELECT f.c_custkey, f.c_acctbal, 'insert' AS _change_type
    FROM final f LEFT JOIN base b
      ON b.c_custkey = f.c_custkey AND b.c_acctbal = f.c_acctbal
    WHERE b.c_custkey IS NULL
    UNION ALL
    SELECT b.c_custkey, b.c_acctbal, 'delete' AS _change_type
    FROM base b LEFT JOIN final f
      ON f.c_custkey = b.c_custkey AND f.c_acctbal = b.c_acctbal
    WHERE f.c_custkey IS NULL
    """,
)
def q_cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog (Iceberg create_changelog_view shape) certified end
    to end: build a real IceLite table from customer, run a DELETE (CoW)
    and an UPDATE (MoR) through the table layer, then diff the first and
    last snapshots with snapshot_changes (tables/table.py) — UPDATEs
    surface as delete+insert pairs, DELETEs as deletes. The oracle
    recomputes the state diff relationally over the raw parquet (rows
    are unique per (custkey, acctbal), so the set-join diff equals the
    multiset exceptAll diff)."""

    from iceberg_matrix_spark.tables.catalog import IceLiteCatalog  # noqa: PLC0415

    wh = scratch_dir("icelite-cdc-wh-")
    cat = IceLiteCatalog(spark, wh)
    cat.create_namespace("cdc")
    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    t = cat.create_table_as_select("cdc.customer_t", base)
    first = t.meta.snapshots[-1].snapshot_id
    t.set_properties({"write.delete.mode": "copy-on-write"})
    t.delete("c_acctbal < 0")
    t.set_properties({"write.update.mode": "merge-on-read"})
    t.update({"c_acctbal": "c_acctbal * 2"}, where="c_acctbal > 5000")
    last = t.refresh().meta.snapshots[-1].snapshot_id
    return t.snapshot_changes(first, last)


# ---------------------------------------------------------------------------
# §2.6 aggregations: conditional / distinct / hierarchical
# ---------------------------------------------------------------------------


@register(
    "q_conditional_agg",
    oracle="""
    SELECT
      n.n_name AS nation,
      CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
      COUNT(*) AS n_total
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — the gained/lost/changed counting pattern of
    the app's computeComparison (/root/reference/src/utils/comparison.ts:16-26)
    re-expressed as sum(when(...)) over a join."""
    orders = load_table(spark, sf_dir, "orders")
    # single-file scan → broadcast joins + partial agg on one core
    # (round 11); round-robin the 2-column projection, no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    orders = ensure_compute_parallelism(
        orders.select("o_custkey", "o_orderstatus")
    )
    cust = load_dim(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def flag(status: str) -> F.Column:
        return F.sum(F.when(F.col("o_orderstatus") == status, 1).otherwise(0))

    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            flag("F").alias("n_finished"),
            flag("O").alias("n_open"),
            flag("P").alias("n_pending"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


@register(
    "q_distinct_agg",
    oracle="""
    SELECT
      l_returnflag,
      COUNT(DISTINCT l_suppkey) AS n_suppliers,
      COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi distinct-aggregate (Catalyst expands to a partial-agg expand plan)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate (ROLLUP) — subtotals + grand total in one pass."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# §2.7 sorts / top-k / window functions
# ---------------------------------------------------------------------------


@register(
    "q_top1_latest",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 1
    """,
)
def q_top1_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-by-time — the reference's latest-snapshot idiom
    (/root/reference/tests/iceberg_feature_tests.py:394-398:
    ORDER BY committed_at DESC LIMIT 1) → TakeOrderedAndProject."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
    )


@register(
    "q_window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT
        o_custkey, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number window (deterministic
    tiebreak on the unique key). Spark pushes a per-partition rank limit
    (WindowGroupLimit) before the shuffle — no full sort of the fact table."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@register(
    "q_window_running",
    oracle="""
    SELECT
      user_id, event_id,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_value,
      LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag per user (decimal accumulation: engines may sum
    window frames in different association orders; decimals are exact)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,4)")).over(frame).cast("double").alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@register(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
        CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE
             OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, event_id,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_seq
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap → session id via lag +
    running sum (the batch analog of streaming session windows, §2.10).

    Scale: one shuffle on user_id serves both window functions and the
    final aggregate (same partitioning reused across stages)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = load_table(spark, sf_dir, "events")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    return (
        ev.select("user_id", "event_id", "ts")
        .withColumn("new_session", new_session)
        .withColumn("session_seq", F.sum("new_session").over(frame))
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# §2.8 set operations
# ---------------------------------------------------------------------------


@register(
    "q_set_ops",
    oracle="""
    WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT o_custkey, 'both' AS bucket FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
    UNION ALL
    SELECT o_custkey, 'finished_only' AS bucket FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over distinct key sets."""
    orders = load_table(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = finished.intersect(open_).withColumn("bucket", F.lit("both"))
    fin_only = finished.exceptAll(open_).withColumn("bucket", F.lit("finished_only"))
    return both.unionByName(fin_only)


# ---------------------------------------------------------------------------
# §2.17 scalar function surface
# ---------------------------------------------------------------------------


@register(
    "q_scalar_funcs",
    oracle="""
    SELECT
      o_orderkey,
      CONCAT('MARK=', CAST(o_orderkey AS VARCHAR)) AS marker,
      CASE WHEN o_totalprice > 200000 THEN 'large'
           WHEN o_totalprice > 100000 THEN 'medium'
           ELSE 'small' END AS size_bucket,
      UPPER(o_orderpriority) AS priority_uc,
      strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    WHERE o_orderkey <= 100
    """,
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar surface: CONCAT/CAST marker idiom
    (/root/reference/tests/flink_feature_tests.py:538-539) + CASE WHEN."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 100)
        .select(
            "o_orderkey",
            F.concat(F.lit("MARK="), F.col("o_orderkey").cast("string")).alias("marker"),
            F.when(F.col("o_totalprice") > 200000, "large")
            .when(F.col("o_totalprice") > 100000, "medium")
            .otherwise("small")
            .alias("size_bucket"),
            F.upper("o_orderpriority").alias("priority_uc"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT
      CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS BIGINT) AS k,
      COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the JSON props column — the VARIANT /
    parse_json surface (/root/reference/tests/iceberg_feature_tests.py:1304-1308)
    over plain JSON strings (no VARIANT type without the Iceberg runtime);
    regexp_extract keeps Spark & DuckDB semantics identical. Both engines
    NULLIF the no-match empty string before the cast: a props row without
    "k" groups under NULL instead of throwing the ANSI empty-string cast
    error (CAST_INVALID_INPUT on Spark 4, Conversion Error on DuckDB)."""
    extracted = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1)
    return (
        load_table(spark, sf_dir, "events")
        .select(
            F.nullif(extracted, F.lit("")).cast("bigint").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "q_date_trunc_agg",
    oracle="""
    SELECT
      CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
      event_type,
      COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_date_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-bucket aggregate (batch analog of streaming windowed
    aggs, §2.10): date_trunc bucketing by day × event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day_ts"),
            "event_type",
            "value",
        )
        .groupBy("day_ts", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping combinations in one pass (Catalyst expands to a
    single expand + hash aggregate, not 4 scans)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the Spark 4 DataFrame API."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupingSets([["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "q_branch_read_sql",
    oracle="""
    SELECT 'branch' AS ref, c_custkey, c_acctbal FROM customer
    UNION ALL
    SELECT 'main' AS ref, c_custkey, c_acctbal FROM customer
    WHERE c_custkey % 2 = 0
    """,
)
def q_branch_read_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch write + suffix read through the SQL front-end — the
    reference's idiom verbatim (/root/reference/tests/
    iceberg_feature_tests.py:890-898): CTAS the even-key half of customer,
    CREATE BRANCH dev, INSERT the odd half INTO tbl.branch_dev as a SQL
    string, then read BOTH refs via suffix identifiers. Branch sees all
    rows; main must still see only the even half — branch isolation is
    the value under test, hash-checked row-for-row by the oracle."""
    return _branch_sql_exec(_branch_sql_setup(spark, sf_dir))


def _branch_sql_setup(spark: SparkSession, sf_dir: str):
    """The CTAS phase of q_branch_read_sql — split out so bench.py can
    report setup and the DML-under-test separately."""

    from iceberg_matrix_spark.sql import IceLiteSQL  # noqa: PLC0415
    from iceberg_matrix_spark.tables.catalog import IceLiteCatalog  # noqa: PLC0415

    wh = scratch_dir("icelite-branch-sql-wh-")
    sql = IceLiteSQL(spark, IceLiteCatalog(spark, wh))
    sql.sql("CREATE NAMESPACE IF NOT EXISTS local.brt")
    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    sql.catalog.create_table_as_select(
        "brt.customer_t", base.filter(F.col("c_custkey") % 2 == 0)
    )
    sql.catalog.create_table_as_select(
        "brt.customer_odd", base.filter(F.col("c_custkey") % 2 == 1)
    )
    return sql


def _branch_sql_exec(sql) -> DataFrame:
    """The measured phase: branch DDL + branch INSERT + both suffix reads."""
    sql.sql("ALTER TABLE local.brt.customer_t CREATE BRANCH `dev`")
    sql.sql(
        "INSERT INTO local.brt.customer_t.branch_dev "
        "SELECT c_custkey, c_acctbal FROM local.brt.customer_odd"
    )
    return sql.sql(
        """SELECT 'branch' AS ref, c_custkey, c_acctbal
           FROM local.brt.customer_t.branch_dev
           UNION ALL
           SELECT 'main' AS ref, c_custkey, c_acctbal
           FROM local.brt.customer_t"""
    )


def _wap_publish_setup(spark: SparkSession, sf_dir: str):
    """The two-CTAS staging phase of q_wap_publish — split out (VERDICT
    r9 What's-wrong #3) so bench.py reports the table builds as setup
    and the WAP protocol (branch + insert + audit + fast_forward +
    reads) as the measured query, the q_merge_sql pattern."""

    from iceberg_matrix_spark.sql import IceLiteSQL  # noqa: PLC0415
    from iceberg_matrix_spark.tables.catalog import IceLiteCatalog  # noqa: PLC0415

    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    wh = scratch_dir("icelite-wap-wh-")
    sql = IceLiteSQL(spark, IceLiteCatalog(spark, wh))
    sql.sql("CREATE NAMESPACE IF NOT EXISTS local.wap")
    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    # the two CTAS builds are independent jobs on disjoint table
    # locations; overlap them (guide §2.6) so the second's tasks
    # back-fill the first's tail — same final table state either way
    with ThreadPoolExecutor(max_workers=2) as pool:
        fe = pool.submit(
            sql.catalog.create_table_as_select,
            "wap.t", base.filter(F.col("c_custkey") % 2 == 0),
        )
        fo = pool.submit(
            sql.catalog.create_table_as_select,
            "wap.odd", base.filter(F.col("c_custkey") % 2 == 1),
        )
        gather_futures(fe, fo)
    return (sql, base)


def _wap_publish_exec(handle) -> DataFrame:
    """The measured phase: branch DDL + branch INSERT + the audit-gate
    count + fast_forward publish + the three observable reads."""
    sql, base = handle
    sql.sql("ALTER TABLE local.wap.t CREATE BRANCH `audit`")
    sql.sql(
        "INSERT INTO local.wap.t.branch_audit "
        "SELECT c_custkey, c_acctbal FROM local.wap.odd"
    )
    # both reads pin their snapshot's file list at statement time, so the
    # staged-main frame stays the PRE-publish state even when evaluated
    # after fast_forward
    staged_main = sql.sql(
        "SELECT 'staged-main' AS ref, c_custkey, c_acctbal FROM local.wap.t"
    )
    audit = sql.sql(
        "SELECT 'audit-branch' AS ref, c_custkey, c_acctbal "
        "FROM local.wap.t.branch_audit"
    )
    # the audit gate: publish only a branch whose staged state passes
    if audit.count() != base.count():
        raise AssertionError("WAP audit failed: staged branch incomplete")
    sql.sql(
        "CALL local.system.fast_forward(table => 'wap.t', "
        "branch => 'main', to => 'audit')"
    )
    published = sql.sql(
        "SELECT 'published-main' AS ref, c_custkey, c_acctbal FROM local.wap.t"
    )
    return staged_main.unionByName(audit).unionByName(published)


@register(
    "q_wap_publish",
    oracle="""
    SELECT 'staged-main' AS ref, c_custkey, c_acctbal FROM customer
    WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT 'audit-branch' AS ref, c_custkey, c_acctbal FROM customer
    UNION ALL
    SELECT 'published-main' AS ref, c_custkey, c_acctbal FROM customer
    """,
)
def q_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish as SQL strings end-to-end: stage the odd-key
    half of customer on an `audit` branch (invisible to main readers —
    the branch-isolation semantics of /root/reference/tests/
    iceberg_feature_tests.py:888-898), audit the staged row count, then
    publish via CALL system.fast_forward(main -> audit) and read main.
    The result captures all three observable states (pre-publish main,
    audit branch, post-publish main); the oracle is the deterministic
    even-half/full/full split — a wrong publish (or a staged write that
    leaked to main) hash-mismatches."""
    return _wap_publish_exec(_wap_publish_setup(spark, sf_dir))


@register(
    "q_zorder_effect",
    oracle="""
    SELECT CAST(4 AS BIGINT) AS n_files,
           CAST(0 AS BIGINT) AS overlapping_pairs,
           COUNT(*) AS n_rows,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders
    """,
)
def q_zorder_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering EFFECT, not just mechanics: after a sort rewrite the
    per-file min/max ranges must be pairwise DISJOINT — the observable
    that makes manifest pruning work (one file per range predicate
    instead of all of them; the reference checks clustering through the
    same footer-bounds lens, iceberg_feature_tests.py:853-860 +
    metadata assertions). Build an 8-file hash-scattered table from
    orders, CALL rewrite_data_files(strategy=>'sort') to 4 files, then
    derive from the files metadata table: file count, count of
    OVERLAPPING bound pairs (must be 0), and the manifest-level row
    count / global key bounds (must equal the raw data's). Boundaries
    themselves are sampling-dependent, so only these deterministic
    aggregates are output."""
    return _zorder_effect_exec(_zorder_effect_setup(spark, sf_dir))


def _zorder_effect_setup(spark: SparkSession, sf_dir: str):
    """The table-build phase of q_zorder_effect — split out so bench.py
    reports setup and the rewrite-under-test separately."""

    from iceberg_matrix_spark.tables.catalog import IceLiteCatalog  # noqa: PLC0415

    wh = scratch_dir("icelite-zeff-wh-")
    cat = IceLiteCatalog(spark, wh)
    cat.create_namespace("zeff")
    t = cat.create_table("zeff.orders_t", "o_orderkey bigint, o_totalprice double")
    base = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # hash-scatter into 8 files: every file covers nearly the full key
    # range (worst case for pruning) — the state the rewrite must fix
    t.append(base.repartition(8, "o_orderkey"))
    return t


def _zorder_effect_exec(t) -> DataFrame:
    """The measured phase: sort rewrite + files-metadata disjointness audit."""
    from iceberg_matrix_spark.tables import maintenance as maint  # noqa: PLC0415
    from iceberg_matrix_spark.tables import metadata_tables as mt  # noqa: PLC0415

    maint.rewrite_data_files(
        t, strategy="sort", columns=["o_orderkey"], target_partitions=4
    )
    t.refresh()
    # one row per FILE (manifest-scale, thousands at 100 TB, not data
    # scale; 1-slice by construction in metadata_tables) — broadcast
    # keeps the pairwise-overlap check a BroadcastNestedLoopJoin, not a
    # CartesianProduct
    bounds = mt.files(t).select(
        F.col("file_path"),
        F.col("record_count"),
        F.element_at("lower_bounds", "o_orderkey").cast("bigint").alias("lo"),
        F.element_at("upper_bounds", "o_orderkey").cast("bigint").alias("hi"),
    )
    a, b = bounds.alias("a"), bounds.alias("b")
    overlaps = a.join(
        F.broadcast(b),
        (F.col("a.file_path") < F.col("b.file_path"))
        & (F.col("a.lo") <= F.col("b.hi"))
        & (F.col("b.lo") <= F.col("a.hi")),
        "inner",
    ).agg(F.count(F.lit(1)).alias("overlapping_pairs"))
    summary = bounds.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("record_count").alias("n_rows"),
        F.min("lo").alias("min_key"),
        F.max("hi").alias("max_key"),
    )
    return summary.crossJoin(F.broadcast(overlaps)).select(
        "n_files", "overlapping_pairs", "n_rows", "min_key", "max_key"
    )
