"""Relational query surface: scans, filters, aggregations, joins,
windows, rollup/cube/grouping sets, set ops, pivot, top-k, scalar
functions.

The reference has none of these (SURVEY.md §2.5 — its only aggregate
workload is schema profiling), but its declared capability surface plus
the driver's star schema define the target. Everything here is
declarative DataFrame/SQL — Catalyst chooses broadcast vs shuffle joins
(small dims: region/nation/supplier/part are all far below the
broadcast threshold), pushes filters into the parquet scans, and prunes
columns.

Scale notes (100 TB posture):
- Dimension joins are explicitly `F.broadcast(...)`-hinted where the
  dimension is bounded (region/nation: 25 rows at any SF; part/supplier
  scale linearly but stay ≪ fact tables — AQE re-plans to broadcast at
  runtime when they fit).
- Fact-fact joins (orders⋈lineitem) shuffle on the join key; both sides
  are pre-filtered before the join so the shuffle moves minimal rows.
- Window queries partition by a key (customer/brand) — no global
  windows, so state is bounded per partition and skew is handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.queries._util import (
    DEC,
    dec_avg,
    dec_sum,
    sql_dec_avg,
    sql_dec_sum,
)
from etl_pipeline_project_auraverse_spark.session import load_table

def REVENUE():
    # per-lineitem discounted revenue (built lazily: Column construction
    # needs an active SparkContext in classic mode)
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


SQL_REVENUE = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# Q1 — pricing summary (TPC-H Q1 shape). Flagship query.
# Scan → filter (pushed to parquet) → hash aggregate (partial map-side
# combine, then one shuffle on the two low-cardinality group keys).
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dec_sum('l_quantity')}                                  AS sum_qty,
           {sql_dec_sum('l_extendedprice')}                             AS sum_base_price,
           {sql_dec_sum(SQL_REVENUE)}                                   AS sum_disc_price,
           {sql_dec_sum(f'({SQL_REVENUE}) * (1 + l_tax)')}              AS sum_charge,
           {sql_dec_avg('l_quantity')}                                  AS avg_qty,
           {sql_dec_avg('l_extendedprice')}                             AS avg_price,
           {sql_dec_avg('l_discount')}                                  AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(REVENUE()).alias("sum_disc_price"),
            dec_sum(REVENUE() * (1 + F.col("l_tax"))).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q6-shape: tight filter + global aggregate. The whole WHERE clause is
# pushed into the parquet row-group scan (min/max pruning at scale).
# ---------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {sql_dec_sum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Q3-shape: 3-way join (dim filter → fact ⋈ fact), group, top-10.
# customer is broadcast; orders⋈lineitem shuffles on l_orderkey after
# both sides are date-filtered. Unique tiebreaker (l_orderkey) makes the
# LIMIT deterministic.
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dec_sum(SQL_REVENUE)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    # NOTE: aggregating lineitem BEFORE the joins (the q18/fulfillment
    # pre-agg idiom) is a measured LOSS here — the broadcast customer
    # join filters ~4/5 of the orders map-side before the groupBy, so
    # the post-join aggregate shuffles far fewer groups than a
    # pre-join aggregate over every shipped order would (A/B at sf0.1:
    # 0.91 s post-join vs 1.07 s pre-agg). Pre-aggregation only wins
    # when no selective dimension filter precedes the aggregate.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(REVENUE()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5-shape: 6-way star join region→nation→customer→orders→lineitem→supplier
# with the "local supplier" (c_nationkey = s_nationkey) condition.
# region/nation/supplier broadcast; the only big shuffle is
# orders⋈lineitem.
# ---------------------------------------------------------------------------
@register(
    "q05_local_supplier_revenue",
    oracle=f"""
    SELECT n_name, {sql_dec_sum(SQL_REVENUE)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q05_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(REVENUE()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# Q4-shape: semi join with a non-equi condition (late shipments),
# then count by priority.
# ---------------------------------------------------------------------------
@register(
    "q04_late_ship_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q04_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Top-k with join: highest-revenue customers. Broadcast dim join after
# the fact-side aggregation (aggregate first, join small result —
# minimizes shuffled bytes).
# ---------------------------------------------------------------------------
@register(
    "q_top_customers_by_revenue",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey, {sql_dec_sum('o_totalprice')} AS total_spend,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, c_mktsegment, total_spend, n_orders
    FROM rev JOIN customer ON o_custkey = c_custkey
    ORDER BY total_spend DESC, c_custkey
    LIMIT 15
    """,
)
def q_top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = orders.groupBy("o_custkey").agg(
        dec_sum("o_totalprice").alias("total_spend"), F.count("*").alias("n_orders")
    )
    return (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "c_mktsegment", "total_spend", "n_orders")
        .orderBy(F.col("total_spend").desc(), "c_custkey")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Semi / anti joins.
# ---------------------------------------------------------------------------
@register(
    "q_semi_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def q_semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "q_anti_customers_without_recent_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    ORDER BY c_custkey
    """,
)
def q_anti_customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Broadcast dim join + aggregate by part type.
# ---------------------------------------------------------------------------
@register(
    "q_revenue_by_part_type",
    oracle=f"""
    SELECT p_type,
           {sql_dec_sum(SQL_REVENUE)} AS revenue,
           {sql_dec_avg('l_quantity')} AS avg_qty,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_type
    ORDER BY p_type
    """,
)
def q_revenue_by_part_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            dec_sum(REVENUE()).alias("revenue"),
            dec_avg("l_quantity").alias("avg_qty"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_type")
    )


# ---------------------------------------------------------------------------
# Window functions: ranking (top-3 parts per brand), running totals,
# lag-based deltas. Unique keys in every ORDER BY → deterministic.
# ---------------------------------------------------------------------------
@register(
    "q_window_top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, rnk
    FROM (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rnk
        FROM part
    )
    WHERE rnk <= 3
    ORDER BY p_brand, rnk
    """,
)
def q_window_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        part.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rnk")
        .orderBy("p_brand", "rnk")
    )


@register(
    "q_window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                      OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS running_spend,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
    FROM orders
    WHERE o_custkey < 50
    ORDER BY o_custkey, order_seq
    """,
)
def q_window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn(
            "running_spend",
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).over(
                    w.rowsBetween(W.unboundedPreceding, W.currentRow)
                ),
                2,
            ).cast("double"),
        )
        .withColumn("order_seq", F.row_number().over(w).cast("long"))
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend", "order_seq")
        .orderBy("o_custkey", "order_seq")
    )


@register(
    "q_window_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderkey) OVER w AS prev_orderkey,
           CAST(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS gap_days,
           CAST(ROUND(o_totalprice - LAG(o_totalprice) OVER w, 2) AS DOUBLE) AS price_delta
    FROM orders
    WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q_window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("prev_orderkey", F.lag("o_orderkey").over(w))
        .withColumn(
            "gap_days",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("long"),
        )
        .withColumn(
            "price_delta",
            F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).cast("double"),
        )
        .select(
            "o_custkey", "o_orderkey", "o_orderdate", "prev_orderkey", "gap_days", "price_delta"
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "q_window_moving_avg_price",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                      OVER (ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
                      / COUNT(*) OVER (ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)
                AS DOUBLE) AS moving_avg_5
    FROM orders
    WHERE o_custkey < 10
    ORDER BY o_orderdate, o_orderkey
    """,
)
def q_window_moving_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 10)
    w = W.orderBy("o_orderdate", "o_orderkey").rowsBetween(-4, W.currentRow)
    return (
        orders.withColumn(
            "moving_avg_5",
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
                / F.count("*").over(w),
                4,
            ).cast("double"),
        )
        .select("o_orderkey", "o_orderdate", "moving_avg_5")
        .orderBy("o_orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Correlated-subquery shape: customers above their nation's average
# balance — expressed as a window aggregate (single shuffle on
# nationkey), not a self-join.
# ---------------------------------------------------------------------------
@register(
    "q_above_nation_avg_balance",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, nation_avg
    FROM (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal,
               CAST(ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6)))
                          OVER (PARTITION BY c_nationkey) AS DOUBLE)
                          / COUNT(*) OVER (PARTITION BY c_nationkey), 6)
                    AS DOUBLE) AS nation_avg
        FROM customer
    )
    WHERE c_acctbal > nation_avg
    ORDER BY c_custkey
    """,
)
def q_above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey")
    return (
        cust.withColumn(
            "nation_avg",
            F.round(
                F.sum(F.col("c_acctbal").cast(DEC)).over(w).cast("double")
                / F.count("*").over(w),
                6,
            ).cast("double"),
        )
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "nation_avg")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# ROLLUP / CUBE / GROUPING SETS. Group keys are coalesced to 'ALL' so
# subtotal rows are unambiguous (and engine null-ordering differences
# are irrelevant).
# ---------------------------------------------------------------------------
@register(
    "q_rollup_status_priority",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           {sql_dec_sum('o_totalprice')} AS total_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
)
def q_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            dec_sum("o_totalprice").alias("total_price"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "total_price",
            "n_orders",
        )
        .orderBy("gid", "status", "priority")
    )


@register(
    "q_cube_returnflag_linestatus",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           {sql_dec_sum('l_quantity')} AS sum_qty,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, returnflag, linestatus
    """,
)
def q_cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            dec_sum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "sum_qty",
            "n_items",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


@register(
    "q_grouping_sets_order_stats",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR), 'ALL') AS order_year,
           {sql_dec_sum('o_totalprice')} AS total_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (EXTRACT(year FROM o_orderdate)))
    ORDER BY status, order_year
    """,
)
def q_grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(CAST(year(o_orderdate) AS STRING), 'ALL') AS order_year,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total_price,
               COUNT(*) AS n_orders
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)))
        ORDER BY status, order_year
        """
    )


# ---------------------------------------------------------------------------
# Set operations: customer nations vs supplier nations, tagged.
# ---------------------------------------------------------------------------
@register(
    "q_set_ops_nation_roles",
    oracle="""
    SELECT 'both' AS role, n FROM (
        SELECT DISTINCT c_nationkey AS n FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS n FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS role, n FROM (
        SELECT DISTINCT c_nationkey AS n FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS n FROM supplier)
    ORDER BY role, n
    """,
)
def q_set_ops_nation_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_n = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n")
    ).distinct()
    supp_n = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n")
    ).distinct()
    both = cust_n.intersect(supp_n).withColumn("role", F.lit("both"))
    cust_only = cust_n.exceptAll(supp_n).withColumn("role", F.lit("customer_only"))
    return both.unionByName(cust_only).select("role", "n").orderBy("role", "n")


# ---------------------------------------------------------------------------
# Pivot (and its CASE-WHEN oracle twin).
# ---------------------------------------------------------------------------
@register(
    "q_pivot_priority_by_status",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_dec_sum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS status_O,
           {sql_dec_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS status_F,
           {sql_dec_sum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS status_P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(dec_sum("o_totalprice"))
    )
    return pivoted.select(
        "o_orderpriority",
        F.col("O").alias("status_O"),
        F.col("F").alias("status_F"),
        F.col("P").alias("status_P"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Distinct & conditional aggregation.
# ---------------------------------------------------------------------------
@register(
    "q_distinct_nation_segments",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment
    FROM customer
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_distinct_nation_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "q_conditional_agg_segments",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS n_negative,
           {sql_dec_sum('CASE WHEN c_acctbal > 0 THEN c_acctbal END')} AS positive_bal,
           MAX(c_acctbal) AS max_bal,
           MIN(c_acctbal) AS min_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_conditional_agg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
            dec_sum(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))).alias("positive_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.min("c_acctbal").alias("min_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Scalar functions: strings, dates, math — all JVM-side built-ins
# (whole-stage codegen; no Python in the row path).
# ---------------------------------------------------------------------------
@register(
    "q_scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           SUBSTRING(p_type, 1, 3) AS type_prefix,
           CONCAT(p_brand, '/', p_type) AS brand_type,
           REPLACE(p_name, 'a', '@') AS name_subst,
           SPLIT_PART(p_name, ' ', 1) AS first_word,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           TRIM(CONCAT('  ', p_brand, '  ')) AS brand_trimmed
    FROM part
    WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
)
def q_scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_name", "a", "@").alias("name_subst"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trimmed"),
    ).orderBy("p_partkey")


@register(
    "q_scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
           CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
               AS days_since_epoch_start,
           strftime(o_orderdate, '%Y-%m') AS year_month
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def q_scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    ).orderBy("o_orderkey")


@register(
    "q_scalar_math_functions",
    oracle="""
    SELECT p_partkey,
           CAST(ROUND(p_retailprice * 1.07, 2) AS DOUBLE) AS with_tax,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
           ABS(p_retailprice - 1000.0) AS dist_from_1k,
           CAST(ROUND(SQRT(CAST(p_size AS DOUBLE)), 6) AS DOUBLE) AS size_sqrt,
           CAST(p_size % 7 AS BIGINT) AS size_mod7,
           CAST(POWER(CAST(p_size AS DOUBLE), 2) AS DOUBLE) AS size_sq,
           GREATEST(p_retailprice, 500.0) AS at_least_500,
           LEAST(CAST(p_size AS BIGINT), 25) AS capped_size
    FROM part
    WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
)
def q_scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return part.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 1.07, 2).cast("double").alias("with_tax"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist_from_1k"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).cast("double").alias("size_sqrt"),
        (F.col("p_size") % 7).cast("long").alias("size_mod7"),
        F.pow(F.col("p_size").cast("double"), 2).alias("size_sq"),
        F.greatest(F.col("p_retailprice"), F.lit(500.0)).alias("at_least_500"),
        F.least(F.col("p_size").cast("long"), F.lit(25).cast("long")).alias("capped_size"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Top-k global sort with unique tiebreaker.
# ---------------------------------------------------------------------------
@register(
    "q_topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )
