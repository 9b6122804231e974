"""CDC / upsert queries: the orders table read as a change feed.

Each order is an update to its customer's "current order state";
an 'F' (finalized/closed) status on the customer's LATEST order acts
as a delete tombstone. ``operators/cdc.apply_changes`` collapses the
feed; the oracle is the equivalent ROW_NUMBER latest-wins SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.cdc import apply_changes
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.session import load_table


@register(
    "q_cdc_latest_order_state",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    )
    SELECT o_custkey AS custkey,
           o_orderkey AS last_orderkey,
           o_orderdate AS last_orderdate,
           CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS last_totalprice,
           o_orderpriority AS last_priority
    FROM ranked
    WHERE rn = 1 AND o_orderstatus <> 'F'
    ORDER BY custkey
    """,
)
def q_cdc_latest_order_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current per-customer order state after applying the whole feed:
    latest (o_orderdate, o_orderkey) wins, customers whose latest
    order is finalized ('F') are tombstoned. One window shuffle on the
    high-cardinality customer key — the MERGE-apply plan shape."""
    orders = load_table(spark, sf_dir, "orders")
    snapshot = apply_changes(
        orders,
        keys=["o_custkey"],
        seq_cols=["o_orderdate", "o_orderkey"],
        op_col="o_orderstatus",
        delete_op="F",
    )
    return snapshot.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
        F.round("o_totalprice", 2).cast("double").alias("last_totalprice"),
        F.col("o_orderpriority").alias("last_priority"),
    ).orderBy("custkey")
