"""Bucketed co-located joins: the plan must prove the shuffle was
eliminated, not just that the rows come back right."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
)
from etl_pipeline_project_auraverse_spark.plans import inspect as PI
from etl_pipeline_project_auraverse_spark.session import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "b_orders", "o_custkey", num_buckets=8, sort_by="o_custkey")
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        num_buckets=8,
        sort_by="o_custkey",
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the join exercises the bucketed SMJ path the
    # way a fact-fact join would at scale (neither side broadcastable)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = colocated_join(spark, left, right, "o_custkey")
        plan = PI.physical_plan(df)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not shuffle either side:\n" + plan[:1500]
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_rows_match_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = colocated_join(spark, left, right, "o_custkey").count()
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    want = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).count()
    assert got == want > 0


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key should also ride the bucketed
    distribution instead of re-shuffling."""
    left, _ = bucketed_tables
    df = spark.table(left).groupBy("o_custkey").agg(F.count("*").alias("n"))
    plan = PI.physical_plan(df)
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
