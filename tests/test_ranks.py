"""Two-level prefix sums and tie-averaged ranks match the single-task
window definitions they replace, with no unpartitioned window in the
plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.ranks import (
    average_rank2,
    ordered_prefix_sums,
)


def test_prefix_sums_match_window_definition(spark, sf_dir):
    d = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderdate")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("o_totalprice").alias("rev"))
    )
    got = {
        r["o_orderdate"]: (r["cum_cnt"], round(r["cum_rev"], 2))
        for r in ordered_prefix_sums(d, "o_orderdate", ["cnt", "rev"]).collect()
    }
    rows = sorted(d.collect(), key=lambda r: r["o_orderdate"])
    c = s = 0
    for r in rows:
        c += r["cnt"]
        s += r["rev"]
        assert got[r["o_orderdate"]][0] == c
        assert abs(got[r["o_orderdate"]][1] - s) < 1e-6


def test_average_rank2_matches_sql_rank(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_quantity"]: r["rank2"]
        for r in average_rank2(li, "l_quantity").collect()
    }
    li.createOrReplaceTempView("li_ranks_t")
    want = {
        r["v"]: r["r2"]
        for r in spark.sql(
            """SELECT DISTINCT l_quantity AS v,
                      2*RANK() OVER (ORDER BY l_quantity)
                      + COUNT(*) OVER (PARTITION BY l_quantity) - 1 AS r2
               FROM li_ranks_t"""
        ).collect()
    }
    assert got == want


def test_rank_plan_has_no_unpartitioned_window(spark, sf_dir):
    from etl_pipeline_project_auraverse_spark.plans import inspect as PI

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = average_rank2(li, "l_extendedprice")
    assert PI.lint_plan(df).unpartitioned_windows == 0
