"""Grouped-agg pandas UDAFs: values must equal the same aggregate
computed driver-side with numpy over the per-group data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.functions.udafs import (
    geometric_mean,
    trimmed_mean_10,
)
from etl_pipeline_project_auraverse_spark.session import load_table


def test_trimmed_mean_matches_numpy(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: r["tm"]
        for r in li.groupBy("l_returnflag")
        .agg(trimmed_mean_10()("l_extendedprice").alias("tm"))
        .collect()
    }
    pdf = li.select("l_returnflag", "l_extendedprice").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        arr = np.sort(grp["l_extendedprice"].to_numpy(dtype=float))
        k = int(len(arr) * 0.1)
        want = arr[k: len(arr) - k].mean()
        assert got[flag] == pytest.approx(want, rel=1e-12)


def test_geometric_mean_matches_numpy(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = {
        r["o_orderpriority"]: r["gm"]
        for r in orders.groupBy("o_orderpriority")
        .agg(geometric_mean()("o_totalprice").alias("gm"))
        .collect()
    }
    pdf = orders.select("o_orderpriority", "o_totalprice").toPandas()
    for prio, grp in pdf.groupby("o_orderpriority"):
        arr = grp["o_totalprice"].to_numpy(dtype=float)
        want = float(np.exp(np.log(arr[arr > 0]).mean()))
        assert got[prio] == pytest.approx(want, rel=1e-9)


def test_usable_in_sql(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("t_orders")
    spark.udf.register("trimmed_mean_10", trimmed_mean_10())
    rows = spark.sql(
        "SELECT o_orderstatus, trimmed_mean_10(o_totalprice) AS tm "
        "FROM t_orders GROUP BY o_orderstatus"
    ).collect()
    assert len(rows) >= 2 and all(r["tm"] > 0 for r in rows)
