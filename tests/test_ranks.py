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


def test_spearman_inline_ranks_match_window_formula(spark):
    """The r8 spearman rewrite attaches ranks two ways (literal maps
    for small domains, in-stream range-partitioned windows for large
    ones). Both must equal Pearson-on-window-ranks exactly — including
    with heavy ties that span range-partition boundaries in value
    space (equal keys must co-locate for the pid-local tie count to be
    the global one)."""
    import random

    from pyspark.sql import functions as F

    from etl_pipeline_project_auraverse_spark.operators import stats_tests
    from etl_pipeline_project_auraverse_spark.operators.stats_tests import (
        spearman,
    )

    rng = random.Random(11)
    # x: tiny domain (literal-map path); y: wide domain with massive
    # tie runs (forced onto the range-window path via monkeypatched
    # threshold) plus some nulls to exercise listwise deletion
    rows = []
    for _ in range(4000):
        x = float(rng.randint(0, 5))
        y = float(rng.choice([1, 1, 1, 2, 3] * 3 + [rng.randint(4, 2000)]))
        rows.append((x, None if rng.random() < 0.01 else y))
    df = spark.createDataFrame(rows, "x double, y double")

    old = stats_tests._LITERAL_RANK_LIMIT
    stats_tests._LITERAL_RANK_LIMIT = 10  # force y onto the big path
    try:
        got = {
            (r["col_x"], r["col_y"]): r["rho"]
            for r in spearman(df, ["x", "y"]).collect()
        }
    finally:
        stats_tests._LITERAL_RANK_LIMIT = old

    # reference: the textbook window formulation on the same frame
    clean = df.na.drop()
    ranked = clean.select(
        *[
            F.expr(
                f"2 * rank() OVER (ORDER BY {c}) "
                f"+ count(*) OVER (PARTITION BY {c}) - 1"
            ).alias(f"r_{c}")
            for c in ("x", "y")
        ]
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r_x").cast("decimal(19,0)")).alias("sx"),
        F.sum(F.col("r_y").cast("decimal(19,0)")).alias("sy"),
        F.sum(
            F.col("r_x").cast("decimal(19,0)") * F.col("r_x").cast("decimal(19,0)")
        ).alias("qx"),
        F.sum(
            F.col("r_y").cast("decimal(19,0)") * F.col("r_y").cast("decimal(19,0)")
        ).alias("qy"),
        F.sum(
            F.col("r_x").cast("decimal(19,0)") * F.col("r_y").cast("decimal(19,0)")
        ).alias("pxy"),
    ).collect()[0]
    n, sx, sy = s["n"], float(s["sx"]), float(s["sy"])
    num = n * float(s["pxy"]) - sx * sy
    den = ((n * float(s["qx"]) - sx * sx) * (n * float(s["qy"]) - sy * sy)) ** 0.5
    assert got[("x", "y")] == round(num / den, 6)
