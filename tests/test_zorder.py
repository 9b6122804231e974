"""Z-order clustering: key correctness and layout locality payoff."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.zorder import (
    quantize,
    sql_zorder_key,
    zorder_key,
    zorder_layout,
)
from etl_pipeline_project_auraverse_spark.session import load_table


def _morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    pts = [(0, 0), (1, 0), (0, 1), (255, 255), (0b1010, 0b0101), (37, 200)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")]).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton(x, y), (x, y)


def test_sql_zorder_key_mirrors_column_version(spark):
    """The SQL twin unrolls to the same values as the Column version."""
    df = spark.createDataFrame([(3, 7), (128, 64), (255, 0)], "x: long, y: long")
    both = df.select(
        zorder_key([F.col("x"), F.col("y")]).alias("a"),
        F.expr(sql_zorder_key(["x", "y"])).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in both)


def test_zorder_layout_tightens_both_envelopes(spark, sf_dir):
    """Per-file min/max spans: a z-order layout bounds BOTH dimensions,
    a linear sort only its leading column. Mean price-span per file
    must shrink under z-order while custkey stays usefully bounded —
    the property that makes min/max file pruning work on either
    filter column."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_custkey").alias("mnc"),
        F.max("o_custkey").alias("mxc"),
        F.min("o_totalprice").alias("mnp"),
        F.max("o_totalprice").alias("mxp"),
    )
    q = orders.crossJoin(F.broadcast(stats)).select(
        quantize(F.col("o_custkey"), F.col("mnc"), F.col("mxc")).alias("xq"),
        quantize(F.col("o_totalprice"), F.col("mnp"), F.col("mxp")).alias("yq"),
    )

    def mean_spans(df):
        spans = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("xq") - F.min("xq")).alias("xspan"),
                (F.max("yq") - F.min("yq")).alias("yspan"),
            )
            .agg(F.avg("xspan").alias("x"), F.avg("yspan").alias("y"))
            .first()
        )
        return spans["x"], spans["y"]

    n_files = 16
    zed = zorder_layout(q, zorder_key([F.col("xq"), F.col("yq")]), n_files)
    linear = q.repartitionByRange(n_files, F.col("xq"))

    zx, zy = mean_spans(zed)
    lx, ly = mean_spans(linear)
    # Linear sort leaves the second dimension unclustered (span ~ full
    # 255 grid); z-order must cut it at least in half while keeping the
    # first dimension far from unclustered too.
    assert zy < ly / 2, (zy, ly)
    assert zx < 255 * 0.75, (zx, lx)
