"""Deterministic HLL: accuracy envelope and partitioning independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.queries.sketches import (
    HLL_M,
    hll_distinct,
)


def _est(df):
    return {
        r[0]: r["hll_estimate"] for r in hll_distinct(df, "g", "item").collect()
    }


def test_hll_accuracy_within_envelope(spark):
    """At n >> m the estimate must land within ~3 standard errors
    (1.04/sqrt(m) each) of the truth, across several cardinalities."""
    rows = []
    for g, n in (("a", 900), ("b", 5000), ("c", 20000)):
        rows += [(g, f"{g}-{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "g: string, item: string")
    est = _est(df)
    tol = 3 * 1.04 / (HLL_M**0.5)
    for g, n in (("a", 900), ("b", 5000), ("c", 20000)):
        assert abs(est[g] - n) / n < tol, (g, est[g], n)


def test_hll_ignores_duplicates(spark):
    """Re-observing the same items must not move the estimate — the
    defining sketch property."""
    base = [("g", f"x{i}") for i in range(2000)]
    df1 = spark.createDataFrame(base, "g: string, item: string")
    df5 = spark.createDataFrame(base * 5, "g: string, item: string")
    assert _est(df1) == _est(df5)


def test_hll_partitioning_independent(spark):
    """The register build is a max aggregate, so any partitioning (any
    shard merge order) produces the identical estimate."""
    rows = [("g", f"k{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "g: string, item: string")
    vals = {
        _est(df.repartition(p))["g"] for p in (1, 3, 17)
    }
    assert len(vals) == 1
