"""t-digest sketch: accuracy vs exact quantiles on skewed data, size
bound on the centroid count, and the grouped face."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.tdigest import (
    _compress,
    tdigest_quantiles,
)


def test_centroid_count_is_bounded():
    """The greedy envelope pass keeps ~5*delta centroids with only
    logarithmic growth in N (the extreme-tail singleton region), so
    per-partition output is effectively constant-size."""
    rng = np.random.RandomState(0)
    counts = {}
    for n in (50_000, 200_000, 1_000_000):
        v = np.sort(rng.lognormal(3, 2, size=n))
        m, w = _compress(v, np.ones(n), delta=100)
        assert w.sum() == n
        counts[n] = len(m)
        assert len(m) <= 8 * 100
    # 20x the data adds well under 2x the centroids
    assert counts[1_000_000] < 2 * counts[50_000]


@pytest.mark.parametrize("dist", ["lognormal", "uniform", "bimodal"])
def test_quantiles_close_to_exact(spark, dist):
    rng = np.random.RandomState(7)
    if dist == "lognormal":
        v = rng.lognormal(3, 2, size=60_000)
    elif dist == "uniform":
        v = rng.uniform(-50, 150, size=60_000)
    else:
        v = np.concatenate(
            [rng.normal(0, 1, 30_000), rng.normal(500, 10, 30_000)]
        )
    df = spark.createDataFrame([(float(x),) for x in v], "v double").repartition(8)
    got = tdigest_quantiles(df, "v", [0.5, 0.9, 0.99]).collect()[0]
    assert got["n_rows"] == len(v)
    for p, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        exact = float(np.quantile(v, p))
        # rank error: the estimate's true rank must be within 2% of p
        rank = (v <= got[name]).mean()
        assert abs(rank - p) < 0.02, (dist, name, exact, got[name], rank)


def test_grouped_face_on_lineitem(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_returnflag"]: r
        for r in tdigest_quantiles(
            li, "l_extendedprice", [0.5, 0.9], group_col="l_returnflag"
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.5).alias("e50"),
            F.percentile("l_extendedprice", 0.9).alias("e90"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, r in got.items():
        e = exact[flag]
        assert r["n_rows"] == e["n"]
        assert abs(r["p50"] - e["e50"]) / e["e50"] < 0.05
        assert abs(r["p90"] - e["e90"]) / e["e90"] < 0.05
