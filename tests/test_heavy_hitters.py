"""Misra–Gries sketch: containment guarantee, lower-bound property,
and partitioning independence of the exact recount."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.heavy_hitters import (
    exact_heavy_hitters,
    misra_gries_candidates,
)


def _zipf_items(n: int, n_keys: int, seed: int) -> list[int]:
    rng = random.Random(seed)
    # Zipf-ish: item i with weight 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(n_keys)]
    return rng.choices(range(n_keys), weights=weights, k=n)


@pytest.mark.parametrize("seed,parts,k", [(1, 4, 8), (2, 7, 5), (3, 3, 12)])
def test_mg_containment_and_lower_bound(spark, seed, parts, k):
    items = _zipf_items(3000, 200, seed)
    truth = Counter(items)
    df = spark.createDataFrame([(i,) for i in items], "item: long").repartition(
        parts
    )
    got = {
        r["item"]: r["mg_count"]
        for r in misra_gries_candidates(df, "item", k).collect()
    }
    n = len(items)
    for item, true_c in truth.items():
        # Guarantee: anything above n/k is present...
        if true_c > n / k:
            assert item in got, (item, true_c, n / k)
        # ...and every sketch count is a lower bound within n/k.
        if item in got:
            assert got[item] <= true_c
            assert got[item] >= true_c - n / k - 1e-9


def test_mg_eviction_actually_bounds_state(spark):
    """With far more keys than counters, each partition summary holds
    at most k rows (the sketch really evicts, not just counts)."""
    items = _zipf_items(5000, 1000, seed=7)
    df = spark.createDataFrame([(i,) for i in items], "item: long").repartition(3)
    k = 10
    cands = misra_gries_candidates(df, "item", k)
    assert cands.count() <= 3 * k


def test_exact_recount_matches_plain_groupby_any_partitioning(spark):
    items = _zipf_items(4000, 300, seed=11)
    truth = Counter(items)
    n = len(items)
    k, phi = 50, 0.02  # phi > 1/k, so the recount is exact
    expect = sorted(
        (i, c) for i, c in truth.items() if c >= n * phi
    )
    for parts in (2, 5, 9):
        df = spark.createDataFrame(
            [(i,) for i in items], "item: long"
        ).repartition(parts)
        thr = df.agg((F.count(F.lit(1)) * F.lit(phi)).alias("threshold"))
        got = sorted(
            (r["item"], r["n_rows"])
            for r in exact_heavy_hitters(df, "item", k, thr).collect()
        )
        assert got == expect, f"parts={parts}"
