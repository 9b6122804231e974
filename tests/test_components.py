"""Unit tests for hash-min connected components (duplicate-cluster
closure, operators/components.py)."""

from __future__ import annotations

import pytest

from etl_pipeline_project_auraverse_spark.operators.components import (
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df).collect()
    return {r["id"]: r["comp"] for r in rows}


def test_chain_collapses_to_min(spark):
    # 5-node chain: diameter > 1 forces multiple propagation rounds
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_cycle(spark):
    got = _cc(spark, [(10, 20), (20, 30), (30, 10), (7, 8)])
    assert got == {10: 10, 20: 10, 30: 10, 7: 7, 8: 7}


def test_self_loop_and_duplicate_edges(spark):
    got = _cc(spark, [(1, 1), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)
