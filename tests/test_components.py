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


def test_random_graphs_match_union_find(spark):
    """Property check: hash-min propagation agrees with a driver-side
    union-find on random graphs (deterministic seed battery)."""
    import random

    def union_find_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    for seed in range(5):
        rng = random.Random(seed)
        n_nodes = rng.randint(5, 40)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(rng.randint(3, 60))
        ]
        want = union_find_components(edges)
        got = _cc(spark, edges)
        assert got == want, (seed, edges)


def test_components_checkpoint_hygiene(spark):
    """Per-round checkpoints are freed as rounds supersede them; the
    final label table's blocks are handed to the cache registry and
    freed by release_caches()."""
    from etl_pipeline_project_auraverse_spark.cache import (
        persistent_rdd_ids,
        release_caches,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], ["src", "dst"]
    )
    before = persistent_rdd_ids(spark)
    labels = connected_components(edges)
    got = {r["id"]: r["comp"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}
    release_caches()
    # subset, not equality: release_caches() may also free registered
    # caches that earlier tests in the session left behind
    assert persistent_rdd_ids(spark) - before == set()
