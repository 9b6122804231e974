"""Deep BFS operator: exact distances on graphs with closed-form
answers, checkpoint-cadence invariance, and early termination."""

from __future__ import annotations

import pytest

from etl_pipeline_project_auraverse_spark.operators.graph_traversal import (
    bfs_min_hops,
)


def _path_graph(spark, n):
    # 0 - 1 - 2 - ... - (n-1), undirected
    e = [(i, i + 1) for i in range(n - 1)] + [(i + 1, i) for i in range(n - 1)]
    return spark.createDataFrame(e, "u long, v long")


def _grid_edges(spark, w, h):
    e = []
    for y in range(h):
        for x in range(w):
            a = y * w + x
            for b in ((x + 1 < w) and a + 1, (y + 1 < h) and a + w):
                if b is not False:
                    e += [(a, b), (b, a)]
    return spark.createDataFrame(e, "u long, v long")


def _seeds(spark, *nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def _dist(df):
    return {r["node"]: r["min_hops"] for r in df.collect()}


def test_path_graph_distances_exact(spark):
    # distance from node 0 along a 9-node path is the node id itself
    got = _dist(bfs_min_hops(_path_graph(spark, 9), _seeds(spark, 0), 12))
    assert got == {i: i for i in range(9)}


def test_depth_limit_truncates_reach(spark):
    got = _dist(bfs_min_hops(_path_graph(spark, 9), _seeds(spark, 0), 4))
    assert got == {i: i for i in range(5)}


def test_multi_seed_takes_nearest(spark):
    # seeds at both ends of a 9-node path: distance = min to either end
    got = _dist(bfs_min_hops(_path_graph(spark, 9), _seeds(spark, 0, 8), 12))
    assert got == {i: min(i, 8 - i) for i in range(9)}


def test_grid_manhattan_distances(spark):
    # 4x3 grid from the corner: BFS distance is the Manhattan distance
    got = _dist(bfs_min_hops(_grid_edges(spark, 4, 3), _seeds(spark, 0), 7))
    assert got == {y * 4 + x: x + y for y in range(3) for x in range(4)}


@pytest.mark.parametrize("cadence", [1, 3])
def test_checkpoint_cadence_never_changes_answer(spark, cadence):
    edges = _grid_edges(spark, 4, 3)
    want = {y * 4 + x: abs(x - 1) + abs(y - 1) for y in range(3) for x in range(4)}
    got = _dist(bfs_min_hops(edges, _seeds(spark, 5), 5, checkpoint_every=cadence))
    assert got == want


def test_early_termination_on_exhausted_frontier(spark):
    # a 4-node path fully explored by hop 3; max_hops=30 must not
    # build 30 plan generations (smoke: it returns promptly + exactly)
    got = _dist(bfs_min_hops(_path_graph(spark, 4), _seeds(spark, 0), 30,
                             checkpoint_every=2))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_matches_unrolled_query_semantics(spark):
    # same frontier/anti-join construction as q_bfs_copurchase_hops:
    # disconnected component never appears
    e = [(0, 1), (1, 0), (5, 6), (6, 5)]
    got = _dist(
        bfs_min_hops(
            spark.createDataFrame(e, "u long, v long"), _seeds(spark, 0), 3
        )
    )
    assert got == {0: 0, 1: 1}
