"""Label propagation operator: known-graph communities, tie
determinism, and checkpoint-cadence invariance."""

from __future__ import annotations

from etl_pipeline_project_auraverse_spark.operators.label_propagation import (
    community_sizes,
    lpa_labels,
)


def _undirected(spark, pairs):
    rows = [(u, v, w) for u, v, w in pairs] + [(v, u, w) for u, v, w in pairs]
    return spark.createDataFrame(rows, "u long, v long, w long")


def test_two_triangles_with_weak_bridge(spark):
    # triangles {1,2,3} and {10,11,12} joined by a weight-1 bridge:
    # LPA must keep them as two communities labeled by their min node
    edges = _undirected(
        spark,
        [
            (1, 2, 5),
            (1, 3, 5),
            (2, 3, 5),
            (10, 11, 5),
            (10, 12, 5),
            (11, 12, 5),
            (3, 10, 1),
        ],
    )
    labels = {r["u"]: r["lab"] for r in lpa_labels(edges, 4).collect()}
    assert {labels[1], labels[2], labels[3]} == {labels[1]}
    assert {labels[10], labels[11], labels[12]} == {labels[10]}
    assert labels[1] != labels[10]

    sizes = community_sizes(lpa_labels(edges, 4), 10).collect()
    assert [r["n_members"] for r in sizes] == [3, 3]


def test_tie_breaks_to_smallest_label(spark):
    # node 5 sees labels 1 and 9 with equal weight: must adopt 1
    edges = _undirected(spark, [(1, 5, 2), (9, 5, 2)])
    labels = {r["u"]: r["lab"] for r in lpa_labels(edges, 1).collect()}
    assert labels[5] == 1


def test_checkpoint_cadence_never_changes_answer(spark):
    edges = _undirected(
        spark,
        [(a, b, (a * 7 + b) % 5 + 1) for a in range(12) for b in range(a + 1, 12) if (a + b) % 3],
    )
    base = sorted(map(tuple, lpa_labels(edges, 6, checkpoint_every=100).collect()))
    for cadence in (1, 2, 4):
        got = sorted(
            map(tuple, lpa_labels(edges, 6, checkpoint_every=cadence).collect())
        )
        assert got == base


def test_directed_out_only_nodes_survive(spark):
    # 1→2 chain with node 1 having out-edges ONLY: node 1 must keep its
    # own label across rounds (not vanish), and its label must keep
    # propagating to 2 and onward to 3 in round 2
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5)], "u long, v long, w long"
    )
    labels = {r["u"]: r["lab"] for r in lpa_labels(edges, 2).collect()}
    assert set(labels) == {1, 2, 3}, "every endpoint must stay labeled"
    assert labels[1] == 1
    assert labels[2] == 1  # adopted 1's label in round 1 and kept it
    assert labels[3] == 1  # round 2 propagates 1's label via node 2
