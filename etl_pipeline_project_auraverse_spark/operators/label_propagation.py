"""Deterministic weighted label propagation (Raghavan et al. 2007) —
the arbitrary-depth twin of ``queries/graph.py::q_lpa_communities``
(which unrolls 3 rounds so a chained-CTE DuckDB oracle can hash-check
it exactly).

Synchronous LPA with a TOTAL update rule so the result is
reproducible across engines and partitionings: each round every node
adopts the label with the highest incident edge-weight sum among its
neighbors, ties broken by smallest label. Scale shape per round: one
equi-join (edges ⋈ labels on u) + one (v, label) groupBy + a
max-score/min-label-at-max filter join — all hash-partitioned on
graph keys, bounded by the edge count, never a per-node window over
all labels. The edge table is iteration-invariant; lineage is
truncated with ``localCheckpoint`` every ``checkpoint_every`` rounds
(the components/BFS/k-means discipline) so a 50-round run never
stacks 50 plans. ``checkpoint_every`` must never change the answer —
the unit tests assert that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.cache import (
    local_checkpoint_tracked,
    persist_tracked,
    register_checkpoint_ids,
    unpersist_rdd_ids,
)


def lpa_labels(
    edges: DataFrame,
    rounds: int,
    checkpoint_every: int = 4,
    assume_symmetric: bool = False,
) -> DataFrame:
    """Community label per node after ``rounds`` synchronous LPA
    updates. ``edges`` needs (u, v, w) directed-edge columns (pass
    both directions for an undirected graph); every node starts
    labeled with its own id. Returns (u, lab).

    Safe on DIRECTED edge tables by default: the node universe is the
    union of both endpoint columns, and a node with no incoming edge
    this round keeps its previous label (a coalesce join) instead of
    vanishing — so its outgoing edges keep contributing in later
    rounds. On a symmetrized table both safeguards are provably no-ops
    (every labeled node also receives edges), so callers that BUILT
    the symmetrized table themselves pass ``assume_symmetric=True``
    to skip the per-round carry-forward join — same answer, ~rounds
    fewer joins."""
    spark = edges.sparkSession
    edges = persist_tracked(edges.select("u", "v", "w"))
    labels = (
        edges.select("u")
        .unionByName(edges.select(F.col("v").alias("u")))
        .distinct()
        .withColumn("lab", F.col("u"))
    )
    held: frozenset = frozenset()
    for i in range(1, rounds + 1):
        # persisted: feeds both the per-node max and the argmax filter
        scores = persist_tracked(
            edges.join(labels, "u")
            .groupBy("v", "lab")
            .agg(F.sum("w").alias("s"))
        )
        m = scores.groupBy("v").agg(F.max("s").alias("smax"))
        updated = (
            scores.join(m, "v")
            .where(F.col("s") == F.col("smax"))
            .groupBy("v")
            .agg(F.min("lab").alias("lab_new"))
            .select(F.col("v").alias("u"), "lab_new")
        )
        if assume_symmetric:
            labels = updated.withColumnRenamed("lab_new", "lab")
        else:
            labels = labels.join(updated, "u", "left").select(
                "u", F.coalesce("lab_new", "lab").alias("lab")
            )
        if i % checkpoint_every == 0 and i < rounds:
            labels, ids = local_checkpoint_tracked(labels)
            # the previous generation is baked into the new checkpoint
            unpersist_rdd_ids(spark, held)
            held = ids
    register_checkpoint_ids(spark, held)
    return labels


def community_sizes(labels: DataFrame, top: int) -> DataFrame:
    """Largest communities from an (u, lab) label table:
    (community, n_members), size-desc / label-asc, limit ``top``."""
    return (
        labels.groupBy("lab")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(
            F.col("lab").cast("long").alias("community"),
            F.col("n_members").cast("long").alias("n_members"),
        )
        .orderBy(F.col("n_members").desc(), "community")
        .limit(top)
    )
