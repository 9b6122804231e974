"""Distributed k-means (Lloyd) training loop — the iterative version
of ``queries/pq.py::q_kmeans_lloyd_step``, with the same deterministic
arithmetic (rounded-cosine argmax assignment, exact per-dimension
decimal-mean updates) so every run converges along an identical path.

Scale shape per iteration: one broadcast of the K centroids into a
linear assignment scan, one (centroid, dim)-keyed aggregate (K x dims
rows out), and a 1-row convergence probe. Lineage is truncated with
``localCheckpoint`` each round (the components/BPE pattern) so N
iterations never stack N plans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_pipeline_project_auraverse_spark.cache import (
    local_checkpoint_tracked,
    register_checkpoint_ids,
    unpersist_rdd_ids,
)
from etl_pipeline_project_auraverse_spark.functions.vectors import cosine


@dataclass
class KMeansResult:
    centroids: DataFrame  # (centroid_id, centroid array<double>)
    assignments: DataFrame  # (vec_id, centroid_id, cos)
    inertia_history: list[float] = field(default_factory=list)
    n_iters: int = 0
    converged: bool = False


def _assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), "centroid_id")
    return (
        emb.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "centroid_id",
            "embedding",
            cosine(F.col("embedding"), F.col("centroid")).alias("cos"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _update(assign: DataFrame) -> DataFrame:
    comps = assign.select(
        "centroid_id", F.posexplode("embedding").alias("dim", "raw")
    ).select(
        "centroid_id", "dim", F.round(F.col("raw").cast("double"), 6).alias("v")
    )
    means = comps.groupBy("centroid_id", "dim").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mv")
    )
    return means.groupBy("centroid_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mv"))),
            lambda s: s["mv"],
        ).alias("centroid")
    )


def kmeans_fit(emb: DataFrame, k: int = 8, max_iters: int = 10) -> KMeansResult:
    """Lloyd iterations from the deterministic lowest-``vec_id`` seeds
    until assignments stop changing (or ``max_iters``). ``emb`` needs
    columns (vec_id, embedding)."""
    centroids = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform(
            F.col("embedding"), lambda x: F.round(x.cast("double"), 6)
        ).alias("centroid"),
    )
    spark = emb.sparkSession
    prev_assign: DataFrame | None = None
    prev_a_ids: frozenset = frozenset()
    cent_ids: frozenset = frozenset()
    result = KMeansResult(centroids=centroids, assignments=emb.limit(0))
    for it in range(1, max_iters + 1):
        assign, a_ids = local_checkpoint_tracked(_assign(emb, centroids))
        inertia = assign.agg(
            F.round(
                F.sum((1.0 - F.col("cos")).cast("decimal(25,6)")), 6
            ).cast("double")
        ).collect()[0][0]
        result.inertia_history.append(float(inertia))
        result.n_iters = it
        if prev_assign is not None:
            n_changed = (
                assign.select("vec_id", "centroid_id")
                .join(
                    prev_assign.select(
                        "vec_id", F.col("centroid_id").alias("__prev")
                    ),
                    "vec_id",
                )
                .filter(F.col("centroid_id") != F.col("__prev"))
                .count()
            )
            # the previous assignment served its convergence diff —
            # free its blocks now (the components.py discipline: at
            # most one assignment + one centroid table stay pinned)
            unpersist_rdd_ids(spark, prev_a_ids)
            if n_changed == 0:
                result.converged = True
                result.centroids = centroids
                result.assignments = assign
                register_checkpoint_ids(spark, a_ids | cent_ids)
                return result
        prev_assign, prev_a_ids = assign, a_ids
        # old centroids are baked into the checkpointed assignment
        unpersist_rdd_ids(spark, cent_ids)
        centroids, cent_ids = local_checkpoint_tracked(_update(assign))
    result.centroids = centroids
    result.assignments = prev_assign if prev_assign is not None else result.assignments
    # hand the surviving blocks to the session registry: consumers of
    # the returned DataFrames keep them until the next release_caches()
    register_checkpoint_ids(spark, prev_a_ids | cent_ids)
    return result
