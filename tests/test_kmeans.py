"""k-means training loop: step-1 equivalence with the oracle-checked
Lloyd query, monotone inertia, and convergence to stable assignments."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.kmeans import kmeans_fit
from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all
from etl_pipeline_project_auraverse_spark.queries.pq import KM_K
from etl_pipeline_project_auraverse_spark.session import load_table

load_all()


def test_first_update_matches_lloyd_query(spark, sf_dir):
    """One fit iteration must produce exactly the centroids the
    oracle-checked q_kmeans_lloyd_step reports."""
    emb = load_table(spark, sf_dir, "embeddings")
    fit = kmeans_fit(emb, k=KM_K, max_iters=1)
    got = {
        (r["centroid_id"], d): v
        for r in fit.centroids.collect()
        for d, v in enumerate(r["centroid"])
    }
    want = {
        (r["centroid_id"], r["dim"]): r["new_val"]
        for r in QUERIES["q_kmeans_lloyd_step"](spark, sf_dir).collect()
    }
    assert got == want


def test_inertia_decreases_and_converges(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    fit = kmeans_fit(emb, k=4, max_iters=12)
    hist = fit.inertia_history
    assert len(hist) >= 2
    # Lloyd guarantees non-increasing inertia (ties allowed)
    assert all(b <= a + 1e-9 for a, b in zip(hist, hist[1:])), hist
    if fit.converged:
        # converged: one more assignment pass must change nothing
        again = kmeans_fit(emb, k=4, max_iters=fit.n_iters)
        assert again.inertia_history[-1] == hist[-1]
    # every vector assigned exactly once
    n = emb.count()
    assert fit.assignments.count() == n
    assert fit.assignments.select("vec_id").distinct().count() == n
