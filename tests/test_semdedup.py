"""q_semdedup_clusters on a closed-form corpus: 40 vectors that are
exact copies of 8 orthogonal prototypes must cluster into the 8
prototypes and keep exactly ONE copy per cluster (the lowest vec_id),
pruning the other four at cosine 1.0."""

from __future__ import annotations

from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all

load_all()


def test_semdedup_keeps_one_per_duplicate_cluster(spark, tmp_path):
    d = str(tmp_path)
    dims = 64
    rows = []
    for i in range(40):
        v = [0.0] * dims
        v[i % 8] = 1.0  # vec i IS prototype i % 8, exactly
        rows.append((i, v, i % 8))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).coalesce(4).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    out = {r["centroid_id"]: r for r in QUERIES["q_semdedup_clusters"](spark, d).collect()}
    # the 8 lowest-id vectors are the seeds AND the prototypes, so the
    # trained clusters are exactly the prototype groups
    assert set(out) == set(range(8))
    for cid, r in out.items():
        assert r["n_members"] == 5
        assert r["n_kept"] == 1, cid  # one representative per ball
        assert r["n_pruned"] == 4
        assert r["keep_rate"] == 0.2
        assert r["max_lower_nn_sim"] == 1.0
