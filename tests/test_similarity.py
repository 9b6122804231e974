"""Multi-probe IVF properties beyond oracle parity: recall monotonicity
in probe depth, and the plan shape of the probe join."""

from __future__ import annotations

from etl_pipeline_project_auraverse_spark.plans import inspect as PI
from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all
from etl_pipeline_project_auraverse_spark.queries.similarity import IVF_NPROBE

load_all()


def test_ivf_recall_monotone_in_nprobe(spark, sf_dir):
    """recall@k must be non-decreasing in probe depth (an exact hit can
    only be displaced from the IVF top-k by a better exact hit), and
    multi-probe must not lose to single-probe — the property that
    justifies probing P blocks at P× candidate cost."""
    rows = QUERIES["q_ann_ivf_recall"](spark, sf_dir).collect()
    assert [r.nprobe for r in rows] == list(range(1, IVF_NPROBE + 1))
    recalls = [r.recall_at_k for r in rows]
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] >= recalls[0]
    assert all(0.0 <= r <= 1.0 for r in recalls)
    # every probe level saw the full query set
    assert len({r.n_queries for r in rows}) == 1


def test_ivf_probe_join_stays_equi(spark, sf_dir):
    """Multi-probe must not change the join shape: candidate generation
    is still an equi-join on centroid_id. The only nested-loop nodes
    allowed are the constant-size broadcasts inside centroid scoring
    (K-seed set, 1-row corpus count) and, for the recall query, the
    deliberate brute-force baseline + 3-row probe-level expansion."""
    df = QUERIES["q_ann_ivf_cosine"](spark, sf_dir)
    plan = PI.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    )
