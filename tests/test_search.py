"""Hybrid-search semantics beyond oracle parity: RRF score integrity
and NDCG metric invariants."""

from __future__ import annotations

import math

from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all
from etl_pipeline_project_auraverse_spark.queries.search import (
    NDCG_K,
    NDCG_N_QUERY,
    RRF_K,
    RRF_POOL,
    RRF_TOP_K,
)

load_all()


def test_rrf_scores_recompute_from_ranks(spark, sf_dir):
    """Every fused row's rrf_score must equal the micro-unit-rounded
    sum of its arm contributions, scores must be non-increasing, and
    every row must come from at least one arm within its pool."""
    rows = QUERIES["q_hybrid_search_rrf"](spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_TOP_K
    prev = float("inf")
    for r in rows:
        assert r.rank_lex is not None or r.rank_sem is not None
        contrib = 0.0
        if r.rank_lex is not None:
            assert 1 <= r.rank_lex <= RRF_POOL
            contrib += 1.0 / (RRF_K + r.rank_lex)
        if r.rank_sem is not None:
            assert 1 <= r.rank_sem <= RRF_POOL
            contrib += 1.0 / (RRF_K + r.rank_sem)
        assert r.rrf_score == math.floor(contrib * 1e6 + 0.5) / 1e6
        assert r.rrf_score <= prev
        prev = r.rrf_score


def test_ndcg_invariants(spark, sf_dir):
    """NDCG lies in [0, 1], DCG never exceeds IDCG, and IDCG equals the
    closed-form micro-unit sum for min(n_rel, k) ideal gains."""
    rows = QUERIES["q_search_ndcg_labels"](spark, sf_dir).collect()
    assert len(rows) == NDCG_N_QUERY
    for r in rows:
        assert 0.0 <= r.ndcg10 <= 1.0
        assert r.dcg10 <= r.idcg10
        n_ideal = max(min(r.n_rel_total, NDCG_K), 1)
        expect_micro = sum(
            math.floor(1.0 / math.log2(i + 1) * 1e6 + 0.5)
            for i in range(1, n_ideal + 1)
        )
        assert r.idcg10 == expect_micro / 1e6
