"""Bloom filter: no false negatives, bounded size, useful pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
)


def test_no_false_negatives_and_some_pruning(spark):
    members = [(i,) for i in range(0, 2000, 20)]  # 100 members
    keys = spark.createDataFrame(members, "k: long")
    bloom = bloom_build(keys, "k", m_bits=1024, k=4)
    # the packed filter is at most m/64 words
    assert bloom.count() <= 1024 // 64

    probe = spark.createDataFrame([(i,) for i in range(2000)], "k: long")
    flagged = bloom_might_contain(probe, "k", bloom, m_bits=1024, k=4)
    rows = {r["k"]: r["bloom_pass"] for r in flagged.collect()}
    member_set = {m[0] for m in members}
    # every member passes (no false negatives)
    assert all(rows[m] for m in member_set)
    # and the filter prunes a substantial share of non-members
    non_members = [k for k in rows if k not in member_set]
    fp = sum(1 for k in non_members if rows[k])
    assert fp / len(non_members) < 0.25


def test_probe_is_map_side(spark):
    """The probe plan must contain no shuffle of the probe side — only
    the broadcast of the packed words."""
    from etl_pipeline_project_auraverse_spark.plans import inspect as PI

    keys = spark.createDataFrame([(i,) for i in range(50)], "k: long")
    bloom = bloom_build(keys, "k")
    probe = spark.createDataFrame([(i,) for i in range(500)], "k: long")
    flagged = bloom_might_contain(probe, "k", bloom)
    plan = PI.physical_plan(flagged)
    assert "BroadcastExchange" in plan
