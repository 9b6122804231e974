"""Streaming Misra–Gries: the no-eviction regime must equal exact
batch counts; the tight-capacity regime must honor the classic MG
bounds (lower bound within n/(k+1), no heavy hitter missing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.session import load_table
from etl_pipeline_project_auraverse_spark.streaming import events as se
from etl_pipeline_project_auraverse_spark.streaming.heavy_hitters import (
    latest_sketch,
    streaming_heavy_hitters,
)


@pytest.fixture(scope="module")
def events_path(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_hh_stream"))
    load_table(spark, sf_dir, "events").repartition(6).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def _final_sketch(spark, events_path, capacity, shards):
    stream = se.read_event_stream(spark, events_path, max_files_per_trigger=2)
    name = f"hh_sketch_{capacity}_{shards}"
    q = se.to_memory(
        streaming_heavy_hitters(
            stream, "event_type", capacity=capacity, shards=shards
        ),
        name,
        output_mode="update",
    )
    q.processAllAvailable()
    q.stop()
    return {
        (r["shard"], r["item"]): (r["mg_count"], r["n_shard"])
        for r in latest_sketch(spark.table(name)).collect()
    }


def _exact_counts(spark, events_path):
    return {
        r["item"]: r["c"]
        for r in spark.read.parquet(events_path)
        .groupBy(F.col("event_type").cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }


def test_roomy_capacity_equals_exact_counts(spark, events_path):
    # capacity far above the event_type cardinality: nothing is ever
    # evicted, so the streamed sketch IS the exact per-key count
    sketch = _final_sketch(spark, events_path, capacity=64, shards=4)
    exact = _exact_counts(spark, events_path)
    got = {item: c for (_, item), (c, _) in sketch.items()}
    assert got == exact
    # every key hashed to exactly one shard
    assert len(sketch) == len(exact)


def test_tight_capacity_honors_mg_bounds(spark, events_path):
    # one shard + capacity 2 over ~6 event types: decrements must fire,
    # and the classic Misra–Gries guarantees must still hold
    sketch = _final_sketch(spark, events_path, capacity=2, shards=1)
    exact = _exact_counts(spark, events_path)
    n = sum(exact.values())
    err = n // (2 + 1)
    assert sketch, "sketch must not be empty"
    for (_, item), (mg, n_shard) in sketch.items():
        assert n_shard == n
        assert mg <= exact[item], "MG count must lower-bound truth"
        assert mg >= exact[item] - err, "MG undercount exceeded n/(k+1)"
    for item, c in exact.items():
        if c > err:
            assert any(i == item for (_, i) in sketch), (
                f"heavy hitter {item} missing from sketch"
            )
