"""Streaming-vs-batch equivalence tests: each streaming operator run
over the bounded events parquet (availableNow trigger) must agree with
its batch twin. This is the test strategy for operators whose
semantics aren't SQL-oracle-checkable via the driver gate."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.session import load_table
from etl_pipeline_project_auraverse_spark.streaming import events as se


@pytest.fixture(scope="module")
def events_path(spark, sf_dir, tmp_path_factory):
    """Events re-written as multiple parquet files so the file stream
    sees several micro-batches (and as micro-us timestamps, matching
    what load_table normalizes to)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(out)
    return out


def _run_stream(df, name: str, output_mode: str = "append"):
    q = se.to_memory(df, name, output_mode=output_mode)
    q.processAllAvailable()
    q.stop()
    return name


def test_windowed_counts_match_batch(spark, events_path):
    stream = se.read_event_stream(spark, events_path, max_files_per_trigger=2)
    name = f"win_{uuid.uuid4().hex[:8]}"
    _run_stream(se.windowed_event_counts(stream), name, output_mode="complete")
    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], round(r["total_value"], 4))
        for r in spark.table(name).collect()
    }
    batch = (
        spark.read.parquet(events_path)
        .groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("tv"))
        .collect()
    )
    want = {(r["win"]["start"], r["event_type"]): (r["n"], r["tv"]) for r in batch}
    assert got == want


def test_sessionization_matches_batch_sessions(spark, events_path):
    stream = se.read_event_stream(spark, events_path, max_files_per_trigger=2)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    _run_stream(se.sessionized_events(stream), name, output_mode="complete")
    got = spark.table(name)
    # session_window semantics == batch lag/cumsum sessionization
    ev = spark.read.parquet(events_path)
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev = F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(prev.isNull() | ((F.unix_micros(F.col("ts")) - prev) > gap_us), 1).otherwise(0)
    batch = (
        ev.withColumn("new", is_new)
        .withColumn("sid", F.sum("new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
        .groupBy("user_id", "sid")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
    )
    got_keys = {(r["user_id"], r["session_start"], r["n_events"]) for r in got.collect()}
    want_keys = {(r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()}
    assert got_keys == want_keys


def test_streaming_dedup(spark, events_path):
    stream = se.read_event_stream(spark, events_path, max_files_per_trigger=2)
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    _run_stream(se.deduped_events(stream), name)
    n_stream = spark.table(name).count()
    n_batch = spark.read.parquet(events_path).select("event_id").distinct().count()
    assert n_stream == n_batch


def test_stream_static_join(spark, sf_dir, events_path):
    from etl_pipeline_project_auraverse_spark.session import load_table

    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = se.read_event_stream(spark, events_path, max_files_per_trigger=2)
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    _run_stream(se.enriched_event_stream(stream, dim), name)
    got = spark.table(name)
    batch = (
        spark.read.parquet(events_path)
        .join(dim, F.col("user_id") == F.col("c_custkey"), "left")
    )
    assert got.count() == batch.count()
    g = {r["segment"]: r["n"] for r in got.groupBy("segment").agg(F.count("*").alias("n")).collect()}
    b = {r["c_mktsegment"]: r["n"] for r in batch.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()}
    assert g == b


def test_stateful_user_counters(spark, events_path):
    stream = se.read_event_stream(spark, events_path, max_files_per_trigger=2)
    name = f"state_{uuid.uuid4().hex[:8]}"
    _run_stream(se.stateful_user_counters(stream), name, output_mode="update")
    # update mode: the LAST emitted row per user carries the final state
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    )
    got = {r["user_id"]: r["n_events"] for r in final}
    batch = spark.read.parquet(events_path).groupBy("user_id").count().collect()
    want = {r["user_id"]: r["count"] for r in batch}
    assert got == want


def test_stream_stream_purchase_context_matches_batch(spark, events_path):
    stream = se.read_event_stream(spark, events_path, max_files_per_trigger=2)
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    _run_stream(se.purchase_context_join(stream), name, output_mode="append")
    got = {
        (r["view_id"], r["purchase_id"])
        for r in spark.table(name).collect()
    }
    ev = spark.read.parquet(events_path)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r["view_id"], r["purchase_id"])
        for r in v.join(
            p,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        ).collect()
    }
    assert got == want and len(want) > 0
