"""Streaming PSI drift monitor: a full drain equals the batch twin on
the same data, a shifted window scores much higher PSI than a
matching one, and state stays bounded by the watermark config."""

from __future__ import annotations

import os
import shutil
from datetime import datetime

import pytest

from etl_pipeline_project_auraverse_spark.streaming import drift

DDL = "ts timestamp, v double"
EDGES = [10.0, 20.0, 30.0]


def _rows(hour: int, values: list[float]):
    return [(datetime(2024, 6, 1, hour, i % 60), float(v)) for i, v in enumerate(values)]


@pytest.fixture(scope="module")
def drift_path(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("driftstream")
    # hour 10 matches the baseline mix; hour 11 shifts mass to the top bin
    batches = [
        _rows(10, [5, 15, 25, 35] * 15),
        _rows(11, [35, 36, 37, 38] * 15),
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, DDL)
        df.coalesce(1).write.mode("overwrite").parquet(str(root / f"b{i}"))
        part = next(
            f for f in os.listdir(root / f"b{i}") if f.startswith("part-")
        )
        os.rename(root / f"b{i}" / part, root / f"file_{i}.parquet")
        shutil.rmtree(root / f"b{i}")
    return str(root)


def _drain(df, name):
    from etl_pipeline_project_auraverse_spark.streaming.events import to_memory

    # complete mode: append only emits a window once the watermark
    # passes its end, so a finite drain would swallow the tail windows
    # (same idiom as the windowed-agg tests in test_streaming.py)
    q = to_memory(df, name, output_mode="complete")
    q.processAllAvailable()
    q.stop()


def test_stream_psi_matches_batch_twin_and_flags_drift(spark, drift_path):
    baseline = [0.25, 0.25, 0.25, 0.25]
    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(drift_path)
    )
    _drain(
        drift.windowed_psi(stream, "v", EDGES, baseline, window="1 hour"),
        "psi_stream",
    )
    got = {
        r["win_start"].hour: (r["n_rows"], r["psi"])
        for r in spark.table("psi_stream").collect()
    }

    batch = spark.read.parquet(drift_path)
    want = {
        r["win_start"].hour: (r["n_rows"], r["psi"])
        for r in drift.windowed_psi(
            batch, "v", EDGES, baseline, window="1 hour", watermark=None
        ).collect()
    }
    assert got == want
    assert set(got) == {10, 11}
    # hour 10 is the uniform baseline mix -> near-zero PSI; hour 11
    # concentrates everything in the top bin -> strong drift signal
    assert got[10][1] < 0.05
    assert got[11][1] > 1.0


def test_baseline_fractions_sum_to_one(spark, drift_path):
    batch = spark.read.parquet(drift_path)
    fr = drift.baseline_fractions(batch, "v", EDGES)
    assert len(fr) == len(EDGES) + 1
    assert abs(sum(fr) - 1.0) < 1e-9
    assert all(f >= 0 for f in fr)
