"""Incremental time-bucket rollups (continuous-aggregate maintenance).

At 100 TB you cannot re-aggregate the whole event history every time
new data lands; you process only the NEW files and merge their partial
aggregates into the stored rollup — the hypertable/continuous-
aggregate pattern. This operator implements it batch-side:

1. A manifest (JSON, one per rollup) records which input files have
   already been folded in.
2. Each run lists the source directory, reads ONLY unseen files,
   computes the per-(window, event_type) partial aggregate, unions it
   with the stored rollup, and re-aggregates — correct because count
   and sum are decomposable; avg is derived at read time (never stored,
   storing it would break mergeability).
3. The merged rollup is written atomically (write to a temp dir, then
   swap) so a crashed run never leaves a half-written rollup; the
   manifest is updated only after the swap, so a crash re-processes at
   most the last batch (idempotent because the manifest is the source
   of truth and the swap is all-or-nothing).

The streaming twin is ``streaming/events.py::windowed_event_counts``
(same aggregate, watermark-driven instead of manifest-driven).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_WINDOW = "6 hours"


def _partial_rollup(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.window("ts", ROLLUP_WINDOW).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


class IncrementalRollup:
    """Maintains a (win_start, win_end, event_type, n_events,
    total_value) rollup over a growing directory of event parquet
    files, processing each file exactly once."""

    def __init__(self, state_dir: str) -> None:
        self.state_dir = state_dir
        self.rollup_dir = os.path.join(state_dir, "rollup")
        self.manifest = os.path.join(state_dir, "manifest.json")
        os.makedirs(state_dir, exist_ok=True)

    def _seen(self) -> set[str]:
        if not os.path.exists(self.manifest):
            return set()
        with open(self.manifest, encoding="utf-8") as f:
            return set(json.load(f)["files"])

    def refresh(self, spark: SparkSession, source_dir: str) -> int:
        """Fold unseen source files into the rollup; returns how many
        new files were processed."""
        all_files = sorted(
            os.path.join(source_dir, f)
            for f in os.listdir(source_dir)
            if f.endswith(".parquet")
        )
        new_files = [f for f in all_files if f not in self._seen()]
        if not new_files:
            return 0

        fresh = _partial_rollup(spark.read.parquet(*new_files))
        if os.path.exists(self.rollup_dir):
            stored = spark.read.parquet(self.rollup_dir)
            merged = (
                stored.unionByName(fresh)
                .groupBy("win_start", "win_end", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_value").alias("total_value"),
                )
            )
        else:
            merged = fresh

        # atomic swap: never leave a half-written rollup behind
        tmp = os.path.join(self.state_dir, f"rollup.tmp.{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").parquet(tmp)
        old = os.path.join(self.state_dir, f"rollup.old.{uuid.uuid4().hex[:8]}")
        if os.path.exists(self.rollup_dir):
            os.rename(self.rollup_dir, old)
        os.rename(tmp, self.rollup_dir)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

        seen = sorted(self._seen() | set(new_files))
        with open(self.manifest, "w", encoding="utf-8") as f:
            json.dump({"files": seen}, f)
        return len(new_files)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.rollup_dir)
