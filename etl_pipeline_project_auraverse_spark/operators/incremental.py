"""Incremental time-bucket rollups (continuous-aggregate maintenance).

At 100 TB you cannot re-aggregate the whole event history every time
new data lands; you process only the NEW files and merge their partial
aggregates into the stored rollup — the hypertable/continuous-
aggregate pattern. This operator implements it batch-side:

1. A manifest records which inputs have already been folded in. It
   lives INSIDE the rollup directory (``_manifest.json`` — Spark
   ignores ``_``-prefixed files in a parquet dir), so the data and the
   record of what produced it swap in the SAME atomic rename. A crash
   at any point leaves either the old (rollup, manifest) pair or the
   new one — never a folded batch whose manifest entry is missing,
   which is the window where a naive after-swap manifest write would
   double-count the last batch on retry.
2. Each run lists the source directory, reads ONLY unseen files,
   computes the per-(window, event_type) partial aggregate, unions it
   with the stored rollup, and re-aggregates — correct because count
   and sum are decomposable; avg is derived at read time (never stored,
   storing it would break mergeability).
3. ``apply_rollup_batch`` is the same fold keyed by a monotonic batch
   id instead of file names — the ``foreachBatch`` hook for the
   streaming twin (``streaming/events.py::rollup_stream``): Spark
   replays a micro-batch after a crash (foreachBatch is at-least-once
   for side effects), and the swapped-in batch id turns the replay
   into a detected no-op, restoring exactly-once.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_WINDOW = "6 hours"
_MANIFEST_NAME = "_manifest.json"


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


def _read_meta(rollup_dir: str) -> dict:
    path = os.path.join(rollup_dir, _MANIFEST_NAME)
    if not os.path.exists(path):
        return {}
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def _recover(state_dir: str, name: str = "rollup") -> None:
    """Crash recovery FIRST, sweep SECOND.

    The swap in :func:`_merge_and_swap` has a window (between renaming
    ``rollup/`` aside and renaming the tmp in) where no ``rollup/``
    exists and the only state copies are the ``rollup.tmp.*`` /
    ``rollup.old.*`` dirs. If ``rollup/`` is missing, a tmp whose
    manifest landed (the manifest is written only after the parquet
    write completed, so its presence marks a fully materialized new
    pair) is renamed in — completing the crashed swap — else the old
    pair is restored. Only then is leftover debris swept: at that
    point ``rollup/`` exists (or there was nothing to recover) and the
    leftovers are dead by construction. Without the recovery step, a
    crash inside the window would lose ALL prior state to the sweep —
    for ``rollup_stream`` that silently drops every committed
    micro-batch, since the checkpoint will not replay batches it
    considers committed. Must run before any manifest read, too:
    reading a missing manifest as empty state would double-fold a
    replayed batch into the later-recovered rollup."""
    rollup_dir = os.path.join(state_dir, name)
    os.makedirs(state_dir, exist_ok=True)
    if not os.path.exists(rollup_dir):
        survivors = sorted(
            s
            for s in os.listdir(state_dir)
            if s.startswith(f"{name}.tmp.")
            and os.path.exists(os.path.join(state_dir, s, _MANIFEST_NAME))
        ) or sorted(s for s in os.listdir(state_dir) if s.startswith(f"{name}.old."))
        if survivors:
            os.rename(os.path.join(state_dir, survivors[0]), rollup_dir)
    for stale in os.listdir(state_dir):
        if stale.startswith((f"{name}.tmp.", f"{name}.old.")):
            shutil.rmtree(os.path.join(state_dir, stale), ignore_errors=True)


def _swap_in(state_dir: str, df: DataFrame, meta: dict, name: str = "rollup") -> None:
    """Materialize ``df`` + its manifest in a tmp dir and atomically
    swap it in as ``state_dir/name``; see :func:`_recover` for the
    crash contract (the manifest is written only after the parquet
    write completes, so its presence marks a fully materialized dir)."""
    live_dir = os.path.join(state_dir, name)
    tmp = os.path.join(state_dir, f"{name}.tmp.{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _MANIFEST_NAME), "w", encoding="utf-8") as f:
        json.dump(meta, f)
    old = os.path.join(state_dir, f"{name}.old.{uuid.uuid4().hex[:8]}")
    if os.path.exists(live_dir):
        os.rename(live_dir, old)
    os.rename(tmp, live_dir)
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)


def _merge_and_swap(
    spark: SparkSession, state_dir: str, fresh: DataFrame, meta: dict
) -> None:
    """Fold ``fresh`` into the stored rollup and atomically swap in the
    new (data, manifest) pair; see :func:`_recover` for the crash
    contract."""
    rollup_dir = os.path.join(state_dir, "rollup")
    _recover(state_dir)
    if os.path.exists(rollup_dir):
        stored = spark.read.parquet(rollup_dir)
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
    _swap_in(state_dir, merged, meta)


def apply_rollup_batch(
    spark: SparkSession, state_dir: str, events: DataFrame, batch_id: int
) -> bool:
    """Fold one micro-batch into the rollup exactly once; returns False
    if ``batch_id`` was already applied (foreachBatch replay)."""
    rollup_dir = os.path.join(state_dir, "rollup")
    _recover(state_dir)  # a crashed swap must surface BEFORE the meta read
    meta = _read_meta(rollup_dir)
    if int(meta.get("last_batch_id", -1)) >= batch_id:
        return False
    _merge_and_swap(
        spark, state_dir, _partial_rollup(events), {**meta, "last_batch_id": batch_id}
    )
    return True


class IncrementalRollup:
    """Maintains a (win_start, win_end, event_type, n_events,
    total_value) rollup over a growing directory of event parquet
    files, processing each file exactly once."""

    def __init__(self, state_dir: str) -> None:
        self.state_dir = state_dir
        self.rollup_dir = os.path.join(state_dir, "rollup")
        # pre-manifest-in-rollup layout, read as a fallback so existing
        # states keep working
        self.legacy_manifest = os.path.join(state_dir, "manifest.json")
        os.makedirs(state_dir, exist_ok=True)

    def _seen(self) -> set[str]:
        _recover(self.state_dir)
        meta = _read_meta(self.rollup_dir)
        if "files" in meta:
            return set(meta["files"])
        if os.path.exists(self.legacy_manifest):
            with open(self.legacy_manifest, encoding="utf-8") as f:
                return set(json.load(f)["files"])
        return set()

    def refresh(self, spark: SparkSession, source_dir: str) -> int:
        """Fold unseen source files into the rollup; returns how many
        new files were processed."""
        all_files = sorted(
            os.path.join(source_dir, f)
            for f in os.listdir(source_dir)
            if f.endswith(".parquet")
        )
        seen = self._seen()
        new_files = [f for f in all_files if f not in seen]
        if not new_files:
            return 0
        fresh = _partial_rollup(spark.read.parquet(*new_files))
        meta = _read_meta(self.rollup_dir)
        meta["files"] = sorted(seen | set(new_files))
        _merge_and_swap(spark, self.state_dir, fresh, meta)
        return len(new_files)

    def read(self, spark: SparkSession) -> DataFrame:
        _recover(self.state_dir)
        return spark.read.parquet(self.rollup_dir)
