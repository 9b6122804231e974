"""Versioned parquet table with time travel — Delta/Iceberg-style
snapshot reads on bare parquet, no table-format library.

Layout under ``root/``:

- ``v{N:06d}/``      immutable snapshot dirs, written once, never
                     modified (each fully materialized before it
                     becomes visible)
- ``_latest.json``   the pointer: current version + commit log. A
                     snapshot EXISTS the moment this file references
                     it; the pointer swap is a POSIX rename of a
                     same-directory temp file, which is atomic.

Crash contract: a crash before the pointer swap leaves a ``*.tmp.*``
or orphaned version dir that no pointer references — invisible to
readers and swept on the next commit. A crash after the swap leaves a
fully valid state. There is no window where a reader can see a
half-written snapshot, because the pointer is only ever written after
the snapshot's parquet write completed.

Scale note: each commit is a full-snapshot write (every executor
writes its own part files), which is the right shape for dimension
tables and rollups; fact-scale incremental maintenance composes with
``operators/cdc.py`` (merge then commit) instead of rewriting inside
this class.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_latest.json"


class VersionedTable:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- internals ----------------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.root, _POINTER)

    def _read_pointer(self) -> dict:
        path = self._pointer_path()
        if not os.path.exists(path):
            return {"version": 0, "log": []}
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    def _write_pointer(self, meta: dict) -> None:
        tmp = os.path.join(self.root, f"{_POINTER}.tmp.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(meta, f)
        os.rename(tmp, self._pointer_path())  # atomic same-dir rename

    def _sweep(self, meta: dict) -> None:
        """Remove dirs no pointer references (crashed commits)."""
        live = {f"v{e['version']:06d}" for e in meta["log"]}
        for name in os.listdir(self.root):
            path = os.path.join(self.root, name)
            if name == _POINTER or not os.path.isdir(path):
                continue
            if name not in live:
                shutil.rmtree(path, ignore_errors=True)

    # -- API ----------------------------------------------------------------
    def commit(self, df: DataFrame, ts: float, note: str = "") -> int:
        """Write a new immutable snapshot; returns its version number.
        ``ts`` is the commit timestamp (caller-supplied so replays and
        tests are deterministic); must be monotonically non-decreasing
        across commits for time travel to be well-defined."""
        meta = self._read_pointer()
        self._sweep(meta)
        if meta["log"] and ts < meta["log"][-1]["ts"]:
            raise ValueError("commit ts must not decrease")
        version = meta["version"] + 1
        vdir = os.path.join(self.root, f"v{version:06d}")
        tmp = f"{vdir}.tmp.{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, vdir)
        meta["version"] = version
        meta["log"].append({"version": version, "ts": ts, "note": note})
        self._write_pointer(meta)
        return version

    def latest_version(self) -> int | None:
        v = self._read_pointer()["version"]
        return v or None

    def history(self) -> list[dict]:
        return list(self._read_pointer()["log"])

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        meta = self._read_pointer()
        if not meta["log"]:
            raise FileNotFoundError(f"{self.root}: no committed versions")
        if version is None:
            version = meta["version"]
        if not any(e["version"] == version for e in meta["log"]):
            raise ValueError(f"unknown version {version}")
        return spark.read.parquet(os.path.join(self.root, f"v{version:06d}"))

    def compact(
        self, spark: SparkSession, ts: float, target_files: int = 1
    ) -> int:
        """Rewrite the latest snapshot into ``target_files`` part files
        as a NEW version (the small-file fix: streaming/incremental
        commits accrete many tiny parts; scans then pay per-file open
        and scheduling cost). ``coalesce`` merges without a shuffle;
        readers of the old version are untouched (snapshots are
        immutable), and the swap is the same atomic pointer commit."""
        df = self.read(spark)
        return self.commit(df.coalesce(target_files), ts, note="compact")

    def vacuum(self, keep_last: int) -> list[int]:
        """Drop all but the newest ``keep_last`` versions (retention).
        Returns the dropped version numbers. The version counter keeps
        advancing, so later commits never reuse a vacuumed number; the
        pointer is rewritten first, then unreferenced dirs are swept —
        a crash between the two leaves only sweepable orphans."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        meta = self._read_pointer()
        dropped = [e["version"] for e in meta["log"][:-keep_last]]
        meta["log"] = meta["log"][-keep_last:]
        self._write_pointer(meta)
        self._sweep(meta)
        return dropped

    def time_travel(self, spark: SparkSession, ts: float) -> DataFrame:
        """The snapshot current as of ``ts`` (latest commit with
        commit ts <= ts)."""
        eligible = [e for e in self._read_pointer()["log"] if e["ts"] <= ts]
        if not eligible:
            raise ValueError(f"no version at or before ts={ts}")
        return self.read(spark, eligible[-1]["version"])

    def diff(
        self,
        spark: SparkSession,
        key_cols: list[str],
        v_from: int,
        v_to: int | None = None,
    ) -> DataFrame:
        """Change-data-feed between two snapshots: one row per changed
        key with ``_change in ('insert','delete','update')`` — the
        Delta-CDF shape derived from plain snapshots. A full outer
        join on the key columns classifies each key; unchanged rows
        (all non-key columns equal, null-safe) are dropped. Cost: one
        co-partitioned outer join of the two snapshots — no state kept
        between commits."""
        from pyspark.sql import functions as F

        if v_to is None:
            v_to = self.latest_version()
        old = self.read(spark, v_from)
        new = self.read(spark, v_to)
        val_cols = [c for c in new.columns if c not in key_cols]
        if set(old.columns) != set(new.columns):
            raise ValueError("diff requires identical schemas")
        o = old.select(
            *[F.col(c).alias(f"__o_{c}") for c in old.columns]
        )
        cond = None
        for k in key_cols:
            c = F.col(f"__o_{k}") == F.col(k)
            cond = c if cond is None else (cond & c)
        joined = new.join(o, cond, "full_outer")
        old_key_null = F.col(f"__o_{key_cols[0]}").isNull()
        new_key_null = F.col(key_cols[0]).isNull()
        same = F.lit(True)
        for c in val_cols:
            same = same & F.col(c).eqNullSafe(F.col(f"__o_{c}"))
        change = (
            F.when(old_key_null, F.lit("insert"))
            .when(new_key_null, F.lit("delete"))
            .when(~same, F.lit("update"))
        )
        out_keys = [
            F.coalesce(F.col(k), F.col(f"__o_{k}")).alias(k) for k in key_cols
        ]
        return (
            joined.withColumn("_change", change)
            .filter(F.col("_change").isNotNull())
            .select(
                *out_keys,
                F.col("_change"),
                *[F.col(c).alias(f"new_{c}") for c in val_cols],
                *[F.col(f"__o_{c}").alias(f"old_{c}") for c in val_cols],
            )
        )
