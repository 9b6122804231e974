"""File-level data skipping: a min/max stats manifest written WITH the
data, and a reader that prunes files BEFORE Spark ever lists them.

Parquet row-group statistics prune within a file the executor already
opened; at 100 TB the win that matters is never scheduling the file's
task at all. Lakehouse formats (Delta/Iceberg) keep per-file column
stats in their transaction log for exactly this reason. This operator
is that mechanism over plain parquet directories:

- ``write_with_stats``: cluster the frame (caller picks the layout —
  Z-order/Hilbert/linear via ``operators/zorder``), write one file per
  partition, then record each file's min/max for the stat columns in
  ``_stats.json`` inside the directory (underscore-prefixed files are
  invisible to Spark's readers, and the manifest is written AFTER the
  data so a crashed write leaves data without manifest — the reader
  then falls back to reading everything, which is correct, only
  slower).
- ``read_pruned``: evaluate simple range predicates against the
  manifest (driver-side, no data IO) and hand Spark ONLY the matching
  file paths. Returns the DataFrame plus the skip report so callers
  (and tests) can assert the pruning actually happened.

The manifest stays small: one JSON row per file with two values per
stat column — listing cost O(files), no data read.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_stats.json"


def write_with_stats(
    df: DataFrame, path: str, stat_cols: list[str]
) -> dict:
    """Write ``df`` (one file per partition, preserving the caller's
    clustering) and the per-file min/max manifest. Returns the
    manifest dict."""
    df.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    files = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    entries = []
    for fname in files:
        aggs = []
        for c in stat_cols:
            aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
        row = spark.read.parquet(os.path.join(path, fname)).agg(*aggs).first()
        entries.append(
            {
                "file": fname,
                "stats": {
                    c: [row[f"mn_{c}"], row[f"mx_{c}"]] for c in stat_cols
                },
            }
        )
    manifest = {"stat_cols": stat_cols, "files": entries}
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))
    return manifest


@dataclass
class SkipReport:
    n_total: int
    n_read: int

    @property
    def n_skipped(self) -> int:
        return self.n_total - self.n_read


def read_pruned(
    spark: SparkSession,
    path: str,
    bounds: dict[str, tuple[float | None, float | None]],
) -> tuple[DataFrame, SkipReport]:
    """Read only the files whose [min, max] envelope intersects every
    requested ``col: (lo, hi)`` band (None = unbounded side).

    The caller STILL applies the row-level filter — file pruning is an
    over-approximation by design (same contract as partition pruning).
    Without a manifest every file is read (crash-safe fallback).
    """
    mpath = os.path.join(path, _MANIFEST)
    all_files = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    if not os.path.exists(mpath):
        df = spark.read.parquet(*(os.path.join(path, f) for f in all_files))
        return df, SkipReport(len(all_files), len(all_files))
    with open(mpath) as f:
        manifest = json.load(f)
    # a band on a column the manifest never collected stats for cannot
    # prune anything — fall back to reading every file, same contract
    # as the missing-manifest path (pruning is an optimization, never
    # a correctness filter)
    if any(col not in manifest["stat_cols"] for col in bounds):
        df = spark.read.parquet(*(os.path.join(path, f) for f in all_files))
        return df, SkipReport(len(all_files), len(all_files))
    keep = []
    for entry in manifest["files"]:
        ok = True
        for col, (lo, hi) in bounds.items():
            mn, mx = entry["stats"][col]
            if mn is None:
                # all-null file for this column: a BOUNDED band can't
                # match NULL, but an unbounded (None, None) band
                # constrains nothing and must keep the file
                if lo is not None or hi is not None:
                    ok = False
                    break
                continue
            if lo is not None and mx < lo:
                ok = False
                break
            if hi is not None and mn > hi:
                ok = False
                break
        if ok:
            keep.append(entry["file"])
    report = SkipReport(len(manifest["files"]), len(keep))
    if not keep:  # no file can match: empty frame with the real schema
        df = spark.read.parquet(path).limit(0)
        return df, report
    df = spark.read.parquet(*(os.path.join(path, f) for f in keep))
    return df, report
