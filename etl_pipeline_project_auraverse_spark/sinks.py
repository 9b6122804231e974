"""Sinks (K1–K4, reference ``backend/etl_pipeline.py:311-316`` and
``backend/server.js:52-91``).

K1 preserves the reference's single-CSV-file contract: Spark writes a
parquet-style directory, so the part file is renamed to the declared
destination path. ``coalesce(1)`` is the price of that contract — a
deliberate single-file bottleneck, flagged here; the scale path is
:func:`write_csv_dir` (partitioned write, no coalesce), which the
pipeline uses whenever the config doesn't demand one file.
"""

from __future__ import annotations

import csv
import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_csv_single(df: DataFrame, destination: str) -> int:
    """K1: one CSV file at ``destination`` (etl_pipeline.py:311-316).

    Returns the row count (the reference prints it on save, A7).
    """
    out_dir = os.path.dirname(destination) or "."
    os.makedirs(out_dir, exist_ok=True)
    tmp = destination + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    if os.path.exists(destination):
        os.remove(destination)  # O5: stale-output delete (server.js:40-41)
    shutil.move(part, destination)
    shutil.rmtree(tmp, ignore_errors=True)
    # csv-parse rather than count raw lines: quoted values extracted from
    # JSON/YAML blocks can contain embedded newlines, which would inflate
    # a physical line count
    with open(destination, newline="", encoding="utf-8") as f:
        n_rows = sum(1 for _ in csv.reader(f)) - 1
    return max(n_rows, 0)


def write_csv_dir(df: DataFrame, destination: str) -> None:
    """K1 at scale: partitioned CSV directory write — no coalesce, every
    executor writes its own part."""
    df.write.mode("overwrite").option("header", True).csv(destination)


# One HTTP response is never allowed to pull an unbounded table onto the
# driver: a /run-etl against a huge upload would otherwise OOM the server
# with a single request. The reference returns the whole table
# (server.js:52-70); below the cap behavior is identical.
TABLE_ROW_CAP = 10_000


def table_records(
    df: DataFrame, max_rows: int = TABLE_ROW_CAP
) -> tuple[list[dict], bool]:
    """K3: the HTTP-response shape (server.js:52-70) — row dicts at the
    API edge. Only for result-sized frames; never in a pipeline.

    Returns ``(records, truncated)``. At most ``max_rows + 1`` rows ever
    cross to the driver — the one extra row exists only to detect
    truncation and is not returned.
    """
    rows = df.limit(max_rows + 1).collect()
    truncated = len(rows) > max_rows
    return [row.asDict(recursive=True) for row in rows[:max_rows]], truncated
