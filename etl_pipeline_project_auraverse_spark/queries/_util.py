"""Shared helpers for oracle-checked queries.

The central trick is deterministic floating-point aggregation: Spark
sums doubles in partition order (nondeterministic across runs/cluster
sizes), DuckDB sums them in its own order — the raw double sums differ
in the last bits. We therefore accumulate through DECIMAL(25,6):
casting each per-row double to decimal is order-independent, decimal
addition is exact/associative, and both engines produce bit-identical
results, which we round and cast back to double for a stable schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(25,6)"

# DataFrames persisted by query builders, released by release_caches().
# A long-lived session runs many queries back-to-back (the driver runs
# 70+); untracked persist() calls would accumulate cached partitions
# forever. Queries register their caches here and the query registry
# releases them when the NEXT query starts (by which point the previous
# result has been materialized), bounding live cache to one query's
# worth without requiring the caller's cooperation.
_LIVE_CACHES: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() with registration so release_caches() can unpersist."""
    df.persist()
    _LIVE_CACHES.append(df)
    return df


def release_caches(blocking: bool = True) -> None:
    """Unpersist every tracked cache (idempotent, never raises on a
    stopped session — cleanup must not mask the real failure).

    Blocking by default: ``unpersist(blocking=False)`` only enqueues
    block removal, so a long-lived session launching the next query
    immediately could still hold the previous query's partitions in
    memory while the new ones materialize — exactly the overlap this
    registry exists to prevent. The wait is a driver-side RPC, trivial
    next to any query's runtime."""
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist(blocking=blocking)
        except Exception:
            pass


def parallelize(df: DataFrame) -> Column | DataFrame:
    """Spread a small single-file scan across every core before
    compute-heavy per-row work (regex batteries, hashing, explodes).

    Small parquet files arrive as ONE partition, serializing all
    downstream projection work onto a single thread; at real scale the
    scan itself is already parallel and this becomes a no-op-sized
    shuffle. Only use ahead of expensive projections — plain
    aggregations shuffle anyway.
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM over a double expression → rounded double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), scale).cast("double")


def dec_avg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum, double division, round."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale).cast("double")


def sql_dec_sum(expr: str, scale: int = 2) -> str:
    """DuckDB oracle twin of :func:`dec_sum`."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(25,6))), {scale}) AS DOUBLE)"


def sql_dec_avg(expr: str, scale: int = 6) -> str:
    """DuckDB oracle twin of :func:`dec_avg`."""
    return (
        f"CAST(ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"
        f" / COUNT({expr}), {scale}) AS DOUBLE)"
    )
