"""Session-wide tracked-cache registry.

A long-lived session runs many queries/pipelines back-to-back (the
driver runs 70+); untracked ``persist()``/``cache()`` calls would
accumulate cached partitions forever. Any layer that needs a cache
registers it here via :func:`persist_tracked`; the query registry (and
the ETL pipeline teardown) call :func:`release_caches` when the next
unit of work starts, bounding live cache to one unit's worth without
requiring the caller's cooperation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# DataFrames persisted by builders, released by release_caches().
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
