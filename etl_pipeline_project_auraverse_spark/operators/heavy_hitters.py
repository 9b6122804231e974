"""Misra–Gries heavy-hitter sketch: bounded-memory frequent items.

The two-pass pattern for exact frequent-item queries at 100 TB:

1. **Sketch pass** — every partition folds its rows into a k-counter
   Misra–Gries summary (constant memory regardless of partition size
   or key cardinality), emitting at most k (item, count) rows. The
   union across P partitions is ≤ P·k rows — tiny.
2. **Exact pass** — the merged summaries form a candidate set that
   PROVABLY contains every item with true frequency > n/k (each
   partition undercounts any item by at most n_p/(k+1); summing the
   per-partition summaries therefore undercounts by < n/k, so a
   > n/k item's merged count stays positive). One broadcast semi-join
   + groupBy over the candidates recounts them exactly.

The result equals a plain ``GROUP BY … HAVING count >= threshold``
whenever ``threshold > n/k`` — but without ever shuffling the full key
cardinality: the only wide op touches ≤ P·k candidate rows. That is
the difference between shuffling 100 TB of URLs and shuffling a few
megabytes of sketch.

The sketch runs in ``mapInPandas`` (Arrow-batched; counters fold
value_counts aggregates, not Python rows) — the documented exception
to the no-Python rule, because a decrement-based counter cap is not
expressible as a DataFrame aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _mg_reduce(counters: dict, k: int) -> None:
    """Enforce the k-counter cap: subtract the minimum surviving count
    until at most k counters remain (batched Misra–Gries decrement)."""
    while len(counters) > k:
        drop = sorted(counters.values())[len(counters) - k - 1]
        for item in list(counters):
            c = counters[item] - drop
            if c > 0:
                counters[item] = c
            else:
                del counters[item]


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries, merged to ≤ P·k candidates.

    Returns ``(col, mg_count)`` where ``mg_count`` is the summed sketch
    count (a lower bound on true frequency, within n/k of it). Every
    item with true frequency > n/k is present.
    """
    field = df.schema[col]
    out_schema = StructType([field, StructField("mg_count", LongType(), False)])

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for item, c in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            _mg_reduce(counters, k)
        if counters:
            yield pd.DataFrame(
                {col: list(counters), "mg_count": list(counters.values())}
            )

    summaries = df.select(col).mapInPandas(sketch, schema=out_schema)
    return summaries.groupBy(col).agg(F.sum("mg_count").alias("mg_count"))


def exact_heavy_hitters(
    df: DataFrame, col: str, k: int, threshold_df: DataFrame
) -> DataFrame:
    """Exact counts of items whose frequency reaches the threshold,
    computed via sketch-pruned recount. ``threshold_df`` is a 1-row
    frame with a single ``threshold`` column (kept lazy and broadcast
    — no driver-side collect). Correct iff the caller ensures
    ``threshold > n/k`` (the sketch's containment bound).

    Returns ``(col, n_rows)`` — identical to the direct
    ``groupBy(col).count().where(count >= threshold)`` but the full-
    cardinality shuffle is replaced by a broadcast candidate semi-join.
    """
    candidates = misra_gries_candidates(df, col, k).select(col)
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(threshold_df))
        .where(F.col("n_rows") >= F.col("threshold"))
        .select(col, "n_rows")
    )
