"""Streaming heavy hitters: hash-sharded Misra–Gries in bounded state —
the streaming face of ``operators/heavy_hitters.py`` (same batched
decrement fold, same guarantee).

Keys are hash-partitioned into ``shards`` state groups, so each key
lives in exactly one shard and the classic per-sketch bound applies
per shard: the emitted count is a lower bound on the key's true
frequency, within n_shard/(capacity+1) of it, and every key whose
true frequency exceeds that bound is PRESENT in the sketch. State per
shard is ≤ ``capacity`` counters + two longs — constant regardless of
stream length or key cardinality, the only state shape that survives
an unbounded 100 TB/day key firehose (exact per-key streaming counts
would grow state with cardinality; watermarked windows would bound it
in time but not in keys).

Each micro-batch emits the shard's full current sketch stamped with an
``upd_seq`` update counter; consumers keep the rows of each shard's
max seq (the memory/console sink pattern) or let an upsert sink
overwrite by (shard, item).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_pipeline_project_auraverse_spark.operators.heavy_hitters import (
    _mg_reduce,
)


def streaming_heavy_hitters(
    events: DataFrame,
    key_col: str = "event_type",
    capacity: int = 32,
    shards: int = 8,
    watermark: str = "1 hour",
) -> DataFrame:
    """Misra–Gries frequent-item sketches over a stream of ``key_col``
    values (cast to string). Returns an update-mode stream of
    ``(shard, item, mg_count, n_shard, upd_seq)`` — the full sketch of
    the shard at each update."""

    out_schema = (
        "shard int, item string, mg_count long, n_shard long, upd_seq long"
    )
    state_schema = "items array<string>, counts array<long>, n long, upd long"

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        items, counts, n, upd = (
            state.get if state.exists else ([], [], 0, 0)
        )
        counters = dict(zip(items, counts))
        for pdf in batches:
            vc = pdf["item"].value_counts()
            n += int(vc.sum())
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            _mg_reduce(counters, capacity)
        upd += 1
        state.update(
            (list(counters), [int(c) for c in counters.values()], n, upd)
        )
        yield pd.DataFrame(
            {
                "shard": key[0],
                "item": list(counters),
                "mg_count": list(counters.values()),
                "n_shard": n,
                "upd_seq": upd,
            }
        )

    keyed = events.select(
        F.col(key_col).cast("string").alias("item"), F.col("ts")
    ).withColumn(
        "shard", F.pmod(F.xxhash64("item"), F.lit(shards)).cast("int")
    )
    return (
        keyed.withWatermark("ts", watermark)
        .groupBy("shard")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def latest_sketch(emissions: DataFrame) -> DataFrame:
    """Collapse an update-mode emission log to each shard's final
    sketch (batch post-processing for memory/file sinks)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard")
    return (
        emissions.withColumn("max_seq", F.max("upd_seq").over(w))
        .where(F.col("upd_seq") == F.col("max_seq"))
        .select("shard", "item", "mg_count", "n_shard")
    )
