"""Bloom-filter join pruning with a portable, engine-reproducible hash.

The scale pattern: before shuffling a 100 TB fact table into a join,
build a few-KB Bloom filter from the (small) build side and drop fact
rows that cannot match. The filter here is exact-by-construction in
any engine — k positions come from md5 prefixes, and the bit array is
the SET of positions (packed into 64-bit words for transport), so
membership is pure integer arithmetic with no library-specific hash.

Build: k position rows per key → ``groupBy(word) bit_or(mask)`` →
at most m/64 rows (16 words at m=1024 — broadcastable at any build
size). Probe: explode k positions per row, one broadcast equi-join on
word index, ``min(bit set)`` per row. False positives are possible
(that's the deal), false negatives are not; callers re-verify
candidates with the exact join, which is the point — the expensive
join now touches only candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k portable hash positions in [0, m_bits) for a key: md5 of the
    key string salted with the probe index."""
    out = []
    for i in range(k):
        h = F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{i}"))), 1, 15),
            16,
            10,
        ).cast("long")
        out.append(h % m_bits)
    return out


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1024, k: int = 4
) -> DataFrame:
    """``(word_idx, word)`` — the packed filter, ≤ m_bits/64 rows."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.expr("div(pos, 64)").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_might_contain(
    df: DataFrame, key_col: str, bloom: DataFrame, m_bits: int = 1024, k: int = 4
) -> DataFrame:
    """Adds ``bloom_pass``: true iff every position's bit is set.

    The packed words fold into ONE map row (≤ m_bits/64 entries),
    broadcast once; each probe row then does k map lookups + bit tests
    — a pure map-side projection, no shuffle of the probe side at all.
    Positions landing in an absent word fail immediately (missing map
    key ⇒ zero word).
    """
    packed = bloom.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("word_idx", "word")))
        ).alias("__bw")
    )
    out = df.crossJoin(F.broadcast(packed))
    helper = ["__bw"]
    cond = F.lit(True)
    for i, pos in enumerate(_positions(F.col(key_col), m_bits, k)):
        out = out.withColumn(f"__p{i}", pos).withColumn(
            f"__w{i}",
            F.coalesce(
                F.element_at(F.col("__bw"), F.expr(f"div(__p{i}, 64)")),
                F.lit(0).cast("long"),
            ),
        )
        helper += [f"__p{i}", f"__w{i}"]
        cond = cond & F.expr(
            f"(shiftright(__w{i}, cast(__p{i} % 64 as int)) & 1) = 1"
        )
    return out.withColumn("bloom_pass", cond).drop(*helper)
