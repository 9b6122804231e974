"""Z-order (Morton-curve) clustering keys as pure Column expressions.

Multi-dimensional data layout for scan pruning: sorting a table by the
bit-interleaved key of two (or more) quantized dimensions places rows
that are close in EVERY dimension into the same file, so per-file
min/max statistics prune scans filtered on ANY of the clustered
columns — the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.
A linear sort only prunes its leading column; at 100 TB the difference
is reading one file vs. reading every file for a filter on the second
dimension.

Everything here is shift/and/or integer arithmetic on already-quantized
non-negative ints — whole-stage codegen, no UDFs, no shuffle beyond the
final ``repartitionByRange`` that implements the clustered write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, mn: Column, mx: Column, bits: int = 8) -> Column:
    """Scale ``col`` from [mn, mx] onto the integer grid [0, 2**bits).

    Pure double arithmetic (subtract, multiply, divide, floor) — every
    step is a correctly-rounded IEEE-754 op, so any engine computing
    the same expression over the same doubles lands on the same cell.
    ``mx`` maps to 2**bits - 1 (the +1.0 in the divisor keeps the top
    value inside the grid).
    """
    levels = float(2**bits)
    return F.floor((col - mn) * levels / (mx - mn + 1.0)).cast("long")


def zorder_key(cols: Sequence[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each quantized column.

    Bit b of column j lands at position ``b * len(cols) + j`` —
    the Morton curve. Unrolled into ``bits * len(cols)`` shift/and/or
    expressions that stay inside codegen.
    """
    d = len(cols)
    key: Column = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * d + j))
    return key


def sql_zorder_key(exprs: Sequence[str], bits: int = 8) -> str:
    """DuckDB oracle twin of :func:`zorder_key` (same unrolling)."""
    d = len(exprs)
    parts = [
        f"((({e} >> {b}) & 1) << {b * d + j})"
        for b in range(bits)
        for j, e in enumerate(exprs)
    ]
    return " | ".join(parts)


def zorder_layout(
    df: DataFrame, key: Column, n_files: int
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` z-contiguous partitions.

    ``repartitionByRange`` range-shuffles on the z-key (one pass), then
    an in-partition sort makes each output file a contiguous run of the
    Morton curve — so every file's min/max envelope is tight in all
    interleaved dimensions. Write the result with any sink; the
    clustering survives because file boundaries follow partitions.
    """
    return df.repartitionByRange(n_files, key.alias("__z")).sortWithinPartitions(
        key.alias("__z")
    )
