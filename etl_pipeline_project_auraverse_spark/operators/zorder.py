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


# ---------------------------------------------------------------------------
# Hilbert-curve keys — the Morton curve's better-locality sibling.
# Morton interleaving has long "jumps" where the curve crosses quadrant
# boundaries; the Hilbert curve visits every cell of the grid with
# every step adjacent (Manhattan distance 1), so file envelopes built
# from contiguous key runs are tighter on average — measurably fewer
# files read per range filter at the same file count. The standard
# xy2d construction (level-by-level quadrant encode + rotate) unrolls
# into ``bits`` rounds of integer CASE arithmetic — pure codegen, no
# UDFs, engine-exact.
# ---------------------------------------------------------------------------


def hilbert_key(df: DataFrame, x: Column, y: Column, bits: int = 8) -> DataFrame:
    """Append column ``hkey``: Hilbert distance of (x, y) on the
    2**bits grid. ``x``/``y`` must already be quantized to
    [0, 2**bits). Each unroll level is one narrow ``select`` so the
    expression tree stays linear in ``bits`` (a single nested
    expression would grow 3**bits)."""
    out = df.withColumn("__hx", x.cast("long")).withColumn(
        "__hy", y.cast("long")
    ).withColumn("__hd", F.lit(0).cast("long"))
    n = 1 << bits
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        rx = (F.col("__hx").bitwiseAND(F.lit(s)) > 0).cast("long")
        ry = (F.col("__hy").bitwiseAND(F.lit(s)) > 0).cast("long")
        quad = F.when(rx == 1, 3 - ry).otherwise(ry)
        hd = F.col("__hd") + F.lit(s * s).cast("long") * quad
        hx = F.when(ry == 1, F.col("__hx")).otherwise(
            F.when(rx == 1, F.lit(n - 1) - F.col("__hy")).otherwise(
                F.col("__hy")
            )
        )
        hy = F.when(ry == 1, F.col("__hy")).otherwise(
            F.when(rx == 1, F.lit(n - 1) - F.col("__hx")).otherwise(
                F.col("__hx")
            )
        )
        keep = [c for c in out.columns if c not in ("__hx", "__hy", "__hd")]
        out = out.select(
            *keep, hx.alias("__hx"), hy.alias("__hy"), hd.alias("__hd")
        )
    keep = [c for c in out.columns if c not in ("__hx", "__hy", "__hd")]
    return out.select(*keep, F.col("__hd").alias("hkey"))


def sql_hilbert_levels(src: str, cols: Sequence[str], bits: int = 8) -> str:
    """DuckDB twin of :func:`hilbert_key`: a nested-subquery chain over
    ``src`` (which must expose quantized ``hx0``/``hy0`` plus ``cols``),
    producing ``hkey``. Level columns are NUMBERED (hx1, hy1, ...)
    because DuckDB's lateral column aliases would otherwise make later
    expressions read the level's OWN freshly-assigned alias."""
    n = 1 << bits
    passthru = ", ".join(cols)
    q = f"({src})"
    lvl = 0
    d_expr_prev = "0"
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        i, j = lvl, lvl + 1
        rx = f"CASE WHEN (hx{i} & {s}) > 0 THEN 1 ELSE 0 END"
        ry = f"CASE WHEN (hy{i} & {s}) > 0 THEN 1 ELSE 0 END"
        quad = f"CASE WHEN {rx} = 1 THEN 3 - {ry} ELSE {ry} END"
        hd = f"{d_expr_prev} + {s * s} * ({quad})"
        hx = (
            f"CASE WHEN {ry} = 1 THEN hx{i} "
            f"WHEN {rx} = 1 THEN {n - 1} - hy{i} ELSE hy{i} END"
        )
        hy = (
            f"CASE WHEN {ry} = 1 THEN hy{i} "
            f"WHEN {rx} = 1 THEN {n - 1} - hx{i} ELSE hx{i} END"
        )
        d_col = f"hd{j}" if b > 0 else "hkey"
        q = (
            f"(SELECT {passthru}, {hd} AS {d_col}, "
            f"{hx} AS hx{j}, {hy} AS hy{j} FROM {q})"
        )
        d_expr_prev = d_col
        lvl += 1
    return q
