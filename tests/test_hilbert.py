"""Hilbert-key operator: exhaustive equivalence with the reference
xy2d construction, plus the curve's defining adjacency property."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.zorder import hilbert_key


def _xy2d(order_bits: int, x: int, y: int) -> int:
    """Reference Hilbert xy->d (classic iterative rotate-and-encode)."""
    n = 1 << order_bits
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_exhaustively(spark):
    bits = 4
    n = 1 << bits
    cells = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(cells, "x int, y int")
    got = {
        (r.x, r.y): r.hkey
        for r in hilbert_key(df, F.col("x"), F.col("y"), bits).collect()
    }
    for x, y in cells:
        assert got[(x, y)] == _xy2d(bits, x, y), (x, y)


def test_hilbert_is_a_complete_adjacent_walk(spark):
    """Every grid cell appears exactly once and consecutive keys are
    Manhattan-adjacent — the property that makes Hilbert envelopes
    tighter than Morton's quadrant jumps."""
    bits = 4
    n = 1 << bits
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    )
    rows = hilbert_key(df, F.col("x"), F.col("y"), bits).collect()
    by_d = {r.hkey: (r.x, r.y) for r in rows}
    assert sorted(by_d) == list(range(n * n))
    for d in range(1, n * n):
        (x0, y0), (x1, y1) = by_d[d - 1], by_d[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (d, by_d[d - 1], by_d[d])
