"""Streaming distribution-drift monitor: per event-time window, a
fixed-bin histogram of a value column is folded into ONE stateful
aggregation and scored against a broadcast baseline with PSI
(population stability index) — the day-over-day drift gate of
``queries/dq.py``'s split-PSI, as a continuous flow.

Design constraints that shape the plan:

- Structured Streaming allows one stateful aggregation per stream in
  append mode, so the per-window histogram is a SINGLE ``groupBy
  (window)`` with one conditional count per bin (bins are a fixed,
  broadcast-literal edge list) — never a second aggregation over a
  (window, bin) aggregate.
- PSI is then a stateless projection over the finished window row:
  p_i = (n_i + eps) / (N + B·eps) vs the baseline fractions riding as
  literals. Identical expressions produce the batch twin, so
  equivalence is testable (``tests/test_streaming_drift.py``).
- State is bounded by the watermark; per-window state is B counters.

At 100 TB/day the same topology holds: the map side emits one
(window, bin-increment) per row into a B-wide aggregate — no shuffle
wider than the window key, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PSI_EPS = 0.5  # Laplace-style smoothing pseudo-count per bin


def bin_of(value: Column, edges: list[float]) -> Column:
    """Bin index = number of edges strictly below the value (same
    assignment rule as the equi-depth histogram query)."""
    b = F.lit(0)
    for e in edges:
        b = b + F.when(value > F.lit(e), 1).otherwise(0)
    return b


def baseline_fractions(
    df: DataFrame, value_col: str, edges: list[float]
) -> list[float]:
    """Batch helper: the baseline histogram fractions for ``edges``
    (B = len(edges)+1 bins), collected to the driver (B doubles) so a
    monitor can ride them as literals."""
    n_bins = len(edges) + 1
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.count(
                F.when(bin_of(F.col(value_col), edges) == i, F.lit(1))
            ).alias(f"n_{i}")
            for i in range(n_bins)
        ],
    ).first()
    total = row["n"]
    return [row[f"n_{i}"] / total for i in range(n_bins)]


def _histogram_agg(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    edges: list[float],
    window: str,
    watermark: str | None,
) -> DataFrame:
    n_bins = len(edges) + 1
    g = df
    if watermark is not None:
        g = g.withWatermark(ts_col, watermark)
    b = bin_of(F.col(value_col), edges)
    return (
        g.groupBy(F.window(ts_col, window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.count(F.when(b == i, F.lit(1))).alias(f"n_{i}")
                for i in range(n_bins)
            ],
        )
    )


def _psi_projection(
    hist: DataFrame, baseline: list[float], n_bins: int
) -> DataFrame:
    # Every PSI term (p-b)·ln(p/b) is >= 0; floor-micro rounding each
    # term before the fixed-order chain sum makes the score identical
    # across engines (ln may differ in the last ulp between libms —
    # the engine's standard guard for ln/exp-derived values), which is
    # what lets q_stream_twin_windowed_psi run THIS function under the
    # DuckDB oracle gate.
    total = F.col("n_rows").cast("double") + n_bins * PSI_EPS
    psi = F.lit(0.0)
    for i in range(n_bins):
        p = (F.col(f"n_{i}").cast("double") + PSI_EPS) / total
        bse = F.lit(max(baseline[i], 1e-12))
        term = (p - bse) * F.log(p / bse)
        psi = psi + F.floor(term * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return hist.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "n_rows",
        (F.floor(psi * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .cast("double")
        .alias("psi"),
    )


def windowed_psi(
    stream: DataFrame,
    value_col: str,
    edges: list[float],
    baseline: list[float],
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-window PSI of ``value_col`` against the baseline fractions.

    Works identically on a streaming or batch frame (pass
    ``watermark=None`` for batch) — the batch twin IS the equivalence
    oracle. Output: ``win_start, win_end, n_rows, psi``.
    """
    n_bins = len(edges) + 1
    if len(baseline) != n_bins:
        raise ValueError(
            f"baseline has {len(baseline)} fractions, expected {n_bins}"
        )
    hist = _histogram_agg(stream, value_col, ts_col, edges, window, watermark)
    return _psi_projection(hist, baseline, n_bins)
