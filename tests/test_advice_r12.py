"""Round-12 advice regressions: numpy cosine blocks must match the
engines' fold semantics exactly, the driver-fused AUC must degrade (not
crash) on a single-class corpus, and the fused quartile-migration pass
must degrade (not crash) when one half has no revenue rows."""

from __future__ import annotations

import math

import pytest

from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all

load_all()


def _ref_cosine(c, q, digits=6):
    """Scalar reference: the exact float ops np_block_cosine promises —
    dimension-by-dimension left-assoc accumulation from 0.0, then
    half-away-from-zero rounding with an EXACT tie test (Fraction)."""
    from fractions import Fraction

    s = cn = qn = 0.0
    for x, y in zip(c, q):
        s += x * y
        cn += x * x
        qn += y * y
    v = s / (math.sqrt(cn) * math.sqrt(qn))
    ys = Fraction(abs(v)) * 10**digits
    fl = ys.numerator // ys.denominator
    r = fl + (1 if ys - fl >= Fraction(1, 2) else 0)
    return math.copysign(r, v) / 10.0**digits


def test_np_block_cosine_matches_fold_reference():
    """Every cell of the blocked score matrix equals the scalar
    left-assoc + half-away reference bit-for-bit — the contract that
    keeps the mapInPandas GEMM arms hash-identical to the F.aggregate
    and DuckDB list_sum folds."""
    import numpy as np

    from etl_pipeline_project_auraverse_spark.queries._util import (
        np_block_cosine,
    )

    rng = np.random.default_rng(7)
    # awkward magnitudes on purpose: int lattice keeps dots exact while
    # the division still lands on arbitrary doubles
    C = rng.integers(-999, 1000, size=(37, 64)).astype(np.float64)
    Q = rng.integers(-999, 1000, size=(11, 64)).astype(np.float64)
    C[0, :] = 1.0  # degenerate-direction rows exercise the sign path
    Q[0, :] = -1.0
    S = np_block_cosine(C, Q)
    for i in range(C.shape[0]):
        for j in range(Q.shape[0]):
            assert S[i, j] == _ref_cosine(C[i], Q[j]), (i, j)


def test_np_block_cosine_rounds_half_away_from_zero():
    """The rounding stage is half-away-from-zero (DuckDB ROUND), not
    numpy's default half-to-even — checked on symmetric +/- values."""
    import numpy as np

    from etl_pipeline_project_auraverse_spark.queries._util import (
        np_block_cosine,
    )

    # orthonormal-ish construction giving cos = 3/5 and -3/5 exactly
    C = np.array([[3.0, 4.0], [-3.0, 4.0]])
    Q = np.array([[1.0, 0.0]])
    S = np_block_cosine(C, Q)
    assert S[0, 0] == 0.6 and S[1, 0] == -0.6


def test_logreg_auc_single_class_degrades_to_null(spark, tmp_path):
    """A corpus where every lineitem has the same returnflag (one
    class) must yield a null AUC, not a driver ZeroDivisionError."""
    d = str(tmp_path)
    rows = [
        (float(5 + i % 40), 0.01 * (i % 10), 0.01 * (i % 8), "N")
        for i in range(200)
    ]
    spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_tax double, l_returnflag string"
    ).coalesce(2).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    out = QUERIES["q_logreg_auc_calibration"](spark, d).collect()
    assert len(out) > 0
    assert all(r["auc"] is None for r in out)
    assert sum(r["n_rows"] for r in out) == 200
    assert all(r["n_pos"] == 0 for r in out)


def test_quartile_migration_empty_half_degrades_to_inactive(spark, tmp_path):
    """All orders on ONE date puts every order in the first half; the
    second half has no revenue rows, so its bounds row is absent — the
    fused pass must emit to_quartile = 0 for everyone instead of dying
    with a KeyError."""
    import datetime

    d = str(tmp_path)
    day = datetime.date(1995, 6, 1)
    rows = [(i, day, 100.0 + i) for i in range(40)]
    spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    ).coalesce(2).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = QUERIES["q_customer_quartile_migration"](spark, d).collect()
    assert len(out) > 0
    assert all(r["to_quartile"] == 0 for r in out)
    assert {r["from_quartile"] for r in out} <= {1, 2, 3, 4}
    assert sum(r["n_customers"] for r in out) == 40


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
