"""Data-quality constraint checking (Deequ-style expectations).

A check suite compiles to ONE aggregate pass over the table — every
metric (completeness, uniqueness, min/max bounds, accepted-value
violations) is an aggregate Column, so a 50-check suite over a 100 TB
table still costs exactly one scan with map-side partial aggregation.
Referential-integrity checks need a second relation and compose as a
broadcast/shuffle anti-join count the caller unions in.

Each check yields a ``(constraint, metric, passed)`` row; metrics are
doubles from ratios of exact bigint counts (or exact min/max), so the
report is engine-reproducible.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    metric: Column  # aggregate expression
    predicate: Callable[[Column], Column]  # metric -> boolean Column


def completeness(col: str, threshold: float = 1.0) -> Check:
    """Fraction of non-null values; passes at >= threshold."""
    m = F.round(F.count(col) / F.count(F.lit(1)), 6)
    return Check(f"completeness({col})", m, lambda c: c >= threshold)


def uniqueness(col: str, threshold: float = 1.0) -> Check:
    """Distinct / total; 1.0 means the column is a key."""
    m = F.round(F.countDistinct(col) / F.count(F.lit(1)), 6)
    return Check(f"uniqueness({col})", m, lambda c: c >= threshold)


def min_bound(col: str, lo: float) -> Check:
    m = F.round(F.min(col).cast("double"), 6)
    return Check(f"min({col})>={lo}", m, lambda c: c >= lo)


def max_bound(col: str, hi: float) -> Check:
    m = F.round(F.max(col).cast("double"), 6)
    return Check(f"max({col})<={hi}", m, lambda c: c <= hi)


def accepted_values(col: str, values: list[str]) -> Check:
    """Count of rows outside the accepted set (nulls count as
    violations); passes at zero."""
    bad = F.count(F.when(~F.col(col).isin(values), F.lit(1))) + F.count(
        F.when(F.col(col).isNull(), F.lit(1))
    )
    return Check(
        f"accepted_values({col})", bad.cast("double"), lambda c: c == 0.0
    )


def non_empty() -> Check:
    return Check("row_count>0", F.count(F.lit(1)).cast("double"), lambda c: c > 0)


def uniqueness_multi(cols: list[str], threshold: float = 1.0) -> Check:
    """Compound-key uniqueness: distinct (col1, col2, ...) tuples /
    total rows; 1.0 means the column set is a key."""
    m = F.round(
        F.countDistinct(F.struct(*cols)) / F.count(F.lit(1)), 6
    )
    name = f"uniqueness({','.join(cols)})"
    return Check(name, m, lambda c: c >= threshold)


def predicate_holds(name: str, cond: Column) -> Check:
    """Row-level business rule: counts rows where ``cond`` is false or
    null (a null predicate is a violation — unknown is not compliant);
    passes at zero violations. This is the cross-field rule shape
    (``colA <= colB``, ``x + y < limit``) the single-column checks
    can't express."""
    bad = F.count(F.when(~F.coalesce(cond, F.lit(False)), F.lit(1)))
    return Check(f"predicate({name})", bad.cast("double"), lambda c: c == 0.0)


def dq_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check in a single aggregate pass; one row per check:
    ``constraint (string), metric (double), passed (boolean)``."""
    agg = df.agg(*[c.metric.alias(f"__m{i}") for i, c in enumerate(checks)])
    rows = [
        F.struct(
            F.lit(c.name).alias("constraint_name"),
            F.col(f"__m{i}").cast("double").alias("metric"),
            c.predicate(F.col(f"__m{i}")).alias("passed"),
        )
        for i, c in enumerate(checks)
    ]
    return agg.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def referential_integrity(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Orphan count as a one-row report (broadcast the parent's
    distinct keys when small; Spark picks the join strategy). Passes
    at zero orphans."""
    orphans = child.join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("__m"))
    name = f"referential({child_col})"
    return orphans.select(
        F.lit(name).alias("constraint_name"),
        F.col("__m").cast("double").alias("metric"),
        (F.col("__m") == 0).alias("passed"),
    )
