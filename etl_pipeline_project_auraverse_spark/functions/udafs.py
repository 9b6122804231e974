"""User-defined aggregates via grouped-agg ``pandas_udf`` — the UDAF
surface the reference's config-lambda layer implies but never built
(SURVEY §2.5): Arrow-batched, one call per group, never row-at-a-time
Python. These are the escape hatch for aggregates Catalyst can't
express; everything expressible natively in this engine stays native.

Built lazily (PySpark-4 classic: ``pandas_udf`` at module import time
requires an active SparkContext) and cached per process.
"""

import functools

import numpy as np
import pandas as pd


@functools.cache
def trimmed_mean_10():
    """Mean of the middle 80% (10% trimmed from each tail, by count —
    ``scipy.stats.trim_mean(v, 0.1)`` semantics)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _trimmed_mean_10(v: pd.Series) -> float:
        arr = np.sort(v.dropna().to_numpy(dtype=np.float64))
        k = int(len(arr) * 0.1)
        core = arr[k : len(arr) - k] if len(arr) > 2 * k else arr
        return float(core.mean()) if len(core) else float("nan")

    return _trimmed_mean_10


@functools.cache
def geometric_mean():
    """exp(mean(log v)) over positive values."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _geometric_mean(v: pd.Series) -> float:
        arr = v.dropna().to_numpy(dtype=np.float64)
        arr = arr[arr > 0]
        return float(np.exp(np.log(arr).mean())) if len(arr) else float("nan")

    return _geometric_mean
