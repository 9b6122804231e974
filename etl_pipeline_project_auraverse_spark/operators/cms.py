"""Count-min sketch over a key column, with a pluggable hash engine.

Two engines, same sketch shape (D rows x W buckets of BIGINT counts,
map-side-combinable groupBy build, broadcast probe):

- ``xxhash64`` (default): one JVM hash call per (key, depth) —
  ``F.xxhash64(key, depth) % W`` — the production path. Roughly half
  the cost of the md5 arm (no string concat, no md5, no base-16
  conv), and the one to use at 100 TB.
- ``md5``: string-concat + md5 + conv, bit-identical to a DuckDB
  twin (``queries/sketches.py::_cms_pos_sql``) — kept because it
  makes the sketch itself oracle-checkable, which xxhash64 cannot be
  (DuckDB has no xxhash64).

The CMS guarantee (estimate >= true count; overcount bounded by
eps*N with probability 1-delta for W = e/eps, D = ln(1/delta)) holds
for any pairwise-independent-ish hash family; the unit tests assert
it empirically for both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, d: Column, w: int, engine: str) -> Column:
    if engine == "xxhash64":
        # xxhash64 returns a signed long; pmod keeps buckets in [0, w)
        return F.pmod(F.xxhash64(key.cast("string"), d), F.lit(w)).cast("long")
    if engine == "md5":
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(key.cast("string"), F.lit("#"), d.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % w
        )
    raise ValueError(f"unknown CMS hash engine {engine!r}")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    engine: str = "xxhash64",
    weight_col: str | None = None,
) -> DataFrame:
    """(d, bucket, c) counts — D*W rows regardless of key cardinality.
    One explode(depth) + one bounded groupBy; partial aggregation
    makes the shuffle carry at most D*W rows per task.

    ``weight_col``: build from pre-aggregated (key, count) rows instead
    of raw observations — c(d, b) = Σ weights of keys hashing to b is
    identical to counting the underlying rows, but hashes each DISTINCT
    key once per depth instead of each observation (the caller that
    already has the key histogram pays |keys|·D hashes, not N·D)."""
    d_col = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    w_expr = F.col("__w") if weight_col else F.lit(1)
    proj = [F.col(key_col).alias("key")] + (
        [F.col(weight_col).alias("__w")] if weight_col else []
    )
    return (
        df.select(*proj)
        .select("*", d_col)
        .select(
            "d",
            _bucket(F.col("key"), F.col("d"), width, engine).alias("bucket"),
            w_expr.alias("__w"),
        )
        .groupBy("d", "bucket")
        .agg(F.sum("__w").alias("c"))
    )


def cms_probe(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 2048,
    engine: str = "xxhash64",
) -> DataFrame:
    """Adds ``cms_estimate`` (min over depths) to ``keys``. The D*W
    sketch broadcasts; the probe is an equi-join on (d, bucket), never
    a shuffle of the key set."""
    d_col = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    kd = keys.select("*", d_col).select(
        "*", _bucket(F.col(key_col), F.col("d"), width, engine).alias("bucket")
    )
    others = [c for c in keys.columns]
    return (
        kd.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(*others)
        .agg(F.min("c").alias("cms_estimate"))
    )
