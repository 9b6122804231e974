"""Data-layout queries: Z-order (Morton) clustering cells.

``operators/zorder.py`` provides the key; this query assigns every
order to its Morton cell over (customer, price) and reports each
cell's row count and min/max envelope — exactly the per-file
statistics a lakehouse writer would record after ``OPTIMIZE ZORDER
BY (o_custkey, o_totalprice)``, and the evidence that the envelopes
are tight in BOTH dimensions (so filters on either column prune).

Scale shape: quantization bounds are a 1-row broadcast; the key is
pure codegen bit arithmetic; the only shuffle is the final groupBy on
the (bounded, 2^10-ary) cell id.

Determinism: quantization is subtract/multiply/divide/floor over
doubles — correctly-rounded IEEE ops computed identically by Spark
and DuckDB — and the interleave is integer bit shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.zorder import (
    quantize,
    sql_zorder_key,
    zorder_key,
)
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.session import load_table

ZBITS = 8  # 8 bits per dimension -> 16-bit Morton key
CELL_SHIFT = 6  # cells = zkey >> 6 -> 1024 cells


@register(
    "q_zorder_order_cells",
    oracle=f"""
    WITH s AS (
        SELECT MIN(o_custkey) AS mnc, MAX(o_custkey) AS mxc,
               MIN(o_totalprice) AS mnp, MAX(o_totalprice) AS mxp
        FROM orders
    ),
    q AS (
        SELECT o_custkey, o_totalprice,
               CAST(FLOOR((o_custkey - mnc) * 256.0 / (mxc - mnc + 1.0))
                    AS BIGINT) AS xq,
               CAST(FLOOR((o_totalprice - mnp) * 256.0 / (mxp - mnp + 1.0))
                    AS BIGINT) AS yq
        FROM orders, s
    ),
    z AS (
        SELECT o_custkey, o_totalprice,
               ({sql_zorder_key(["xq", "yq"], ZBITS)}) AS zkey
        FROM q
    )
    SELECT zkey >> {CELL_SHIFT} AS cell,
           COUNT(*) AS n_orders,
           MIN(o_custkey) AS min_custkey,
           MAX(o_custkey) AS max_custkey,
           CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE) AS min_price,
           CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) AS max_price
    FROM z
    GROUP BY cell
    ORDER BY cell
    """,
)
def q_zorder_order_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton cells over (o_custkey, o_totalprice): per-cell count and
    min/max envelope. Bounds broadcast as one row; key is codegen bit
    arithmetic; one bounded-cardinality groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_custkey").alias("mnc"),
        F.max("o_custkey").alias("mxc"),
        F.min("o_totalprice").alias("mnp"),
        F.max("o_totalprice").alias("mxp"),
    )
    xq = quantize(F.col("o_custkey"), F.col("mnc"), F.col("mxc"), ZBITS)
    yq = quantize(F.col("o_totalprice"), F.col("mnp"), F.col("mxp"), ZBITS)
    zkey = zorder_key([xq, yq], ZBITS)
    return (
        orders.crossJoin(F.broadcast(stats))
        .select("o_custkey", "o_totalprice", zkey.alias("zkey"))
        .groupBy(F.shiftright(F.col("zkey"), CELL_SHIFT).alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.round(F.min("o_totalprice"), 2).cast("double").alias("min_price"),
            F.round(F.max("o_totalprice"), 2).cast("double").alias("max_price"),
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
# Hilbert cells over the same (customer, price) plane: the
# better-locality layout (every curve step is Manhattan-adjacent, so
# cell envelopes avoid Morton's quadrant-jump stretch). Same plan
# shape as the Z-order query — 1-row bounds broadcast, pure-codegen
# key, one bounded groupBy — so the two layouts are directly
# comparable cell for cell.
# ---------------------------------------------------------------------------
from etl_pipeline_project_auraverse_spark.operators.zorder import (  # noqa: E402
    hilbert_key,
    sql_hilbert_levels,
)

HBITS = 8


@register(
    "q_hilbert_order_cells",
    oracle=f"""
    WITH s AS (
        SELECT MIN(o_custkey) AS mnc, MAX(o_custkey) AS mxc,
               MIN(o_totalprice) AS mnp, MAX(o_totalprice) AS mxp
        FROM orders
    )
    SELECT hkey >> {CELL_SHIFT} AS cell,
           COUNT(*) AS n_orders,
           MIN(o_custkey) AS min_custkey,
           MAX(o_custkey) AS max_custkey,
           CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE) AS min_price,
           CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) AS max_price
    FROM {sql_hilbert_levels(
        f'''SELECT o_custkey, o_totalprice,
               CAST(FLOOR((o_custkey - mnc) * 256.0 / (mxc - mnc + 1.0))
                    AS BIGINT) AS hx0,
               CAST(FLOOR((o_totalprice - mnp) * 256.0 / (mxp - mnp + 1.0))
                    AS BIGINT) AS hy0
        FROM orders, s''',
        ["o_custkey", "o_totalprice"],
        HBITS,
    )}
    GROUP BY cell
    ORDER BY cell
    """,
)
def q_hilbert_order_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert cells over (o_custkey, o_totalprice): per-cell count and
    min/max envelope, directly comparable to q_zorder_order_cells."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_custkey").alias("mnc"),
        F.max("o_custkey").alias("mxc"),
        F.min("o_totalprice").alias("mnp"),
        F.max("o_totalprice").alias("mxp"),
    )
    xq = quantize(F.col("o_custkey"), F.col("mnc"), F.col("mxc"), HBITS)
    yq = quantize(F.col("o_totalprice"), F.col("mnp"), F.col("mxp"), HBITS)
    keyed = hilbert_key(
        orders.crossJoin(F.broadcast(stats)).select(
            "o_custkey", "o_totalprice", xq.alias("xq"), yq.alias("yq")
        ),
        F.col("xq"),
        F.col("yq"),
        HBITS,
    )
    return (
        keyed.groupBy(F.shiftright(F.col("hkey"), CELL_SHIFT).alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.round(F.min("o_totalprice"), 2).cast("double").alias("min_price"),
            F.round(F.max("o_totalprice"), 2).cast("double").alias("max_price"),
        )
        .orderBy("cell")
    )
