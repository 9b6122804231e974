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


# ---------------------------------------------------------------------------
# Layout pruning audit: the same orders table laid out three ways —
# custkey-major linear key, Morton (Z-order), Hilbert — cut into the
# same number of key-contiguous cells (files), then MEASURED: how many
# cells' min/max envelopes intersect (a) a 10%-wide price band and
# (b) a 10%-wide custkey band. This turns the "Z-order/Hilbert prune
# on EVERY clustered dimension, a linear sort only on its leading one"
# claim from the module docstrings into numbers the driver gate
# checks: the linear layout touches almost every cell for the price
# filter; the curves touch a bounded fraction for both.
#
# Scale shape: one scan + 1-row bounds broadcast, three pure-codegen
# key expressions over the same quantized pair, one groupBy on the
# bounded (layout, cell) key, then a 3-row rollup. The filter bands
# derive from the same broadcast bounds, so no second scan.
# ---------------------------------------------------------------------------
_BAND_LO, _BAND_HI = 0.45, 0.55  # central 10% band of each dimension


def _layout_compare_oracle() -> str:
    hilbert_src = f"""SELECT xq, yq, o_custkey, o_totalprice,
               xq AS hx0, yq AS hy0 FROM q"""
    return f"""
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
    hk AS (
        SELECT o_custkey, o_totalprice, xq, yq, hkey
        FROM {sql_hilbert_levels(hilbert_src, ["xq", "yq", "o_custkey", "o_totalprice"], ZBITS)}
    ),
    keyed AS (
        SELECT 'linear' AS layout, (xq * 256 + yq) >> {CELL_SHIFT} AS cell,
               o_custkey, o_totalprice FROM hk
        UNION ALL
        SELECT 'zorder', ({sql_zorder_key(["xq", "yq"], ZBITS)}) >> {CELL_SHIFT},
               o_custkey, o_totalprice FROM hk
        UNION ALL
        SELECT 'hilbert', hkey >> {CELL_SHIFT}, o_custkey, o_totalprice FROM hk
    ),
    cells AS (
        SELECT layout, cell,
               MIN(o_custkey) AS mn_c, MAX(o_custkey) AS mx_c,
               MIN(o_totalprice) AS mn_p, MAX(o_totalprice) AS mx_p
        FROM keyed GROUP BY layout, cell
    ),
    bands AS (
        SELECT mnc + {_BAND_LO} * (mxc - mnc) AS c_lo,
               mnc + {_BAND_HI} * (mxc - mnc) AS c_hi,
               mnp + {_BAND_LO} * (mxp - mnp) AS p_lo,
               mnp + {_BAND_HI} * (mxp - mnp) AS p_hi
        FROM s
    )
    SELECT layout,
           COUNT(*) AS n_cells,
           COUNT(CASE WHEN mx_p >= p_lo AND mn_p <= p_hi THEN 1 END)
               AS cells_hit_price,
           COUNT(CASE WHEN mx_c >= c_lo AND mn_c <= c_hi THEN 1 END)
               AS cells_hit_cust,
           CAST(ROUND(COUNT(CASE WHEN mx_p >= p_lo AND mn_p <= p_hi THEN 1 END)
                * 1.0 / COUNT(*), 6) AS DOUBLE) AS frac_price,
           CAST(ROUND(COUNT(CASE WHEN mx_c >= c_lo AND mn_c <= c_hi THEN 1 END)
                * 1.0 / COUNT(*), 6) AS DOUBLE) AS frac_cust
    FROM cells CROSS JOIN bands
    GROUP BY layout
    ORDER BY layout
    """


@register("q_layout_pruning_compare", oracle=_layout_compare_oracle())
def q_layout_pruning_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured scan-pruning power of linear vs Z-order vs Hilbert
    cells for a 10% price band and a 10% custkey band."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_custkey").alias("mnc"),
        F.max("o_custkey").alias("mxc"),
        F.min("o_totalprice").alias("mnp"),
        F.max("o_totalprice").alias("mxp"),
    )
    xq = quantize(F.col("o_custkey"), F.col("mnc"), F.col("mxc"), ZBITS)
    yq = quantize(F.col("o_totalprice"), F.col("mnp"), F.col("mxp"), ZBITS)
    base = hilbert_key(
        orders.crossJoin(F.broadcast(stats)).select(
            "o_custkey", "o_totalprice", xq.alias("xq"), yq.alias("yq")
        ),
        F.col("xq"),
        F.col("yq"),
        ZBITS,
    )
    zkey = zorder_key([F.col("xq"), F.col("yq")], ZBITS)
    linkey = F.col("xq") * 256 + F.col("yq")
    keyed = None
    for layout, key in [
        ("linear", linkey),
        ("zorder", zkey),
        ("hilbert", F.col("hkey")),
    ]:
        part = base.select(
            F.lit(layout).alias("layout"),
            F.shiftright(key.cast("long"), CELL_SHIFT).alias("cell"),
            "o_custkey",
            "o_totalprice",
        )
        keyed = part if keyed is None else keyed.unionByName(part)
    cells = keyed.groupBy("layout", "cell").agg(
        F.min("o_custkey").alias("mn_c"),
        F.max("o_custkey").alias("mx_c"),
        F.min("o_totalprice").alias("mn_p"),
        F.max("o_totalprice").alias("mx_p"),
    )
    bands = stats.select(
        (F.col("mnc") + _BAND_LO * (F.col("mxc") - F.col("mnc"))).alias("c_lo"),
        (F.col("mnc") + _BAND_HI * (F.col("mxc") - F.col("mnc"))).alias("c_hi"),
        (F.col("mnp") + _BAND_LO * (F.col("mxp") - F.col("mnp"))).alias("p_lo"),
        (F.col("mnp") + _BAND_HI * (F.col("mxp") - F.col("mnp"))).alias("p_hi"),
    )
    hit_p = (F.col("mx_p") >= F.col("p_lo")) & (F.col("mn_p") <= F.col("p_hi"))
    hit_c = (F.col("mx_c") >= F.col("c_lo")) & (F.col("mn_c") <= F.col("c_hi"))
    return (
        cells.crossJoin(F.broadcast(bands))
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.count(F.when(hit_p, F.lit(1))).alias("cells_hit_price"),
            F.count(F.when(hit_c, F.lit(1))).alias("cells_hit_cust"),
        )
        .select(
            "layout",
            "n_cells",
            "cells_hit_price",
            "cells_hit_cust",
            F.round(F.col("cells_hit_price") * 1.0 / F.col("n_cells"), 6)
            .cast("double")
            .alias("frac_price"),
            F.round(F.col("cells_hit_cust") * 1.0 / F.col("n_cells"), 6)
            .cast("double")
            .alias("frac_cust"),
        )
        .orderBy("layout")
    )
