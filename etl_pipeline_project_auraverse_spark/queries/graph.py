"""Graph analytics over the star schema: weighted PageRank on the
part co-purchase graph, in EXACT scaled-integer arithmetic.

Iterative numeric algorithms are normally impossible to oracle-check
bit-for-bit across engines (double accumulation order differs), so
ranks are fixed-point integers: r0 = 10^9 per node, and one iteration
is

    r'(v) = 150_000_000 + (85 * SUM_u floor(r(u) * w(u,v) / wsum(u))) div 100

— the damped (d = 0.85) weighted PageRank update with every operation
on BIGINTs (floor division on positive values is identical in Spark
``div`` and DuckDB ``//``), so three unrolled iterations are
bit-identical across engines with no rounding contract at all.

Scale shape: the co-purchase edge build reuses the basket pattern
(one groupBy -> per-order sorted part array -> map-side pair explode,
capped baskets); the per-node weight table joins once into an edge
table that is INVARIANT across iterations; each iteration is then one
equi-join + one groupBy on (part) keys. Lineage depth is 3 (unrolled),
so no checkpointing is needed; a 50-iteration variant would
localCheckpoint per round like operators/components.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.cache import persist_tracked
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.queries.extended import (
    BASKET_CAP,
    MIN_PAIR_SUPPORT,
)
from etl_pipeline_project_auraverse_spark.session import load_table

PR_R0 = 1_000_000_000
PR_TELEPORT = 150_000_000  # (1 - d) * R0 with d = 0.85
PR_ITERS = 3
PR_TOP = 20


def _pr_oracle() -> str:
    iters = ""
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        iters += f""",
    r{i} AS (
        SELECT en.v AS u,
               {PR_TELEPORT} + 85 * SUM((p.r * en.w) // en.wsum) // 100 AS r
        FROM en JOIN {prev} p ON en.u = p.u
        GROUP BY en.v
    )"""
        prev = f"r{i}"
    return f"""
    WITH basket AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    ok_orders AS (
        SELECT l_orderkey FROM basket
        GROUP BY l_orderkey HAVING COUNT(*) <= {BASKET_CAP}
    ),
    b AS (SELECT basket.* FROM basket JOIN ok_orders USING (l_orderkey)),
    pairs AS (
        SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
               COUNT(*) AS w
        FROM b x JOIN b y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        GROUP BY part_a, part_b
        HAVING COUNT(*) >= {MIN_PAIR_SUPPORT}
    ),
    edges AS (
        SELECT part_a AS u, part_b AS v, w FROM pairs
        UNION ALL
        SELECT part_b AS u, part_a AS v, w FROM pairs
    ),
    wdeg AS (SELECT u, SUM(w) AS wsum FROM edges GROUP BY u),
    en AS (SELECT e.u, e.v, e.w, d.wsum FROM edges e JOIN wdeg d USING (u)),
    r0 AS (SELECT u, CAST({PR_R0} AS BIGINT) AS r FROM wdeg){iters}
    SELECT u AS part, CAST(r AS BIGINT) AS rank
    FROM {prev}
    ORDER BY r DESC, part
    LIMIT {PR_TOP}
    """


@register("q_pagerank_copurchase", oracle=_pr_oracle())
def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top parts by weighted PageRank over the co-purchase graph —
    'centrality' ranking rather than raw co-occurrence counts (a part
    bridging many popular baskets outranks one repeated in a clique).
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= BASKET_CAP)
    )
    lhs = baskets.select("parts", F.posexplode("parts").alias("i", "part_a"))
    pairs = (
        lhs.select(
            "part_a",
            F.explode(
                F.expr("slice(parts, i + 2, size(parts) - i - 1)")
            ).alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= MIN_PAIR_SUPPORT)
    )
    edges = pairs.select(
        F.col("part_a").alias("u"), F.col("part_b").alias("v"), "w"
    ).unionByName(
        pairs.select(F.col("part_b").alias("u"), F.col("part_a").alias("v"), "w")
    )
    wdeg = edges.groupBy("u").agg(F.sum("w").alias("wsum"))
    # the normalized edge table never changes between iterations
    en = persist_tracked(edges.join(wdeg, "u").select("u", "v", "w", "wsum"))
    ranks = wdeg.select("u", F.lit(PR_R0).cast("long").alias("r"))
    for _ in range(PR_ITERS):
        ranks = (
            en.join(ranks, "u")
            .groupBy("v")
            .agg(F.sum(F.expr("(r * w) div wsum")).alias("s"))
            .select(
                F.col("v").alias("u"),
                F.expr(f"{PR_TELEPORT} + (85 * s) div 100").alias("r"),
            )
        )
    return (
        ranks.select(F.col("u").alias("part"), F.col("r").cast("long").alias("rank"))
        .orderBy(F.col("rank").desc(), "part")
        .limit(PR_TOP)
    )
