"""Schema-profiling queries — the engine's re-expression of the
reference's ``generate_schema`` aggregates (etl_pipeline.py:246-276):
per column, a majority-vote inferred type over the reference's
``infer_type`` regex classes (etl_pipeline.py:228-244), nullability,
distinct counts, primary-key candidacy (etl_pipeline.py:272-275),
modal-value confidence (etl_pipeline.py:262-263) and deterministic
example values (reference line 261, made deterministic = 3 smallest).

Shape: unpivot the table to (col_name, canonical_string) →
groupBy(col_name, value).count() → one aggregate per column. Two
shuffles total for the whole table profile, independent of column
count. At 100 TB the exact distinct/modal counts would switch to
``approx_count_distinct`` + count-min sketches (same query shape);
exact math is kept here because the driver gate diffs values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.session import load_table

# infer_type classes, reference etl_pipeline.py:228-244 (anchored like the
# original; written with explicit classes so Java regex and RE2 agree)
INT_RE = "^[0-9]+$"
FLOAT_RE = r"^[0-9]*\.[0-9]+$"
DATE_RE = "^[0-9]{4}-[0-9]{2}-[0-9]{2}"

# canonical stringification per physical type, identical in both engines
_SPARK_CANON = {
    "int": "CAST({c} AS STRING)",
    "double": "CAST(CAST(ROUND({c}, 2) AS DECIMAL(18,2)) AS STRING)",
    "ts": "date_format({c}, 'yyyy-MM-dd HH:mm:ss')",
    "str": "{c}",
}
_SQL_CANON = {
    "int": "CAST({c} AS VARCHAR)",
    "double": "CAST(CAST(ROUND({c}, 2) AS DECIMAL(18,2)) AS VARCHAR)",
    "ts": "strftime({c}, '%Y-%m-%d %H:%M:%S')",
    "str": "{c}",
}


def _profile_spark(table: str, cols: list[tuple[str, str]]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load_table(spark, sf_dir, table)
        stack = ", ".join(
            f"'{name}', {_SPARK_CANON[kind].format(c=name)}" for name, kind in cols
        )
        vals = df.selectExpr(f"stack({len(cols)}, {stack}) AS (col_name, v)")
        vc = vals.groupBy("col_name", "v").agg(F.count("*").alias("cnt"))

        v, cnt = F.col("v"), F.col("cnt")
        # examples = 3 smallest distinct values, via SALTED two-level
        # aggregation (guide §2.5): the old plan clustered the whole
        # distinct-value table by col_name alone — |columns| single-task
        # sort/aggregate funnels doing all the regex classification and
        # the example ranking at parallelism 6. Salting the value layer
        # by hash(v) keeps every per-value computation (type-class
        # regexes, per-salt top-3 window, partial sums) |columns|×SALT
        # wide; the final merge aggregates |columns|×SALT tiny partial
        # rows. Ranking per (col, salt) and collecting only rank ≤ 3
        # still bounds every aggregation buffer at 3 elements (the
        # 100-TB contract the old window enforced); the global 3
        # smallest are exactly the 3 smallest of the per-salt top-3
        # union because salts partition the distinct values.
        N_SALT = 32
        vc = vc.withColumn("__salt", F.pmod(F.xxhash64("v"), F.lit(N_SALT)))
        w_ex = Window.partitionBy("col_name", "__salt").orderBy(
            F.col("v").asc_nulls_last()
        )
        vc = vc.withColumn("__rn", F.row_number().over(w_ex))
        example_of = F.when((F.col("__rn") <= 3) & v.isNotNull(), v)
        nn = lambda expr: F.sum(F.when(expr, cnt).otherwise(0))  # noqa: E731
        part = vc.groupBy("col_name", "__salt").agg(
            F.sum(cnt).alias("p_rows"),
            nn(v.isNull()).alias("p_nulls"),
            F.count(F.when(v.isNotNull(), 1)).alias("p_distinct"),
            nn(v.isNotNull()).alias("p_nn"),
            nn(v.rlike(INT_RE)).alias("p_i"),
            nn(v.rlike(FLOAT_RE)).alias("p_f"),
            nn(F.lower(v).isin("true", "false")).alias("p_b"),
            nn(v.rlike(DATE_RE)).alias("p_d"),
            F.max(F.when(v.isNotNull(), cnt)).alias("p_maxcnt"),
            F.array_sort(F.collect_list(example_of)).alias("p_ex"),
        )
        n_nonnull = F.sum("p_nn")
        n_str = (
            n_nonnull
            - F.sum("p_i") - F.sum("p_f") - F.sum("p_b") - F.sum("p_d")
        )
        prof = part.groupBy("col_name").agg(
            F.sum("p_rows").cast("long").alias("n_rows"),
            F.sum("p_nulls").cast("long").alias("n_nulls"),
            F.sum("p_distinct").cast("long").alias("n_distinct"),
            n_nonnull.cast("long").alias("_nn"),
            F.sum("p_i").cast("long").alias("_i"),
            F.sum("p_f").cast("long").alias("_f"),
            F.sum("p_b").cast("long").alias("_b"),
            F.sum("p_d").cast("long").alias("_d"),
            n_str.cast("long").alias("_s"),
            F.round(F.max("p_maxcnt") * 1.0 / n_nonnull, 6)
            .cast("double")
            .alias("confidence"),
            F.concat_ws(
                ",",
                F.slice(
                    F.array_sort(F.flatten(F.collect_list("p_ex"))), 1, 3
                ),
            ).alias("examples"),
        )
        i, f_, b, d, s = (F.col(c) for c in ["_i", "_f", "_b", "_d", "_s"])
        inferred = (
            F.when(F.col("_nn") == 0, "string")
            .when((i >= f_) & (i >= b) & (i >= d) & (i >= s), "integer")
            .when((f_ >= b) & (f_ >= d) & (f_ >= s), "float")
            .when((b >= d) & (b >= s), "boolean")
            .when(d >= s, "date")
            .otherwise("string")
        )
        return (
            prof.select(
                "col_name",
                "n_rows",
                "n_nulls",
                "n_distinct",
                inferred.alias("inferred_type"),
                (F.col("n_nulls") > 0).alias("nullable"),
                ((F.col("n_nulls") == 0) & (F.col("n_distinct") == F.col("n_rows"))).alias(
                    "pk_candidate"
                ),
                "confidence",
                "examples",
            )
            .orderBy("col_name")
        )

    return fn


def _profile_sql(table: str, cols: list[tuple[str, str]]) -> str:
    unions = "\n        UNION ALL ".join(
        f"SELECT '{name}' AS col_name, {_SQL_CANON[kind].format(c=name)} AS v FROM {table}"
        for name, kind in cols
    )
    cls = {
        "i": f"regexp_matches(v, '{INT_RE}')",
        "f": rf"regexp_matches(v, '{FLOAT_RE}')",
        "b": "lower(v) IN ('true', 'false')",
        "d": f"regexp_matches(v, '{DATE_RE}')",
    }
    nn = lambda cond: f"COALESCE(SUM(cnt) FILTER (WHERE v IS NOT NULL AND {cond}), 0)"  # noqa: E731
    return f"""
    WITH vals AS (
        {unions}
    ),
    vc AS (SELECT col_name, v, COUNT(*) AS cnt FROM vals GROUP BY col_name, v),
    agg AS (
        SELECT col_name,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(cnt) FILTER (WHERE v IS NULL), 0) AS BIGINT) AS n_nulls,
               CAST(COUNT(*) FILTER (WHERE v IS NOT NULL) AS BIGINT) AS n_distinct,
               CAST(COALESCE(SUM(cnt) FILTER (WHERE v IS NOT NULL), 0) AS BIGINT) AS nn,
               CAST({nn(cls["i"])} AS BIGINT) AS n_i,
               CAST({nn(cls["f"])} AS BIGINT) AS n_f,
               CAST({nn(cls["b"])} AS BIGINT) AS n_b,
               CAST({nn(cls["d"])} AS BIGINT) AS n_d,
               CAST(ROUND(MAX(cnt) FILTER (WHERE v IS NOT NULL) * 1.0
                    / SUM(cnt) FILTER (WHERE v IS NOT NULL), 6) AS DOUBLE) AS confidence,
               array_to_string(list_sort(list(v) FILTER (WHERE v IS NOT NULL))[1:3], ',')
                   AS examples
        FROM vc GROUP BY col_name
    )
    SELECT col_name, n_rows, n_nulls, n_distinct,
           CASE WHEN nn = 0 THEN 'string'
                WHEN n_i >= n_f AND n_i >= n_b AND n_i >= n_d
                     AND n_i >= nn - n_i - n_f - n_b - n_d THEN 'integer'
                WHEN n_f >= n_b AND n_f >= n_d
                     AND n_f >= nn - n_i - n_f - n_b - n_d THEN 'float'
                WHEN n_b >= n_d AND n_b >= nn - n_i - n_f - n_b - n_d THEN 'boolean'
                WHEN n_d >= nn - n_i - n_f - n_b - n_d THEN 'date'
                ELSE 'string' END AS inferred_type,
           n_nulls > 0 AS nullable,
           (n_nulls = 0 AND n_distinct = n_rows) AS pk_candidate,
           confidence, examples
    FROM agg
    ORDER BY col_name
    """


ORDERS_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "double"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]

DOCUMENTS_COLS = [
    ("doc_id", "int"),
    ("text", "str"),
    ("lang", "str"),
    ("source", "str"),
    ("n_chars", "int"),
]

register("q_profile_orders_schema", oracle=_profile_sql("orders", ORDERS_COLS))(
    _profile_spark("orders", ORDERS_COLS)
)
register("q_profile_documents_schema", oracle=_profile_sql("documents", DOCUMENTS_COLS))(
    _profile_spark("documents", DOCUMENTS_COLS)
)


# ---------------------------------------------------------------------------
# Join-key skew audit: the diagnostic you run BEFORE shuffling a big
# join on a key. Per-key counts in one aggregate, heaviest keys via
# the two-level shard rank, and the whole-table skew posture
# (max/mean ratio) broadcast onto each row from a 1-row stats
# aggregate. At 100 TB this is the query that decides between a plain
# shuffle join, AQE skew splitting, and explicit salting.
# ---------------------------------------------------------------------------
SKEW_TOP_K = 10


@register(
    "q_join_skew_audit_custkey",
    oracle=f"""
    WITH counts AS (
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    stats AS (
        SELECT CAST(SUM(n_orders) AS BIGINT) AS total,
               COUNT(*) AS n_keys,
               CAST(MAX(n_orders) AS BIGINT) AS max_cnt
        FROM counts
    )
    SELECT CAST(rank AS BIGINT) AS rank, o_custkey, n_orders,
           CAST(FLOOR(n_orders * 1e0 / total * 1e6 + 0.5) AS BIGINT)
               AS share_ppm,
           n_keys,
           CAST(FLOOR(max_cnt * 1e0 * n_keys / total * 1e6 + 0.5) / 1e6
                AS DOUBLE) AS skew_ratio
    FROM (
        SELECT o_custkey, n_orders,
               ROW_NUMBER() OVER (ORDER BY n_orders DESC, o_custkey) AS rank
        FROM counts
    ) CROSS JOIN stats
    WHERE rank <= {SKEW_TOP_K}
    ORDER BY rank
    """,
)
def q_join_skew_audit_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution audit for joins on o_custkey: heaviest keys
    (count + parts-per-million share) and the table-wide max/mean skew
    ratio. One groupBy, a 1-row broadcast stats aggregate, and a
    two-level top-k — no full sort, no second scan."""
    from etl_pipeline_project_auraverse_spark.queries._util import two_level_rank

    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    stats = counts.agg(
        F.sum("n_orders").cast("long").alias("total"),
        F.count("*").alias("n_keys"),
        F.max("n_orders").cast("long").alias("max_cnt"),
    )
    top = two_level_rank(counts, "n_orders", "o_custkey", SKEW_TOP_K, "rank")
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            "rank",
            "o_custkey",
            "n_orders",
            F.floor(
                F.col("n_orders") * F.lit(1.0) / F.col("total") * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("share_ppm"),
            "n_keys",
            (
                F.floor(
                    F.col("max_cnt") * F.lit(1.0) * F.col("n_keys")
                    / F.col("total")
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            )
            .cast("double")
            .alias("skew_ratio"),
        )
        .orderBy("rank")
    )
