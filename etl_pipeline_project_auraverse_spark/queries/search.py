"""Keyword search: BM25-ranked retrieval over the documents table —
the classic lexical search primitive (Lucene/Elasticsearch scoring)
expressed as three exact count aggregates plus rounded float math.

Determinism: tf/df/N/dl are exact integers; avgdl is a decimal
average; idf and each per-term score are rounded before the (decimal)
sum over query terms, so ranking order is bit-identical across
engines. The final top-k uses the two-level shard rank (local top-k
per shard, global rank over <= k * SHARDS survivors) so no task ever
sorts the full match set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_pipeline_project_auraverse_spark.functions.text import n_words
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.queries._util import parallelize
from etl_pipeline_project_auraverse_spark.session import load_table

BM25_TERMS = ["scan", "window", "hash"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 15
BM25_SHARDS = 16

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


@register(
    "q_bm25_search",
    oracle=rf"""
    WITH dl AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS dl
        FROM documents
    ),
    toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents
    ),
    tf AS (
        SELECT doc_id, w, COUNT(*) AS tf FROM toks
        WHERE w IN ({_TERMS_SQL}) GROUP BY doc_id, w
    ),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    stats AS (
        SELECT COUNT(*) AS n,
               CAST(ROUND(CAST(SUM(CAST(dl AS DECIMAL(25,6))) AS DOUBLE)
                    / COUNT(*), 6) AS DOUBLE) AS avgdl
        FROM dl
    ),
    terms AS (
        SELECT t.doc_id, t.w,
               ROUND(ROUND(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0), 6)
                     * t.tf * ({BM25_K1} + 1.0)
                     / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                        + {BM25_B} * l.dl / s.avgdl)), 6) AS term_score
        FROM tf t
        JOIN dfreq d USING (w)
        JOIN dl l USING (doc_id)
        CROSS JOIN stats s
    ),
    scored AS (
        SELECT doc_id,
               COUNT(*) AS n_terms_matched,
               CAST(ROUND(SUM(CAST(term_score AS DECIMAL(25,6))), 4) AS DOUBLE)
                   AS score
        FROM terms GROUP BY doc_id
    )
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_terms_matched, score
    FROM (
        SELECT doc_id, n_terms_matched, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= {BM25_TOP_K}
    ORDER BY rank
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k for a fixed keyword query: exact tf/df/length
    statistics, Lucene-style positive idf, two-level shard ranking."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    dl = docs.select("doc_id", n_words(F.col("text")).alias("dl"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    tf = (
        toks.filter(F.col("w").isin(BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("dl").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        )
        .cast("double")
        .alias("avgdl"),
    )
    idf = F.round(
        F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0), 6
    )
    term_score = F.round(
        idf
        * F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1
            * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.round(F.sum(F.col("term_score").cast("decimal(25,6)")), 4)
            .cast("double")
            .alias("score"),
        )
    )
    w_local = W.partitionBy("__shard").orderBy(F.col("score").desc(), "doc_id")
    w_global = W.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("__shard", F.col("doc_id") % BM25_SHARDS)
        .withColumn("__lrn", F.row_number().over(w_local))
        .filter(F.col("__lrn") <= BM25_TOP_K)
        .withColumn("rank", F.row_number().over(w_global).cast("long"))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("rank", "doc_id", "n_terms_matched", "score")
        .orderBy("rank")
    )
