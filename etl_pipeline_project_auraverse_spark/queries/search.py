"""Keyword + hybrid search: BM25-ranked retrieval over the documents
table — the classic lexical search primitive (Lucene/Elasticsearch
scoring) — plus reciprocal-rank fusion with an embedding-cosine arm
(the standard hybrid-retrieval recipe for RAG pipelines) and a
label-relevance NDCG@k evaluation of the semantic ranking.

Determinism: tf/df/N/dl are exact integers; avgdl is a decimal
average; idf and each per-term score are rounded before the (decimal)
sum over query terms, so ranking order is bit-identical across
engines. RRF contributions and NDCG gain terms go through the
``FLOOR(x * 1e6 + 0.5)`` integer-micro-unit idiom (pure IEEE double
arithmetic — no ROUND half-tie split between engines). Every top-k
uses the two-level shard rank (local top-k per shard, global rank over
<= k * SHARDS survivors) so no task ever sorts the full match set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_pipeline_project_auraverse_spark.functions.text import n_words
from etl_pipeline_project_auraverse_spark.functions.vectors import cosine, sql_cosine
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.queries._util import (
    parallelize,
    two_level_rank,
)
from etl_pipeline_project_auraverse_spark.session import load_table

BM25_TERMS = ["scan", "window", "hash"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 15
BM25_SHARDS = 16

RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_POOL = 30  # candidates taken from each arm before fusion
RRF_TOP_K = 15
HYBRID_QUERY_VEC = 0  # the fixed semantic query: embedding of vec_id 0

NDCG_K = 10
NDCG_N_QUERY = 5  # evaluation query set: vec_id < 5 (matches kNN suite)

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

# Shared BM25 scoring CTE chain (docs -> per-doc score), reused by the
# plain BM25 ranker and the hybrid-RRF lexical arm.
_BM25_SCORED_CTES = rf"""
    dl AS (
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
    )"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BM25 score for the fixed term set: exact integer
    tf/df/N, decimal avgdl, per-term rounding before the decimal sum
    (bit-identical ranking across engines)."""
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
    return (
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


def _two_level_rank(
    scored: DataFrame, order_col: str, id_col: str, pool: int, out_rank: str
) -> DataFrame:
    """Search-family face of :func:`_util.two_level_rank` pinned to
    BM25_SHARDS."""
    return two_level_rank(scored, order_col, id_col, pool, out_rank, BM25_SHARDS)


@register(
    "q_bm25_search",
    oracle=rf"""
    WITH {_BM25_SCORED_CTES}
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
    return (
        _two_level_rank(
            _bm25_scored(spark, sf_dir), "score", "doc_id", BM25_TOP_K, "rank"
        )
        .select("rank", "doc_id", "n_terms_matched", "score")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 lexical arm + embedding-cosine semantic arm,
# fused by reciprocal-rank fusion (score = sum over arms of
# 1 / (RRF_K + rank), the Cormack/Clarke/Buettcher recipe). Each arm
# produces its top-RRF_POOL via the two-level shard rank; the fuse is a
# full-outer join of two <= POOL-row tables, so the final sort input is
# bounded by 2 * POOL regardless of corpus size. The semantic arm scans
# the embedding table once against a broadcast 1-row query vector.
# ---------------------------------------------------------------------------
@register(
    "q_hybrid_search_rrf",
    oracle=rf"""
    WITH {_BM25_SCORED_CTES},
    lex AS (
        SELECT doc_id, CAST(rank_lex AS BIGINT) AS rank_lex FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank_lex
            FROM scored
        ) WHERE rank_lex <= {RRF_POOL}
    ),
    sem_scored AS (
        SELECT c.vec_id AS doc_id,
               {sql_cosine("q.embedding", "c.embedding")} AS cos_sim
        FROM embeddings c
        CROSS JOIN (SELECT embedding FROM embeddings
                    WHERE vec_id = {HYBRID_QUERY_VEC}) q
        WHERE c.vec_id <> {HYBRID_QUERY_VEC}
    ),
    sem AS (
        SELECT doc_id, CAST(rank_sem AS BIGINT) AS rank_sem FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rank_sem
            FROM sem_scored
        ) WHERE rank_sem <= {RRF_POOL}
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
               l.rank_lex, s.rank_sem,
               CAST(FLOOR((COALESCE(1e0 / ({RRF_K} + l.rank_lex), 0e0)
                         + COALESCE(1e0 / ({RRF_K} + s.rank_sem), 0e0))
                          * 1e6 + 0.5) / 1e6 AS DOUBLE) AS rrf_score
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    )
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, rank_lex, rank_sem, rrf_score
    FROM (
        SELECT doc_id, rank_lex, rank_sem, rrf_score,
               ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fused
    ) WHERE rank <= {RRF_TOP_K}
    ORDER BY rank
    """,
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: RRF fusion of the BM25 top-30 and the
    embedding-cosine top-30 (query = vec_id 0, vec_id == doc_id by the
    data dictionary). The at-scale shape: each arm is already bounded
    by the two-level shard rank, the semantic scan is one pass against
    a broadcast query vector, and the fuse sorts <= 2 * POOL rows."""
    lex = _two_level_rank(
        _bm25_scored(spark, sf_dir), "score", "doc_id", RRF_POOL, "rank_lex"
    ).select("doc_id", "rank_lex")

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == HYBRID_QUERY_VEC).select(
        F.col("embedding").alias("q_emb")
    )
    sem_scored = (
        emb.filter(F.col("vec_id") != HYBRID_QUERY_VEC)
        .select(F.col("vec_id").alias("doc_id"), "embedding")
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id", cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim")
        )
    )
    sem = _two_level_rank(sem_scored, "cos_sim", "doc_id", RRF_POOL, "rank_sem").select(
        "doc_id", "rank_sem"
    )

    contrib = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_lex")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_sem")), F.lit(0.0))
    fused = lex.join(sem, "doc_id", "full_outer").withColumn(
        "rrf_score",
        (F.floor(contrib * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("double"),
    )
    w = W.orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= RRF_TOP_K)
        .select("rank", "doc_id", "rank_lex", "rank_sem", "rrf_score")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Retrieval evaluation: NDCG@10 of the embedding-cosine ranking under
# label-match relevance (candidate relevant iff it carries the query's
# label) — the standard offline search-quality metric. Gain terms
# 1/log2(rank+1) go through integer micro-units (FLOOR idiom), so
# DCG/IDCG/NDCG are bit-identical across engines. Per-query ranking is
# a (query_id, shard)-partitioned local top-k then a query-partitioned
# rank over <= k * SHARDS survivors — both windows partitioned.
# ---------------------------------------------------------------------------
@register(
    "q_search_ndcg_labels",
    oracle=rf"""
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {sql_cosine("q.embedding", "c.embedding")} AS cos_sim,
               CAST(c.label = q.label AS INT) AS rel
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {NDCG_N_QUERY}
    ),
    ranked AS (
        SELECT query_id, rel,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, cand_id) AS rank
        FROM pairs
    ),
    dcg AS (
        SELECT query_id,
               SUM(CAST(FLOOR(rel * 1e0 / log2(rank + 1) * 1e6 + 0.5)
                        AS BIGINT)) AS dcg_micro
        FROM ranked WHERE rank <= {NDCG_K} GROUP BY query_id
    ),
    nrel AS (
        SELECT query_id, CAST(SUM(rel) AS BIGINT) AS n_rel_total
        FROM pairs GROUP BY query_id
    ),
    ideal AS (
        SELECT query_id,
               unnest(generate_series(1,
                   CAST(LEAST(GREATEST(n_rel_total, 1), {NDCG_K}) AS BIGINT)))
                   AS i
        FROM nrel
    ),
    idcg AS (
        SELECT query_id,
               SUM(CAST(FLOOR(1e0 / log2(i + 1) * 1e6 + 0.5) AS BIGINT))
                   AS idcg_micro
        FROM ideal GROUP BY query_id
    )
    SELECT n.query_id, n.n_rel_total,
           CAST(d.dcg_micro / 1e6 AS DOUBLE) AS dcg10,
           CAST(i.idcg_micro / 1e6 AS DOUBLE) AS idcg10,
           CAST(FLOOR(d.dcg_micro * 1e0 / i.idcg_micro * 1e6 + 0.5) / 1e6
                AS DOUBLE) AS ndcg10
    FROM nrel n JOIN dcg d USING (query_id) JOIN idcg i USING (query_id)
    ORDER BY n.query_id
    """,
)
def q_search_ndcg_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of brute-force cosine retrieval, relevance = label match
    (5 fixed queries, same query set as the kNN suite). IDCG comes from
    the per-query relevant-count via an exploded integer sequence — no
    driver-side state, no unpartitioned window."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < NDCG_N_QUERY).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("label").alias("q_label"),
        )
    )
    pairs = (
        emb.select(
            F.col("vec_id").alias("cand_id"), "embedding", "label"
        )
        .join(q, F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
            (F.col("label") == F.col("q_label")).cast("int").alias("rel"),
        )
    )

    # two-level per-query rank: bounded local sorts, bounded survivors
    w_local = W.partitionBy("query_id", "__shard").orderBy(
        F.col("cos_sim").desc(), "cand_id"
    )
    w_query = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "cand_id")
    ranked = (
        pairs.withColumn("__shard", F.col("cand_id") % BM25_SHARDS)
        .withColumn("__lrn", F.row_number().over(w_local))
        .filter(F.col("__lrn") <= NDCG_K)
        .withColumn("rank", F.row_number().over(w_query))
        .filter(F.col("rank") <= NDCG_K)
    )
    dcg = ranked.groupBy("query_id").agg(
        F.sum(
            F.floor(
                F.col("rel") * F.lit(1.0) / F.log2(F.col("rank") + 1)
                * F.lit(1e6)
                + F.lit(0.5)
            )
        ).alias("dcg_micro")
    )

    nrel = pairs.groupBy("query_id").agg(
        F.sum("rel").cast("long").alias("n_rel_total")
    )
    idcg = nrel.select(
        "query_id",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.greatest(F.col("n_rel_total"), F.lit(1)), F.lit(NDCG_K))
                .cast("int"),
            )
        ).alias("i"),
    ).groupBy("query_id").agg(
        F.sum(
            F.floor(F.lit(1.0) / F.log2(F.col("i") + 1) * F.lit(1e6) + F.lit(0.5))
        ).alias("idcg_micro")
    )

    return (
        nrel.join(dcg, "query_id")
        .join(idcg, "query_id")
        .select(
            "query_id",
            "n_rel_total",
            (F.col("dcg_micro") / F.lit(1e6)).cast("double").alias("dcg10"),
            (F.col("idcg_micro") / F.lit(1e6)).cast("double").alias("idcg10"),
            (
                F.floor(
                    F.col("dcg_micro") * F.lit(1.0) / F.col("idcg_micro")
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            )
            .cast("double")
            .alias("ndcg10"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Positional phrase search: the inverted-index phrase-match primitive.
# Token positions come from one posexplode pass; the phrase is an
# EQUI-join of the two terms' posting lists on (doc_id, position+1) —
# the classic positional-postings intersection, never a text rescan or
# a nested-loop. Ranking by hit count uses the two-level shard rank.
# ---------------------------------------------------------------------------
PHRASE = ("hash", "join")
PHRASE_TOP_K = 20


@register(
    "q_phrase_search_positional",
    oracle=rf"""
    WITH s AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents
    ),
    idx AS (
        SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
        FROM s
    ),
    p1 AS (SELECT doc_id, i FROM idx WHERE w = '{PHRASE[0]}'),
    p2 AS (SELECT doc_id, i FROM idx WHERE w = '{PHRASE[1]}'),
    hits AS (
        SELECT p1.doc_id, p1.i
        FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.i = p1.i + 1
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_hits, CAST(MIN(i) AS BIGINT) AS first_pos
        FROM hits GROUP BY doc_id
    )
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_hits, first_pos
    FROM (
        SELECT doc_id, n_hits, first_pos,
               ROW_NUMBER() OVER (ORDER BY n_hits DESC, doc_id) AS rank
        FROM agg
    ) WHERE rank <= {PHRASE_TOP_K}
    ORDER BY rank
    """,
)
def q_phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase match ("hash join") via positional posting lists:
    filter each term's postings, equi-join on (doc_id, adjacent
    position), rank docs by phrase frequency. Positions are 1-based to
    match the oracle's generate_subscripts."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "w"),
    )
    # p1 carries the 1-based position i of the FIRST phrase token; the
    # second token matches when its 0-based pos equals that i.
    p1 = toks.filter(F.col("w") == PHRASE[0]).select(
        "doc_id", (F.col("pos") + 1).alias("i")
    )
    p2 = toks.filter(F.col("w") == PHRASE[1]).select(
        "doc_id", F.col("pos").alias("i")
    )
    agg = (
        p1.join(p2, ["doc_id", "i"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.min("i").cast("long").alias("first_pos"),
        )
    )
    return (
        _two_level_rank(agg, "n_hits", "doc_id", PHRASE_TOP_K, "rank")
        .select("rank", "doc_id", "n_hits", "first_pos")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# MRR@k: mean-reciprocal-rank of the first relevant hit — the sibling
# offline metric to NDCG@k (above), standard for known-item search and
# retrieval-augmented-generation recall tuning. Same fixed query set
# and label-match relevance as the NDCG query; same two-level shard
# rank so no task sorts the full candidate set; reciprocal ranks go
# through the FLOOR(x*1e6+0.5) integer-micro idiom. A query with no
# relevant candidate in the top k scores rr = 0 (first_rel_rank = 0
# sentinel), emitted unconditionally via a left join against the
# query list so both engines always produce NDCG_N_QUERY rows.
# ---------------------------------------------------------------------------
MRR_K = 10

_MRR_ORACLE = rf"""
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {sql_cosine("q.embedding", "c.embedding")} AS cos_sim,
               CAST(c.label = q.label AS INT) AS rel
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {NDCG_N_QUERY}
    ),
    ranked AS (
        SELECT query_id, rel,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, cand_id) AS rank
        FROM pairs
    ),
    first_rel AS (
        SELECT query_id, MIN(rank) AS first_rel_rank
        FROM ranked WHERE rel = 1 AND rank <= {MRR_K}
        GROUP BY query_id
    ),
    qs AS (SELECT DISTINCT query_id FROM pairs)
    SELECT qs.query_id,
           CAST(COALESCE(f.first_rel_rank, 0) AS BIGINT) AS first_rel_rank,
           CAST(CASE WHEN f.first_rel_rank IS NULL THEN 0.0
                     ELSE FLOOR(1e0 / f.first_rel_rank * 1e6 + 0.5) / 1e6
                END AS DOUBLE) AS rr
    FROM qs LEFT JOIN first_rel f USING (query_id)
    ORDER BY qs.query_id
"""


@register("q_mrr_search_eval", oracle=_MRR_ORACLE)
def q_mrr_search_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the first label-relevant candidate within the
    top MRR_K cosine hits, per fixed query (0 when none lands in k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < NDCG_N_QUERY).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("label").alias("q_label"),
        )
    )
    pairs = (
        emb.select(F.col("vec_id").alias("cand_id"), "embedding", "label")
        .join(q, F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
            (F.col("label") == F.col("q_label")).cast("int").alias("rel"),
        )
    )
    w_local = W.partitionBy("query_id", "__shard").orderBy(
        F.col("cos_sim").desc(), "cand_id"
    )
    w_query = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "cand_id"
    )
    first_rel = (
        pairs.withColumn("__shard", F.col("cand_id") % BM25_SHARDS)
        .withColumn("__lrn", F.row_number().over(w_local))
        .filter(F.col("__lrn") <= MRR_K)
        .withColumn("rank", F.row_number().over(w_query))
        .filter((F.col("rank") <= MRR_K) & (F.col("rel") == 1))
        .groupBy("query_id")
        .agg(F.min("rank").alias("first_rel_rank"))
    )
    qs = q.select("query_id")
    return (
        qs.join(first_rel, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("first_rel_rank", F.lit(0)).cast("long")
            .alias("first_rel_rank"),
            F.when(F.col("first_rel_rank").isNull(), F.lit(0.0))
            .otherwise(
                F.floor(
                    F.lit(1.0) / F.col("first_rel_rank") * F.lit(1e6) + F.lit(0.5)
                )
                / F.lit(1e6)
            )
            .cast("double")
            .alias("rr"),
        )
        .orderBy("query_id")
    )
