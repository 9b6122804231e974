"""Similarity search over the `embeddings` table (array<float> vectors):
brute-force cosine top-k (baseline), sign-LSH bucketed ANN, IVF-style
label-partitioned ANN, and norm profiling — all pure Column expressions
(``F.zip_with``/``F.aggregate`` vector math, no UDFs) with DuckDB twins.

Scale design (100 TB posture):
- The query set is always the small side: Catalyst broadcasts it, so the
  corpus is scanned once with no shuffle (verified BroadcastNestedLoop /
  BroadcastHashJoin in the plans). Top-k per query is a window over the
  joined pairs — rank truncation prunes before any wide result.
- Brute force is the correctness baseline; the scale path is the LSH
  bucket equi-join (candidates bounded per bucket) or the IVF partition
  join (candidates bounded per centroid block). Both replace the
  all-pairs product with an equi-join on a compact key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_pipeline_project_auraverse_spark.functions.vectors import (
    cosine,
    lsh_signature,
    norm2,
    sql_cosine,
    sql_lsh_signature,
)
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.queries._util import (
    dec_avg,
    persist_tracked,
    sql_dec_avg,
)
from etl_pipeline_project_auraverse_spark.session import load_table

N_QUERY = 5  # brute-force query set: vec_id < 5
TOP_K = 10


# ---------------------------------------------------------------------------
# Brute-force cosine top-k: exact baseline every ANN variant is judged
# against. Query side broadcast; rank = row_number with vec_id tiebreak.
# ---------------------------------------------------------------------------
@register(
    "q_knn_bruteforce_cosine",
    oracle=f"""
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {sql_cosine("q.embedding", "c.embedding")} AS cos_sim
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERY}
    ),
    ranked AS (
        SELECT query_id, cand_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, cand_id) AS rank
        FROM pairs
    )
    SELECT query_id, cand_id, CAST(rank AS BIGINT) AS rank, cos_sim
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def q_knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(emb.filter(F.col("vec_id") < N_QUERY).alias("q"))
    c = emb.alias("c")
    pairs = q.join(c, F.col("q.vec_id") != F.col("c.vec_id")).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("cand_id"),
        cosine(F.col("q.embedding"), F.col("c.embedding")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "cand_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "rank", "cos_sim")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Sign-LSH ANN: 8 deterministic hyperplanes -> 8-bit bucket; search only
# the query's bucket (equi-join). The scale path for huge corpora.
# ---------------------------------------------------------------------------
LSH_QUERY_MAX = 50
LSH_TOP_K = 3


def _lsh_buckets(emb: DataFrame) -> DataFrame:
    """Sign-LSH signatures via posexplode + groupBy: the hyperplane
    dot products run as codegen'd sums over (vec_id, dim, value) rows
    instead of interpreted per-element array folds (~10x). Bit j uses
    the same round-then-sign rule as ``functions.vectors.lsh_signature``
    so bucket ids agree with the DuckDB oracle."""
    from etl_pipeline_project_auraverse_spark.functions.vectors import (
        HP_MOD,
        HP_MULT_D,
        HP_MULT_J,
        HP_SHIFT,
    )

    ex = emb.select("vec_id", F.posexplode("embedding").alias("d", "x"))
    aggs = []
    for j in range(8):
        hp = ((F.lit(j * HP_MULT_J) + F.col("d") * F.lit(HP_MULT_D)) % HP_MOD - HP_SHIFT).cast(
            "double"
        )
        aggs.append(F.sum(F.col("x").cast("double") * hp).alias(f"dot{j}"))
    dots = ex.groupBy("vec_id").agg(*aggs)
    bucket = sum(
        (
            F.when(F.round(F.col(f"dot{j}"), 6) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(8)
        ),
        F.lit(0),
    ).cast("long")
    return dots.select("vec_id", bucket.alias("bucket"))


@register(
    "q_ann_lsh_cosine",
    oracle=f"""
    WITH sig AS (
        SELECT vec_id, embedding, {sql_lsh_signature("embedding")} AS bucket
        FROM embeddings
    ),
    pairs AS (
        SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS cand_id,
               {sql_cosine("q.embedding", "c.embedding")} AS cos_sim
        FROM sig q JOIN sig c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {LSH_QUERY_MAX}
    ),
    ranked AS (
        SELECT query_id, bucket, cand_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, cand_id) AS rank
        FROM pairs
    )
    SELECT query_id, bucket, cand_id, CAST(rank AS BIGINT) AS rank, cos_sim
    FROM ranked WHERE rank <= {LSH_TOP_K}
    ORDER BY query_id, rank
    """,
)
def q_ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sig = persist_tracked(  # both sides of the bucket self-join
        emb.join(_lsh_buckets(emb), "vec_id").select("vec_id", "embedding", "bucket")
    )
    q = sig.filter(F.col("vec_id") < LSH_QUERY_MAX).alias("q")
    c = sig.alias("c")
    pairs = q.join(
        c,
        (F.col("q.bucket") == F.col("c.bucket")) & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("q.bucket").alias("bucket"),
        F.col("c.vec_id").alias("cand_id"),
        cosine(F.col("q.embedding"), F.col("c.embedding")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "cand_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= LSH_TOP_K)
        .select("query_id", "bucket", "cand_id", "rank", "cos_sim")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Coarse quantization (real IVF centroids, deterministic + oracle-twin).
#
# Seeds = the K lowest-vec_id vectors; every vector is assigned to the
# seed with the highest ROUNDED cosine (seed-id tiebreak), so the
# assignment is bit-identical in Spark and DuckDB.
# Cost is n x K broadcast scoring — linear in the corpus, no shuffle —
# and the resulting blocks have expected size n/K. K SCALES WITH THE
# CORPUS: K = max(N_CENTROIDS_MIN, ceil(n / CENTROID_TARGET_BLOCK)),
# computed lazily from count(*) in both engines, so block sizes stay
# ~CENTROID_TARGET_BLOCK at any scale instead of blocks growing
# linearly with a fixed K. In production the seeds would come from a
# k-means(||) fit persisted as a centroids table; deterministic seed
# *selection* (not iteration) keeps the oracle expressible while
# exercising the identical plan shape.
# ---------------------------------------------------------------------------
N_CENTROIDS_MIN = 32
CENTROID_TARGET_BLOCK = 500


def centroid_assignments(emb: DataFrame) -> DataFrame:
    """(vec_id, centroid_id, cos_to_centroid): nearest-seed coarse
    quantization. Broadcast the K seeds against the corpus — one scan,
    no shuffle until the consumer's own join. K derives from the corpus
    count as a lazy 1-row broadcast (no driver-side collect)."""
    k_row = emb.agg(
        F.greatest(
            F.lit(N_CENTROIDS_MIN),
            F.ceil(F.count("*") / F.lit(float(CENTROID_TARGET_BLOCK))),
        ).alias("__k")
    )
    seeds = F.broadcast(
        emb.crossJoin(F.broadcast(k_row))
        .filter(F.col("vec_id") < F.col("__k"))
        .select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("seed_emb")
        )
    )
    scored = (
        emb.select("vec_id", "embedding")
        .crossJoin(seeds)
        .select(
            "vec_id",
            "centroid_id",
            cosine(F.col("embedding"), F.col("seed_emb")).alias("cos_to_centroid"),
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos_to_centroid").desc(), "centroid_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id", "cos_to_centroid")
    )


def sql_centroid_cte() -> str:
    """DuckDB twin of :func:`centroid_assignments` — CTEs ``cent``,
    ``scored``, ``assign`` (vec_id, centroid_id, cos_to_centroid)."""
    return f"""
    cent AS (
        SELECT vec_id AS centroid_id, embedding AS seed_emb
        FROM embeddings
        WHERE vec_id < (SELECT GREATEST({N_CENTROIDS_MIN},
                               CEIL(COUNT(*) / {float(CENTROID_TARGET_BLOCK)}))
                        FROM embeddings)
    ),
    scored AS (
        SELECT e.vec_id, c.centroid_id,
               {sql_cosine("e.embedding", "c.seed_emb")} AS cos_to_centroid
        FROM embeddings e CROSS JOIN cent c
    ),
    assign AS (
        SELECT vec_id, centroid_id, cos_to_centroid FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY cos_to_centroid DESC, centroid_id) AS rn
            FROM scored
        ) WHERE rn = 1
    )"""


@register(
    "q_embedding_centroid_blocks",
    oracle=f"""
    WITH {sql_centroid_cte()}
    SELECT centroid_id,
           COUNT(*) AS n_vecs,
           {sql_dec_avg("cos_to_centroid")} AS avg_cos
    FROM assign
    GROUP BY centroid_id
    ORDER BY centroid_id
    """,
)
def q_embedding_centroid_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-size profile of the coarse quantization — the evidence
    that centroid blocking bounds within-block pair counts."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        centroid_assignments(emb)
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n_vecs"), dec_avg("cos_to_centroid").alias("avg_cos"))
        .orderBy("centroid_id")
    )


# ---------------------------------------------------------------------------
# IVF ANN: probe only the query's centroid block. At scale: partition /
# bucket the corpus by centroid id so the probe is a co-located join.
# ---------------------------------------------------------------------------
IVF_QUERY_MAX = 20
IVF_TOP_K = 3


@register(
    "q_ann_ivf_cosine",
    oracle=f"""
    WITH {sql_centroid_cte()},
    blocked AS (
        SELECT e.vec_id, e.embedding, a.centroid_id
        FROM embeddings e JOIN assign a USING (vec_id)
    ),
    pairs AS (
        SELECT q.vec_id AS query_id, q.centroid_id, c.vec_id AS cand_id,
               {sql_cosine("q.embedding", "c.embedding")} AS cos_sim
        FROM blocked q JOIN blocked c
          ON q.centroid_id = c.centroid_id AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {IVF_QUERY_MAX}
    ),
    ranked AS (
        SELECT query_id, centroid_id, cand_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, cand_id) AS rank
        FROM pairs
    )
    SELECT query_id, centroid_id, cand_id, CAST(rank AS BIGINT) AS rank, cos_sim
    FROM ranked WHERE rank <= {IVF_TOP_K}
    ORDER BY query_id, rank
    """,
)
def q_ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe over REAL centroid blocks (was: the synthetic `label`
    column standing in for a centroid id). Candidates come only from
    the query's block, so per-query work is O(block) = O(n/K), not
    O(n); the blocked corpus is persisted because it feeds both sides
    of the probe join."""
    emb = load_table(spark, sf_dir, "embeddings")
    blocked = persist_tracked(
        emb.join(centroid_assignments(emb).select("vec_id", "centroid_id"), "vec_id")
    )
    q = blocked.filter(F.col("vec_id") < IVF_QUERY_MAX).alias("q")
    c = blocked.alias("c")
    pairs = q.join(
        c,
        (F.col("q.centroid_id") == F.col("c.centroid_id"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("q.centroid_id").alias("centroid_id"),
        F.col("c.vec_id").alias("cand_id"),
        cosine(F.col("q.embedding"), F.col("c.embedding")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "cand_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= IVF_TOP_K)
        .select("query_id", "centroid_id", "cand_id", "rank", "cos_sim")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Embedding profile: per-label vector counts and L2-norm stats.
# Per-vector norms rounded before aggregation -> order-independent.
# ---------------------------------------------------------------------------
SQL_NORM = (
    "ROUND(SQRT(list_sum(list_transform(range(0, 64), d -> "
    "CAST(embedding[d+1] AS DOUBLE) * CAST(embedding[d+1] AS DOUBLE)))), 6)"
)


@register(
    "q_embedding_norms",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n_vecs,
           {sql_dec_avg(SQL_NORM)} AS avg_norm,
           CAST(MIN({SQL_NORM}) AS DOUBLE) AS min_norm,
           CAST(MAX({SQL_NORM}) AS DOUBLE) AS max_norm
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.round(norm2(F.col("embedding")), 6)
    return (
        emb.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            dec_avg("nrm").alias("avg_norm"),
            F.min("nrm").cast("double").alias("min_norm"),
            F.max("nrm").cast("double").alias("max_norm"),
        )
        .orderBy("label")
    )
