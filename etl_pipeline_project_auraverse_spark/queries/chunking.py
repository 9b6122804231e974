"""Document chunking: fixed-size overlapping windows over ``text``.

The standard pre-tokenization step of an LLM training pipeline: long
documents are cut into model-window-sized chunks with an overlap so no
span is lost at a boundary, and each chunk gets a content fingerprint
so chunk-level dedup can run downstream (a near-duplicate tail of one
doc and the head of another collide at chunk granularity even when the
whole-document hashes differ).

Scale shape: chunking is a pure per-row ``posexplode`` projection —
no shuffle, stays inside whole-stage codegen, and the fan-out per row
is bounded by ceil(len/stride) (a document contributes chunks
proportional to its own size, never to the corpus). The chunk-dedup
query's only wide op is a groupBy on the 64-bit chunk fingerprint —
maximal-cardinality keys, no skew funnel.

Determinism: offsets are integer arithmetic, the fingerprint is an
md5 prefix of the exact substring — both engines agree byte-for-byte
(``substring`` is 1-based with the same clamping semantics in Spark
and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.queries._util import parallelize
from etl_pipeline_project_auraverse_spark.session import load_table

CHUNK = 120  # window size in characters (model-window stand-in)
STRIDE = 80  # step between window starts
OVERLAP = CHUNK - STRIDE  # characters shared by adjacent chunks

# n_chunks = ceil((len - OVERLAP) / STRIDE), at least 1 — integer form
# (len - OVERLAP + STRIDE - 1) // STRIDE so no float rounding is involved.
_SQL_N_CHUNKS = f"GREATEST(1, (length(text) - {OVERLAP} + {STRIDE - 1}) // {STRIDE})"


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, chunk_idx, chunk_start, chunk_len, chunk_hash for every
    overlapping window of every document (shared by both queries)."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((F.length("text") - OVERLAP + (STRIDE - 1)) / F.lit(STRIDE)),
    ).cast("int")
    exploded = docs.select(
        "doc_id",
        "text",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_i"),
    )
    chunk_text = F.substring(
        F.col("text"), F.col("chunk_idx") * STRIDE + 1, CHUNK
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx").cast("long") * STRIDE).alias("chunk_start"),
        F.length(chunk_text).cast("long").alias("chunk_len"),
        F.substring(F.md5(chunk_text), 1, 16).alias("chunk_hash"),
    )


@register(
    "q_doc_chunks_overlap",
    oracle=f"""
    WITH exploded AS (
        SELECT doc_id, text,
               unnest(generate_series(0, {_SQL_N_CHUNKS} - 1)) AS chunk_idx
        FROM documents
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {STRIDE} AS BIGINT) AS chunk_start,
           CAST(length(substr(text, chunk_idx * {STRIDE} + 1, {CHUNK})) AS BIGINT)
               AS chunk_len,
           substr(md5(substr(text, chunk_idx * {STRIDE} + 1, {CHUNK})), 1, 16)
               AS chunk_hash
    FROM exploded
    ORDER BY doc_id, chunk_idx
    """,
)
def q_doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping {CHUNK}-char chunks at stride {STRIDE} for every
    document: offset table, per-chunk length (the tail chunk is
    shorter) and a 64-bit content fingerprint. Map-side only."""
    return _chunks(spark, sf_dir).orderBy("doc_id", "chunk_idx")


@register(
    "q_chunk_dedup_crossdoc",
    oracle=f"""
    WITH exploded AS (
        SELECT doc_id, text,
               unnest(generate_series(0, {_SQL_N_CHUNKS} - 1)) AS chunk_idx
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               substr(md5(substr(text, chunk_idx * {STRIDE} + 1, {CHUNK})), 1, 16)
                   AS chunk_hash
        FROM exploded
    )
    SELECT chunk_hash,
           COUNT(*) AS n_chunks,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS keeper_doc
    FROM hashed
    GROUP BY chunk_hash
    HAVING COUNT(DISTINCT doc_id) > 1
    ORDER BY chunk_hash
    """,
)
def q_chunk_dedup_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity exact dedup across documents: fingerprints
    shared by more than one doc_id, with the smallest doc_id as the
    canonical keeper. Catches copied passages that whole-document
    hashing misses. One groupBy on the high-cardinality fingerprint."""
    return (
        _chunks(spark, sf_dir)
        .groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy("chunk_hash")
    )


# ---------------------------------------------------------------------------
# Padding-waste audit per context length: if every document is split
# into ceil(tokens/C) fixed-length training sequences of C tokens, how
# much of the resulting token grid is padding? The readout that decides
# whether a corpus needs sequence PACKING (q_sequence_packing) before
# training, per candidate context size. Pure map-side arithmetic per
# document fanned out over the |contexts|-element literal array, then
# one aggregate — no shuffle beyond the 3-row groupBy.
# ---------------------------------------------------------------------------
PAD_CONTEXTS = [128, 256, 512]


@register(
    "q_padding_waste_by_context",
    oracle=f"""
    WITH per_doc AS (
        SELECT c.context,
               CAST(CEIL(length(text) / 4.0) AS BIGINT) AS toks
        FROM documents
        CROSS JOIN (SELECT unnest([{", ".join(str(c) for c in PAD_CONTEXTS)}]) AS context) c
    ),
    cells AS (
        SELECT context,
               COUNT(*) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST(CEIL(toks * 1.0 / context) AS BIGINT) * context)
                    AS BIGINT) AS grid_tokens
        FROM per_doc GROUP BY context
    )
    SELECT CAST(context AS BIGINT) AS context, n_docs, total_tokens, grid_tokens,
           CAST(grid_tokens - total_tokens AS BIGINT) AS padding_tokens,
           CAST(ROUND((grid_tokens - total_tokens) * 1.0 / grid_tokens, 6) AS DOUBLE)
               AS waste_frac
    FROM cells
    ORDER BY context
    """,
)
def q_padding_waste_by_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-grid padding waste at each candidate context length."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.ceil(F.length("text") / 4.0).cast("long")
    per_doc = docs.select(
        toks.alias("toks"),
        F.explode(F.array(*[F.lit(c) for c in PAD_CONTEXTS])).alias("context"),
    )
    grid = F.ceil(F.col("toks") * 1.0 / F.col("context")).cast("long") * F.col(
        "context"
    )
    cells = per_doc.groupBy("context").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("total_tokens"),
        F.sum(grid).alias("grid_tokens"),
    )
    return cells.select(
        F.col("context").cast("long").alias("context"),
        "n_docs",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("grid_tokens").cast("long").alias("grid_tokens"),
        (F.col("grid_tokens") - F.col("total_tokens")).cast("long").alias("padding_tokens"),
        F.round(
            (F.col("grid_tokens") - F.col("total_tokens")) * 1.0 / F.col("grid_tokens"),
            6,
        )
        .cast("double")
        .alias("waste_frac"),
    ).orderBy("context")


# ---------------------------------------------------------------------------
# Content-defined chunking (Rabin/gear-hash style, the restic/borg/
# LBFS storage-dedup primitive): a chunk boundary falls AFTER any word
# whose portable hash ≡ 0 (mod CDC_MOD), so boundaries depend only on
# LOCAL content — inserting a paragraph shifts fixed-size chunk grids
# everywhere, but CDC chunks downstream of the edit keep their
# identity, which is why dedup ratios survive document revisions.
# Expected chunk length = CDC_MOD words. The query reports, per
# source, the chunk census and the cross-document duplicate-chunk
# fraction — the storage/transfer savings CDC would deliver.
#
# Scale design: boundary flags are map-side; the running boundary
# count is a window PARTITIONED by doc_id; chunk assembly is one
# groupBy (doc, chunk) whose per-group state is bounded by chunk
# length; the dedup census is a per-source aggregate with a two-phase
# distinct on the chunk fingerprint.
# ---------------------------------------------------------------------------
CDC_MOD = 16


@register(
    "q_cdc_chunking_stats",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w
        FROM documents
    ),
    pw AS (
        SELECT doc_id, source,
               unnest(range(1, len(w) + 1)) - 1 AS pos,
               unnest(w) AS word
        FROM toks
    ),
    flagged AS (
        SELECT *,
               CASE WHEN ('0x' || substr(md5(word), 1, 7))::BIGINT % {CDC_MOD} = 0
                    THEN 1 ELSE 0 END AS b
        FROM pw
    ),
    chunks AS (
        SELECT doc_id, source, pos, word,
               COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS chunk_id
        FROM flagged
    ),
    chunk_tbl AS (
        SELECT doc_id, source, chunk_id,
               COUNT(*) AS n_words,
               md5(string_agg(word, ' ' ORDER BY pos)) AS ch
        FROM chunks GROUP BY doc_id, source, chunk_id
    )
    SELECT source,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(ROUND(SUM(n_words) * 1.0 / COUNT(*), 6) AS DOUBLE)
               AS avg_chunk_words,
           COUNT(DISTINCT ch) AS n_distinct_chunks,
           CAST(ROUND((COUNT(*) - COUNT(DISTINCT ch)) * 1.0 / COUNT(*), 6)
                AS DOUBLE) AS dup_frac
    FROM chunk_tbl GROUP BY source ORDER BY source
    """,
)
def q_cdc_chunking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content-defined-chunk census and duplicate-chunk
    fraction."""
    from pyspark.sql.window import Window as W

    from etl_pipeline_project_auraverse_spark.functions.text import h28, words

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", "source", words(F.col("text")).alias("w"))
    pw = toks.select("doc_id", "source", F.posexplode("w").alias("pos", "word"))
    flagged = pw.withColumn(
        "b", F.when(h28(F.col("word")) % CDC_MOD == 0, 1).otherwise(0)
    )
    w_run = W.partitionBy("doc_id").orderBy("pos").rowsBetween(
        W.unboundedPreceding, -1
    )
    chunks = flagged.withColumn(
        "chunk_id", F.coalesce(F.sum("b").over(w_run), F.lit(0))
    )
    chunk_tbl = chunks.groupBy("doc_id", "source", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda x: x["word"],
                ),
            )
        ).alias("ch"),
    )
    return (
        chunk_tbl.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.round(F.sum("n_words") * 1.0 / F.count(F.lit(1)), 6)
            .cast("double")
            .alias("avg_chunk_words"),
            F.countDistinct("ch").alias("n_distinct_chunks"),
            F.round(
                (F.count(F.lit(1)) - F.countDistinct("ch")) * 1.0 / F.count(F.lit(1)),
                6,
            )
            .cast("double")
            .alias("dup_frac"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Truncation loss by context length — the TRUNCATE-policy complement
# to q_padding_waste_by_context (that query chunks documents onto the
# token grid and measures padding; this one cuts each document at the
# context boundary and measures what the cut discards). Together they
# quantify both sides of the chunk-vs-truncate decision at each
# candidate context length.
#
# Scale: one projection exploded by |PAD_CONTEXTS| (map-side), one
# tiny groupBy — integer token arithmetic end to end.
# ---------------------------------------------------------------------------


@register(
    "q_truncation_loss_by_context",
    oracle=f"""
    WITH per_doc AS (
        SELECT c.context,
               CAST(CEIL(length(text) / 4.0) AS BIGINT) AS toks
        FROM documents
        CROSS JOIN (SELECT unnest([{", ".join(str(c) for c in PAD_CONTEXTS)}]) AS context) c
    ),
    cells AS (
        SELECT context,
               COUNT(*) AS n_docs,
               COUNT(CASE WHEN toks > context THEN 1 END) AS n_truncated,
               CAST(SUM(toks) AS BIGINT) AS total_tokens,
               CAST(SUM(LEAST(toks, context)) AS BIGINT) AS kept_tokens
        FROM per_doc GROUP BY context
    )
    SELECT CAST(context AS BIGINT) AS context, n_docs,
           CAST(n_truncated AS BIGINT) AS n_truncated,
           total_tokens, kept_tokens,
           CAST(total_tokens - kept_tokens AS BIGINT) AS lost_tokens,
           CAST(ROUND((total_tokens - kept_tokens) * 1.0 / total_tokens, 6)
                AS DOUBLE) AS loss_frac
    FROM cells
    ORDER BY context
    """,
)
def q_truncation_loss_by_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens discarded when each document is truncated (not chunked)
    at each candidate context length, plus the truncated-document
    count — the other half of the context-length sizing study."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.ceil(F.length("text") / 4.0).cast("long")
    per_doc = docs.select(
        toks.alias("toks"),
        F.explode(F.array(*[F.lit(c) for c in PAD_CONTEXTS])).alias("context"),
    )
    kept = F.least(F.col("toks"), F.col("context").cast("long"))
    cells = per_doc.groupBy("context").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("toks") > F.col("context"), 1)).alias("n_truncated"),
        F.sum("toks").alias("total_tokens"),
        F.sum(kept).alias("kept_tokens"),
    )
    lost = F.col("total_tokens") - F.col("kept_tokens")
    return cells.select(
        F.col("context").cast("long").alias("context"),
        "n_docs",
        F.col("n_truncated").cast("long").alias("n_truncated"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("kept_tokens").cast("long").alias("kept_tokens"),
        lost.cast("long").alias("lost_tokens"),
        F.round(lost * 1.0 / F.col("total_tokens"), 6)
        .cast("double")
        .alias("loss_frac"),
    ).orderBy("context")
