"""Streaming document ingest — the LLM-corpus curation pipeline as a
Structured Streaming flow: files of raw documents arrive continuously,
each micro-batch is quality-scored with the SAME pure Column
expressions as the batch query (``queries/text.py``), fingerprinted,
exact-deduplicated against the stream's state, and filtered to the
keep set. The batch and streaming faces share every expression, so
equivalence is testable (``tests/test_streaming_documents.py``).

Scale posture:
- Quality scoring/fingerprinting are stateless map-side expressions —
  no shuffle, no Python.
- Dedup state is bounded by ``dropDuplicatesWithinWatermark`` on the
  ingest timestamp: a fingerprint seen longer than the watermark ago
  is evicted from state (at corpus scale the unbounded exact-dedup
  variant is a join against the incremental MinHash index instead —
  ``queries/dedup.py`` q_dedup_incremental_minhash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.functions.text import (
    PUNCT_RE,
    STOPWORD_RE,
    match_count,
    n_words,
    norm_text,
)

DOC_DDL = "doc_id long, ts timestamp, text string, lang string, source string"

QUALITY_KEEP_THRESHOLD = 0.3
MIN_TOKENS = 5


def read_document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based document stream: each parquet file is a micro-batch."""
    return (
        spark.readStream.schema(DOC_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def scored_documents(docs: DataFrame) -> DataFrame:
    """Stateless curation columns (identical in batch and streaming):
    token count, stopword/punct ratios, composite quality score, the
    whitespace-normalized md5 fingerprint, and the keep decision."""
    t = F.col("text")
    enriched = docs.withColumns(
        {
            "n_tokens": n_words(t),
            "stop_hits": match_count(F.lower(t), STOPWORD_RE),
            "punct_hits": match_count(t, PUNCT_RE),
            "fp": F.md5(norm_text(t)),
        }
    )
    stop_ratio = F.col("stop_hits") * 1.0 / F.col("n_tokens")
    punct_ratio = F.col("punct_hits") * 1.0 / F.length("text")
    quality = F.round(
        F.least(F.lit(1.0), F.col("n_tokens") / 200.0) * 0.4
        + stop_ratio * 0.4
        + (1.0 - punct_ratio) * 0.2,
        6,
    ).cast("double")
    return enriched.select(
        "doc_id",
        "ts",
        "lang",
        "source",
        "fp",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        quality.alias("quality_score"),
        (
            (quality >= QUALITY_KEEP_THRESHOLD)
            & (F.col("n_tokens") >= MIN_TOKENS)
        ).alias("keep"),
    )


def curated_document_stream(
    docs: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Quality-filter + exact-dedup the document stream: only keep
    rows pass, and each fingerprint survives once within the watermark
    horizon (first arrival wins; state evicts beyond the horizon)."""
    return (
        scored_documents(docs)
        .filter(F.col("keep"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
