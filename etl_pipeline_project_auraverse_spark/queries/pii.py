"""PII scrubbing as a driver-checked query.

The generated corpus is PII-free word salad, so running the scrubber
over the raw text would be a vacuous 0-match green (the q08/q22
lesson). Instead the query DERIVES a deterministic PII-bearing corpus
in-plan — each doc_id injects an email / phone / IP / SSN / card
according to fixed modulus rules, built with plain string functions
that both engines evaluate identically — then runs the real
detection + redaction machinery (operators/pii.py) and aggregates
per-language counts, scrubbed length, and an md5 fingerprint of the
scrubbed text. Every regex, the replacement precedence, and the
augmentation arithmetic are all on the hash-checked path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.pii import (
    pii_counts,
    scrub,
    sql_pii_counts,
    sql_scrub,
)
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.session import load_table


def _sql_augmented() -> str:
    """DuckDB expression for the injected-PII text column."""
    return """
        text
        || CASE WHEN doc_id % 3 = 0 THEN ' Contact user' || CAST(doc_id AS VARCHAR)
                     || '@' || source || '.example.com.' ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN ' Call +1 555-'
                     || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '-'
                     || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0') ELSE '' END
        || CASE WHEN doc_id % 7 = 0 THEN ' from 10.'
                     || CAST(doc_id % 256 AS VARCHAR) || '.'
                     || CAST(doc_id * 3 % 256 AS VARCHAR) || '.'
                     || CAST(doc_id * 5 % 256 AS VARCHAR) ELSE '' END
        || CASE WHEN doc_id % 11 = 0 THEN ' SSN '
                     || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '-'
                     || lpad(CAST(doc_id % 90 + 10 AS VARCHAR), 2, '0') || '-'
                     || lpad(CAST(doc_id * 13 % 9000 + 1000 AS VARCHAR), 4, '0') ELSE '' END
        || CASE WHEN doc_id % 13 = 0 THEN ' card 4111-1111-1111-'
                     || lpad(CAST(doc_id % 9000 + 1000 AS VARCHAR), 4, '0') ELSE '' END
    """


def _spark_augmented() -> F.Column:
    """Spark twin of :func:`_sql_augmented` — identical strings."""
    did = F.col("doc_id")

    def when_mod(m: int, *parts: F.Column) -> F.Column:
        return F.when(did % m == 0, F.concat(*parts)).otherwise(F.lit(""))

    def pad(col: F.Column, n: int) -> F.Column:
        return F.lpad(col.cast("string"), n, "0")

    return F.concat(
        F.col("text"),
        when_mod(
            3,
            F.lit(" Contact user"),
            did.cast("string"),
            F.lit("@"),
            F.col("source"),
            F.lit(".example.com."),
        ),
        when_mod(
            5,
            F.lit(" Call +1 555-"),
            pad(did % 900 + 100, 3),
            F.lit("-"),
            pad(did * 7 % 10000, 4),
        ),
        when_mod(
            7,
            F.lit(" from 10."),
            (did % 256).cast("string"),
            F.lit("."),
            (did * 3 % 256).cast("string"),
            F.lit("."),
            (did * 5 % 256).cast("string"),
        ),
        when_mod(
            11,
            F.lit(" SSN "),
            pad(did % 900 + 100, 3),
            F.lit("-"),
            pad(did % 90 + 10, 2),
            F.lit("-"),
            pad(did * 13 % 9000 + 1000, 4),
        ),
        when_mod(
            13,
            F.lit(" card 4111-1111-1111-"),
            pad(did % 9000 + 1000, 4),
        ),
    )


# CAST: DuckDB SUM(BIGINT) yields HUGEINT (pandas float) — cast back
# so the driver's value hash sees integers on both sides
_COUNT_SUMS_SQL = ",\n           ".join(
    f"CAST(SUM({name}_count) AS BIGINT) AS {name}_total"
    for name in ("card", "ssn", "phone", "ip", "email")
)


@register(
    "q_pii_scrub_stats",
    oracle=f"""
    WITH aug AS (
        SELECT lang, ({_sql_augmented()}) AS text FROM documents
    ),
    scanned AS (
        SELECT lang,
               {", ".join(sql_pii_counts("text"))},
               {sql_scrub("text")} AS text_scrubbed
        FROM aug
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           {_COUNT_SUMS_SQL},
           CAST(SUM(length(text_scrubbed)) AS BIGINT) AS scrubbed_chars,
           MIN(md5(text_scrubbed)) AS scrub_fingerprint
    FROM scanned
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language PII detection totals and redaction fingerprint
    over the deterministically augmented corpus."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select("lang", _spark_augmented().alias("text"))
    scanned = aug.select(
        "lang",
        *pii_counts(F.col("text")),
        scrub(F.col("text")).alias("text_scrubbed"),
    )
    return (
        scanned.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            *[
                F.sum(f"{name}_count").alias(f"{name}_total")
                for name in ("card", "ssn", "phone", "ip", "email")
            ],
            F.sum(F.length("text_scrubbed")).alias("scrubbed_chars"),
            F.min(F.md5("text_scrubbed")).alias("scrub_fingerprint"),
        )
        .orderBy("lang")
    )
