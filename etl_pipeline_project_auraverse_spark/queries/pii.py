"""PII scrubbing as a driver-checked query, built on the existing
``functions/pii.py`` battery (regexp counts + expression-level Luhn
card validation + typed-placeholder redaction).

The generated corpus is PII-free word salad, so running the scrubber
over the raw text would be a vacuous 0-match green (the q08/q22
lesson). Instead the query DERIVES a deterministic PII-bearing corpus
in-plan — each doc_id injects an email / phone / IP / SSN / a
Luhn-valid card / a card-shaped candidate that usually fails Luhn,
according to fixed modulus rules, built with plain string
functions both engines evaluate identically — then runs the real
detection + redaction machinery and aggregates per-language counts,
scrubbed length, and an md5 fingerprint of the redacted text. Every
regex, the Luhn checksum (DuckDB twin: indexed list lambdas over the
reversed digit string), the redaction precedence, and the
augmentation arithmetic are all on the hash-checked path. Detection
fidelity on realistic strings is pinned separately by the
``tests/test_pii.py`` case battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.functions.pii import (
    PATTERNS,
    luhn_valid_count,
    pii_count,
    redact,
)
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.session import load_table

_KINDS = ("email", "ipv4", "phone", "ssn")  # + Luhn-validated "card"


def _sql_luhn_count(expr: str) -> str:
    """DuckDB twin of ``luhn_valid_count``: extract card-shaped
    candidates, keep those whose reversed digit string passes Luhn.
    ``list_transform``'s index is 1-based, so doubling i % 2 = 0
    matches Spark's 0-based ``i % 2 == 1`` — both double the 2nd,
    4th, ... digit from the right."""
    pat = PATTERNS["card_candidate"]
    return f"""CAST(len(list_filter(
        regexp_extract_all({expr}, '{pat}'),
        c -> list_sum(list_transform(
               string_split(reverse(regexp_replace(c, '[ -]', '', 'g')), ''),
               (d, i) -> CASE WHEN i % 2 = 0 THEN
                              CASE WHEN CAST(d AS INT) * 2 > 9
                                   THEN CAST(d AS INT) * 2 - 9
                                   ELSE CAST(d AS INT) * 2 END
                         ELSE CAST(d AS INT) END)) % 10 = 0
    )) AS BIGINT)"""


def _sql_redact(expr: str) -> str:
    """DuckDB twin of ``redact`` — same patterns, same order."""
    out = expr
    for kind, pattern in PATTERNS.items():
        tag = "card" if kind == "card_candidate" else kind
        out = f"regexp_replace({out}, '{pattern}', '[{tag.upper()}]', 'g')"
    return out


def _sql_augmented() -> str:
    """DuckDB expression for the injected-PII text column."""
    return """
        text
        || CASE WHEN doc_id % 3 = 0 THEN ' Contact user' || CAST(doc_id AS VARCHAR)
                     || '@' || source || '.example.com' ELSE '' END
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
        || CASE WHEN doc_id % 13 = 0 THEN ' card 4242 4242 4242 4242' ELSE '' END
        || CASE WHEN doc_id % 17 = 0 THEN ' maybe 4111-1111-1111-'
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
            F.lit(".example.com"),
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
        when_mod(13, F.lit(" card 4242 4242 4242 4242")),
        when_mod(
            17,
            F.lit(" maybe 4111-1111-1111-"),
            pad(did % 9000 + 1000, 4),
        ),
    )


# CAST: DuckDB SUM(BIGINT) yields HUGEINT (pandas float) — cast back
# so the driver's value hash sees integers on both sides
_SQL_COUNT_COLS = ",\n               ".join(
    f"CAST(len(regexp_extract_all(text, '{PATTERNS[k]}')) AS BIGINT)"
    f" AS {k}_count"
    for k in _KINDS
)
_SQL_TOTALS = ",\n           ".join(
    f"CAST(SUM({k}_count) AS BIGINT) AS {k}_total" for k in (*_KINDS, "card")
)


@register(
    "q_pii_scrub_stats",
    oracle=f"""
    WITH aug AS (
        SELECT lang, ({_sql_augmented()}) AS text FROM documents
    ),
    scanned AS (
        SELECT lang,
               {_SQL_COUNT_COLS},
               {_sql_luhn_count("text")} AS card_count,
               {_sql_redact("text")} AS text_scrubbed
        FROM aug
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           {_SQL_TOTALS},
           CAST(SUM(length(text_scrubbed)) AS BIGINT) AS scrubbed_chars,
           MIN(md5(text_scrubbed)) AS scrub_fingerprint
    FROM scanned
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language PII detection totals (card = Luhn-validated) and
    redaction fingerprint over the deterministically augmented corpus."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select("lang", _spark_augmented().alias("text"))
    text = F.col("text")
    scanned = aug.select(
        "lang",
        *[pii_count(text, k).alias(f"{k}_count") for k in _KINDS],
        luhn_valid_count(text).alias("card_count"),
        redact(text).alias("text_scrubbed"),
    )
    return (
        scanned.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            *[
                F.sum(f"{k}_count").alias(f"{k}_total")
                for k in (*_KINDS, "card")
            ],
            F.sum(F.length("text_scrubbed")).alias("scrubbed_chars"),
            F.min(F.md5("text_scrubbed")).alias("scrub_fingerprint"),
        )
        .orderBy("lang")
    )
