"""PII detection and redaction over text columns — the scrubbing pass
every large-scale training-data pipeline runs before anything else
(emails, phone numbers, IP addresses, SSNs, card numbers).

Pure ``pyspark.sql.functions`` regex chains: JVM-side, whole-stage
codegen, no UDFs — a linear scan over the text column that
column-prunes to exactly (key, text). Patterns are restricted to the
common subset of Java regex (Spark) and RE2 (DuckDB): character
classes, bounded quantifiers, alternation, word boundaries — no
lookaround, no backreferences — so the same pattern string drives
both engines and the whole pass is oracle-checkable.

Redaction order matters where patterns overlap (an SSN-shaped group
inside a card number): cards are replaced first, then SSNs, phones,
IPs, emails. ``PII_PATTERNS`` is ordered accordingly.

Reference parity: /root/reference/backend/etl_pipeline.py has no PII
handling; this is part of the beyond-reference training-data surface
(task brief: dedup/quality/curation family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement token) in redaction precedence order.
# Patterns are valid and equivalent under Java regex AND RE2.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "card",
        r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
        "[CARD]",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "[SSN]",
    ),
    (
        "phone",
        r"\b\+?\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}\b|\(\d{3}\) ?\d{3}-\d{4}",
        "[PHONE]",
    ),
    (
        "ip",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "[IP]",
    ),
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
]


def pii_counts(col: Column) -> list[Column]:
    """One ``<name>_count`` column per PII class (codegen regex scans).

    Counts run against the ORIGINAL text, so overlapping classes each
    see the raw string (a card number also contains phone-shaped
    digits; redaction precedence only affects :func:`scrub`)."""
    return [
        F.regexp_count(col, F.lit(pat)).cast("long").alias(f"{name}_count")
        for name, pat, _ in PII_PATTERNS
    ]


def scrub(col: Column) -> Column:
    """The text with every PII class replaced by its token, applying
    the precedence order above."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-class ``*_count`` columns and a ``text_scrubbed``
    column; every other column passes through untouched."""
    col = F.col(text_col)
    return df.select(
        "*",
        *pii_counts(col),
        scrub(col).alias("text_scrubbed"),
    )


def sql_pii_counts(expr: str) -> list[str]:
    """DuckDB twins of :func:`pii_counts` (RE2 engine)."""
    return [
        f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT)"
        f" AS {name}_count"
        for name, pat, _ in PII_PATTERNS
    ]


def sql_scrub(expr: str) -> str:
    """DuckDB twin of :func:`scrub` (global-replace flag)."""
    out = expr
    for _, pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out
