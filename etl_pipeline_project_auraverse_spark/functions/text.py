"""Text-analysis column builders: tokenization, quality scoring,
language-ID heuristics, fingerprinting.

All pure Column expressions (JVM-side, whole-stage codegen — no Python
in the row path). Regex patterns are kept to the portable subset that
Java regex and RE2 interpret identically (\\b word boundaries, simple
alternations, explicit character classes) so DuckDB oracles can
replicate the semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/keyword heuristic
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "es": r"\b(el|la|los|las|es|y)\b",
    "fr": r"\b(le|les|des|est|et)\b",
}

STOPWORD_RE = r"\b(the|a|of|to|and|in|is)\b"
PUNCT_RE = r"[.,!?;:]"


def norm_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lower, collapse whitespace."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def words(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(col), r"\s+")


def n_words(col: Column) -> Column:
    return F.size(words(col)).cast("long")


def match_count(col: Column, pattern: str) -> Column:
    """Number of regex matches (full-match group) in the column."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")


def token_estimate(col: Column) -> Column:
    """BPE-ish token-count estimate: ~4 chars/token heuristic."""
    return F.ceil(F.length(col) / 4.0).cast("long")


def fingerprint_md5(col: Column) -> Column:
    """128-bit content fingerprint of the canonical text (hex)."""
    return F.md5(norm_text(col))


def fingerprint64(col: Column) -> Column:
    """Portable 60-bit integer fingerprint (md5-prefix → bigint).

    `conv(hex, 16, 10)` is replicated in DuckDB as
    `('0x' || hex)::BIGINT`, making the fingerprint engine-independent.
    """
    return F.conv(F.substring(fingerprint_md5(col), 1, 15), 16, 10).cast("long")


def h28(col: Column) -> Column:
    """Portable 28-bit hash: first 7 hex digits of md5 → bigint.

    Engine-independent (DuckDB twin: ``('0x' || substr(md5(s),1,7))::BIGINT``)
    so dedup sketches built on it are oracle-checkable. 28 bits keeps
    ``a*h + b`` products inside int64 for universal-hash MinHash seeds.
    """
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def h60(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5 → bigint.

    DuckDB twin: ``('0x' || substr(md5(s),1,15))::BIGINT``. Used where
    28 bits aren't enough (e.g. 48-bit SimHash fingerprints).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (empty if < n tokens).

    Index arithmetic only — stays in whole-stage codegen. ``F.get`` is
    0-based; the explicit ``when`` guards Spark's ``sequence`` from
    generating a descending range for short docs.
    """
    toks = words(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(" ", *[F.get(toks, i + k) for k in range(n)])  # noqa: E731
    return F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-word hit counts over the lowered text."""
    lowered = F.lower(col)
    return {lang: match_count(lowered, pat) for lang, pat in LANG_MARKERS.items()}


def predicted_lang(col: Column) -> Column:
    """Argmax language with deterministic tie-break order en>de>es>fr."""
    s = lang_scores(col)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
