"""PII detection/redaction unit tests on realistic crafted strings —
the detection evidence the driver query can't give (its corpus is
synthetic-by-construction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.pii import (
    PII_PATTERNS,
    scrub_pii,
)


def _one(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return scrub_pii(df).collect()[0].asDict()


CASES = [
    # (text, expected per-class counts, expected scrubbed text)
    (
        "Reach me at jane.doe+spam@mail.example.co.uk today",
        {"email": 1},
        "Reach me at [EMAIL] today",
    ),
    (
        "Call +1 555-867-5309 or (212) 555-0187 now",
        {"phone": 2},
        "Call +[PHONE] or [PHONE] now",
    ),
    (
        "server at 192.168.0.12, gateway 10.0.0.1.",
        {"ip": 2},
        "server at [IP], gateway [IP].",
    ),
    (
        "SSN 078-05-1120 on file",
        {"ssn": 1},
        "SSN [SSN] on file",
    ),
    (
        "card 4111-1111-1111-1111 exp 11/29",
        {"card": 1},
        "card [CARD] exp 11/29",
    ),
    (
        "no pii here, just 1234 and version 2.5",
        {},
        "no pii here, just 1234 and version 2.5",
    ),
    (
        # overlapping classes: the email's host is not an IP, the
        # card must win over phone/ssn-shaped digit groups inside it
        "a@b.io 4012-8888-8888-1881 and 301-70-4455",
        {"email": 1, "card": 1, "ssn": 1},
        "[EMAIL] [CARD] and [SSN]",
    ),
]


@pytest.mark.parametrize("text,counts,scrubbed", CASES)
def test_scrub_cases(spark, text, counts, scrubbed):
    row = _one(spark, text)
    for name, _, _ in PII_PATTERNS:
        assert row[f"{name}_count"] == counts.get(name, 0), (name, row)
    assert row["text_scrubbed"] == scrubbed


def test_counts_see_raw_text_but_scrub_applies_precedence(spark):
    # phone-shaped digits inside a card number: the card redacts
    # first, so no stray [PHONE] appears in the output
    row = _one(spark, "pay 5555-4444-3333-2222 fast")
    assert row["card_count"] == 1
    assert row["text_scrubbed"] == "pay [CARD] fast"
    assert "[PHONE]" not in row["text_scrubbed"]


def test_passthrough_columns_preserved(spark):
    df = spark.createDataFrame(
        [(7, "x", "en")], "doc_id long, text string, lang string"
    )
    out = scrub_pii(df)
    assert {"doc_id", "text", "lang", "text_scrubbed"} <= set(out.columns)
    assert out.collect()[0]["lang"] == "en"


def test_plan_is_codegen_only(spark):
    # the scrubber must stay JVM-side: no BatchEvalPython / Arrow
    # UDF stages in the plan
    df = spark.createDataFrame([(1, "a@b.io")], "doc_id long, text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
