"""UDTF surface tests: SQL-level table functions expand rows as the
reference's extraction semantics require, and agree with the codegen'd
builders they mirror."""

from __future__ import annotations

import pytest

from etl_pipeline_project_auraverse_spark.functions.udtfs import register_udtfs


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_udtfs(spark)


def test_word_ngrams_basic(spark):
    rows = spark.sql(
        "SELECT * FROM word_ngrams('a b c d', 2) ORDER BY pos"
    ).collect()
    assert [(r["pos"], r["gram"]) for r in rows] == [
        (0, "a b"),
        (1, "b c"),
        (2, "c d"),
    ]


def test_word_ngrams_lateral_join_matches_builtin(spark):
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "p q")], ["doc_id", "text"]
    )
    df.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT doc_id, gram FROM udtf_docs,
        LATERAL word_ngrams(text, 3)
        ORDER BY doc_id, pos
        """
    ).collect()
    assert [(r["doc_id"], r["gram"]) for r in got] == [(1, "x y z"), (1, "y z w")]


def test_structured_blocks_tags(spark):
    text = 'junk {"a": 1} more [2024-01-01 10:00:00] started junk'
    rows = spark.sql(
        "SELECT * FROM structured_blocks('" + text.replace("'", "''") + "')"
    ).collect()
    tags = {(r["block_type"]) for r in rows}
    assert tags == {"json", "log"}


def test_structured_blocks_error_sentinel(spark):
    rows = spark.sql("SELECT * FROM structured_blocks('no blocks here')").collect()
    assert [(r["block_type"]) for r in rows] == ["error"]
