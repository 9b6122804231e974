"""Epoch-capped water-filling allocation when a source SATURATES.

Regression for the r9 advice finding: the driver-side water-level loop
divided by ``w_tot - cum_w``, which is exactly 0.0 at the last ranked
source, so Python raised ZeroDivisionError precisely on cap-binding
inputs — the only inputs that reach the loop (the unconstrained level
is taken when nobody saturates). The DuckDB oracle survived because
its ``x / 0.0`` yields NULL, which the CASE filter drops; the Spark
side now mirrors that by skipping the zero-denominator candidate.

The fixture: one 10 000-word source and one 4-word source. Budget
b = floor(0.5 · 10004) = 5002, weights w = sqrt(n), so the
unconstrained level b/Σw ≈ 49.04 hands the tiny source 98 tokens
against a cap of 8 — it saturates, the loop runs, and the last ranked
source (the big one) hits the denom == 0 branch.
"""

from __future__ import annotations

from conftest import assert_matches_oracle

from etl_pipeline_project_auraverse_spark.queries import ORACLE, QUERIES, load_all

load_all()

NAME = "q_mixture_epoch_capped_allocation"
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _saturating_dir(spark, tmp_path_factory) -> str:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("mix_saturating"))
    big = " ".join(f"w{i}" for i in range(10_000))
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [big, "a b c d"],
            "lang": ["en", "en"],
            "source": ["big_corpus", "tiny_corpus"],
            "n_chars": [len(big), 7],
        }
    )
    # single FILE (not a Spark part-dir) so the conftest DuckDB view
    # and Spark's reader both see the same path shape as /root/testdata
    pq.write_table(pa.Table.from_pandas(pdf), f"{d}/documents.parquet")
    return d


def test_saturating_source_matches_oracle(spark, tmp_path_factory):
    d = _saturating_dir(spark, tmp_path_factory)
    # Before the fix this raised ZeroDivisionError inside the query fn.
    assert_matches_oracle(spark, NAME, QUERIES[NAME], ORACLE[NAME], d)


def test_fixture_actually_saturates(spark, tmp_path_factory):
    d = _saturating_dir(spark, tmp_path_factory)
    rows = {r["source"]: r.asDict() for r in QUERIES[NAME](spark, d).collect()}
    tiny = rows["tiny_corpus"]
    assert tiny["saturated"] is True
    assert tiny["alloc_tokens"] == tiny["cap_tokens"] == 8
    big = rows["big_corpus"]
    assert big["saturated"] is False
    # budget is fully spent up to floor() slack: alloc ≤ b always
    assert big["alloc_tokens"] + tiny["alloc_tokens"] <= 5002
