"""Differential test: every registered query with an oracle must match
DuckDB exactly (row count + columns + order-insensitive values) at the
test scale factor. This mirrors the driver's t2 correctness gate.
"""

from __future__ import annotations

import pytest

from etl_pipeline_project_auraverse_spark.queries import ORACLE, QUERIES, load_all
from tests.conftest import assert_matches_oracle

load_all()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    assert_matches_oracle(spark, name, QUERIES[name], ORACLE[name], sf_dir)


def test_all_queries_return_rows(spark, sf_dir):
    """Every registered query (oracle or not) runs and returns a schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
