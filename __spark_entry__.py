"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_pipeline_project_auraverse_spark``; this
module only adapts the registry to the driver contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES["q01_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Only oracle-backed queries are exposed to the driver (its compare
    treats a missing ``oracle_sql()`` entry as an error row). Since
    r10 every registered query is oracle-backed — the last oracle-less
    entry, iterative BPE training, gained a chained-argmax trajectory
    oracle — so the filter is a no-op kept as a guard for future
    genuinely non-SQL-expressible additions.
    """
    from etl_pipeline_project_auraverse_spark.queries import ORACLE, QUERIES, load_all

    load_all()
    return {name: fn for name, fn in QUERIES.items() if name in ORACLE}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle for each SQL-expressible query."""
    from etl_pipeline_project_auraverse_spark.queries import ORACLE, load_all

    load_all()
    return dict(ORACLE)
