"""Data-quality expectation suite over the star schema.

The validation pass an ETL pipeline runs before publishing a load:
column completeness, key uniqueness, value bounds, accepted domains,
and referential integrity — all metrics from ``operators/dq.py``,
where same-table checks compile into ONE aggregate scan and the RI
check is an anti-join count. The report is the contract: one
``(constraint_name, metric, passed)`` row per expectation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.dq import (
    accepted_values,
    completeness,
    dq_report,
    max_bound,
    min_bound,
    non_empty,
    referential_integrity,
    uniqueness,
)
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.session import load_table

_STATUS = ["O", "F", "P"]
_PRICE_MAX = 1.0e7


@register(
    "q_dq_orders_report",
    oracle=f"""
    WITH base AS (
        SELECT COUNT(*) AS n,
               COUNT(o_custkey) AS nc,
               COUNT(DISTINCT o_orderkey) AS nd,
               MIN(o_totalprice) AS mn,
               MAX(o_totalprice) AS mx,
               COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END)
                   + COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS bad
        FROM orders
    ),
    orph AS (
        SELECT COUNT(*) AS k
        FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT * FROM (
        SELECT 'row_count>0' AS constraint_name,
               CAST(n AS DOUBLE) AS metric, n > 0 AS passed FROM base
        UNION ALL
        SELECT 'completeness(o_custkey)',
               CAST(ROUND(nc / n, 6) AS DOUBLE), ROUND(nc / n, 6) >= 1.0
        FROM base
        UNION ALL
        SELECT 'uniqueness(o_orderkey)',
               CAST(ROUND(nd / n, 6) AS DOUBLE), ROUND(nd / n, 6) >= 1.0
        FROM base
        UNION ALL
        SELECT 'min(o_totalprice)>=0.0',
               CAST(ROUND(mn, 6) AS DOUBLE), ROUND(mn, 6) >= 0.0 FROM base
        UNION ALL
        SELECT 'max(o_totalprice)<={_PRICE_MAX}',
               CAST(ROUND(mx, 6) AS DOUBLE), ROUND(mx, 6) <= {_PRICE_MAX}
        FROM base
        UNION ALL
        SELECT 'accepted_values(o_orderstatus)',
               CAST(bad AS DOUBLE), bad = 0 FROM base
        UNION ALL
        SELECT 'referential(o_custkey)',
               CAST(k AS DOUBLE), k = 0 FROM orph
    )
    ORDER BY constraint_name
    """,
)
def q_dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite for the orders load: six single-scan checks
    plus customer referential integrity, one report row each."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    checks = [
        non_empty(),
        completeness("o_custkey"),
        uniqueness("o_orderkey"),
        min_bound("o_totalprice", 0.0),
        max_bound("o_totalprice", _PRICE_MAX),
        accepted_values("o_orderstatus", _STATUS),
    ]
    report = dq_report(orders, checks)
    ri = referential_integrity(orders, "o_custkey", customer, "c_custkey")
    return report.unionByName(ri).orderBy("constraint_name")
