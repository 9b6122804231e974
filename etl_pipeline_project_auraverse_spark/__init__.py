"""etl_pipeline_project_auraverse_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference ETL project (AdityaNayak12/ETL-Pipeline-Project-Auraverse):
multi-format extraction, value normalization, struct flattening, schema
profiling with drift detection — plus the relational query surface,
time-series, deduplication, similarity-search, text-analysis and
streaming operators a large-scale (100 TB) training-data pipeline needs.

Architecture: everything is a lazy `pyspark.sql.DataFrame` plan.
Catalyst/Tungsten/AQE handle physical strategy; Python stays on the
driver declaring plans. Row-level Python appears only behind Arrow
(pandas UDFs / mapInPandas) and only where built-ins genuinely cannot
express the semantics (PDF/YAML/HTML parsing, stateful streaming).
"""

from etl_pipeline_project_auraverse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
