"""Bucketed-table writes and co-located (shuffle-free) joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
both sides. Spark's answer is bucketing: write each table
``bucketBy(N, key)`` so files are pre-partitioned by ``hash(key) % N``
— a later join on that key reads both sides already co-located and
skips the exchange entirely (the plan shows SortMergeJoin with NO
Exchange under either side). This module wraps the write path and a
join helper; ``tests/test_bucketing.py`` pins the shuffle-free plan.

Notes that matter at scale:
- Both tables must use the SAME bucket count (or a divisor — Spark
  4 can coalesce mismatched buckets when
  ``spark.sql.bucketing.coalesceBucketedTableScan.enabled`` is set).
- Bucketed writes require ``saveAsTable`` (bucket metadata lives in
  the catalog, not the parquet files); a plain ``.parquet(path)``
  write silently drops bucketing.
- One file per bucket per writing task: repartition by the bucket key
  before writing so each bucket is one well-sized file instead of
  ``tasks × buckets`` fragments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    managed table. Sorting by the join key at write time lets the later
    sort-merge join skip its sort as well as its shuffle."""
    writer = (
        df.repartition(num_buckets, bucket_key)
        .write.mode("overwrite")
        .bucketBy(num_buckets, bucket_key)
    )
    if sort_by is not None:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket key.
    With matching bucketing this plans as a SortMergeJoin whose
    children read bucketed scans directly — no Exchange on either
    side."""
    return spark.table(left_table).join(spark.table(right_table), on)
