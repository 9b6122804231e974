"""File-level data skipping: clustered writes + manifest pruning read
fewer files for band predicates, results stay identical, and the
missing-manifest fallback reads everything."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.file_skipping import (
    read_pruned,
    write_with_stats,
)
from etl_pipeline_project_auraverse_spark.operators.zorder import (
    hilbert_key,
    quantize,
    zorder_layout,
)


def _clustered_orders(spark, sf_dir, n_files):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    stats = orders.agg(
        F.min("o_custkey").alias("mnc"), F.max("o_custkey").alias("mxc"),
        F.min("o_totalprice").alias("mnp"), F.max("o_totalprice").alias("mxp"),
    )
    keyed = hilbert_key(
        orders.crossJoin(F.broadcast(stats)),
        quantize(F.col("o_custkey"), F.col("mnc"), F.col("mxc"), 8),
        quantize(F.col("o_totalprice"), F.col("mnp"), F.col("mxp"), 8),
        8,
    ).drop("mnc", "mxc", "mnp", "mxp")
    return zorder_layout(keyed, F.col("hkey"), n_files).drop("hkey"), orders


def test_band_predicate_skips_files_and_keeps_results(spark, sf_dir, tmp_path):
    clustered, orders = _clustered_orders(spark, sf_dir, 16)
    path = str(tmp_path / "orders_clustered")
    manifest = write_with_stats(clustered, path, ["o_custkey", "o_totalprice"])
    assert len(manifest["files"]) >= 8

    lo, hi = 100000.0, 150000.0
    df, report = read_pruned(spark, path, {"o_totalprice": (lo, hi)})
    assert report.n_skipped > 0, "clustered band filter must skip files"
    got = df.filter(
        (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi)
    )
    expected = orders.filter(
        (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi)
    )
    assert got.count() == expected.count()
    assert (
        got.agg(F.sum("o_orderkey")).first()[0]
        == expected.agg(F.sum("o_orderkey")).first()[0]
    )


def test_impossible_band_reads_zero_files(spark, sf_dir, tmp_path):
    clustered, _ = _clustered_orders(spark, sf_dir, 8)
    path = str(tmp_path / "oc2")
    write_with_stats(clustered, path, ["o_totalprice"])
    df, report = read_pruned(spark, path, {"o_totalprice": (1e12, None)})
    assert report.n_read == 0
    assert df.count() == 0
    assert "o_orderkey" in df.columns  # schema survives the empty read


def test_missing_manifest_falls_back_to_full_read(spark, sf_dir, tmp_path):
    clustered, orders = _clustered_orders(spark, sf_dir, 8)
    path = str(tmp_path / "oc3")
    write_with_stats(clustered, path, ["o_totalprice"])
    os.remove(os.path.join(path, "_stats.json"))
    df, report = read_pruned(spark, path, {"o_totalprice": (0.0, 1.0)})
    assert report.n_skipped == 0
    assert df.count() == orders.count()


def test_unbounded_band_keeps_all_null_files(spark, tmp_path):
    # an all-null stats column with a (None, None) band constrains
    # nothing — those rows must NOT be silently dropped
    # range partitioning sorts NULLs first, so file 0 is all-null
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, 5.0), (4, 6.0)], "k int, v double"
    ).repartitionByRange(2, F.col("v"))
    path = str(tmp_path / "nulls")
    manifest = write_with_stats(df, path, ["v"])
    assert any(e["stats"]["v"][0] is None for e in manifest["files"])
    got, report = read_pruned(spark, path, {"v": (None, None)})
    assert report.n_skipped == 0
    assert got.count() == 4
    # a bounded band still prunes the all-null file
    got2, report2 = read_pruned(spark, path, {"v": (1.0, None)})
    assert report2.n_skipped >= 1
    assert got2.filter(F.col("v").isNull()).count() == 0


def test_unknown_bounds_column_falls_back_to_full_read(spark, tmp_path):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double")
    path = str(tmp_path / "unknown_col")
    write_with_stats(df, path, ["v"])
    # "k" was never collected into the manifest: read everything
    # (same contract as a missing manifest), never KeyError
    got, report = read_pruned(spark, path, {"k": (0.0, 10.0)})
    assert report.n_skipped == 0
    assert got.count() == 2
