"""Custom Python DataSource: registration, partition planning, and
the determinism contract (same rows for any partition count)."""

from __future__ import annotations

from etl_pipeline_project_auraverse_spark.sources.synthetic_ds import register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_with_partition_planning(spark):
    df = _read(spark, n_docs=50, partitions=5)
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    assert len(rows) == 50
    assert sorted(r["doc_id"] for r in rows) == list(range(50))
    r0 = {r["doc_id"]: r for r in rows}[7]
    assert r0["lang"] == "fr"  # 7 % 4
    assert r0["n_words"] == 12 and len(r0["text"].split()) == 12


def test_partitioning_does_not_change_rows(spark):
    a = {(r["doc_id"], r["text"]) for r in _read(spark, n_docs=40, partitions=2).collect()}
    b = {(r["doc_id"], r["text"]) for r in _read(spark, n_docs=40, partitions=8).collect()}
    assert a == b and len(a) == 40


def test_feeds_the_engine_pipeline(spark):
    """The custom source composes with downstream operators like any
    table: word counting over the generated corpus."""
    from pyspark.sql import functions as F

    df = _read(spark, n_docs=30, partitions=3)
    counts = (
        df.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
    )
    total = counts.agg(F.sum("count")).collect()[0][0]
    assert total == 30 * 12


def test_streaming_reader_emits_all_docs_once(spark, tmp_path):
    """The streaming face advances its offset per micro-batch and a
    full drain emits each document exactly once, identical to the
    batch read of the same range."""
    register(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("max_docs", 37)
        .option("batch_size", 10)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r["doc_id"], r["text"]) for r in spark.table("synth_stream").collect()}
    want = {
        (r["doc_id"], r["text"])
        for r in _read(spark, n_docs=37, partitions=3).collect()
    }
    assert got == want and len(got) == 37
