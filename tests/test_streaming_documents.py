"""Streaming document curation: full drain of the file stream equals
the batch computation of the same expressions, dedup keeps exactly one
row per fingerprint, and the quality gate filters identically."""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from etl_pipeline_project_auraverse_spark.streaming import documents as sd


def _ts(minute: int) -> datetime:
    return datetime(2024, 5, 1, 10, minute)


GOOD = (
    "the quick brown fox jumps over the lazy dog and the cat "
    "watches from the fence while the sun is high in the sky"
)
SHORT = "tiny doc"
PUNCTY = "!!! ??? ;;; ### " * 12


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("docstream")
    batches = [
        [
            (1, _ts(0), GOOD, "en", "src0"),
            (2, _ts(1), SHORT, "en", "src0"),
            (3, _ts(2), GOOD + " extra tail words here", "en", "src1"),
        ],
        [
            (4, _ts(3), GOOD, "en", "src2"),          # exact dup of 1
            (5, _ts(4), "  " + GOOD + "  ", "en", "src3"),  # ws-normalized dup
            (6, _ts(5), PUNCTY, "en", "src0"),
        ],
        [
            (7, _ts(6), GOOD.upper(), "en", "src4"),  # case-normalized dup
            (8, _ts(7), "an entirely different long document about spark "
                        "streaming and the watermarking of late data in "
                        "the state store with many words", "en", "src5"),
        ],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, sd.DOC_DDL)
        df.coalesce(1).write.mode("overwrite").parquet(str(root / f"b{i}"))
        # move the part file up so the stream source sees one file per batch
        part = next(
            f for f in os.listdir(root / f"b{i}") if f.startswith("part-")
        )
        os.rename(root / f"b{i}" / part, root / f"file_{i}.parquet")
    for i in range(len(batches)):
        import shutil

        shutil.rmtree(root / f"b{i}")
    return str(root)


def _drain(df, name):
    from etl_pipeline_project_auraverse_spark.streaming.events import to_memory

    q = to_memory(df, name)
    q.processAllAvailable()
    q.stop()


def test_stream_curation_matches_batch(spark, docs_path):
    stream = sd.read_document_stream(spark, docs_path)
    _drain(sd.curated_document_stream(stream), "curated_docs")
    got = {
        r.doc_id: r for r in spark.sql("SELECT * FROM curated_docs").collect()
    }

    batch = sd.scored_documents(spark.read.schema(sd.DOC_DDL).parquet(docs_path))
    kept = batch.filter("keep").collect()
    # quality gate: short + punctuation-soup docs fail in BOTH faces
    assert {r.doc_id for r in kept} == {1, 3, 4, 5, 7, 8}
    # dedup: docs 1/4/5/7 share one normalized fingerprint -> one survivor
    fps = {}
    for r in kept:
        fps.setdefault(r.fp, set()).add(r.doc_id)
    surviving = set(got)
    assert len(surviving) == len({r.fp for r in got.values()})
    for fp, ids in fps.items():
        assert len(ids & surviving) == 1, (fp, ids, surviving)
    # per-row expressions identical across faces for the survivors
    by_id = {r.doc_id: r for r in kept}
    for doc_id, row in got.items():
        b = by_id[doc_id]
        assert (row.quality_score, row.n_tokens, row.fp) == (
            b.quality_score,
            b.n_tokens,
            b.fp,
        )


def test_stream_dedup_keeps_first_arrival(spark, docs_path):
    stream = sd.read_document_stream(spark, docs_path)
    _drain(sd.curated_document_stream(stream), "curated_first")
    rows = spark.sql("SELECT * FROM curated_first").collect()
    dup_family = [r for r in rows if r.doc_id in (1, 4, 5, 7)]
    assert len(dup_family) == 1 and dup_family[0].doc_id == 1
