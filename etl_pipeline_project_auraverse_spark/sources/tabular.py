"""Native tabular sources/sinks: CSV / JSON / Parquet readers and
partitioned writers (the S15/K1 surface generalized beyond the
reference's one-file-per-run model).

The reference re-parses whole files eagerly in Python
(etl_pipeline.py:16-50, server.js:22-27 routes by extension). Here
reads are lazy Spark scans: schema inference is distributed, predicate
pushdown/column pruning apply automatically (parquet), and writers
partition output by declared columns instead of coalescing to one file
unless the single-file contract is explicitly requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_EXT_FORMAT = {
    ".csv": "csv",
    ".tsv": "tsv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".parquet": "parquet",
    ".orc": "orc",
    ".arrow": "arrow",
    ".feather": "arrow",
    ".txt": "text",
    ".md": "text",
    ".xml": "xml",
    ".xlsx": "xlsx",
    ".avro": "avro",
}


# transparent-compression suffixes Spark's text-based readers (csv/
# json/text) decompress natively; strip before routing on the real
# extension. NOT parquet/orc/arrow — those embed their own codecs and
# a whole-file-compressed container would be invalid anyway.
_COMPRESSION_EXTS = (".gz", ".bz2", ".zst", ".lz4", ".deflate", ".snappy")


def format_for_path(path: str) -> str:
    """Extension → reader format (the server.js:22-27 routing,
    driver-side only — never a per-row decision). ``data.json.gz``
    routes as json: Spark decompresses per-file codecs natively
    (non-splittable — one task per .gz file, which is exactly the
    many-small-files layout such archives arrive in)."""
    low = path.lower()
    for comp in _COMPRESSION_EXTS:
        if low.endswith(comp):
            low = low[: -len(comp)]
            break
    dot = low.rfind(".")
    ext = low[dot:] if dot >= 0 else ""
    fmt = _EXT_FORMAT.get(ext)
    if fmt is None:
        raise ValueError(f"Unsupported file type: {ext}")  # S3 guard
    return fmt


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    infer: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV/TSV scan. Prefer an explicit schema at scale: inference is
    a full extra pass over the data."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer)
    return reader.csv(path)


def read_json_table(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    multiline: bool = False,
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSON scan — JSON-lines by default (splittable, scales);
    ``multiline=True`` for whole-file documents (not splittable, each
    file one task — fine for document-per-file corpora).

    ``keep_corrupt=True`` surfaces unparseable lines in a
    ``_corrupt_record`` column instead of silently nulling them
    (PERMISSIVE mode) — at 100 TB a malformed-input rate you can't SEE
    is a correctness hole, and failing the whole job on one bad line
    (FAILFAST) is worse. Requires an explicit ``schema`` (Spark drops
    the corrupt column during inference)."""
    reader = spark.read.option("multiLine", multiline)
    if keep_corrupt:
        if schema is None:
            raise ValueError("keep_corrupt requires an explicit schema")
        reader = (
            reader.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .schema(schema + ", _corrupt_record string")
        )
        return reader.json(path)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_table(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Extension-routed read (S14/S15 dispatch, tabular formats).

    Directories (e.g. partitioned-writer output) are routed by the
    extension of their data files — a driver-side listing peek, never
    a data read."""
    import os

    probe = path
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            data = [f for f in files if not f.startswith(("_", "."))]
            if data:
                probe = os.path.join(root, data[0])
                break
    fmt = format_for_path(probe)
    if fmt == "csv":
        return read_csv_table(spark, path, **kwargs)
    if fmt == "tsv":
        kwargs.setdefault("sep", "\t")
        return read_csv_table(spark, path, **kwargs)
    if fmt == "json":
        return read_json_table(spark, path, **kwargs)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "xml":
        from etl_pipeline_project_auraverse_spark.sources.xml_table import (
            read_xml_table,
        )

        return read_xml_table(spark, path, **kwargs)
    if fmt == "arrow":
        from etl_pipeline_project_auraverse_spark.sources.arrow_ipc import (
            read_arrow_ipc,
        )

        return read_arrow_ipc(spark, path, **kwargs)
    if fmt == "xlsx":
        from etl_pipeline_project_auraverse_spark.sources.xlsx_table import (
            read_xlsx_table,
        )

        return read_xlsx_table(spark, path, **kwargs)
    if fmt == "avro":
        from etl_pipeline_project_auraverse_spark.sources.avro_table import (
            read_avro_table,
        )

        return read_avro_table(spark, path, **kwargs)
    return spark.read.text(path, wholetext=True)


def write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Scale-path writer: every executor writes its own part files;
    ``partition_by`` gives directory-partitioned layout so downstream
    scans get partition pruning for free."""
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
