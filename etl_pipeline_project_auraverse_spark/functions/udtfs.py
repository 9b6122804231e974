"""Python UDTF surface (table-valued functions).

SURVEY §2.5 records that the reference has no user-pluggable function
API at all; this module provides the missing UDTF leg next to the
existing scalar (Column-expression) and Pandas-UDF surfaces, using
PySpark 4's native ``@udtf`` support.

UDTFs are driver-registered, run row-at-a-time in Python workers —
the SLOW path. They exist for semantics a built-in generator
(`explode`/`posexplode`/`inline`/`stack`) cannot express: stateful
per-row expansion, irregular parsing, external-library calls. Every
UDTF here documents the built-in it should be replaced with when the
semantics allow; the query layer itself uses none of them (it stays
codegen'd) — this is API surface for engine users.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.session import SparkSession


@udtf(returnType="pos int, gram string")
class WordNgrams:
    """Word n-grams with positions: ``SELECT * FROM word_ngrams(text, 3)``.

    Built-in equivalent (preferred in pipelines):
    ``posexplode(transform(sequence(...), i -> concat_ws(' ', ...)))``
    — see ``queries/dedup.py::_exploded_gram_hashes``. The UDTF form
    exists for SQL users and as the extension template.
    """

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        toks = text.split()
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


@udtf(returnType="block_type string, body string")
class StructuredBlocks:
    """Tagged block extraction from raw text — the UDTF face of the
    reference's ``extract_structured_blocks`` (etl_pipeline.py:87-156):
    one input document row expands to N typed block rows. The
    production path is ``sources/blocks.py::scan_blocks`` (single-pass
    regexp + ``from_json``, codegen'd); this UDTF mirrors its tagging
    for SQL-level use."""

    def eval(self, text: str):  # noqa: D102
        import json as _json
        import re as _re

        if not text:
            return
        emitted = False
        for m in _re.finditer(r"\{[\s\S]+?\}", text):
            try:
                _json.loads(m.group(0))
            except Exception:
                continue
            emitted = True
            yield "json", m.group(0)
        for m in _re.finditer(r"\[\d{4}-\d{2}-\d{2} .+?\] .+", text):
            emitted = True
            yield "log", m.group(0)
        if not emitted:
            yield "error", ""


def register_udtfs(spark: SparkSession) -> None:
    """Expose the UDTFs to SQL: ``word_ngrams``, ``structured_blocks``."""
    spark.udtf.register("word_ngrams", WordNgrams)
    spark.udtf.register("structured_blocks", StructuredBlocks)
