"""Oracle gates for the real from-scratch AUDIO decoders (r12 verdict
ask #5, completing the codec-gate family that ``queries/image_codecs
.py`` started): before this module the audio leg decoded only PCM16
WAV; the compressed formats a real speech/audio corpus actually ships
— G.711 mu-law and IMA-ADPCM WAV — were quarantined at the codec seam.
Both are now decoded FOR REAL (``operators/multimodal._decode_audio_
bytes`` — from-scratch RIFF chunk walk, G.711 expansion, IMA nibble/
step-table reconstruction; the stdlib ``wave`` module refuses every
non-PCM format tag, so no library path exists) and gated here on
integer-exact per-clip features whose closed forms the DuckDB oracle
recomputes arithmetically:

- ``q_wav_mulaw_decode_audit``: the payload's code stream is
  c_i = (doc_id*13 + i*7) % 256, so across docs all 256 mu-law codes
  hit the expansion; the oracle mirrors the ITU-T G.711 expansion
  itself (complement, segment shift, 0x84 bias) in integer SQL. Gated
  on sample sum, absolute sum, position-weighted checksum (catches
  reordering the plain sum can't) and peak.
- ``q_wav_alaw_decode_audit``: the same gate shape through G.711's
  OTHER half — A-law (format tag 6), whose 0x55 even-bit toggle,
  seg-0 special case and inverted sign convention are a distinct
  expansion path mirrored independently in the oracle.
- ``q_wav_ima_adpcm_decode_audit``: 2-block payload with per-block
  closed-form (predictor, step index) headers and a fixed nibble
  pattern that drives the step index UP and DOWN each period without
  clamping, so header parse, low-nibble-first unpacking, the diff
  shift cascade, sign nibbles, step-table adaptation in both
  directions AND the block-boundary state reset are all inside the
  hash; the oracle rebuilds every sample as a window-sum of the same
  closed-form diffs.

The payload writers (``operators/multimodal.synth_{mulaw,ima_adpcm}_
wav_bytes``) are independent spec-side implementations sharing no
code with the decoder (the shared ``_wav_container`` helper is
writer-only), so the gates attest spec conformance, not encoder/
decoder co-bugs — the image_codecs.py contract.

Reference scope: the reference dispatches uploads by extension and
never opens payloads (/root/reference/backend/etl_pipeline.py:30-60);
real decoders are part of the beyond-reference multimodal surface.

Scale: synthesis + decode run as one ``mapInPandas`` over each doc
slice (per-partition, no shuffle; payloads are <200 bytes); the only
exchange is the doc-keyed caption join and the final ``ORDER BY
doc_id``. At 100 TB the synth stage is replaced by the object-store
scan and everything downstream is unchanged.
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

_SQL_N_WORDS = r"CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)"

# mu-law clip length contract: n = 96 + doc_id % 57 samples (<= 152)
_MULAW_MAX_N = 96 + 56
_MULAW_MOD = 5  # doc slice doc_id % 5 == 1 (audio.py's PCM gate owns 0)

_MULAW_ORACLE = f"""
WITH idx AS (SELECT unnest(range({_MULAW_MAX_N})) AS i),
clip AS (
    SELECT doc_id, 96 + doc_id % 57 AS n, text FROM documents
    WHERE doc_id % {_MULAW_MOD} = 1
),
-- u = one's complement of the stored code (the G.711 expansion input)
s AS (
    SELECT c.doc_id, idx.i,
           255 - ((c.doc_id * 13 + idx.i * 7) % 256) AS u
    FROM clip c CROSS JOIN idx WHERE idx.i < c.n
),
-- ITU-T G.711 mu-law expansion: magnitude = ((mant*8 + 132) << seg) - 132
dec AS (
    SELECT doc_id, i,
           CASE WHEN u >= 128
                THEN 132 - (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)))
                ELSE (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132
           END AS v
    FROM s
),
sums AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sample_sum,
           CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
           CAST(SUM((i + 1) * v) AS BIGINT) AS position_checksum,
           CAST(MAX(ABS(v)) AS BIGINT) AS peak
    FROM dec GROUP BY doc_id
)
SELECT c.doc_id, s.n_samples, s.sample_sum, s.sum_abs,
       s.position_checksum, s.peak,
       {_SQL_N_WORDS} AS n_words
FROM clip c JOIN sums s USING (doc_id)
ORDER BY doc_id
"""


@register("q_wav_mulaw_decode_audit", oracle=_MULAW_ORACLE)
def q_wav_mulaw_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per mu-law-bearing document: REAL decode through the from-scratch
    WAV codec seam of a G.711 mu-law payload whose code stream is a
    closed form of (doc_id, i), gated on integer-exact sample sums, a
    position-weighted checksum and peak — the oracle recomputes the
    G.711 expansion arithmetically, so any fault in RIFF chunk
    walking, fmt-tag dispatch or the expansion itself flips the hash."""
    import numpy as np

    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        _decode_audio_bytes,
        synth_mulaw_wav_bytes,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 96 + d % 57
                _sr, _nch, s = _decode_audio_bytes(synth_mulaw_wav_bytes(d, n))
                v = s.astype(np.int64)
                i = np.arange(len(v), dtype=np.int64)
                rows.append(
                    (
                        d,
                        len(v),
                        int(v.sum()),
                        int(np.abs(v).sum()),
                        int(((i + 1) * v).sum()),
                        int(np.abs(v).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_sum", "sum_abs",
                    "position_checksum", "peak",
                ],
            )

    clip = parallelize(
        load_table(spark, sf_dir, "documents").filter(
            (F.col("doc_id") % _MULAW_MOD) == 1
        )
    )
    facts = clip.select("doc_id").mapInPandas(
        run,
        schema=(
            "doc_id long, n_samples long, sample_sum long, sum_abs long, "
            "position_checksum long, peak long"
        ),
    )
    nw = F.size(words(F.col("text"))).cast("long")
    caption = clip.select("doc_id", nw.alias("n_words"))
    return (
        facts.join(caption, "doc_id")
        .select(
            "doc_id", "n_samples", "sample_sum", "sum_abs",
            "position_checksum", "peak", "n_words",
        )
        .orderBy("doc_id")
    )


# A-law clip length contract: n = 88 + doc_id % 61 samples (<= 148)
_ALAW_MAX_N = 88 + 60
_ALAW_MOD = 5  # doc slice doc_id % 5 == 3

_ALAW_ORACLE = f"""
WITH idx AS (SELECT unnest(range({_ALAW_MAX_N})) AS i),
clip AS (
    SELECT doc_id, 88 + doc_id % 61 AS n, text FROM documents
    WHERE doc_id % {_ALAW_MOD} = 3
),
-- u = stored code with the spec's 0x55 even-bit toggle undone
s AS (
    SELECT c.doc_id, idx.i,
           xor((c.doc_id * 19 + idx.i * 11) % 256, 85) AS u
    FROM clip c CROSS JOIN idx WHERE idx.i < c.n
),
-- ITU-T G.711 A-law expansion: seg 0 -> mant*16 + 8, seg >= 1 ->
-- (mant*16 + 264) << (seg - 1); sign bit SET means positive
dec AS (
    SELECT doc_id, i,
           (CASE WHEN u >= 128 THEN 1 ELSE -1 END) *
           (CASE WHEN (u // 16) % 8 = 0 THEN (u % 16) * 16 + 8
                 ELSE ((u % 16) * 16 + 264) * (1 << ((u // 16) % 8 - 1))
            END) AS v
    FROM s
),
sums AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sample_sum,
           CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
           CAST(SUM((i + 1) * v) AS BIGINT) AS position_checksum,
           CAST(MAX(ABS(v)) AS BIGINT) AS peak
    FROM dec GROUP BY doc_id
)
SELECT c.doc_id, s.n_samples, s.sample_sum, s.sum_abs,
       s.position_checksum, s.peak,
       {_SQL_N_WORDS} AS n_words
FROM clip c JOIN sums s USING (doc_id)
ORDER BY doc_id
"""


@register("q_wav_alaw_decode_audit", oracle=_ALAW_ORACLE)
def q_wav_alaw_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per A-law-bearing document: REAL decode through the from-scratch
    WAV codec seam of a G.711 A-law payload (format tag 6) — the
    mu-law gate's sibling, with the OPPOSITE sign convention and the
    0x55 even-bit toggle instead of a complement, so the two G.711
    expansion paths are attested independently. Same integer-exact
    gate shape: sample sums, position-weighted checksum, peak, all
    recomputed arithmetically by the oracle."""
    import numpy as np

    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        _decode_audio_bytes,
        synth_alaw_wav_bytes,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 88 + d % 61
                _sr, _nch, s = _decode_audio_bytes(synth_alaw_wav_bytes(d, n))
                v = s.astype(np.int64)
                i = np.arange(len(v), dtype=np.int64)
                rows.append(
                    (
                        d,
                        len(v),
                        int(v.sum()),
                        int(np.abs(v).sum()),
                        int(((i + 1) * v).sum()),
                        int(np.abs(v).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_sum", "sum_abs",
                    "position_checksum", "peak",
                ],
            )

    clip = parallelize(
        load_table(spark, sf_dir, "documents").filter(
            (F.col("doc_id") % _ALAW_MOD) == 3
        )
    )
    facts = clip.select("doc_id").mapInPandas(
        run,
        schema=(
            "doc_id long, n_samples long, sample_sum long, sum_abs long, "
            "position_checksum long, peak long"
        ),
    )
    nw = F.size(words(F.col("text"))).cast("long")
    caption = clip.select("doc_id", nw.alias("n_words"))
    return (
        facts.join(caption, "doc_id")
        .select(
            "doc_id", "n_samples", "sample_sum", "sum_abs",
            "position_checksum", "peak", "n_words",
        )
        .orderBy("doc_id")
    )


# IMA-ADPCM gate geometry (operators/multimodal.IMA_GATE_*): 2 blocks,
# 65 samples each (header predictor + 64 nibbles), nibble pattern
# period 6 = [4, 0, 3, 12, 8, 11] -> step index s -> s+2 -> s+1 per
# 3 nibbles (net 0), diff sign + + + - - -. Steps hardcoded from the
# IMA step table for indices 4..9 (s in [4, 7] keeps the walk inside
# that window, so no clamping arm is needed in the closed form).
_ADPCM_MOD = 5  # doc slice doc_id % 5 == 2

_ADPCM_ORACLE = f"""
WITH blocks AS (SELECT unnest(range(2)) AS b),
nib AS (SELECT unnest(range(64)) AS j),
clip AS (
    SELECT doc_id, text FROM documents WHERE doc_id % {_ADPCM_MOD} = 2
),
hdr AS (
    SELECT c.doc_id, bl.b,
           ((c.doc_id * 31 + bl.b * 101) % 4001) - 2000 AS pred0,
           4 + (c.doc_id + bl.b) % 4 AS s
    FROM clip c CROSS JOIN blocks bl
),
-- step BEFORE decoding nibble j: index = s + [0, 2, 1][j % 3],
-- mapped through the IMA step table entries 4..9
steps AS (
    SELECT h.doc_id, h.b, h.pred0, n.j,
           CASE h.s + (CASE n.j % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 1 END)
                WHEN 4 THEN 11 WHEN 5 THEN 12 WHEN 6 THEN 13
                WHEN 7 THEN 14 WHEN 8 THEN 16 ELSE 17 END AS st
    FROM hdr h CROSS JOIN nib n
),
-- the spec's shift-cascade diff for nibble magnitudes 4 / 0 / 3,
-- sign-flipped on the second half of each period (nibbles 12 / 8 / 11)
diffs AS (
    SELECT doc_id, b, pred0, j,
           (CASE WHEN j % 6 < 3 THEN 1 ELSE -1 END) *
           (CASE j % 3
                WHEN 0 THEN st + st // 8
                WHEN 1 THEN st // 8
                ELSE st // 2 + st // 4 + st // 8 END) AS d
    FROM steps
),
samp AS (
    SELECT doc_id, b, 0 AS k, pred0 AS v FROM hdr
    UNION ALL
    SELECT doc_id, b, j + 1 AS k,
           pred0 + SUM(d) OVER (PARTITION BY doc_id, b ORDER BY j) AS v
    FROM diffs
),
flat AS (SELECT doc_id, b * 65 + k AS i, v FROM samp),
sums AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sample_sum,
           CAST(SUM((i + 1) * v) AS BIGINT) AS position_checksum,
           CAST(MAX(ABS(v)) AS BIGINT) AS peak
    FROM flat GROUP BY doc_id
)
SELECT c.doc_id, s.n_samples, s.sample_sum, s.position_checksum, s.peak,
       {_SQL_N_WORDS} AS n_words
FROM clip c JOIN sums s USING (doc_id)
ORDER BY doc_id
"""


@register("q_wav_ima_adpcm_decode_audit", oracle=_ADPCM_ORACLE)
def q_wav_ima_adpcm_decode_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per ADPCM-bearing document: REAL decode through the from-scratch
    IMA-ADPCM path (block headers, low-nibble-first unpacking, shift-
    cascade diffs, bidirectional step-table adaptation, block-reset)
    of a 2-block payload whose every decoded sample is a closed-form
    window-sum the oracle rebuilds — gated on sample sum, a position-
    weighted checksum (a swapped nibble order or misplaced block
    boundary flips it) and peak."""
    import numpy as np

    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        _decode_audio_bytes,
        synth_ima_adpcm_wav_bytes,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                _sr, _nch, s = _decode_audio_bytes(synth_ima_adpcm_wav_bytes(d))
                v = s.astype(np.int64)
                i = np.arange(len(v), dtype=np.int64)
                rows.append(
                    (
                        d,
                        len(v),
                        int(v.sum()),
                        int(((i + 1) * v).sum()),
                        int(np.abs(v).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_sum",
                    "position_checksum", "peak",
                ],
            )

    clip = parallelize(
        load_table(spark, sf_dir, "documents").filter(
            (F.col("doc_id") % _ADPCM_MOD) == 2
        )
    )
    facts = clip.select("doc_id").mapInPandas(
        run,
        schema=(
            "doc_id long, n_samples long, sample_sum long, "
            "position_checksum long, peak long"
        ),
    )
    nw = F.size(words(F.col("text"))).cast("long")
    caption = clip.select("doc_id", nw.alias("n_words"))
    return (
        facts.join(caption, "doc_id")
        .select(
            "doc_id", "n_samples", "sample_sum",
            "position_checksum", "peak", "n_words",
        )
        .orderBy("doc_id")
    )
