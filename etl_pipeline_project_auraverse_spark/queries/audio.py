"""Audio decode + feature extraction as a driver-checked query.

Companion to ``queries/video.py`` (same r7-ask-#6 pattern): the audio
leg of the multimodal surface (``operators/multimodal.decode_audio``)
was unit-test-only. Here every sampled document gets a REAL PCM16 WAV
payload whose waveform is a closed-form integer function of
``(doc_id, sample_index)``; the query round-trips it through the
stdlib ``wave`` writer AND reader and computes integer-exact clip
features — peak amplitude, total absolute amplitude, energy, strict
zero crossings — that the SQL oracle recomputes arithmetically from
the same closed form. A mismatch anywhere in PCM encoding, RIFF
framing, decode, or the feature math flips the hash. (The float
features rms/duration of ``decode_audio`` stay unit-checked — they
are engine-exactness-hostile by nature; everything here is BIGINT.)

Reference scope: the reference never opens media payloads
(/root/reference/backend/etl_pipeline.py:30-60) — beyond-reference
multimodal surface.

Scale: synthesis and decode are ``mapInPandas`` over the binary
column (no shuffle); the only exchange is the final doc-keyed
aggregate, which here is already per-doc (one row out per clip).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.queries._util import parallelize
from etl_pipeline_project_auraverse_spark.session import load_table

_DOC_MOD = 5
_RATE = 8000
# waveform contract shared with the oracle: n = 64 + d % 97 samples,
# amplitude a_i = ((d*7 + i*13) % 2001) - 1000  (integers in ±1000)
_MAX_N = 64 + 96


def _amps(doc_id: int):
    import numpy as np

    n = 64 + doc_id % 97
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 7 + i * 13) % 2001) - 1000).astype("<i2")


def synth_wav(doc_id: int) -> bytes:
    """PCM16 mono WAV with the contract waveform."""
    import io
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(_RATE)
        w.writeframes(_amps(doc_id).tobytes())
    return bio.getvalue()


_ORACLE = f"""
WITH idx AS (SELECT unnest(range({_MAX_N})) AS i),
s AS (
    SELECT doc_id, i,
           ((doc_id * 7 + i * 13) % 2001) - 1000 AS a,
           ((doc_id * 7 + (i + 1) * 13) % 2001) - 1000 AS a_next,
           64 + doc_id % 97 AS n
    FROM documents CROSS JOIN idx
    WHERE doc_id % {_DOC_MOD} = 0 AND i < 64 + doc_id % 97
)
SELECT doc_id,
       CAST({_RATE} AS INTEGER) AS sample_rate,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST(MAX(ABS(a)) AS BIGINT) AS peak,
       CAST(SUM(ABS(a)) AS BIGINT) AS sum_abs,
       CAST(SUM(a * a) AS BIGINT) AS energy,
       CAST(COUNT(CASE WHEN i + 1 < n AND a * a_next < 0 THEN 1 END)
            AS BIGINT) AS zero_crossings
FROM s GROUP BY doc_id ORDER BY doc_id
"""


@register("q_wav_audio_features", oracle=_ORACLE)
def q_wav_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                buf = synth_wav(int(doc_id))
                # decode through the real stdlib reader — the same
                # path decode_audio takes — so RIFF framing and PCM16
                # byte order are on the hash-checked path
                with wave.open(io.BytesIO(buf), "rb") as w:
                    sr = w.getframerate()
                    raw = w.readframes(w.getnframes())
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        sr,
                        len(s),
                        int(np.abs(s).max()),
                        int(np.abs(s).sum()),
                        int((s * s).sum()),
                        int(((s[:-1] * s[1:]) < 0).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "peak",
                    "sum_abs", "energy", "zero_crossings",
                ],
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % _DOC_MOD == 0)
    )
    return (
        parallelize(docs)
        .mapInPandas(
            run,
            schema=(
                "doc_id long, sample_rate int, n_samples long, peak long, "
                "sum_abs long, energy long, zero_crossings long"
            ),
        )
        .orderBy("doc_id")
    )
