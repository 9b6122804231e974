"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Part of the extended training-data-pipeline surface (SURVEY §7 M5).
The container has no image/audio codecs, so the *decode* steps are
stubbed behind clearly-marked seams (``_decode_image_bytes``): they
raise ``NotImplementedError`` unless a deterministic fake header is
recognized. Everything Spark-side — schema, batch iteration, partition
behavior, UDF signatures, output shapes — is real and tested.

Scale notes:
- Binary payloads ride in their own column so Catalyst column-pruning
  drops them from any plan that only touches metadata.
- All operators are ``mapInPandas`` (per-partition Arrow batches): no
  shuffle, embarrassingly parallel, memory bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
- Byte-level features (size/entropy/histogram) are real computations
  (numpy over the buffer) — the pattern a real decoder plugs into.

Fake payload format (deterministic test stand-in for a codec):
``b"FAKEIMG!" + width:uint16 + height:uint16 + channels:uint8 + pixels``
where pixels are row-major uint8. ``synth_image_bytes`` builds one.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FAKE_MAGIC = b"FAKEIMG!"

IMAGE_META_DDL = (
    "doc_id long, content binary, media_type string, width int, height int, channels int"
)
FEATURE_DDL = (
    "doc_id long, media_type string, n_bytes long, entropy double, "
    "mean_byte double, histogram array<long>"
)
DECODED_DDL = "doc_id long, width int, height int, channels int, mean_pixel double"
THUMB_DDL = "doc_id long, thumb_width int, thumb_height int, thumbnail binary"


def synth_image_bytes(doc_id: int, width: int = 8, height: int = 6, channels: int = 1) -> bytes:
    """Deterministic fake image payload for tests/stub decoding."""
    n = width * height * channels
    pixels = bytes(((doc_id * 31 + i * 7) % 256) for i in range(n))
    return FAKE_MAGIC + struct.pack("<HHB", width, height, channels) + pixels


def _decode_image_bytes(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """DECODER SEAM: real codecs (PIL/cv2/ffmpeg) are not installed in
    this container. The deterministic fake format decodes fully; any
    other payload raises — callers treat that row as corrupt."""
    if buf is None or not buf.startswith(FAKE_MAGIC):
        raise NotImplementedError(
            "image decoding requires a codec library (not installed); "
            "only the deterministic FAKEIMG format decodes here"
        )
    w, h, c = struct.unpack_from("<HHB", buf, len(FAKE_MAGIC))
    pixels = np.frombuffer(buf, dtype=np.uint8, offset=len(FAKE_MAGIC) + 5)
    return w, h, c, pixels.reshape(h, w * c)


def byte_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Codec-free byte-level features: size, Shannon entropy, mean byte,
    coarse histogram. Real math, no decode needed — the cheap first
    pass a 100 TB pipeline runs before any expensive decoding."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media_type, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                buf = np.frombuffer(bytes(content), dtype=np.uint8)
                counts = np.bincount(buf, minlength=256).astype(np.float64)
                p = counts[counts > 0] / len(buf)
                entropy = float(-(p * np.log2(p)).sum()) if len(buf) else 0.0
                hist = np.bincount(buf // (256 // n_bins), minlength=n_bins)
                rows.append(
                    (
                        int(doc_id),
                        media_type,
                        int(len(buf)),
                        round(entropy, 6),
                        round(float(buf.mean()) if len(buf) else 0.0, 6),
                        [int(x) for x in hist],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "entropy",
                    "mean_byte",
                    "histogram",
                ],
            )

    return df.mapInPandas(run, schema=FEATURE_DDL)


def decode_images(df: DataFrame) -> DataFrame:
    """Decode stage (stub-backed): emits per-image dimensions + mean
    pixel; rows whose payload can't decode are dropped (corrupt-row
    policy a real pipeline would route to a quarantine sink)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    w, h, c, pixels = _decode_image_bytes(bytes(content))
                except NotImplementedError:
                    continue
                rows.append((int(doc_id), w, h, c, round(float(pixels.mean()), 6)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "mean_pixel"]
            )

    return df.mapInPandas(run, schema=DECODED_DDL)


def resize_images(df: DataFrame, max_side: int = 4) -> DataFrame:
    """Resize/thumbnail stage on the fake format: integer-stride
    downsample re-encoded as FAKEIMG. Shows the binary-in → binary-out
    UDF shape a real resizer uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    w, h, c, pixels = _decode_image_bytes(bytes(content))
                except NotImplementedError:
                    continue
                stride = max(1, math.ceil(max(w, h) / max_side))
                thumb = pixels.reshape(h, w, c)[::stride, ::stride, :]
                th, tw = thumb.shape[0], thumb.shape[1]
                payload = (
                    FAKE_MAGIC + struct.pack("<HHB", tw, th, c) + thumb.tobytes()
                )
                rows.append((int(doc_id), tw, th, payload))
            yield pd.DataFrame(
                rows, columns=["doc_id", "thumb_width", "thumb_height", "thumbnail"]
            )

    return df.mapInPandas(run, schema=THUMB_DDL)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling stage for video-like payloads: treats each pixel
    row of the fake format as a 'frame', emits every Nth — the
    explode-shaped mapInPandas a real ffmpeg sampler plugs into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    w, h, c, pixels = _decode_image_bytes(bytes(content))
                except NotImplementedError:
                    continue
                for frame_idx in range(0, h, every_n):
                    frame = pixels[frame_idx]
                    rows.append(
                        (int(doc_id), frame_idx, round(float(frame.mean()), 6))
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_mean"])

    return df.mapInPandas(run, schema="doc_id long, frame_idx int, frame_mean double")
