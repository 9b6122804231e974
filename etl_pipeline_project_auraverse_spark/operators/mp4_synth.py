"""Deterministic MP4 (ISO-BMFF) payload synthesis.

The reference treats uploads as opaque per-extension blobs
(/root/reference/backend/etl_pipeline.py:30-60); our video leg parses
real container structure (``operators/mp4_meta.py``). This module is
the other half of making that surface *oracle-gateable*: it builds
byte-exact MP4 containers whose every parameter — geometry, sample
counts, frame deltas, per-sample byte sizes — is a pure closed-form
function of ``doc_id``. A SQL oracle can therefore recompute what the
box parser must extract without ever seeing the bytes, which turns the
container-parsing path into a driver-checkable query
(``q_mp4_video_metadata``) instead of a unit-test-only seam.

Scale posture: synthesis is a stand-in for reading real video blobs
from object storage; it runs as ``mapInPandas`` over the doc_id column
— embarrassingly parallel, no shuffle, no driver collection.

Box layout follows the public ISO/IEC 14496-12 structure: fixed-size
headers, big-endian fields, containers nested via length-prefixed
boxes (same public format the parser in ``mp4_meta.py`` reads).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _box(four: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + four + payload


def _full(version: int, payload: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + payload


def _mvhd(timescale: int, duration: int) -> bytes:
    tail = struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
    tail += b"\x00" * 36 + b"\x00" * 24 + struct.pack(">I", 2)
    return _box(
        b"mvhd",
        _full(0, struct.pack(">IIII", 0, 0, timescale, duration) + tail),
    )


def _tkhd(track_id: int, width: int, height: int) -> bytes:
    body = struct.pack(">III", 0, 0, track_id)  # ct, mt, track id
    body += b"\x00" * 4 + struct.pack(">I", 0)  # reserved, duration
    body += b"\x00" * 16  # reserved, layer/group/volume/pad
    body += b"\x00" * 36  # matrix
    body += struct.pack(">II", width << 16, height << 16)
    return _box(b"tkhd", _full(0, body))


def _mdhd(timescale: int, duration: int) -> bytes:
    return _box(
        b"mdhd",
        _full(
            0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + b"\x55\xc4\x00\x00",
        ),
    )


def _hdlr(handler: bytes) -> bytes:
    return _box(b"hdlr", _full(0, b"\x00" * 4 + handler + b"\x00" * 13))


def _stbl(
    codec: bytes, stts: list[tuple[int, int]], sizes: list[int], uniform: bool
) -> bytes:
    entry = _box(codec, b"\x00" * 8)  # minimal sample entry
    stsd = _box(b"stsd", _full(0, struct.pack(">I", 1) + entry))
    stts_b = _box(
        b"stts",
        _full(
            0,
            struct.pack(">I", len(stts))
            + b"".join(struct.pack(">II", c, d) for c, d in stts),
        ),
    )
    if uniform:  # stsz uniform-size form: sample_size != 0, no table
        stsz = _box(
            b"stsz", _full(0, struct.pack(">II", sizes[0], len(sizes)))
        )
    else:
        stsz = _box(
            b"stsz",
            _full(
                0,
                struct.pack(">II", 0, len(sizes))
                + struct.pack(f">{len(sizes)}I", *sizes),
            ),
        )
    return _box(b"stbl", stsd + stts_b + stsz)


def build_track(
    track_id: int,
    width: int,
    height: int,
    handler: bytes,
    codec: bytes,
    timescale: int,
    duration: int,
    stts: list[tuple[int, int]],
    sizes: list[int],
    uniform_stsz: bool = False,
) -> bytes:
    mdia = _box(
        b"mdia",
        _mdhd(timescale, duration)
        + _hdlr(handler)
        + _box(b"minf", _stbl(codec, stts, sizes, uniform_stsz)),
    )
    return _box(b"trak", _tkhd(track_id, width, height) + mdia)


def build_mp4(
    brand: bytes,
    movie_timescale: int,
    movie_duration: int,
    tracks: list[bytes],
) -> bytes:
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 512) + brand)
    moov = _box(b"moov", _mvhd(movie_timescale, movie_duration) + b"".join(tracks))
    return ftyp + moov + _box(b"mdat", b"\x00" * 32)


def doc_video_params(doc_id: int) -> dict[str, int]:
    """The closed-form per-doc parameters — the CONTRACT shared with
    the SQL oracle of ``q_mp4_video_metadata``. Every value is integer
    arithmetic on ``doc_id`` so DuckDB recomputes it exactly. The
    media timescale is fixed at 1000 and every frame delta is a
    multiple of 5, so all sample times are exact 3-decimal values —
    Python's round-to-6dp in the parser and SQL's ``/1000.0`` then
    produce bit-identical doubles (no half-tie exists at 1e-6)."""
    d = int(doc_id)
    return {
        "width": 320 + (d % 4) * 160,
        "height": 240 + (d % 3) * 120,
        "n1": 8 + d % 5,
        "delta1": 20 + (d % 3) * 5,
        "n2": 10 + d % 7,
        "delta2": 40 + (d % 4) * 5,
        "size_base": 400,
        "size_step": 1 + d % 5,
    }


def synth_doc_mp4(doc_id: int) -> bytes:
    """Two-track MP4 for one document: an avc1 video track whose
    stts has TWO runs (variable frame rate) and a non-uniform stsz
    ramp, plus an mp4a audio track using the uniform-stsz form — so
    one payload exercises both sample-size encodings and multi-run
    timing."""
    p = doc_video_params(doc_id)
    n = p["n1"] + p["n2"]
    dur = p["n1"] * p["delta1"] + p["n2"] * p["delta2"]
    sizes = [p["size_base"] + i * p["size_step"] for i in range(n)]
    video = build_track(
        1, p["width"], p["height"], b"vide", b"avc1", 1000, dur,
        [(p["n1"], p["delta1"]), (p["n2"], p["delta2"])], sizes,
    )
    audio = build_track(
        2, 0, 0, b"soun", b"mp4a", 1000, 32 * 25, [(32, 25)], [128] * 32,
        uniform_stsz=True,
    )
    return build_mp4(b"isom", 1000, dur, [video, audio])


def synthesize_mp4_column(df: DataFrame) -> DataFrame:
    """doc_id column → (doc_id, content binary) with a deterministic
    MP4 payload per row. ``mapInPandas`` so each partition builds its
    own payloads — at real scale this stage is replaced by the object-
    store read of actual video blobs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "content": [
                        synth_doc_mp4(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    return df.select("doc_id").mapInPandas(
        run, schema="doc_id long, content binary"
    )
