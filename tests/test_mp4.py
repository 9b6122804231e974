"""MP4 (ISO-BMFF) metadata extraction: box parsing on hand-built
containers, the Spark operator faces, and the quarantine contract."""

from __future__ import annotations

import struct

import pytest

from etl_pipeline_project_auraverse_spark.operators.mp4_meta import (
    parse_mp4,
    sample_mp4_frames,
    sample_times,
    video_metadata,
)


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
    body += b"\x00" * 8 + b"\x00" * 8  # reserved, layer/group/vol/pad
    body += b"\x00" * 36  # matrix
    body += struct.pack(">II", width << 16, height << 16)
    return _box(b"tkhd", _full(0, body))


def _mdhd(timescale: int, duration: int) -> bytes:
    return _box(
        b"mdhd",
        _full(0, struct.pack(">IIII", 0, 0, timescale, duration) + b"\x55\xc4\x00\x00"),
    )


def _hdlr(handler: bytes) -> bytes:
    return _box(b"hdlr", _full(0, b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00"))


def _stbl(codec: bytes, stts: list[tuple[int, int]], sizes: list[int]) -> bytes:
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
    stsz = _box(
        b"stsz",
        _full(
            0,
            struct.pack(">II", 0, len(sizes))
            + struct.pack(f">{len(sizes)}I", *sizes),
        ),
    )
    return _box(b"stbl", stsd + stts_b + stsz)


def _trak(track_id, w, h, handler, codec, timescale, duration, stts, sizes):
    mdia = _box(
        b"mdia",
        _mdhd(timescale, duration)
        + _hdlr(handler)
        + _box(b"minf", _stbl(codec, stts, sizes)),
    )
    return _box(b"trak", _tkhd(track_id, w, h) + mdia)


def synth_mp4_bytes() -> bytes:
    """Two-track MP4: 640x360 avc1 video (10 samples, 10 fps) + mp4a
    audio."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    video = _trak(
        1, 640, 360, b"vide", b"avc1", 1000, 1000,
        [(4, 100), (6, 100)], [500 + i for i in range(10)],
    )
    audio = _trak(2, 0, 0, b"soun", b"mp4a", 48000, 48000, [(48, 1000)], [128] * 48)
    moov = _box(b"moov", _mvhd(1000, 1000) + video + audio)
    return ftyp + moov + _box(b"mdat", b"\x00" * 64)


def test_parse_mp4_metadata():
    meta = parse_mp4(synth_mp4_bytes())
    assert meta["major_brand"] == "isom"
    assert meta["duration_sec"] == 1.0
    vide, soun = meta["tracks"]
    assert (vide["track_id"], vide["width"], vide["height"]) == (1, 640, 360)
    assert (vide["handler"], vide["codec"]) == ("vide", "avc1")
    assert vide["n_samples"] == 10 and vide["sizes"][0] == 500
    assert (soun["handler"], soun["codec"], soun["n_samples"]) == (
        "soun", "mp4a", 48,
    )


def test_sample_times_from_stts():
    assert sample_times([(2, 100), (1, 300)], 1000) == [0.0, 0.1, 0.2]


def test_quarantine_contract():
    with pytest.raises(NotImplementedError):
        parse_mp4(b"not an mp4 container!!")
    with pytest.raises(NotImplementedError):
        parse_mp4(_box(b"ftyp", b"isom" + b"\x00" * 8))  # no moov


def test_video_metadata_operator(spark):
    rows = [(0, bytearray(synth_mp4_bytes())), (9, bytearray(b"junk bytes"))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = video_metadata(df).orderBy("doc_id", "track_id").collect()
    assert len(got) == 2  # junk row quarantined, two tracks survive
    v = got[0]
    assert (v.doc_id, v.handler, v.codec, v.width, v.height) == (
        0, "vide", "avc1", 640, 360,
    )
    assert v.fps == 10.0 and v.duration_sec == 1.0
    assert got[1].handler == "soun"


def test_sample_mp4_frames_operator(spark):
    df = spark.createDataFrame(
        [(0, bytearray(synth_mp4_bytes()))], "doc_id long, content binary"
    )
    got = sample_mp4_frames(df, every_n=3).orderBy("sample_idx").collect()
    # video samples 0,3,6,9 at 0.1s spacing; audio track has no vide handler
    assert [(r.sample_idx, r.time_sec, r.sample_bytes) for r in got] == [
        (0, 0.0, 500), (3, 0.3, 503), (6, 0.6, 506), (9, 0.9, 509),
    ]
