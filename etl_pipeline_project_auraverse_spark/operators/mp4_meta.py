"""MP4 (ISO-BMFF) metadata extraction — stdlib-only box parsing.

The video leg of the multimodal story (reference treats uploads as
opaque blobs; see /root/reference/backend/etl_pipeline.py:30-60 for
its per-extension dispatch): we parse the REAL container structure —
ftyp brand, movie header timescale/duration, per-track dimensions,
handler, sample-description fourcc, and the stts/stsz sample tables —
without decoding any video. That gives exact frame counts, per-frame
timestamps, and byte sizes (everything a frame-sampling stage needs to
plan work) while the pixel decode itself stays behind the documented
quarantine seam: this container ships no codec libraries, so
``sample_mp4_frames`` emits the frame TIMELINE (index, time, bytes)
and a real ffmpeg/NVDEC stage plugs in where the stub sits.

Scale posture: both operators are ``mapInPandas`` over the binary
column — embarrassingly parallel, no shuffle, quarantine rows skipped
exactly like the image/audio seams.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(buf: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, payload_start, payload_end) for each box in
    [start, end); raises NotImplementedError on malformed sizes."""
    pos = start
    while pos + 8 <= end:
        size, four = struct.unpack_from(">I4s", buf, pos)
        payload = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise NotImplementedError("truncated MP4 largesize box")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            payload = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise NotImplementedError(f"malformed MP4 box {four!r} size {size}")
        yield four, payload, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, four: bytes) -> tuple[int, int] | None:
    for f, a, b in _boxes(buf, start, end):
        if f == four:
            return a, b
    return None


def _fullbox(buf: bytes, pos: int) -> tuple[int, int]:
    """(version, payload_pos_after_version_flags)."""
    return buf[pos], pos + 4


def _parse_mvhd(buf: bytes, a: int, b: int) -> tuple[int, int]:
    v, p = _fullbox(buf, a)
    if v == 1:
        _ct, _mt, ts, dur = struct.unpack_from(">QQIQ", buf, p)
    else:
        _ct, _mt, ts, dur = struct.unpack_from(">IIII", buf, p)
    return ts, dur


def _parse_stts(buf: bytes, a: int, b: int) -> list[tuple[int, int]]:
    _v, p = _fullbox(buf, a)
    n = struct.unpack_from(">I", buf, p)[0]
    return [struct.unpack_from(">II", buf, p + 4 + 8 * i) for i in range(n)]


def _parse_stsz(buf: bytes, a: int, b: int) -> tuple[int, list[int]]:
    _v, p = _fullbox(buf, a)
    uniform, count = struct.unpack_from(">II", buf, p)
    if uniform:
        return count, [uniform] * count
    return count, list(struct.unpack_from(f">{count}I", buf, p + 8))


def _parse_trak(buf: bytes, a: int, b: int) -> dict[str, Any]:
    out: dict[str, Any] = {
        "track_id": None,
        "width": None,
        "height": None,
        "handler": None,
        "codec": None,
        "timescale": None,
        "duration": None,
        "stts": [],
        "sizes": [],
        "n_samples": 0,
    }
    tkhd = _find(buf, a, b, b"tkhd")
    if tkhd:
        v, p = _fullbox(buf, tkhd[0])
        p += 16 if v == 0 else 24  # times + track id offset below
        out["track_id"] = struct.unpack_from(
            ">I", buf, tkhd[0] + 4 + (8 if v == 0 else 16)
        )[0]
        # width/height: 16.16 fixed, last 8 bytes of the box payload
        w_fixed, h_fixed = struct.unpack_from(">II", buf, tkhd[1] - 8)
        out["width"] = w_fixed >> 16
        out["height"] = h_fixed >> 16
    mdia = _find(buf, a, b, b"mdia")
    if not mdia:
        return out
    mdhd = _find(buf, mdia[0], mdia[1], b"mdhd")
    if mdhd:
        v, p = _fullbox(buf, mdhd[0])
        if v == 1:
            _ct, _mt, ts, dur = struct.unpack_from(">QQIQ", buf, p)
        else:
            _ct, _mt, ts, dur = struct.unpack_from(">IIII", buf, p)
        out["timescale"], out["duration"] = ts, dur
    hdlr = _find(buf, mdia[0], mdia[1], b"hdlr")
    if hdlr:
        out["handler"] = buf[hdlr[0] + 8 : hdlr[0] + 12].decode("latin1")
    minf = _find(buf, mdia[0], mdia[1], b"minf")
    stbl = _find(buf, minf[0], minf[1], b"stbl") if minf else None
    if stbl:
        stsd = _find(buf, stbl[0], stbl[1], b"stsd")
        if stsd:
            _v, p = _fullbox(buf, stsd[0])
            if struct.unpack_from(">I", buf, p)[0] >= 1:
                out["codec"] = buf[p + 8 : p + 12].decode("latin1")
        stts = _find(buf, stbl[0], stbl[1], b"stts")
        if stts:
            out["stts"] = _parse_stts(buf, *stts)
        stsz = _find(buf, stbl[0], stbl[1], b"stsz")
        if stsz:
            out["n_samples"], out["sizes"] = _parse_stsz(buf, *stsz)
    return out


def parse_mp4(buf: bytes) -> dict[str, Any]:
    """Parse an ISO-BMFF buffer into container + per-track metadata.

    Raises NotImplementedError (the quarantine contract shared with the
    image/audio codecs) for non-MP4 or structurally broken payloads.
    """
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise NotImplementedError("not an ISO-BMFF (ftyp) container")
    out: dict[str, Any] = {
        "major_brand": buf[8:12].decode("latin1"),
        "timescale": None,
        "duration_sec": None,
        "tracks": [],
    }
    moov = _find(buf, 0, len(buf), b"moov")
    if not moov:
        raise NotImplementedError("MP4 without a moov box")
    mvhd = _find(buf, moov[0], moov[1], b"mvhd")
    if mvhd:
        ts, dur = _parse_mvhd(buf, *mvhd)
        out["timescale"] = ts
        out["duration_sec"] = round(dur / ts, 6) if ts else None
    for four, a, b in _boxes(buf, moov[0], moov[1]):
        if four == b"trak":
            out["tracks"].append(_parse_trak(buf, a, b))
    return out


def sample_times(stts: list[tuple[int, int]], timescale: int) -> list[float]:
    """Per-sample start times in seconds from a decoded stts table."""
    times: list[float] = []
    t = 0
    for count, delta in stts:
        for _ in range(count):
            times.append(round(t / timescale, 6))
            t += delta
    return times


VIDEO_META_DDL = (
    "doc_id long, major_brand string, duration_sec double, track_id long, "
    "handler string, codec string, width int, height int, n_samples long, "
    "fps double"
)


def video_metadata(df: DataFrame) -> DataFrame:
    """One row per track of each decodable MP4 payload: brand, movie
    duration, track geometry/handler/codec, sample count, and the
    fps implied by the sample table. Undecodable payloads quarantine
    (skipped), matching the image/audio seams."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    meta = parse_mp4(bytes(content))
                except NotImplementedError:
                    continue
                for tr in meta["tracks"]:
                    dur = (
                        tr["duration"] / tr["timescale"]
                        if tr["timescale"]
                        else None
                    )
                    fps = (
                        round(tr["n_samples"] / dur, 6)
                        if dur and tr["n_samples"]
                        else None
                    )
                    rows.append(
                        (
                            int(doc_id),
                            meta["major_brand"],
                            meta["duration_sec"],
                            tr["track_id"],
                            tr["handler"],
                            tr["codec"],
                            tr["width"],
                            tr["height"],
                            tr["n_samples"],
                            fps,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "major_brand",
                    "duration_sec",
                    "track_id",
                    "handler",
                    "codec",
                    "width",
                    "height",
                    "n_samples",
                    "fps",
                ],
            )

    return df.mapInPandas(run, schema=VIDEO_META_DDL)


def sample_mp4_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Decode-free frame-timeline sampling: every Nth video sample's
    index, start time, and byte size straight from stts/stsz — the
    exact work-plan a real decode stage (ffmpeg/NVDEC, not shipped in
    this container) would execute. The pixel decode is the documented
    stub; the container math and the Spark plumbing are real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    meta = parse_mp4(bytes(content))
                except NotImplementedError:
                    continue
                for tr in meta["tracks"]:
                    if tr["handler"] != "vide" or not tr["timescale"]:
                        continue
                    times = sample_times(tr["stts"], tr["timescale"])
                    for i in range(0, min(len(times), tr["n_samples"]), every_n):
                        rows.append(
                            (
                                int(doc_id),
                                tr["track_id"],
                                i,
                                times[i],
                                tr["sizes"][i] if i < len(tr["sizes"]) else None,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "track_id",
                    "sample_idx",
                    "time_sec",
                    "sample_bytes",
                ],
            )

    return df.mapInPandas(
        run,
        schema=(
            "doc_id long, track_id long, sample_idx int, time_sec double, "
            "sample_bytes long"
        ),
    )
