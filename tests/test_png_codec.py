"""From-scratch PNG codec tests: round-trips plus independent
filter-application vectors so the unfilter logic is checked against
the spec, not against our own encoder."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_pipeline_project_auraverse_spark.operators import multimodal as mm
from etl_pipeline_project_auraverse_spark.operators.png_codec import (
    _SIG,
    _chunk,
    decode_png,
    encode_png,
    encode_png_palette,
)


def _rand(shape, seed):
    return np.random.RandomState(seed).randint(0, 256, size=shape, dtype=np.uint8)


def test_grey_round_trip():
    px = _rand((5, 7), 1)
    w, h, c, out = decode_png(encode_png(px))
    assert (w, h, c) == (7, 5, 1)
    assert np.array_equal(out, px)


def test_rgb_round_trip():
    px = _rand((4, 6, 3), 2)
    w, h, c, out = decode_png(encode_png(px))
    assert (w, h, c) == (6, 4, 3)
    assert np.array_equal(out, px.reshape(4, 18))


def _filter_line(ftype, line, prev, bpp):
    """Reference filter application per PNG spec §9 (the encoder-side
    transform, written independently of the decoder's unfilter)."""
    out = bytearray(len(line))
    for i in range(len(line)):
        x = int(line[i])
        a = int(line[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        cc = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - ((a + b) >> 1)) & 0xFF
        elif ftype == 4:
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out[i] = (x - pred) & 0xFF
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_type_unfilters(ftype):
    px = _rand((4, 5, 3), ftype + 10)
    h, w = 4, 5
    stride = w * 3
    flat = px.reshape(h, stride)
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        raw.append(ftype)
        raw += _filter_line(ftype, bytes(flat[y]), prev, 3)
        prev = bytes(flat[y])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    got_w, got_h, got_c, out = decode_png(png)
    assert (got_w, got_h, got_c) == (w, h, 3)
    assert np.array_equal(out, flat), f"filter {ftype} mismatch"


def test_palette_round_trip():
    idx = np.random.RandomState(5).randint(0, 16, size=(5, 9), dtype=np.uint8)
    pal = _rand((16, 3), 6)
    w, h, c, out = decode_png(encode_png_palette(idx, pal))
    assert (w, h, c) == (9, 5, 3)
    assert np.array_equal(out, pal[idx].reshape(5, 27))


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_palette_filtered_scanlines_unfilter(ftype):
    """Palette scanlines filter over 1-byte indices (bpp=1), and the
    PLTE lookup happens after unfiltering — independent filter vectors
    again, not our encoder's filter-0 output."""
    h, w = 4, 6
    idx = np.random.RandomState(20 + ftype).randint(0, 8, size=(h, w), dtype=np.uint8)
    pal = _rand((8, 3), 21)
    raw = bytearray()
    prev = bytes(w)
    for y in range(h):
        raw.append(ftype)
        raw += _filter_line(ftype, bytes(idx[y]), prev, 1)
        prev = bytes(idx[y])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    png = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    got_w, got_h, got_c, out = decode_png(png)
    assert (got_w, got_h, got_c) == (w, h, 3)
    assert np.array_equal(out, pal[idx].reshape(h, w * 3)), f"filter {ftype}"


def test_palette_index_out_of_range_rejected():
    idx = np.full((2, 2), 9, dtype=np.uint8)
    pal = _rand((4, 3), 7)  # only indices 0..3 valid
    png = encode_png_palette(idx, pal)
    with pytest.raises(ValueError, match="palette index"):
        decode_png(png)


def test_palette_png_flows_through_decode_stage(spark):
    idx = np.random.RandomState(9).randint(0, 4, size=(6, 8), dtype=np.uint8)
    pal = _rand((4, 3), 10)
    rows = [(11, bytearray(encode_png_palette(idx, pal)), "image/png")]
    df = spark.createDataFrame(rows, "doc_id long, content binary, media_type string")
    got = mm.decode_images(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["width"], r["height"], r["channels"]) == (8, 6, 3)
    assert abs(r["mean_pixel"] - float(pal[idx].mean())) < 1e-6


def test_unsupported_variants_raise():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # palette, no PLTE
    png = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\0" * 6)) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(png)
    with pytest.raises(NotImplementedError):
        decode_png(b"not a png at all")
    # 16-bit and interlaced stay quarantined
    for ihdr in (
        struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0),
        struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1),
    ):
        png = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\0" * 6)) + _chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError):
            decode_png(png)


def test_png_flows_through_decode_stage(spark):
    px0 = _rand((6, 8), 42)
    rows = [(7, bytearray(encode_png(px0)), "image/png")]
    df = spark.createDataFrame(rows, "doc_id long, content binary, media_type string")
    got = mm.decode_images(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["width"], r["height"], r["channels"]) == (8, 6, 1)
    assert abs(r["mean_pixel"] - float(px0.mean())) < 1e-6
