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


def test_unsupported_variants_raise():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # palette
    png = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\0" * 6)) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(png)
    with pytest.raises(NotImplementedError):
        decode_png(b"not a png at all")


def test_png_flows_through_decode_stage(spark):
    px0 = _rand((6, 8), 42)
    rows = [(7, bytearray(encode_png(px0)), "image/png")]
    df = spark.createDataFrame(rows, "doc_id long, content binary, media_type string")
    got = mm.decode_images(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["width"], r["height"], r["channels"]) == (8, 6, 1)
    assert abs(r["mean_pixel"] - float(px0.mean())) < 1e-6
