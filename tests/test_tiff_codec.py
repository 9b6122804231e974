"""From-scratch TIFF codec: fixtures built byte-by-byte from the TIFF
6.0 spec, decoded and compared against the known pixel arrays."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_pipeline_project_auraverse_spark.operators.tiff_codec import (
    _unpackbits,
    decode_tiff,
)


def _packbits(data: bytes) -> bytes:
    """Reference PackBits encoder (runs >= 3 encoded as repeats)."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 127:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            lit_start = i
            i += run
            while (
                i < len(data)
                and i - lit_start < 127
                and not (
                    i + 2 < len(data)
                    and data[i] == data[i + 1] == data[i + 2]
                )
            ):
                i += 1
            out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def _build_tiff(
    width,
    height,
    photometric,
    pixels,  # bytes, row-major, post-palette-index / pre-inversion
    bo="<",
    spp=1,
    compression=1,
    rows_per_strip=None,
    colormap=None,
):
    rows_per_strip = rows_per_strip or height
    row_bytes = width * spp
    strips = []
    r = 0
    while r < height:
        n = min(rows_per_strip, height - r)
        chunk = pixels[r * row_bytes : (r + n) * row_bytes]
        strips.append(chunk if compression == 1 else _packbits(chunk))
        r += n

    entries = {
        256: (4, [width]),
        257: (4, [height]),
        258: (3, [8] * spp),
        259: (3, [compression]),
        262: (3, [photometric]),
        277: (3, [spp]),
        278: (4, [rows_per_strip]),
    }
    if colormap is not None:
        entries[320] = (3, colormap)

    # layout: header(8) + IFD + out-of-line values + strip data
    n_tags = len(entries) + 2  # + StripOffsets, StripByteCounts
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    heap = bytearray()
    heap_base = ifd_off + ifd_size

    def value_field(typ, vals):
        size = {3: 2, 4: 4}[typ] * len(vals)
        fmt = bo + {3: "H", 4: "I"}[typ] * len(vals)
        packed = struct.pack(fmt, *vals)
        if size <= 4:
            return packed.ljust(4, b"\x00")
        off = heap_base + len(heap)
        heap.extend(packed)
        return struct.pack(bo + "I", off)

    # strip value arrays need final offsets: place strip data after heap.
    tag_list = []
    for tag in sorted(entries):
        typ, vals = entries[tag]
        tag_list.append((tag, typ, len(vals), value_field(typ, vals)))
    # reserve heap room for offsets/counts arrays if >1 strip
    counts = [len(s) for s in strips]
    if len(strips) == 1:
        off_field_placeholder = None
        tag_list.append((273, 4, 1, None))  # patched below
        tag_list.append((279, 4, 1, struct.pack(bo + "I", counts[0])))
    else:
        off_arr_off = heap_base + len(heap)
        heap.extend(b"\x00" * 4 * len(strips))  # patched below
        cnt_arr_off = heap_base + len(heap)
        heap.extend(struct.pack(bo + "I" * len(strips), *counts))
        tag_list.append((273, 4, len(strips), struct.pack(bo + "I", off_arr_off)))
        tag_list.append((279, 4, len(strips), struct.pack(bo + "I", cnt_arr_off)))
    tag_list.sort()

    data_base = heap_base + len(heap)
    strip_offsets = []
    pos = data_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    # patch strip offsets
    if len(strips) == 1:
        tag_list = [
            (t, typ, c, struct.pack(bo + "I", strip_offsets[0]) if t == 273 else v)
            for t, typ, c, v in tag_list
        ]
    else:
        struct.pack_into(
            bo + "I" * len(strips), heap, off_arr_off - heap_base, *strip_offsets
        )

    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, ifd_off)
    out += struct.pack(bo + "H", len(tag_list))
    for tag, typ, count, val in tag_list:
        out += struct.pack(bo + "HHI", tag, typ, count) + val
    out += struct.pack(bo + "I", 0)  # next-IFD pointer
    out += heap
    for s in strips:
        out += s
    return bytes(out)


def _pix(w, h, c=1, seed=3):
    return bytes(((seed * 31 + i * 7) % 256) for i in range(w * h * c))


@pytest.mark.parametrize("bo", ["<", ">"])
def test_grey_uncompressed(bo):
    w, h = 7, 5
    pix = _pix(w, h)
    buf = _build_tiff(w, h, photometric=1, pixels=pix, bo=bo)
    W, H, C, arr = decode_tiff(buf)
    assert (W, H, C) == (w, h, 1)
    assert arr.tobytes() == pix


def test_white_is_zero_inverts():
    w, h = 4, 3
    pix = _pix(w, h)
    buf = _build_tiff(w, h, photometric=0, pixels=pix)
    _, _, _, arr = decode_tiff(buf)
    assert arr.tobytes() == bytes(255 - b for b in pix)


@pytest.mark.parametrize("rows_per_strip", [1, 2, 5])
def test_rgb_packbits_multistrip(rows_per_strip):
    w, h = 6, 5
    pix = _pix(w, h, 3)
    buf = _build_tiff(
        w,
        h,
        photometric=2,
        pixels=pix,
        spp=3,
        compression=32773,
        rows_per_strip=rows_per_strip,
    )
    W, H, C, arr = decode_tiff(buf)
    assert (W, H, C) == (w, h, 3)
    assert arr.tobytes() == pix


def test_palette_expands_to_rgb():
    w, h = 5, 4
    idx = bytes((i % 4) for i in range(w * h))
    # 4-entry palette, 16-bit per channel (value*257 maps back to 8-bit)
    reds = [0, 65535, 32896, 12850]
    greens = [65535, 0, 8224, 514]
    blues = [257, 514, 771, 65535]
    buf = _build_tiff(
        w, h, photometric=3, pixels=idx, colormap=reds + greens + blues
    )
    W, H, C, arr = decode_tiff(buf)
    assert (W, H, C) == (w, h, 3)
    rgb = arr.reshape(h, w * 3)
    for i, v in enumerate(idx):
        y, x = divmod(i, w)
        assert tuple(rgb[y, 3 * x : 3 * x + 3]) == (
            reds[v] // 257,
            greens[v] // 257,
            blues[v] // 257,
        )


def test_packbits_roundtrip_property():
    rng = np.random.RandomState(7)
    for _ in range(50):
        raw = bytes(rng.randint(0, 4, size=rng.randint(1, 400)).astype(np.uint8))
        assert _unpackbits(_packbits(raw), len(raw)) == raw


def test_unsupported_paths_quarantine():
    w, h = 4, 3
    pix = _pix(w, h)
    lzw = _build_tiff(w, h, photometric=1, pixels=pix, compression=5)
    with pytest.raises(NotImplementedError):
        decode_tiff(lzw)
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + b"\x00" * 16)


def test_multimodal_seam_routes_tiff(spark):
    """A real TIFF payload decodes through the Spark-side image
    pipeline (mapInPandas seam), not the quarantine path."""
    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        decode_images,
    )

    w, h = 6, 4
    pix = _pix(w, h)
    buf = _build_tiff(w, h, photometric=1, pixels=pix)
    df = spark.createDataFrame(
        [(1, buf, "image/tiff")], "doc_id long, content binary, media_type string"
    )
    rows = decode_images(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height, r.channels) == (w, h, 1)
    expected = round(sum(pix) / len(pix), 4)
    assert abs(r.mean_pixel - expected) < 1e-6
