"""From-scratch baseline TIFF decoder (stdlib + numpy only).

Supports the baseline-TIFF profile that covers the overwhelming bulk
of real scanner/export output:

- both byte orders (``II`` little-endian, ``MM`` big-endian) and both
  IFD layouts via explicit struct formats;
- 8-bit greyscale (PhotometricInterpretation 1, with 0=WhiteIsZero
  inverted to the conventional 0=black), 8-bit RGB (2), and 8-bit
  palette-color (3, ColorMap expanded to RGB);
- Compression 1 (none) and 32773 (PackBits run-length, decoded per
  strip);
- strip organisation (StripOffsets / StripByteCounts / RowsPerStrip),
  any strip count, chunky planar configuration.

Everything else (LZW/JPEG-in-TIFF, tiled layout, 16-bit samples,
planar=2) raises ``NotImplementedError`` so the multimodal seam
routes those payloads to quarantine, same policy as the PNG/GIF/JPEG
codecs.

Public format: Adobe TIFF 6.0 specification.
"""

from __future__ import annotations

import struct

import numpy as np

# baseline tag ids
_WIDTH = 256
_HEIGHT = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_COLOR_MAP = 320

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def _read_ifd(buf: bytes, bo: str) -> dict[int, list[int]]:
    """First IFD as {tag: [values...]} (integer-typed tags only)."""
    (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    (n_entries,) = struct.unpack_from(bo + "H", buf, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(bo + "HHI", buf, off)
        if typ not in _TYPE_FMT:
            continue  # rationals / ascii: irrelevant to pixel decode
        size = _TYPE_SIZES[typ] * count
        value_off = off + 8 if size <= 4 else struct.unpack_from(bo + "I", buf, off + 8)[0]
        fmt = bo + _TYPE_FMT[typ] * count
        tags[tag] = list(struct.unpack_from(fmt, buf, value_off))
    return tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (Apple RLE) decode of one strip."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits strip underrun")
    return bytes(out[:expected])


def decode_tiff(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline TIFF -> (width, height, channels, HxW*C uint8).

    Greyscale returns channels=1; RGB and palette return channels=3.
    """
    if len(buf) < 8 or buf[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF stream")
    bo = "<" if buf[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    if magic != 42:
        raise NotImplementedError("BigTIFF (magic 43) is not baseline")
    tags = _read_ifd(buf, bo)
    width = tags[_WIDTH][0]
    height = tags[_HEIGHT][0]
    compression = tags.get(_COMPRESSION, [1])[0]
    photometric = tags.get(_PHOTOMETRIC, [1])[0]
    spp = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
    bits = tags.get(_BITS_PER_SAMPLE, [8])
    planar = tags.get(_PLANAR_CONFIG, [1])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"only 8-bit samples (got {bits})")
    if planar != 1:
        raise NotImplementedError("only chunky planar configuration")
    if compression not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression} needs a codec (baseline: "
            "1=none, 32773=PackBits)"
        )
    if photometric not in (0, 1, 2, 3):
        raise NotImplementedError(f"photometric {photometric} unsupported")
    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_BYTE_COUNTS]
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [height])[0]
    row_bytes = width * spp

    raw = bytearray()
    rows_left = height
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rows_per_strip, rows_left)
        expected = strip_rows * row_bytes
        chunk = buf[off : off + cnt]
        raw += chunk if compression == 1 else _unpackbits(chunk, expected)
        rows_left -= strip_rows
    pixels = np.frombuffer(bytes(raw), dtype=np.uint8, count=height * row_bytes)
    pixels = pixels.reshape(height, row_bytes)

    if photometric == 0:  # WhiteIsZero -> conventional 0=black
        pixels = 255 - pixels
    if photometric == 3:  # palette -> RGB via ColorMap (16-bit entries)
        cmap = tags[_COLOR_MAP]
        n = len(cmap) // 3
        lut = (
            np.array(cmap, dtype=np.uint32).reshape(3, n).T // 257
        ).astype(np.uint8)  # 65535 -> 255
        idx = pixels.reshape(height, width)
        rgb = lut[idx]  # H x W x 3
        return width, height, 3, np.ascontiguousarray(
            rgb.reshape(height, width * 3)
        )
    channels = 3 if photometric == 2 else 1
    if spp != channels:
        raise NotImplementedError(
            f"photometric {photometric} with {spp} samples/pixel"
        )
    return width, height, channels, np.ascontiguousarray(pixels)
