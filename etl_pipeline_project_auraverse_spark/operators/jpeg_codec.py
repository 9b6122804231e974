"""From-scratch BASELINE JPEG decoder (stdlib + numpy only) — shrinks
the multimodal quarantine seam by one more real format, like
``png_codec.py`` (inflate + filters) and ``gif_codec.py`` (LZW) did.

Covers the ITU-T.81 baseline sequential DCT process: SOF0/SOF1, 8-bit
samples, 1 or 3 components, any H/V subsampling (4:4:4, 4:2:2, 4:2:0),
interleaved single-scan, restart intervals (DRI/RSTn), 8- and 16-bit
quantization tables, multi-table DQT/DHT markers, 0xFF00 byte
stuffing. Everything else — progressive (SOF2), arithmetic coding,
hierarchical, 12-bit, non-interleaved multi-scan — raises
``NotImplementedError`` and stays on the quarantine path with the
same skip policy as the other codecs (reference parity:
/root/reference/backend/etl_pipeline.py has no media decode at all;
this is part of the beyond-reference multimodal surface).

Decode pipeline per MCU: Huffman-decode DC (predictor + extend) and
AC (run/size, ZRL, EOB) coefficients in zigzag order, dequantize,
de-zigzag, 2-D IDCT as two 8x8 orthonormal matrix multiplies
(vectorized over numpy), +128 level shift, clamp; then chroma planes
are integer-replicated up to full resolution and converted via the
JFIF YCbCr→RGB matrix.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index i -> natural (row-major) position in the 8x8 block
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# orthonormal 8-point DCT basis: A[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _idct2(block: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of one natural-order 8x8 coefficient block."""
    return _A.T @ block @ _A


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise NotImplementedError("truncated JPEG entropy data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_huffman(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_entropy_segments(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff the scan data from ``pos``, splitting at RSTn markers.
    Returns (segments, position of the terminating marker's 0xFF)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker: segment boundary
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker (EOI or next header) ends the scan
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (width, height, channels, HxW*channels uint8 array)."""
    if not buf.startswith(b"\xff\xd8"):
        raise NotImplementedError("not a JPEG signature")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    dri = 0
    width = height = 0
    comps: list[tuple[int, int, int, int]] = []  # (id, H, V, Tq)
    scan_comps: list[tuple[int, int, int]] = []  # (comp_index, Td, Ta)
    i = 2
    n = len(buf)
    while i < n - 1:
        if buf[i] != 0xFF:
            raise NotImplementedError("JPEG marker sync lost")
        marker = buf[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack_from(">H", buf, i + 2)
        body = buf[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT, possibly several tables
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq:
                    q = np.frombuffer(body[p : p + 128], dtype=">u2").astype(
                        np.int32
                    )
                    p += 128
                else:
                    q = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                qtables[tq] = q  # zigzag order, as stored
        elif marker == 0xC4:  # DHT, possibly several tables
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                nvals = sum(bits)
                values = body[p + 17 : p + 17 + nvals]
                htables[(tc, th)] = _build_huffman(bits, values)
                p += 17 + nvals
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            height, width = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG process (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — baseline assumes one interleaved scan
            ns = body[0]
            if not comps:
                raise NotImplementedError("JPEG scan before frame header")
            if ns != len(comps):
                raise NotImplementedError("non-interleaved JPEG scan")
            by_id = {cid: idx for idx, (cid, _, _, _) in enumerate(comps)}
            scan_comps = []
            for s in range(ns):
                cs, tdta = body[1 + 2 * s : 3 + 2 * s]
                scan_comps.append((by_id[cs], tdta >> 4, tdta & 15))
            i = i + 2 + seglen
            return _decode_scan(
                buf, i, width, height, comps, scan_comps, qtables, htables, dri
            )
        # APPn / COM / anything else: skip
        i += 2 + seglen
    raise NotImplementedError("JPEG without an SOS scan")


def _decode_scan(
    buf: bytes,
    pos: int,
    width: int,
    height: int,
    comps: list[tuple[int, int, int, int]],
    scan_comps: list[tuple[int, int, int]],
    qtables: dict[int, np.ndarray],
    htables: dict[tuple[int, int], dict[tuple[int, int], int]],
    dri: int,
) -> tuple[int, int, int, np.ndarray]:
    if width == 0 or height == 0:
        raise NotImplementedError("empty JPEG frame")
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient planes, padded to whole MCUs
    planes = [
        np.zeros((mcuy * v * 8, mcux * h * 8), dtype=np.float64)
        for _, h, v, _ in comps
    ]
    dequant = []
    for _, _, _, tq in comps:
        if tq not in qtables:
            raise NotImplementedError("JPEG references a missing DQT table")
        dequant.append(qtables[tq])

    segments, _ = _split_entropy_segments(buf, pos)
    total_mcus = mcux * mcuy
    per_segment = dri if dri else total_mcus
    reader = _BitReader(segments[0])
    seg_idx = 0
    preds = [0] * len(comps)
    zz = np.zeros(64, dtype=np.float64)
    for mcu in range(total_mcus):
        if dri and mcu and mcu % per_segment == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise NotImplementedError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, td, ta in scan_comps:
            _, ch, cv, _ = comps[ci]
            dc_tab = htables.get((0, td))
            ac_tab = htables.get((1, ta))
            if dc_tab is None or ac_tab is None:
                raise NotImplementedError("JPEG references a missing DHT table")
            for by in range(cv):
                for bx in range(ch):
                    zz[:] = 0.0
                    t = _decode_symbol(reader, dc_tab)
                    if t > 11:
                        raise NotImplementedError("invalid JPEG DC category")
                    preds[ci] += _extend(reader.read_bits(t), t)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_symbol(reader, ac_tab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise NotImplementedError("JPEG AC run overflow")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = zz * dequant[ci]
                    pix = _idct2(block.reshape(8, 8)) + 128.0
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix

    # upsample each plane to full resolution by integer replication,
    # then crop the MCU padding
    full = []
    for (_, ch, cv, _), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(up[:height, :width])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return width, height, 1, gray.reshape(height, width)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG unsupported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.reshape(height, width * 3)
