"""From-scratch JPEG decoder (stdlib + numpy only) — shrinks the
multimodal quarantine seam by one more real format, like
``png_codec.py`` (inflate + filters) and ``gif_codec.py`` (LZW) did.

Covers the ITU-T.81 baseline sequential DCT process — SOF0/SOF1, 8-bit
samples, 1 or 3 components, any H/V subsampling (4:4:4, 4:2:2, 4:2:0),
interleaved single-scan, restart intervals (DRI/RSTn), 8- and 16-bit
quantization tables, multi-table DQT/DHT markers, 0xFF00 byte stuffing
— AND the progressive DCT process (SOF2, T.81 Annex G): spectral
selection, successive approximation (DC and AC first + refinement
scans, EOB runs), interleaved DC scans, non-interleaved per-component
scans, restart intervals per scan, and tables redefined between scans.
Everything else — arithmetic coding, hierarchical, 12-bit — raises
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


def _parse_dqt(body: bytes, qtables: dict[int, np.ndarray]) -> None:
    p = 0
    while p < len(body):
        pq, tq = body[p] >> 4, body[p] & 15
        p += 1
        if pq:
            q = np.frombuffer(body[p : p + 128], dtype=">u2").astype(np.int32)
            p += 128
        else:
            q = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(np.int32)
            p += 64
        qtables[tq] = q  # zigzag order, as stored


def _parse_dht(
    body: bytes, htables: dict[tuple[int, int], dict[tuple[int, int], int]]
) -> None:
    p = 0
    while p < len(body):
        tc, th = body[p] >> 4, body[p] & 15
        bits = list(body[p + 1 : p + 17])
        nvals = sum(bits)
        values = body[p + 17 : p + 17 + nvals]
        htables[(tc, th)] = _build_huffman(bits, values)
        p += 17 + nvals


def decode_jpeg(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (width, height, channels, HxW*channels uint8 array)."""
    if not buf.startswith(b"\xff\xd8"):
        raise NotImplementedError("not a JPEG signature")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    dri = 0
    width = height = 0
    progressive = False
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
            _parse_dqt(body, qtables)
        elif marker == 0xC4:  # DHT, possibly several tables
            _parse_dht(body, htables)
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            progressive = marker == 0xC2
            height, width = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG process (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if not comps:
                raise NotImplementedError("JPEG scan before frame header")
            if progressive:
                # hand the whole tail to the scan-accumulating decoder
                # (tables/DRI may be redefined between scans)
                return _decode_progressive(
                    buf, i, width, height, comps, qtables, htables, dri
                )
            ns = body[0]
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

    return _finish(width, height, comps, planes, hmax, vmax)


def _finish(
    width: int,
    height: int,
    comps: list[tuple[int, int, int, int]],
    planes: list[np.ndarray],
    hmax: int,
    vmax: int,
) -> tuple[int, int, int, np.ndarray]:
    """Upsample pixel planes by integer replication, crop MCU padding,
    and color-convert — shared by the sequential and progressive paths."""
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


# ---------------------------------------------------------------------------
# Progressive DCT process (T.81 Annex G): coefficients accumulate
# across scans — DC/AC first passes place (value << Al), refinement
# passes add one magnitude bit at a time — then one reconstruction.
# ---------------------------------------------------------------------------


def _dc_first(reader, dc_tab, coef, pred, al):
    t = _decode_symbol(reader, dc_tab)
    if t > 11:
        raise NotImplementedError("invalid JPEG DC category")
    pred += _extend(reader.read_bits(t), t)
    coef[0] = pred << al
    return pred


def _dc_refine(reader, coef, al):
    if reader.read_bit():
        coef[0] |= 1 << al


def _ac_first(reader, ac_tab, coef, ss, se, al, eobrun):
    """AC first pass over one block's zigzag coefficients [ss, se]."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise NotImplementedError("JPEG AC run overflow")
        coef[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, ac_tab, coef, ss, se, al, eobrun):
    """AC refinement pass (T.81 G.1.2.3): newly-significant
    coefficients arrive as ±1<<al; every already-nonzero coefficient
    traversed gets one correction bit."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        if reader.read_bit() and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    k = ss
    in_eob = eobrun > 0  # this block sits inside a pending EOB run
    if in_eob:
        eobrun -= 1
    else:
        while k <= se:
            rs = _decode_symbol(reader, ac_tab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:  # EOBn covers THIS block + (1<<r)-1+ext more
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    in_eob = True
                    break
                newval = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise NotImplementedError("invalid JPEG refinement size")
                newval = p1 if reader.read_bit() else m1
            # advance past r zero-history positions, correcting the
            # nonzero-history coefficients passed over
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                coef[k] = newval
            k += 1
    if in_eob:
        # EOB region: only correction bits for nonzero coefficients
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
    return eobrun


def _decode_progressive(
    buf: bytes,
    pos: int,
    width: int,
    height: int,
    comps: list[tuple[int, int, int, int]],
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
    # per-component zigzag coefficient store, padded to whole MCUs
    coefs = [
        np.zeros((mcuy * v, mcux * h, 64), dtype=np.int32)
        for _, h, v, _ in comps
    ]
    # non-interleaved scans cover only the component's own block grid
    nb = []
    for _, h, v, _ in comps:
        cw = (width * h + hmax - 1) // hmax
        chh = (height * v + vmax - 1) // vmax
        nb.append(((cw + 7) // 8, (chh + 7) // 8))

    i = pos
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
        if marker == 0xDB:
            _parse_dqt(body, qtables)
            i += 2 + seglen
        elif marker == 0xC4:
            _parse_dht(body, htables)
            i += 2 + seglen
        elif marker == 0xDD:
            (dri,) = struct.unpack_from(">H", body, 0)
            i += 2 + seglen
        elif marker == 0xDA:
            ns = body[0]
            by_id = {cid: idx for idx, (cid, _, _, _) in enumerate(comps)}
            scan_comps = []
            for s in range(ns):
                cs, tdta = body[1 + 2 * s : 3 + 2 * s]
                scan_comps.append((by_id[cs], tdta >> 4, tdta & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            segments, endpos = _split_entropy_segments(buf, i + 2 + seglen)
            _progressive_scan(
                segments, comps, coefs, nb, scan_comps,
                ss, se, ah, al, htables, dri, mcux, mcuy,
            )
            i = endpos
        else:
            i += 2 + seglen

    # reconstruct: dequantize in zigzag, de-zigzag, IDCT, level shift
    planes = []
    inv_zz = np.empty(64, dtype=np.int64)
    inv_zz[ZIGZAG] = np.arange(64)
    for (_, h, v, tq), coef in zip(comps, coefs):
        if tq not in qtables:
            raise NotImplementedError("JPEG references a missing DQT table")
        deq = (coef * qtables[tq][None, None, :]).astype(np.float64)
        nat = deq[:, :, inv_zz].reshape(coef.shape[0], coef.shape[1], 8, 8)
        pix = np.einsum("ur,bcrs,sv->bcuv", _A.T, nat, _A) + 128.0
        by, bx = coef.shape[0], coef.shape[1]
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        planes.append(plane)
    return _finish(width, height, comps, planes, hmax, vmax)


def _progressive_scan(
    segments: list[bytes],
    comps,
    coefs,
    nb,
    scan_comps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    htables,
    dri: int,
    mcux: int,
    mcuy: int,
) -> None:
    """Apply one progressive scan to the coefficient store."""
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise NotImplementedError("JPEG DC scan with Se != 0")
    if not dc_scan and len(scan_comps) != 1:
        raise NotImplementedError("interleaved progressive AC scan")

    if len(scan_comps) == 1:
        ci, td, ta = scan_comps[0]
        bw, bh = nb[ci]
        units = [(ci, by, bx) for by in range(bh) for bx in range(bw)]
    else:
        units = []  # one entry per MCU; blocks expanded in the loop
        for mcu in range(mcux * mcuy):
            units.append((None, *divmod(mcu, mcux)))

    per_segment = dri if dri else len(units)
    reader = _BitReader(segments[0])
    seg_idx = 0
    preds = [0] * len(comps)
    eobrun = 0
    for u_idx, unit in enumerate(units):
        if dri and u_idx and u_idx % per_segment == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise NotImplementedError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
            eobrun = 0
        if unit[0] is not None:  # non-interleaved data unit
            ci, by, bx = unit
            blocks = [(ci, by, bx)]
        else:  # interleaved MCU (DC scans only)
            _, my, mx = unit
            blocks = []
            for ci, _, _ in scan_comps:
                _, ch, cv, _ = comps[ci]
                for byy in range(cv):
                    for bxx in range(ch):
                        blocks.append((ci, my * cv + byy, mx * ch + bxx))
        for ci, by, bx in blocks:
            td = ta = None
            for sc_ci, sc_td, sc_ta in scan_comps:
                if sc_ci == ci:
                    td, ta = sc_td, sc_ta
            coef = coefs[ci][by, bx]
            if dc_scan:
                if ah == 0:
                    dc_tab = htables.get((0, td))
                    if dc_tab is None:
                        raise NotImplementedError(
                            "JPEG references a missing DHT table"
                        )
                    preds[ci] = _dc_first(reader, dc_tab, coef, preds[ci], al)
                else:
                    _dc_refine(reader, coef, al)
            else:
                ac_tab = htables.get((1, ta))
                if ac_tab is None:
                    raise NotImplementedError("JPEG references a missing DHT table")
                if ah == 0:
                    eobrun = _ac_first(reader, ac_tab, coef, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(reader, ac_tab, coef, ss, se, al, eobrun)
