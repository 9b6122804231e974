"""Baseline JPEG decoder tests.

Three independent evidence lines, so a shared-constant bug can't
self-cancel:

1. HANDCRAFTED bitstreams with DC-only blocks — the spec gives the
   exact closed-form output (flat block = DC*Q[0]/8 + 128), computed
   here by hand, no DCT code involved.
2. ROUNDTRIP through a minimal test-side encoder (forward DCT +
   canonical Huffman built from scratch in this file, including 4:2:0
   subsampling and restart markers) — decode(encode(img)) must land
   within quantization tolerance of img.
3. A REAL third-party baseline JPEG fixture (161x161 4:4:4 with
   DRI=21, produced by an external encoder) — dimension + content
   checks against values that only a correct Huffman/IDCT path hits.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np
import pytest

from etl_pipeline_project_auraverse_spark.operators.jpeg_codec import (
    _A,
    ZIGZAG,
    decode_jpeg,
)

FIXTURES = Path(__file__).parent / "fixtures"


# ---------------------------------------------------------------------------
# minimal encoder (test-side only)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s per T.81


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


# simple custom tables (NOT the Annex K ones the decoder might assume):
# 12 DC categories at length 5, all 162 AC run/size symbols at length 8
_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]
_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    ln, code = _DC_CODES[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODES[0xF0]
            w.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = _AC_CODES[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = _AC_CODES[0x00]
        w.write(code, ln)
    return dc


def _fdct_quant(tile: np.ndarray, q: np.ndarray) -> np.ndarray:
    coef = _A @ (tile.astype(np.float64) - 128.0) @ _A.T
    flat = coef.reshape(64)
    zz = np.array([flat[ZIGZAG[i]] for i in range(64)])
    return np.round(zz / q).astype(np.int64)


def _dht_segment() -> bytes:
    body = bytearray()
    for tc, bits, vals in (
        (0, _DC_BITS, _DC_VALS),
        (1, _AC_BITS, _AC_VALS),
    ):
        body.append((tc << 4) | 0)
        body += bytes(bits)
        body += bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + bytes(body)


def _prep_planes(img: np.ndarray, subsample: bool):
    """Shared encoder prep: component layout + MCU-padded pixel planes."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [(1, 1, 1, 0)]
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        if subsample:
            comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]

            def box2(p: np.ndarray) -> np.ndarray:
                ph = p[: p.shape[0] - p.shape[0] % 2, : p.shape[1] - p.shape[1] % 2]
                if ph.size == 0:
                    ph = p
                return (
                    ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )

            planes = [y, box2(cb), box2(cr)]
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
            planes = [y, cb, cr]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for (cid, ch, cv, _), plane in zip(comps, planes):
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        pad = np.full((ph, pw), 128.0)
        pad[: plane.shape[0], : plane.shape[1]] = plane
        # edge-replicate so padding doesn't ring into real pixels
        pad[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        pad[:, plane.shape[1] :] = pad[:, plane.shape[1] - 1 : plane.shape[1]]
        padded.append(pad)
    return comps, padded, mcux, mcuy, hmax, vmax


def encode_jpeg(
    img: np.ndarray,
    q: int = 4,
    subsample: bool = False,
    restart: int = 0,
) -> bytes:
    """Tiny baseline encoder: grayscale (h, w) or RGB (h, w, 3) uint8.
    Flat quantization table of ``q``; 4:2:0 when ``subsample``;
    RSTn markers every ``restart`` MCUs when nonzero."""
    h, w = img.shape[:2]
    qt = np.full(64, q, dtype=np.int64)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(
        int(x) for x in qt
    )
    comps, padded, mcux, mcuy, hmax, vmax = _prep_planes(img, subsample)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment()
    if restart:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart)
    sos = bytearray([len(comps)])
    for cid, _, _, _ in comps:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)

    writer = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            writer.flush()
            out += bytes(writer.out)
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, (cid, ch, cv, _) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    tile = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                    zz = _fdct_quant(tile, qt)
                    preds[ci] = _encode_block(writer, zz, preds[ci])
    writer.flush()
    out += bytes(writer.out)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# 1. handcrafted DC-only stream: closed-form expected output
# ---------------------------------------------------------------------------


def _handcrafted_dc_only(dc_zz: int, q0: int) -> bytes:
    """8x8 single-component JPEG whose one block has only a DC coef."""
    w = _BitWriter()
    t = _category(dc_zz)
    ln, code = _DC_CODES[t]
    w.write(code, ln)
    if t:
        w.write(dc_zz if dc_zz >= 0 else dc_zz + (1 << t) - 1, t)
    ln, code = _AC_CODES[0x00]  # EOB
    w.write(code, ln)
    w.flush()
    qt = bytes([q0] * 64)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + qt
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment()
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes(w.out) + b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("dc,q0", [(0, 16), (24, 16), (-24, 16), (100, 3)])
def test_dc_only_block_closed_form(dc, q0):
    # IDCT of a DC-only block is flat: pixel = DC*Q0/8 + 128 exactly
    # (c(0)^2/4 * F00 = F00/8), computed here without any DCT code.
    expected = int(np.clip(round(dc * q0 / 8 + 128), 0, 255))
    w, h, c, pix = decode_jpeg(_handcrafted_dc_only(dc, q0))
    assert (w, h, c) == (8, 8, 1)
    assert pix.shape == (8, 8)
    assert np.all(pix == expected), f"got {np.unique(pix)}, want {expected}"


def test_single_ac_coefficient_matches_spec_idct():
    # one AC coefficient: expected image from the spec's closed-form
    # cosine sum, evaluated longhand (not via the decoder's matrices)
    w = _BitWriter()
    ln, code = _DC_CODES[0]
    w.write(code, ln)  # DC diff 0
    ln, code = _AC_CODES[0x11]  # run 1, size 1 -> zigzag index 2 (=natural 8)
    w.write(code, ln)
    w.write(1, 1)  # value +1
    ln, code = _AC_CODES[0x00]
    w.write(code, ln)
    w.flush()
    qt = bytes([16] * 64)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + qt
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment()
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes(w.out) + b"\xff\xd9"

    # zigzag index 2 is natural position 8 = (row 1=v, col 0=u):
    # f(x,y) = 1/4 * c(1)c(0) * 16 * cos((2y+1)pi/16), constant in x
    expected = np.zeros((8, 8))
    for y in range(8):
        expected[y, :] = (
            0.25 * np.sqrt(0.5) * 16 * np.cos((2 * y + 1) * 1 * np.pi / 16)
        )
    expected = np.clip(np.round(expected + 128), 0, 255)
    _, _, _, pix = decode_jpeg(bytes(out))
    assert np.array_equal(pix.astype(float), expected)


# ---------------------------------------------------------------------------
# 2. roundtrip through the test-side encoder
# ---------------------------------------------------------------------------


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((2 * xx + 3 * yy) % 256).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (19, 13)])
def test_roundtrip_grayscale(h, w):
    img = _gradient(h, w)
    ww, hh, c, pix = decode_jpeg(encode_jpeg(img, q=2))
    assert (ww, hh, c) == (w, h, 1)
    err = np.abs(pix.astype(int) - img.astype(int))
    assert err.max() <= 12, f"max roundtrip error {err.max()}"


def test_roundtrip_rgb_444():
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 4, (16, 16, 3)) * 60 + 40).astype(np.uint8)
    w, h, c, pix = decode_jpeg(encode_jpeg(img, q=2))
    assert (w, h, c) == (16, 16, 3)
    err = np.abs(pix.reshape(16, 16, 3).astype(int) - img.astype(int))
    # blocky color input quantizes hard at edges; mean error is the
    # honest fidelity number for a color roundtrip
    assert err.mean() <= 6, f"mean roundtrip error {err.mean()}"


def test_roundtrip_rgb_420_subsampled():
    img = np.zeros((24, 24, 3), dtype=np.uint8)
    img[:, :12] = (200, 40, 40)
    img[:, 12:] = (40, 40, 200)
    w, h, c, pix = decode_jpeg(encode_jpeg(img, q=2, subsample=True))
    assert (w, h, c) == (24, 24, 3)
    out = pix.reshape(24, 24, 3).astype(int)
    # away from the color edge the 2x2-subsampled chroma reconstructs
    left = np.abs(out[:, :8] - np.array((200, 40, 40))).mean()
    right = np.abs(out[:, 16:] - np.array((40, 40, 200))).mean()
    assert left <= 8 and right <= 8, (left, right)


def test_roundtrip_with_restart_markers():
    img = _gradient(16, 40)  # 2x5 MCUs at 8x8
    data = encode_jpeg(img, q=2, restart=3)
    assert b"\xff\xd0" in data  # RST0 actually present
    w, h, c, pix = decode_jpeg(data)
    assert (w, h, c) == (40, 16, 1)
    err = np.abs(pix.astype(int) - img.astype(int))
    assert err.max() <= 12


# ---------------------------------------------------------------------------
# 3. the real third-party fixture + quarantine behavior
# ---------------------------------------------------------------------------


def test_real_fixture_baseline():
    buf = (FIXTURES / "flower-of-life.jpg").read_bytes()
    w, h, c, pix = decode_jpeg(buf)
    assert (w, h, c) == (161, 161, 3)
    rgb = pix.reshape(161, 161, 3)
    # the image is dark line-art on a white background: mostly-white
    # histogram with a meaningful dark tail. A broken Huffman or IDCT
    # path produces noise that fails all three checks.
    assert float(rgb.mean()) > 180
    assert float((rgb.max(axis=2) > 240).mean()) > 0.5  # white majority
    assert float((rgb.min(axis=2) < 80).mean()) > 0.01  # real dark lines
    # near-grayscale artwork: channel means within a few counts
    means = rgb.reshape(-1, 3).mean(axis=0)
    assert float(np.ptp(means)) < 12


# ---------------------------------------------------------------------------
# progressive (SOF2): test-side progressive encoder — same quantized
# coefficients as the baseline encoder, different scan script — plus a
# real-world fixture and a closed-form DC check
# ---------------------------------------------------------------------------

# progressive AC tables also need the EOBn symbols (r<<4 | 0, r<=14)
_PAC_VALS = (
    [0x00]
    + [(r << 4) | 0 for r in range(1, 15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PAC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_PAC_VALS), 0, 0, 0, 0, 0, 0, 0]
_PAC_CODES = _canonical_codes(_PAC_BITS, _PAC_VALS)


def _prog_dht_segment() -> bytes:
    body = bytearray()
    for tc, bits, vals in (
        (0, _DC_BITS, _DC_VALS),
        (1, _PAC_BITS, _PAC_VALS),
    ):
        body.append((tc << 4) | 0)
        body += bytes(bits)
        body += bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + bytes(body)


def _quantized_blocks(img: np.ndarray, q: int, subsample: bool):
    comps, padded, mcux, mcuy, hmax, vmax = _prep_planes(img, subsample)
    qt = np.full(64, q, dtype=np.int64)
    coefs = []
    for plane in padded:
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        arr = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                arr[by, bx] = _fdct_quant(
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qt
                )
        coefs.append(arr)
    return comps, coefs, mcux, mcuy, hmax, vmax, qt


class _ProgWriter:
    """Bit writer + EOB-run and correction-bit buffering for one scan
    (mirrors the decoder's traversal order exactly)."""

    def __init__(self) -> None:
        self.w = _BitWriter()
        self.eobrun = 0
        self.eob_bits: list[int] = []

    def sym(self, rs: int) -> None:
        ln, code = _PAC_CODES[rs]
        self.w.write(code, ln)

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.eob_bits:
            self.w.write(b, 1)
        self.eob_bits = []


def _encode_dc_first(w: _BitWriter, dc_shifted: int, pred: int) -> int:
    diff = dc_shifted - pred
    t = _category(diff)
    ln, code = _DC_CODES[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    return dc_shifted


def _encode_ac_first_block(pw: _ProgWriter, zz, ss: int, se: int, al: int) -> None:
    v1 = [
        (1 if zz[k] >= 0 else -1) * (abs(int(zz[k])) >> al)
        for k in range(ss, se + 1)
    ]
    if not any(v1):
        pw.eobrun += 1
        if pw.eobrun == 0x7FFF:
            pw.flush_eob()
        return
    pw.flush_eob()
    last = max(i for i, v in enumerate(v1) if v)
    run = 0
    for v in v1[: last + 1]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            pw.sym(0xF0)
            run -= 16
        s = _category(v)
        pw.sym((run << 4) | s)
        pw.w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < se - ss:
        pw.eobrun += 1


def _encode_ac_refine_block(pw: _ProgWriter, zz, ss: int, se: int, al: int) -> None:
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    signs = [1 if zz[k] >= 0 else 0 for k in range(ss, se + 1)]
    new_sig = [i for i, a in enumerate(absv) if a == 1]
    eob = max(new_sig) if new_sig else -1
    run = 0
    pending: list[int] = []
    for i, a in enumerate(absv):
        if i > eob:
            break
        if a == 0:
            run += 1
            continue
        while run > 15:
            pw.flush_eob()
            pw.sym(0xF0)
            run -= 16
            for b in pending:
                pw.w.write(b, 1)
            pending = []
        if a > 1:  # nonzero history: buffer its correction bit
            pending.append(a & 1)
            continue
        pw.flush_eob()
        pw.sym((run << 4) | 1)
        pw.w.write(signs[i], 1)
        run = 0
        for b in pending:
            pw.w.write(b, 1)
        pending = []
    # tail: if ANY position remains after the last newly-significant
    # coefficient the decoder expects another symbol for this block —
    # fold it (and its history-correction bits) into the EOB run
    tail_bits = [a & 1 for a in absv[eob + 1 :] if a > 1]
    if eob < len(absv) - 1:
        pw.eobrun += 1
        pw.eob_bits.extend(pending + tail_bits)
        if pw.eobrun == 0x7FFF:
            pw.flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray, q: int = 4, subsample: bool = False
) -> bytes:
    """Progressive twin of ``encode_jpeg``: same quantized coefficients,
    emitted as a DC first (Al=1) interleaved scan + DC refinement, then
    per-component spectral bands 1-5 / 6-63 at Al=1 with AC refinement
    scans down to Al=0 — so decode(progressive) must equal
    decode(baseline) EXACTLY."""
    h, w = img.shape[:2]
    comps, coefs, mcux, mcuy, hmax, vmax, qt = _quantized_blocks(img, q, subsample)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(
        int(x) for x in qt
    )
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _prog_dht_segment()

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytearray([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + bytes(body)

    # non-interleaved grids (component's own visible blocks)
    nb = []
    for _, ch, cv, _ in comps:
        cw = (w * ch + hmax - 1) // hmax
        chh = (h * cv + vmax - 1) // vmax
        nb.append(((cw + 7) // 8, (chh + 7) // 8))

    # --- scan 1: DC first, interleaved, Al=1 ---
    out += sos_header([c[0] for c in comps], 0, 0, 0, 1)
    bw_ = _BitWriter()
    preds = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (_, ch, cv, _) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    dc = int(coefs[ci][my * cv + by, mx * ch + bx, 0])
                    preds[ci] = _encode_dc_first(bw_, dc >> 1, preds[ci])
    bw_.flush()
    out += bytes(bw_.out)

    # --- scan 2: DC refinement to Al=0 (one raw bit per block) ---
    out += sos_header([c[0] for c in comps], 0, 0, 1, 0)
    bw_ = _BitWriter()
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (_, ch, cv, _) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    bw_.write(int(coefs[ci][my * cv + by, mx * ch + bx, 0]) & 1, 1)
    bw_.flush()
    out += bytes(bw_.out)

    # --- AC scans: first pass at Al=1 then refinement, per band ---
    bands = [(1, 5), (6, 63)]
    for ah, al, enc in ((0, 1, _encode_ac_first_block), (1, 0, _encode_ac_refine_block)):
        for ci, (cid, _, _, _) in enumerate(comps):
            for ss, se in bands:
                out += sos_header([cid], ss, se, ah, al)
                pw = _ProgWriter()
                bwid, bht = nb[ci]
                for by in range(bht):
                    for bx in range(bwid):
                        enc(pw, coefs[ci][by, bx], ss, se, al)
                pw.flush_eob()
                pw.w.flush()
                out += bytes(pw.w.out)
    out += b"\xff\xd9"
    return bytes(out)


def test_truncated_jpeg_quarantines():
    buf = (FIXTURES / "flower-of-life.jpg").read_bytes()
    with pytest.raises(NotImplementedError):
        decode_jpeg(buf[:2000])


def test_decode_images_picks_up_jpeg(spark):
    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        decode_images,
    )

    img = _gradient(8, 8)
    rows = [
        (1, bytearray(encode_jpeg(img, q=2))),
        (2, bytearray(b"\xff\xd8\xff\xe0junk")),  # corrupt -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in decode_images(df).collect()}
    assert set(out) == {1}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (8, 8, 1)


def test_progressive_roundtrip_equals_baseline_exactly():
    """Baseline and progressive streams built from the SAME quantized
    coefficients must decode to IDENTICAL pixels — this pins the whole
    Annex-G scan machinery (spectral selection, successive
    approximation, EOB runs, refinement bits) against the
    already-proven sequential path, with no DCT tolerance involved."""
    rng = np.random.RandomState(11)
    images = [
        rng.randint(0, 256, size=(24, 41, 3)).astype(np.uint8),
        np.tile(np.linspace(0, 255, 37, dtype=np.uint8), (19, 1)),  # gray
        (np.indices((32, 32)).sum(axis=0) * 4 % 256).astype(np.uint8),
    ]
    for idx, img in enumerate(images):
        for subsample in (False, True):
            if img.ndim == 2 and subsample:
                continue
            base = decode_jpeg(encode_jpeg(img, q=4, subsample=subsample))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, q=4, subsample=subsample)
            )
            assert base[:3] == prog[:3], (idx, subsample)
            np.testing.assert_array_equal(base[3], prog[3], err_msg=f"img{idx} sub={subsample}")


def test_progressive_dc_only_closed_form():
    """Handcrafted SOF2 stream: DC-first (Al=1) + DC-refinement (Al=0)
    scans for one 8x8 block — flat output pixel = DC*Q0/8 + 128,
    computed by hand with no DCT code involved."""
    for dc, q0 in [(25, 16), (-25, 16), (0, 8)]:
        w1 = _BitWriter()
        _encode_dc_first(w1, dc >> 1, 0)
        w1.flush()
        w2 = _BitWriter()
        w2.write(dc & 1, 1)
        w2.flush()
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([q0] * 64)
        sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
        out += _prog_dht_segment()
        sos1 = bytes([1, 1, 0x00, 0, 0, 0x01])  # DC first, Al=1
        out += b"\xff\xda" + struct.pack(">H", len(sos1) + 2) + sos1
        out += bytes(w1.out)
        sos2 = bytes([1, 1, 0x00, 0, 0, 0x10])  # DC refine, Ah=1, Al=0
        out += b"\xff\xda" + struct.pack(">H", len(sos2) + 2) + sos2
        out += bytes(w2.out)
        out += b"\xff\xd9"
        ww, hh, c, pix = decode_jpeg(bytes(out))
        expected = int(np.clip(round(dc * q0 / 8 + 128), 0, 255))
        assert (ww, hh, c) == (8, 8, 1)
        assert np.all(pix == expected), (dc, q0, np.unique(pix), expected)


def test_progressive_fixture_decodes():
    """Real third-party progressive JPEG (493x58, 4:4:4, per-component
    spectral-selection scans produced by an external encoder): decodes
    with sane structure — a white-dominant banner with real colored
    content, not the noise a desynced Huffman/refinement path yields."""
    buf = (FIXTURES / "progressive-stripe.jpg").read_bytes()
    w, h, c, arr = decode_jpeg(buf)
    assert (w, h, c) == (493, 58, 3)
    img = arr.reshape(h, w, 3).astype(np.float64)
    assert float(img.mean()) > 200  # white-dominant
    assert float((img.max(axis=2) > 240).mean()) > 0.5
    # real chromatic content (green artwork), not gray noise
    green_frac = ((img[..., 1] > img[..., 0] + 30) & (img[..., 1] > img[..., 2] + 30)).mean()
    assert float(green_frac) > 0.02
