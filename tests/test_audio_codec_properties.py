"""Property tests for the WAV codec seam: algebraic invariants of the
G.711 expansions that hold for EVERY code (sign symmetry, range
bounds, quantization-level parity) and container-robustness properties
(foreign chunks tolerated, garbage rejected with the quarantine
exception and nothing else)."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pipeline_project_auraverse_spark.operators.multimodal import (
    _alaw_expand,
    _decode_audio_bytes,
    _mulaw_expand,
    _wav_container,
)

codes_arrays = st.lists(st.integers(0, 255), min_size=1, max_size=64).map(
    lambda xs: np.array(xs, dtype=np.uint8)
)


@given(codes_arrays)
def test_mulaw_sign_symmetry_and_bounds(codes):
    # flipping the (complemented) sign bit negates the sample exactly,
    # and magnitudes stay within the published table bound 32124
    lin = _mulaw_expand(codes).astype(np.int64)
    neg = _mulaw_expand(codes ^ 0x80).astype(np.int64)
    assert (neg == -lin).all()
    assert (np.abs(lin) <= 32124).all()


@given(codes_arrays)
def test_alaw_sign_symmetry_and_bounds(codes):
    lin = _alaw_expand(codes).astype(np.int64)
    neg = _alaw_expand(codes ^ 0x80).astype(np.int64)
    assert (neg == -lin).all()
    assert (np.abs(lin) <= 32256).all()
    # A-law has no zero level: every sample is at least +-8 (its
    # mid-rise quantizer), unlike mu-law's mid-tread zero codes
    assert (np.abs(lin) >= 8).all()


def test_mulaw_all_codes_distinct_except_the_two_zeros():
    lin = _mulaw_expand(np.arange(256, dtype=np.uint8))
    # 0x7F and 0xFF both decode to 0; all other codes are distinct
    assert len(set(lin.tolist())) == 255


def test_alaw_all_codes_distinct():
    lin = _alaw_expand(np.arange(256, dtype=np.uint8))
    assert len(set(lin.tolist())) == 256


@given(st.integers(0, 255), st.integers(1, 40))
@settings(max_examples=40)
def test_container_tolerates_foreign_chunks(first_code, n):
    # LIST/INFO-style chunks (odd sizes included, exercising the
    # word-alignment walk) before AND after fmt/data must not disturb
    # the decode
    codes = bytes(((first_code + 7 * i) % 256) for i in range(n))
    plain = _wav_container(7, 1, 8000, 8, 1, codes, fact_samples=n)
    # splice foreign chunks into the chunk list
    body = plain[12:]
    junk1 = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd, padded
    junk2 = b"cue " + struct.pack("<I", 4) + b"\x00" * 4
    frankenstein = (
        b"RIFF"
        + struct.pack("<I", 4 + len(junk1) + len(body) + len(junk2))
        + b"WAVE"
        + junk1
        + body
        + junk2
    )
    sr, nch, a = _decode_audio_bytes(plain)
    sr2, nch2, b = _decode_audio_bytes(frankenstein)
    assert (sr, nch) == (sr2, nch2)
    assert np.array_equal(a, b)


@given(st.binary(max_size=64))
@settings(max_examples=200)
def test_garbage_quarantines_with_the_seam_exception(buf):
    # arbitrary bytes either decode (if they happen to be a valid WAV,
    # vanishingly unlikely at this size) or raise NotImplementedError —
    # never IndexError/struct.error/ValueError leaking out of the seam
    try:
        _decode_audio_bytes(buf)
    except NotImplementedError:
        pass


@given(st.binary(max_size=48))
@settings(max_examples=100)
def test_riff_prefixed_garbage_quarantines(tail):
    try:
        _decode_audio_bytes(b"RIFF\xff\xff\xff\xffWAVE" + tail)
    except NotImplementedError:
        pass
