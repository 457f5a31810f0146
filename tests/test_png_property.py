"""Property-based tests for the pure-Python PNG codec (no Spark session —
these run in milliseconds and hammer the chunk framing / filter handling)."""

from __future__ import annotations

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from safeascent_spark.operators.multimodal import (PNG_SIG, decode_png,
                                                   encode_png)


@settings(max_examples=200, deadline=None)
@given(width=st.integers(1, 257), height=st.integers(1, 97),
       gray=st.integers(0, 255))
def test_roundtrip_any_geometry(width, height, gray):
    w, h, bd, ct, psum = decode_png(encode_png(width, height, gray))
    assert (w, h, bd, ct) == (width, height, 8, 0)
    assert psum == sum(width * ((gray + r) % 256) for r in range(height))


@settings(max_examples=100, deadline=None)
@given(width=st.integers(1, 64), height=st.integers(1, 64),
       gray=st.integers(0, 255), flip=st.integers(8, 200),
       bit=st.integers(0, 7))
def test_any_single_bitflip_never_decodes_silently_wrong(width, height, gray,
                                                         flip, bit):
    """Corrupting any byte after the signature either raises (CRC / inflate
    / framing) or — if it lands in IDAT padding that zlib tolerates — still
    yields the exact original pixels.  A silent wrong decode is the only
    unacceptable outcome."""
    payload = bytearray(encode_png(width, height, gray))
    flip = min(flip, len(payload) - 1)
    payload[flip] ^= 1 << bit
    expected = sum(width * ((gray + r) % 256) for r in range(height))
    try:
        w, h, _, _, psum = decode_png(bytes(payload))
    except (ValueError, NotImplementedError, zlib.error, IndexError):
        return  # detected — good
    assert (w, h, psum) == (width, height, expected)


def test_signature_is_the_real_png_magic():
    assert PNG_SIG == bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])


# --- WAV codec ---------------------------------------------------------------

def test_wav_roundtrips_through_stdlib_reader():
    """Our encoder must produce files the stdlib wave module accepts with
    identical params, and our decoder must agree with it sample-for-sample."""
    import io
    import struct
    import wave
    from safeascent_spark.operators.multimodal import decode_wav, encode_wav
    payload = encode_wav(11000, 453, seed=42)
    with wave.open(io.BytesIO(payload)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth(),
                w.getnframes()) == (11000, 1, 2, 453)
        frames = struct.unpack("<453h", w.readframes(453))
    rate, ch, bits, n, sum_abs, peak = decode_wav(payload)
    assert (rate, ch, bits, n) == (11000, 1, 16, 453)
    assert sum_abs == sum(abs(s) for s in frames)
    assert peak == max(abs(s) for s in frames)


def test_wav_decoder_rejects_corruption():
    import pytest
    from safeascent_spark.operators.multimodal import decode_wav, encode_wav
    payload = bytearray(encode_wav(8000, 10, seed=1))
    payload[0:4] = b"RIFX"
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(bytes(payload))
    payload = bytearray(encode_wav(8000, 10, seed=1))
    payload[4] ^= 0xFF  # declared RIFF size now wrong
    with pytest.raises(ValueError, match="size mismatch"):
        decode_wav(bytes(payload))
    # a chunk whose declared length overruns the payload must be a clean
    # ValueError, not a downstream struct.error (r3 ADVICE item 3)
    import struct as _s
    good = encode_wav(8000, 10, seed=1)
    data_at = good.find(b"data")
    payload = bytearray(good)
    payload[data_at + 4:data_at + 8] = _s.pack("<I", 10_000)
    payload[4:8] = _s.pack("<I", len(payload) - 8)  # keep RIFF size valid
    with pytest.raises(ValueError, match="overruns"):
        decode_wav(bytes(payload))
    # fmt chunk shorter than 16 bytes: same contract
    fmt_at = good.find(b"fmt ")
    payload = bytearray(good[:fmt_at + 8 + 8])  # truncate fmt to 8 bytes
    payload[fmt_at + 4:fmt_at + 8] = _s.pack("<I", 8)
    payload[4:8] = _s.pack("<I", len(payload) - 8)
    with pytest.raises(ValueError, match="fmt chunk"):
        decode_wav(bytes(payload))


def test_resize_nn_on_nonconstant_grid():
    """Oracle images are row-constant, so independently verify the NN
    resize on a grid that varies in BOTH axes."""
    from safeascent_spark.operators.multimodal import resize_gray_nn
    src = [bytes((r * 10 + c) % 256 for c in range(5)) for r in range(7)]
    out = resize_gray_nn(src, 3, 2)
    expect = bytes(src[r2 * 7 // 2][c2 * 5 // 3]
                   for r2 in range(2) for c2 in range(3))
    assert out == expect
    assert len(out) == 6


def test_resize_roundtrip_through_real_codec():
    """encode -> decode_png_pixels -> resize must agree with resizing the
    known generator pattern directly."""
    from safeascent_spark.operators.multimodal import (
        decode_png_pixels, encode_png, resize_gray_nn)
    payload = encode_png(20, 13, gray=200)
    px = decode_png_pixels(payload)
    assert len(px) == 13 and all(len(r) == 20 for r in px)
    out = resize_gray_nn(px, 8, 8)
    expect = bytes((200 + (r2 * 13 // 8)) % 256
                   for r2 in range(8) for _ in range(8))
    assert out == expect
