"""Pure-Python FLAC codec (functions/flac_codec.py).

Lossless by definition, so every round-trip asserts EXACT sample
equality. The encoder emits the CONSTANT/FIXED subset; the
LPC/wasted-bits/escape decode paths are exercised by hand-built frames
through the same bit-writer primitives. soundfile parity auto-skips
when the wheel is absent.
"""

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marmaray_spark.functions.flac_codec import (
    _BitWriter,
    _crc8,
    _crc16,
    _write_utf8_number,
    decode_flac,
    encode_flac,
)
from marmaray_spark.functions.media_codec import MediaCodecError


def _signal(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (8000 * np.sin(t / 50.0)
            + rng.integers(-200, 200, n)).astype(np.int64)


def test_mono_roundtrip_exact_and_compresses():
    mono = _signal()
    fl = encode_flac(mono, 16000, channels=1)
    rate, ch, got = decode_flac(fl)
    assert (rate, ch) == (16000, 1)
    assert (got == mono).all()
    assert len(fl) < len(mono) * 2 * 0.8        # beats raw PCM-16


@pytest.mark.parametrize("mid_side", [False, True])
def test_stereo_roundtrip_exact(mid_side):
    t = np.arange(9000)
    left = (6000 * np.sin(t / 40.0)).astype(np.int64)
    rng = np.random.default_rng(1)
    right = (left * 0.9 + rng.integers(-100, 100, len(t))).astype(np.int64)
    inter = np.empty(2 * len(t), np.int64)
    inter[0::2], inter[1::2] = left, right
    fl = encode_flac(inter, 44100, channels=2, mid_side=mid_side)
    rate, ch, got = decode_flac(fl)
    assert (rate, ch) == (44100, 2)
    assert (got == inter).all()


def test_constant_and_empty_blocks():
    c = np.full(5000, -123, np.int64)
    fl = encode_flac(c, 8000)
    assert (decode_flac(fl)[2] == c).all()
    assert len(fl) < 100                        # constant folds to ~nothing


def test_odd_lengths_and_multi_frame():
    x = _signal(4096 * 2 + 137)                 # forces a short last frame
    fl = encode_flac(x, 22050, block_size=4096)
    assert (decode_flac(fl)[2] == x).all()


@given(st.integers(min_value=1, max_value=600),
       st.integers(min_value=0, max_value=2**31 - 1),
       st.sampled_from([1, 2]))
@settings(max_examples=40, deadline=None)
def test_roundtrip_property(n, seed, channels):
    rng = np.random.default_rng(seed)
    x = rng.integers(-(2**15), 2**15, n * channels).astype(np.int64)
    fl = encode_flac(x, 16000, channels=channels, block_size=256)
    rate, ch, got = decode_flac(fl)
    assert ch == channels and (got == x).all()


def test_pinned_digest():
    x = _signal(8000, seed=7)
    fl = encode_flac(x, 16000)
    d = hashlib.sha256(fl).hexdigest()
    assert d == "abfd7e57374600d5842344894ff872e3cae8e35e70e738e6eb292ef92f051420", d


def _handmade_frame(subframe_writer, blocksize, bps=16, channels=1):
    """Minimal single-frame FLAC container around a custom subframe."""
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(16000, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(blocksize, 36)
    si.out += b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si.out).to_bytes(3, "big") + bytes(si.out)

    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)                               # 16-bit blocksize at end
    w.write(0, 4)
    w.write(channels - 1, 4)
    w.write(0, 3)
    w.write(0, 1)
    _write_utf8_number(0, w.out)
    w.out += struct.pack(">H", blocksize - 1)
    w.out.append(_crc8(bytes(w.out)))
    for c in range(channels):
        subframe_writer(w, c)
    w.align()
    w.out += struct.pack(">H", _crc16(bytes(w.out)))
    return bytes(out + w.out)


def test_lpc_subframe_decodes():
    """Hand-built LPC(2) subframe: data[k] = r[k] + ((2*d[k-1] - d[k-2])
    >> 1) — expected samples computed independently, byte-level frame
    through the writer primitives."""
    warm = [100, 140]
    coeffs = [2, -1]
    prec, shift = 4, 1                          # coeffs in 4 bits signed
    resid = [3, -2, 5, 0, -7, 1, 4, -1]
    blocksize = len(warm) + len(resid)
    data = list(warm)
    for r in resid:
        pred = (coeffs[0] * data[-1] + coeffs[1] * data[-2]) >> shift
        data.append(r + pred)

    def sub(w, _c):
        w.write(0, 1)
        w.write(32 | (2 - 1), 6)                # LPC order 2
        w.write(0, 1)                           # no wasted bits
        for v in warm:
            w.write(v, 16)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coeffs:
            w.write(c, prec)
        # residual: rice method 0, partition order 0, param 3
        w.write(0, 2)
        w.write(0, 4)
        w.write(3, 4)
        for r in resid:
            v = (r << 1) ^ (r >> 63)
            w.unary(v >> 3)
            w.write(v, 3)

    rate, ch, got = decode_flac(_handmade_frame(sub, blocksize))
    assert got.tolist() == data


def test_wasted_bits_and_escape_partition():
    """Hand-built VERBATIM subframe with 2 wasted bits, plus a FIXED(0)
    subframe whose residual partition uses the escape code (raw 6-bit)."""
    vals = [4, -8, 12, 16, -20, 24, 8, -4]      # all divisible by 4
    blocksize = len(vals)

    def sub_wasted(w, _c):
        w.write(0, 1)
        w.write(1, 6)                           # VERBATIM
        w.write(1, 1)                           # wasted flag
        w.unary(2 - 1)                          # 2 wasted bits
        for v in vals:
            w.write(v >> 2, 14)                 # eff bps = 16 - 2

    rate, ch, got = decode_flac(_handmade_frame(sub_wasted, blocksize))
    assert got.tolist() == vals

    raw_vals = [5, -17, 30, 0, -1, 9, -25, 14]

    def sub_escape(w, _c):
        w.write(0, 1)
        w.write(8, 6)                           # FIXED order 0
        w.write(0, 1)
        w.write(0, 2)                           # rice method 0
        w.write(0, 4)                           # partition order 0
        w.write(0xF, 4)                         # ESCAPE
        w.write(6, 5)                           # 6 raw bits per residual
        for v in raw_vals:
            w.write(v, 6)

    rate, ch, got = decode_flac(_handmade_frame(sub_escape, len(raw_vals)))
    assert got.tolist() == raw_vals


def test_corrupt_inputs_raise_codec_error():
    x = _signal(3000)
    fl = bytearray(encode_flac(x, 16000))
    hostile = [b"", b"fLaC", bytes(fl[:20]), bytes(fl[:len(fl) // 2]),
               b"RIFF" + bytes(fl[4:])]
    for bad in hostile:
        with pytest.raises(MediaCodecError):
            decode_flac(bad)
    # CRC must catch a flipped byte in the frame body
    fl[-10] ^= 0xFF
    with pytest.raises(MediaCodecError):
        decode_flac(bytes(fl))


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_decoder_never_leaks_raw_exceptions(data):
    for payload in (data, b"fLaC" + data):
        try:
            decode_flac(payload)
        except MediaCodecError:
            pass


@given(st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=1, max_value=255))
@settings(max_examples=150, deadline=None)
def test_decoder_survives_single_byte_corruption(pos_seed, xor):
    x = _signal(600, seed=11)
    fl = bytearray(encode_flac(x, 16000, block_size=256))
    fl[pos_seed % len(fl)] ^= xor
    try:
        rate, ch, got = decode_flac(bytes(fl))
        assert ch >= 1
    except MediaCodecError:
        pass


def test_soundfile_parity():
    from marmaray_spark.functions.media_codec import soundfile_available
    if not soundfile_available():
        pytest.skip("soundfile not in this container")
    import io

    import soundfile as sf

    x = _signal(5000)
    data, rate = sf.read(io.BytesIO(encode_flac(x, 16000)), dtype="int16")
    assert rate == 16000 and (data.astype(np.int64) == x).all()


def test_multimodal_kernel_decodes_flac(spark):
    """The dominant lossless audio format decodes FOR REAL through the
    Spark audio-features kernel — no soundfile required."""
    from marmaray_spark.operators.multimodal import (_decode_audio,
                                                     attach_media_metadata)
    x = _signal(16000)
    payload = encode_flac(x, 16000)
    rate, n = _decode_audio(payload)
    assert (rate, n) == (16000, 16000)


def test_audio_features_kernel_flac_rms(spark):
    """extract_audio_features computes a REAL rms for FLAC (not the
    stub's -1 marker), through the Spark kernel."""
    import pandas as pd

    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     extract_audio_features)
    x = _signal(8000)
    df = attach_media_metadata(spark.createDataFrame(
        [(1, "audio", encode_flac(x, 16000))],
        ["media_id", "media_type", "payload"]))
    row = extract_audio_features(df).first()
    assert row["sample_rate"] == 16000 and row["n_samples"] == 8000
    assert row["duration_ms"] == 500
    assert row["rms_milli"] > 0        # real decode, not the -1 stub
