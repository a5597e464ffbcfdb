"""G.711 (mu-law / A-law) and IMA ADPCM WAV codecs: the compressed-WAV
variants real corpora carry (telephony captures, 4-bit field recorders).

Validation strategy (no external audio libs in env): the G.711 decode
laws are fixed ITU-T formulas, so the tables are COMPUTED and checked
against known anchor points plus the 256-code self-inverse property; IMA
ADPCM is lossy, so round-trips assert SNR and a pinned digest."""

import hashlib

import numpy as np
import pytest

from marmaray_spark.functions.media_codec import (
    MediaCodecError,
    alaw_decode,
    alaw_encode,
    decode_wav,
    encode_wav_g711,
    encode_wav_ima_adpcm,
    ima_adpcm_decode,
    ima_adpcm_encode,
    ulaw_decode,
    ulaw_encode,
)


def _sine(n=4000, amp=12000, period=20):
    return (np.sin(np.arange(n) / period) * amp).astype(np.int16)


@pytest.mark.parametrize("dec,enc", [(ulaw_decode, ulaw_encode),
                                     (alaw_decode, alaw_encode)])
def test_g711_self_inverse_over_all_codes(dec, enc):
    codes = np.arange(256, dtype=np.uint8)
    vals = dec(codes)
    # encode(decode(code)) decodes back to the same PCM value for every
    # code (some code pairs alias the same value, e.g. +0/-0)
    assert (dec(enc(vals)) == vals).all()


def test_g711_known_anchor_values():
    # ITU-T G.711 anchors: mu-law 0xFF/0x7F are +0/-0; A-law 0xD5 is +8
    assert ulaw_decode(np.array([0xFF], np.uint8))[0] == 0
    assert ulaw_decode(np.array([0x7F], np.uint8))[0] == 0
    assert alaw_decode(np.array([0xD5], np.uint8))[0] == 8
    # full-scale magnitudes of the two laws
    assert int(np.abs(ulaw_decode(np.arange(256, dtype=np.uint8))).max()) == 32124
    assert int(np.abs(alaw_decode(np.arange(256, dtype=np.uint8))).max()) == 32256


def test_g711_encode_is_nearest_code():
    sig = _sine()
    for enc, dec in [(ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)]:
        got = dec(enc(sig)).astype(np.float64)
        table = np.sort(dec(np.arange(256, dtype=np.uint8)).astype(np.float64))
        # quantization error never exceeds the local code spacing
        spacing = np.diff(table).max()
        assert np.abs(got - sig).max() <= spacing


@pytest.mark.parametrize("channels", [1, 2])
def test_ima_adpcm_roundtrip_snr(channels):
    sig = _sine(8000)
    if channels == 2:
        st = np.empty(16000, np.int16)
        st[0::2], st[1::2] = sig, sig // 2
        sig = st
    data = ima_adpcm_encode(sig, channels, 256)
    out = ima_adpcm_decode(data, channels, 256)[:len(sig)]
    err = (out.astype(np.float64) - sig) ** 2
    snr = 10 * np.log10((sig.astype(np.float64) ** 2).mean() / err.mean())
    assert snr > 25          # typical ADPCM quality on a smooth signal


def test_ima_adpcm_deterministic_digest():
    sig = _sine(2048, amp=9000, period=13)
    data = ima_adpcm_encode(sig, 1, 256)
    assert hashlib.md5(data).hexdigest() == \
        hashlib.md5(ima_adpcm_encode(sig, 1, 256)).hexdigest()
    out1 = ima_adpcm_decode(data, 1, 256)
    out2 = ima_adpcm_decode(data, 1, 256)
    assert (out1 == out2).all()


def test_wav_container_dispatch_all_codecs():
    sig = _sine()
    for law in ("ulaw", "alaw"):
        rate, ch, got = decode_wav(encode_wav_g711(sig, 8000, 1, law))
        assert (rate, ch) == (8000, 1) and len(got) == len(sig)
    rate, ch, got = decode_wav(encode_wav_ima_adpcm(sig, 8000, 1))
    assert (rate, ch) == (8000, 1) and len(got) >= len(sig)
    st = np.empty(8000, np.int16)
    st[0::2], st[1::2] = sig[:4000], sig[:4000] // 3
    rate, ch, got = decode_wav(encode_wav_ima_adpcm(st, 16000, 2))
    assert (rate, ch) == (16000, 2) and len(got) % 2 == 0


def test_ima_adpcm_hostile_layouts_are_codec_errors():
    with pytest.raises(MediaCodecError):
        ima_adpcm_decode(b"\x00" * 256, channels=3, block_align=256)
    with pytest.raises(MediaCodecError):
        ima_adpcm_decode(b"\x00" * 256, channels=1, block_align=2)
    with pytest.raises(MediaCodecError):
        ima_adpcm_decode(b"\x00" * 256, channels=1, block_align=None)
    # short tail data (no complete block) decodes to empty, not a crash
    assert len(ima_adpcm_decode(b"\x00" * 10, 1, 256)) == 0


def test_ima_adpcm_step_index_clamped_on_hostile_header():
    # index byte 0xFF in the block header must clamp to 88, not index OOB
    block = bytearray(256)
    block[2] = 0xFF
    out = ima_adpcm_decode(bytes(block), 1, 256)
    assert len(out) == (256 - 4) * 2 + 1


def test_audio_features_on_compressed_wav_variants(spark):
    """The multimodal audio-feature kernel decodes G.711 and IMA ADPCM
    WAVs through the same decode_wav dispatch as PCM-16 — the Spark-side
    plumbing sees one WAV contract regardless of inner codec."""
    from marmaray_spark.operators.multimodal import extract_audio_features

    sig = _sine(8000)
    rows = [
        (1, "audio", encode_wav_g711(sig, 8000, 1, "ulaw")),
        (2, "audio", encode_wav_g711(sig, 8000, 1, "alaw")),
        (3, "audio", encode_wav_ima_adpcm(sig, 8000, 1)),
        (4, "audio", b"RIFFnope"),             # hostile: decode error row
    ]
    df = spark.createDataFrame(rows, ["media_id", "media_type", "payload"])
    got = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    for i in (1, 2, 3):
        assert got[i]["sample_rate"] == 8000, i
        assert got[i]["ok"], i
        # one second of audio, RMS well above silence
        assert got[i]["duration_ms"] >= 990, i
        assert got[i]["rms_milli"] > 100, i
    # G.711 decodes track the source closely: RMS within 1% of each other
    assert abs(got[1]["rms_milli"] - got[2]["rms_milli"]) <= 10
    # the hostile row forked to ok=False; the batch survived
    assert not got[4]["ok"] and got[4]["sample_rate"] == -1


# -- WebP header parse / MP3 frame-walk metadata (r6) ------------------------

def _webp(fourcc: bytes, body: bytes) -> bytes:
    import struct
    chunk = fourcc + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_webp_dims_all_three_variants():
    import struct
    from marmaray_spark.functions.media_codec import parse_webp_dims

    # VP8 lossy keyframe: tag + start code + 14-bit dims
    vp8 = b"\x00\x00\x00" + b"\x9d\x01\x2a" \
        + struct.pack("<H", 320) + struct.pack("<H", 240) + b"\x00" * 8
    assert parse_webp_dims(_webp(b"VP8 ", vp8)) == (320, 240, 3)
    # VP8L lossless: 0x2F + packed w-1/h-1/alpha
    bits = (17 - 1) | ((5 - 1) << 14) | (1 << 28)
    vp8l = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 8
    assert parse_webp_dims(_webp(b"VP8L", vp8l)) == (17, 5, 4)
    bits = (100 - 1) | ((50 - 1) << 14)
    vp8l = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 8
    assert parse_webp_dims(_webp(b"VP8L", vp8l)) == (100, 50, 3)
    # VP8X extended: flags + 24-bit canvas dims
    vp8x = bytes([0x10]) + b"\x00" * 3 \
        + (640 - 1).to_bytes(3, "little") + (480 - 1).to_bytes(3, "little")
    assert parse_webp_dims(_webp(b"VP8X", vp8x)) == (640, 480, 4)


def test_webp_hostile_headers_are_codec_errors():
    from marmaray_spark.functions.media_codec import (MediaCodecError,
                                                      parse_webp_dims)

    for bad in (b"RIFF1234WEBP",                       # no chunk
                _webp(b"VP8 ", b"\x00\x00\x00badsig\x00\x00\x00\x00"),
                _webp(b"VP8L", b"\x00\x00\x00\x00\x00"),
                _webp(b"ALPH", b"\x00" * 16),
                b"not webp at all"):
        with pytest.raises(MediaCodecError):
            parse_webp_dims(bad)


def _mp3_frames(n=10, pad_id3=False):
    # MPEG1 Layer III, 44.1 kHz, 128 kbps, no padding: 417-byte frames
    frame = b"\xff\xfb\x90\x00" + b"\x00" * (417 - 4)
    out = frame * n
    if pad_id3:
        size = 100
        id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, size]) + b"\x00" * size
        out = id3 + out
    return out


def test_mp3_frame_walk_counts_frames_and_samples():
    from marmaray_spark.functions.media_codec import mp3_stream_info

    rate, n_samples, n_frames = mp3_stream_info(_mp3_frames(10))
    assert (rate, n_frames) == (44100, 10)
    assert n_samples == 10 * 1152
    # ID3v2 tag skipped via syncsafe size
    rate, n_samples, n_frames = mp3_stream_info(_mp3_frames(3, pad_id3=True))
    assert (rate, n_frames) == (44100, 3)
    # trailing junk after the last frame stops the walk cleanly
    rate, _, n_frames = mp3_stream_info(_mp3_frames(2) + b"\x01garbage")
    assert n_frames == 2


def test_mp3_hostile_streams_are_codec_errors():
    from marmaray_spark.functions.media_codec import (MediaCodecError,
                                                      mp3_stream_info)

    for bad in (b"\xff\xe0 but never a full frame",
                b"no sync here at all",
                b"ID3\x04\x00\x00\x00\x00\x00\x05hello"):
        with pytest.raises(MediaCodecError):
            mp3_stream_info(bad)


def test_image_features_webp_and_audio_features_mp3(spark):
    """The kernels surface REAL WebP dims and REAL MP3 duration without
    any external library — metadata-real, samples behind the seam."""
    import struct
    from marmaray_spark.operators.multimodal import (extract_audio_features,
                                                     extract_image_features)

    bits = (31 - 1) | ((13 - 1) << 14)
    webp = _webp(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 8)
    img = spark.createDataFrame([(1, "image", webp)],
                                ["media_id", "media_type", "payload"])
    row = extract_image_features(img).collect()[0]
    assert (row["width"], row["height"], row["ok"]) == (31, 13, True)

    aud = spark.createDataFrame([(1, "audio", _mp3_frames(20))],
                                ["media_id", "media_type", "payload"])
    arow = extract_audio_features(aud).collect()[0]
    assert arow["sample_rate"] == 44100 and arow["ok"]
    assert arow["n_samples"] == 20 * 1152
    assert arow["rms_milli"] == -1          # samples stay behind the seam


# -- mutational fuzz: the new parsers obey the codec-error-only contract -----

def test_fuzz_wav_variants_codec_error_only():
    """Bit-flipped / truncated G.711+ADPCM WAVs either decode or raise
    MediaCodecError — never IndexError/struct.error/segfault-shaped
    surprises (the contract the OCF/JPEG/FLAC parsers are pinned to)."""
    import random

    rng = random.Random(0xC0DEC)
    sig = _sine(512)
    seeds = [encode_wav_g711(sig, 8000, 1, "ulaw"),
             encode_wav_g711(sig, 8000, 1, "alaw"),
             encode_wav_ima_adpcm(sig, 8000, 1, 64)]
    for seed in seeds:
        for _ in range(150):
            b = bytearray(seed)
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            if rng.random() < 0.3:
                b = b[:rng.randrange(len(b))]
            try:
                decode_wav(bytes(b))
            except MediaCodecError:
                pass                    # the only permitted failure


def test_fuzz_webp_mp3_codec_error_only():
    import random
    import struct
    from marmaray_spark.functions.media_codec import (mp3_stream_info,
                                                      parse_webp_dims)

    rng = random.Random(0xFEED)
    bits = (64 - 1) | ((32 - 1) << 14)
    seeds_webp = [
        _webp(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 8),
        _webp(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a"
              + struct.pack("<HH", 64, 32) + b"\x00" * 8),
        _webp(b"VP8X", bytes([0x10]) + b"\x00" * 3
              + (63).to_bytes(3, "little") + (31).to_bytes(3, "little")),
    ]
    for seed in seeds_webp:
        for _ in range(200):
            b = bytearray(seed)
            for _ in range(rng.randint(1, 3)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            if rng.random() < 0.3:
                b = b[:rng.randrange(len(b))]
            try:
                parse_webp_dims(bytes(b))
            except MediaCodecError:
                pass
    seed_mp3 = _mp3_frames(4)
    for _ in range(200):
        b = bytearray(seed_mp3)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        if rng.random() < 0.3:
            b = b[:rng.randrange(len(b))]
        try:
            mp3_stream_info(bytes(b))
        except MediaCodecError:
            pass


def test_pcm16_trailing_odd_byte_tolerated():
    from marmaray_spark.functions.media_codec import encode_wav_pcm16

    sig = _sine(100)
    w = encode_wav_pcm16(sig, 8000, 1)
    rate, ch, got = decode_wav(w[:-1])      # bad-writer trailing cut
    assert (rate, ch) == (8000, 1) and len(got) == 99


def test_fuzz_pcm16_wav_codec_error_only():
    import random
    from marmaray_spark.functions.media_codec import encode_wav_pcm16

    rng = random.Random(0xBEEF)
    seed = encode_wav_pcm16(_sine(256), 8000, 1)
    for _ in range(200):
        b = bytearray(seed)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        if rng.random() < 0.4:
            b = b[:rng.randrange(len(b))]
        try:
            decode_wav(bytes(b))
        except MediaCodecError:
            pass
