"""GIF (LZW) + MJPEG-AVI codecs and the now-real frame sampler.

GIF indices round-trip EXACTLY (palette indexing is lossless); AVI
frames round-trip through the lossy JPEG codec within its bounds; the
frame-sampling kernel returns real decodable frames for both container
types and keeps the byte-slice stub for unknown formats.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marmaray_spark.functions.avi_codec import (
    decode_avi_frames,
    encode_avi_mjpeg,
    parse_avi,
)
from marmaray_spark.functions.gif_codec import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)
from marmaray_spark.functions.jpeg_codec import encode_jpeg
from marmaray_spark.functions.media_codec import MediaCodecError

PAL = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
                [255, 255, 0], [128, 128, 128]], np.uint8)


def _rgb(k=0, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 5 + k * 30) % 256, (yy * 7) % 256,
                     ((xx + yy) * 3) % 256], axis=2).astype(np.uint8)


def test_gif_single_frame_exact():
    rng = np.random.default_rng(5)
    fr = rng.integers(0, len(PAL), (37, 53)).astype(np.uint8)
    got = decode_gif(encode_gif([fr], PAL))
    assert (got == PAL[fr]).all()


def test_gif_animation_frames_exact():
    rng = np.random.default_rng(6)
    frames = [rng.integers(0, len(PAL), (20, 30)).astype(np.uint8)
              for _ in range(5)]
    got = decode_gif_frames(encode_gif(frames, PAL))
    assert len(got) == 5
    for g, f in zip(got, frames):
        assert (g == PAL[f]).all()


@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    fr = rng.integers(0, len(PAL), (h, w)).astype(np.uint8)
    assert (decode_gif(encode_gif([fr], PAL)) == PAL[fr]).all()


def test_gif_corrupt_raises_codec_error():
    good = encode_gif([np.zeros((8, 8), np.uint8)], PAL)
    for bad in (b"", b"GIF89a", good[:20], good[:-5],
                b"GIF89a" + b"\xff" * 30):
        with pytest.raises(MediaCodecError):
            decode_gif(bad)


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_gif_decoder_never_leaks_raw_exceptions(data):
    for payload in (data, b"GIF89a" + data):
        try:
            decode_gif(payload)
        except MediaCodecError:
            pass


def test_avi_parse_and_decode():
    frames = [_rgb(k) for k in range(4)]
    avi = encode_avi_mjpeg([encode_jpeg(f, quality=90) for f in frames],
                           48, 32, fps=5)
    info = parse_avi(avi)
    assert (info["width"], info["height"], info["n_frames"]) == (48, 32, 4)
    assert info["usec_per_frame"] == 200000
    dec = decode_avi_frames(avi)
    assert len(dec) == 4
    for d, f in zip(dec, frames):
        assert d.shape == f.shape
        assert np.abs(d.astype(int) - f.astype(int)).mean() < 3.0


def test_avi_corrupt_raises_codec_error():
    avi = encode_avi_mjpeg([encode_jpeg(_rgb(), quality=80)], 48, 32)
    for bad in (b"", b"RIFF", avi[:30], b"RIFF" + avi[4:8] + b"WAVE"
                + avi[12:]):
        with pytest.raises(MediaCodecError):
            parse_avi(bad)


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_avi_parser_never_leaks_raw_exceptions(data):
    for payload in (data, b"RIFF\x00\x01\x00\x00AVI " + data):
        try:
            parse_avi(payload)
        except MediaCodecError:
            pass


def test_frame_sampler_real_avi_and_gif(spark):
    """The frame-sampling operator emits REAL frames for MJPEG AVI
    (JPEG payloads that decode to the true dims) and animated GIF (PNG
    payloads), while unknown containers keep the byte-slice stub."""
    from marmaray_spark.functions.media_codec import decode_png
    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     sample_frames)
    frames = [_rgb(k) for k in range(3)]
    avi = encode_avi_mjpeg([encode_jpeg(f, quality=90) for f in frames],
                           48, 32)
    rng = np.random.default_rng(2)
    gif = encode_gif([rng.integers(0, len(PAL), (16, 24)).astype(np.uint8)
                      for _ in range(2)], PAL)
    blob = b"rawvideo-ish" * 20
    df = attach_media_metadata(spark.createDataFrame(
        [(1, "video", avi), (2, "video", gif), (3, "video", blob)],
        ["media_id", "media_type", "payload"]))
    rows = sample_frames(df).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 3
    from marmaray_spark.functions.jpeg_codec import decode_jpeg
    px = decode_jpeg(bytes(by_id[1][0]["frame_payload"]))
    assert px.shape == (32, 48, 3)
    assert len(by_id[2]) == 2
    png = decode_png(bytes(by_id[2][0]["frame_payload"]))
    assert png.shape == (16, 24, 3)
    assert len(by_id[3]) == len(blob) // 64 + (1 if len(blob) % 64 else 0)


def test_image_features_real_gif_dims(spark):
    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     extract_image_features)
    fr = np.zeros((21, 34), np.uint8)
    df = attach_media_metadata(spark.createDataFrame(
        [(1, "image", encode_gif([fr], PAL))],
        ["media_id", "media_type", "payload"]))
    row = extract_image_features(df).first()
    assert (row["width"], row["height"], row["channels"]) == (34, 21, 3)


def test_resize_gif_payload(spark):
    from marmaray_spark.functions.media_codec import decode_png
    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     resize_images)
    rng = np.random.default_rng(9)
    fr = rng.integers(0, len(PAL), (20, 28)).astype(np.uint8)
    df = attach_media_metadata(spark.createDataFrame(
        [(1, "image", encode_gif([fr], PAL))],
        ["media_id", "media_type", "payload"]))
    row = resize_images(df, 14, 10).first()
    out = decode_png(bytes(row["payload"]))
    assert out.shape == (10, 14, 3)


def test_gif_lzw_tail_width_bump_regression():
    """Hypothesis-found (r10): the decoder adds its last table entry
    while processing the FINAL data code — an allocation the encoder's
    lagged bump rule never mirrors. When that entry lands exactly on
    2^width the decoder reads END one bit wider than written ('LZW
    stream ended without END'). Pinned with the falsifying frame (the
    final allocation is code 256)."""
    rng = np.random.default_rng(938970918)
    fr = rng.integers(0, len(PAL), (15, 36)).astype(np.uint8)
    assert (decode_gif(encode_gif([fr], PAL)) == PAL[fr]).all()
