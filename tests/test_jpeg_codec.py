"""Pure-numpy baseline JPEG codec (functions/jpeg_codec.py).

Strategy: the encoder produces spec-conformant baseline streams the
decoder must invert within JPEG's lossy bounds; exact digests of both
directions are PINNED so any regression in either codec path is a hard
failure; PIL parity (both decode-ours and decode-theirs) auto-skips when
PIL is absent from the container.
"""

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marmaray_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg
from marmaray_spark.functions.media_codec import MediaCodecError


def _test_image(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 // max(w - 1, 1),
        yy * 255 // max(h - 1, 1),
        (127 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(int),
    ], axis=2).clip(0, 255).astype(np.uint8)


def test_roundtrip_quality_bounds():
    img = _test_image()
    for q, bound in ((95, 3.0), (75, 6.0), (50, 9.0)):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < bound, (q, err)


def test_roundtrip_420_and_restarts():
    img = _test_image(45, 57)       # non-multiple-of-16 dims
    for kw in (dict(subsampling="420"),
               dict(restart_interval=3),
               dict(subsampling="420", restart_interval=2)):
        dec = decode_jpeg(encode_jpeg(img, quality=85, **kw))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < 8.0


def test_grayscale():
    g = (np.mgrid[0:33, 0:41][0] * 255 // 32).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (33, 41, 3)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 2.0
    assert (dec[:, :, 0] == dec[:, :, 1]).all()


def test_pinned_digests():
    """Regression pins: exact sha256 of the encoded stream AND of the
    decoded pixels for a fixed input. A change to either codec path that
    alters output bytes is a deliberate act, not an accident."""
    img = _test_image(40, 56)
    jp = encode_jpeg(img, quality=90)
    dec = decode_jpeg(jp)
    enc_d = hashlib.sha256(jp).hexdigest()
    dec_d = hashlib.sha256(dec.tobytes()).hexdigest()
    assert (enc_d, dec_d) == (
        "03a22150f93825676cd71f8bb7ff87a153b4977b4ff881ac48ea8718ffcbcd4d",
        "92e0ee8b785a327c8a9e62608d1734de001df8a13d0b4e4821eee7fe2870bd05",
    ), (enc_d, dec_d)


def test_corrupt_inputs_raise_codec_error():
    img = _test_image(16, 16)
    jp = encode_jpeg(img)
    hostile = [b"", b"\x89PNG", b"\xff\xd8", b"\xff\xd8\xff\xe0",
               jp[:40], jp[:len(jp) // 2], jp[:2] + b"\x00" * 30,
               # progressive SOF2 marker spliced in
               b"\xff\xd8\xff\xc2" + jp[4:]]
    for bad in hostile:
        with pytest.raises(MediaCodecError):
            decode_jpeg(bad)


@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2 ** 31 - 1))
@settings(max_examples=30, deadline=None)
def test_roundtrip_property_random_dims(h, w, seed):
    rng = np.random.default_rng(seed)
    # low-frequency content (random noise is JPEG-hostile by design):
    # bilinear-ish upsample of a tiny random grid
    small = rng.integers(0, 256, (4, 4, 3)).astype(np.float64)
    ys = np.linspace(0, 3, h)
    xs = np.linspace(0, 3, w)
    y0 = np.floor(ys).astype(int).clip(0, 2)
    x0 = np.floor(xs).astype(int).clip(0, 2)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    img = ((1 - fy) * (1 - fx) * small[y0][:, x0]
           + (1 - fy) * fx * small[y0][:, x0 + 1]
           + fy * (1 - fx) * small[y0 + 1][:, x0]
           + fy * fx * small[y0 + 1][:, x0 + 1]).clip(0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    # chroma quantization dominates for tiny saturated-color images, so
    # the bound is loose; the shape/determinism guarantees are the point
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 10.0


def test_pil_parity():
    """When PIL exists: libjpeg decodes OUR streams and we decode ITS
    streams, both within JPEG-lossy bounds — proving interoperability,
    not just self-consistency."""
    from marmaray_spark.functions.media_codec import pil_available
    if not pil_available():
        pytest.skip("PIL not in this container")
    import io

    from PIL import Image

    img = _test_image(40, 56)
    # theirs decodes ours
    theirs = np.asarray(
        Image.open(io.BytesIO(encode_jpeg(img, quality=90))).convert("RGB"))
    assert np.abs(theirs.astype(int) - img.astype(int)).mean() < 4.0
    # ours decodes theirs
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    ours = decode_jpeg(buf.getvalue())
    assert np.abs(ours.astype(int) - img.astype(int)).mean() < 4.0


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_decoder_never_leaks_raw_exceptions(data):
    """Fuzz: arbitrary bytes (with and without SOI grafted on) must only
    raise MediaCodecError — a raw IndexError/struct.error/KeyError out of
    the marker parser or Huffman decoder would crash the Spark kernel
    instead of forking the record to the error channel."""
    for payload in (data, b"\xff\xd8" + data, b"\xff\xd8\xff\xe0" + data):
        try:
            decode_jpeg(payload)
        except MediaCodecError:
            pass


@given(st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=1, max_value=255))
@settings(max_examples=200, deadline=None)
def test_decoder_survives_single_byte_corruption(pos_seed, xor):
    """Mutational fuzz: flip ONE byte anywhere in a VALID stream. The
    decoder must either still decode (entropy bits may absorb the flip)
    or raise MediaCodecError — never a raw exception, never a hang."""
    img = _test_image(24, 24)
    jp = bytearray(encode_jpeg(img, quality=80))
    pos = pos_seed % len(jp)
    jp[pos] ^= xor
    try:
        out = decode_jpeg(bytes(jp))
        assert out.dtype == np.uint8 and out.ndim == 3
    except MediaCodecError:
        pass
