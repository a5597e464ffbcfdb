"""Pure-stdlib media codecs: uncompressed 24-bit BMP, PCM-16 WAV, and
zlib-compressed 8-bit RGB(A) PNG.

The container ships no image/audio libraries, but these formats need
none — struct + numpy decode BMP/WAV exactly, and PNG's DEFLATE layer is
stdlib ``zlib``, so a COMPRESSED format is decoded for real too (all
five scanline filters). They make the multimodal operators REAL for
BMP/WAV/PNG payloads (decode, feature-extract, resize, duration/RMS)
while JPEG/MP3 stay behind the documented deterministic-stub seam in
operators/multimodal.py.

Everything here is per-payload Python called from Arrow-batched
mapInPandas kernels — the bytes never leave the executor.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class MediaCodecError(ValueError):
    pass


# -- BMP (BITMAPINFOHEADER, 24bpp, bottom-up, no compression) ----------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise MediaCodecError("pixels must be (h, w, 3) uint8")
    h, w, _ = pixels.shape
    row_len = (w * 3 + 3) & ~3          # rows pad to 4 bytes
    img_size = row_len * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = bytearray()
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):      # bottom-up
        rows += pixels[y, :, ::-1].tobytes() + pad   # RGB -> BGR on disk
    return header + info + bytes(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. Strict: 24bpp uncompressed only."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise MediaCodecError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise MediaCodecError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    flipped = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    if offset + row_len * h > len(payload):
        raise MediaCodecError("truncated BMP pixel data")
    rows = np.frombuffer(payload, np.uint8, row_len * h, offset)
    rows = rows.reshape(h, row_len)[:, :w * 3].reshape(h, w, 3)
    if flipped:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()      # BGR -> RGB


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w, 3)."""
    h, w, _ = pixels.shape
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return pixels[ys][:, xs]


# -- PNG (8-bit RGB/RGBA, non-interlaced; DEFLATE via stdlib zlib) -----------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (color type 2, filter 0 rows)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise MediaCodecError("pixels must be (h, w, 3) uint8")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (_PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def _unfilter_png(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters. Returns (h, w*bpp) uint8."""
    stride = w * bpp
    out = np.zeros((h, stride), np.uint16)
    raw = np.frombuffer(raw, np.uint8)
    if raw.size != h * (stride + 1):
        raise MediaCodecError("PNG scanline data has the wrong length")
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype, line = int(rows[y, 0]), rows[y, 1:].astype(np.uint16)
        prev = out[y - 1] if y > 0 else np.zeros(stride, np.uint16)
        if ftype == 0:                       # None
            out[y] = line
        elif ftype == 2:                     # Up
            out[y] = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):             # Sub / Average / Paeth scan left
            cur = out[y]
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise MediaCodecError(f"unknown PNG filter {ftype}")
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB. Strict: 8-bit RGB or RGBA
    (alpha dropped), non-interlaced, single image."""
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise MediaCodecError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        size, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        if ctype == b"IHDR":
            w, h, depth, ctype_png, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or ctype_png not in (2, 6) or comp != 0 \
                    or filt != 0 or interlace != 0:
                raise MediaCodecError(
                    f"unsupported PNG (depth={depth}, color={ctype_png}, "
                    f"interlace={interlace})")
            bpp = 3 if ctype_png == 2 else 4
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size                 # len + type + body + crc
    if w is None or not idat:
        raise MediaCodecError("PNG missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise MediaCodecError(f"PNG inflate failed: {e}") from e
    px = _unfilter_png(raw, h, w, bpp).reshape(h, w, bpp)
    return px[:, :, :3].copy()


# -- WAV (RIFF, PCM 16-bit) --------------------------------------------------

def encode_wav_pcm16(samples: np.ndarray, sample_rate: int,
                     channels: int = 1) -> bytes:
    """int16 samples (interleaved when channels > 1) -> WAV bytes."""
    if samples.dtype != np.int16:
        raise MediaCodecError("samples must be int16")
    data = samples.tobytes()
    block = 2 * channels
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, channels, int16 samples). Walks RIFF
    chunks; strict PCM-16 only."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaCodecError("not a WAV payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            codec, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if codec != 1 or bits != 16:
                raise MediaCodecError(f"unsupported WAV (codec={codec}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)    # chunks pad to even
    if rate is None or data is None:
        raise MediaCodecError("WAV missing fmt/data chunk")
    return rate, channels, np.frombuffer(data, np.int16)


def wav_rms_milli(samples: np.ndarray) -> int:
    """Integer RMS in milli-units of full scale (deterministic)."""
    if samples.size == 0:
        return 0
    mean_sq = float(np.mean((samples.astype(np.float64) / 32768.0) ** 2))
    return int(round(mean_sq ** 0.5 * 1000))


# -- optional-library seam: PIL for compressed images, soundfile for
# -- compressed audio. import-try so the engine runs identically in
# -- codec-less containers (stub path) and codec-equipped clusters (real
# -- path); the Spark-side plumbing is the same either way.

def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def soundfile_available() -> bool:
    try:
        import soundfile  # noqa: F401
        return True
    except ImportError:
        return False


def decode_image_pil(payload: bytes) -> np.ndarray:
    """Any PIL-supported compressed format (JPEG/WebP/GIF/...) ->
    (h, w, c) uint8. Raises MediaCodecError on undecodable bytes so the
    kernel's error handling is uniform with the stdlib codecs."""
    import io

    from PIL import Image, UnidentifiedImageError
    try:
        with Image.open(io.BytesIO(payload)) as im:
            im = im.convert("RGB") if im.mode not in ("RGB", "RGBA") else im
            arr = np.asarray(im, dtype=np.uint8)
    except (UnidentifiedImageError, OSError, ValueError) as e:
        raise MediaCodecError(f"PIL could not decode payload: {e}") from e
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def encode_jpeg_pil(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB -> JPEG bytes via PIL."""
    import io

    from PIL import Image
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise MediaCodecError("pixels must be (h, w, 3) uint8")
    buf = io.BytesIO()
    Image.fromarray(pixels, mode="RGB").save(buf, format="JPEG",
                                             quality=quality)
    return buf.getvalue()


def decode_audio_soundfile(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Any libsndfile-supported compressed format (MP3/FLAC/OGG/...) ->
    (sample_rate, channels, interleaved int16 samples) — the same
    contract as decode_wav, so kernels treat both paths identically."""
    import io

    import soundfile as sf
    try:
        data, rate = sf.read(io.BytesIO(payload), dtype="int16",
                             always_2d=True)
    except (sf.LibsndfileError, RuntimeError, ValueError) as e:
        raise MediaCodecError(f"soundfile could not decode payload: {e}") from e
    channels = data.shape[1]
    return int(rate), channels, data.reshape(-1)


_JPEG_MAGIC = b"\xff\xd8\xff"
_MP3_ID3_MAGIC = b"ID3"


def looks_like_jpeg(payload: bytes) -> bool:
    return payload[:3] == _JPEG_MAGIC


def looks_like_mp3(payload: bytes) -> bool:
    # ID3v2 container, or a bare MPEG frame sync (11 set bits)
    return (payload[:3] == _MP3_ID3_MAGIC
            or (len(payload) >= 2 and payload[0] == 0xFF
                and (payload[1] & 0xE0) == 0xE0))


def decode_jpeg_best(payload: bytes) -> np.ndarray:
    """JPEG -> (h, w, c) uint8: PIL/libjpeg when the wheel exists (fast,
    battle-tested), else the pure-numpy baseline decoder
    (functions/jpeg_codec.py) — so the dominant real-corpus image format
    decodes FOR REAL in this environment, not only when PIL ships."""
    if pil_available():
        return decode_image_pil(payload)
    from marmaray_spark.functions.jpeg_codec import decode_jpeg
    return decode_jpeg(payload)


def encode_jpeg_best(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB -> JPEG via PIL when present, else the
    pure-numpy baseline encoder."""
    if pil_available():
        return encode_jpeg_pil(pixels, quality)
    from marmaray_spark.functions.jpeg_codec import encode_jpeg
    return encode_jpeg(pixels, quality=quality)


def looks_like_flac(payload: bytes) -> bool:
    return payload[:4] == b"fLaC"


def decode_audio_best(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Compressed audio -> (sample_rate, channels, interleaved samples):
    soundfile/libsndfile when the wheel exists; FLAC additionally decodes
    through the pure-Python codec (functions/flac_codec.py) so the
    dominant lossless format works FOR REAL in this environment. Same
    contract as decode_wav."""
    if soundfile_available():
        return decode_audio_soundfile(payload)
    if looks_like_flac(bytes(payload[:4])):
        from marmaray_spark.functions.flac_codec import decode_flac
        return decode_flac(payload)
    raise MediaCodecError("no decoder for this audio payload in env")
