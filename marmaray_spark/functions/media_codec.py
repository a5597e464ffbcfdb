"""Pure-stdlib media codecs: uncompressed 24-bit BMP, WAV (PCM-16 plus
the compressed G.711 mu-law/A-law and IMA-ADPCM variants), and
zlib-compressed 8-bit RGB(A) PNG.

The container ships no image/audio libraries, but these formats need
none — struct + numpy decode BMP/WAV exactly, and PNG's DEFLATE layer is
stdlib ``zlib``, so a COMPRESSED format is decoded for real too (all
five scanline filters). Together with the JPEG/GIF/FLAC/AVI codecs in
their sibling modules they make the multimodal operators REAL for those
payloads; WebP and MP3 get real METADATA here (header/frame-walk parse:
dims+alpha, sample rate+duration) with pixel/sample decode behind the
PIL/soundfile adapter seams.

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
    chunks; decodes PCM-16 (codec 1), A-law (6), mu-law (7) and IMA
    ADPCM (17) payloads — the compressed-WAV variants real corpora carry
    (G.711 telephony captures, 4-bit ADPCM field recorders)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaCodecError("not a WAV payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    codec, block_align = None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            codec, channels, rate, _br, block_align, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if codec not in (1, 6, 7, 17):
                raise MediaCodecError(
                    f"unsupported WAV (codec={codec}, bits={bits})")
            if codec == 1 and bits != 16:
                raise MediaCodecError(f"unsupported PCM WAV (bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)    # chunks pad to even
    if rate is None or data is None:
        raise MediaCodecError("WAV missing fmt/data chunk")
    if codec == 1:
        # tolerate a trailing odd byte (a common bad-writer artifact):
        # truncate to sample alignment instead of np.frombuffer's plain
        # ValueError escaping the MediaCodecError-only contract
        return rate, channels, np.frombuffer(data, np.int16,
                                             len(data) // 2)
    if codec == 6:
        return rate, channels, alaw_decode(np.frombuffer(data, np.uint8))
    if codec == 7:
        return rate, channels, ulaw_decode(np.frombuffer(data, np.uint8))
    return rate, channels, ima_adpcm_decode(data, channels, block_align)


# -- G.711 companded PCM (WAV codecs 6 = A-law, 7 = mu-law) ------------------
#
# 8-bit logarithmic PCM; the decode laws are fixed formulas (ITU-T G.711),
# so the 256-entry lookup tables are COMPUTED here, not transcribed. The
# encoders are exact inverses built by segment search; round-trip
# encode(decode(code)) == code over all 256 codes is the self-check.

def _ulaw_table() -> np.ndarray:
    c = ~np.arange(256, dtype=np.int32) & 0xFF
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84      # max 32124: 16-bit
    return np.where(c & 0x80, -mag, mag).astype(np.int16)

_ULAW_DEC = _ulaw_table()


def _alaw_table() -> np.ndarray:
    c = np.arange(256, dtype=np.int32) ^ 0x55
    seg = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = np.where(seg == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(seg - 1, 0))
    return np.where(c & 0x80, mag, -mag).astype(np.int16)   # max 32256

_ALAW_DEC = _alaw_table()


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    return _ULAW_DEC[np.asarray(codes, np.uint8)]


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    return _ALAW_DEC[np.asarray(codes, np.uint8)]


def _compand_encode(samples: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Nearest-code companding encoder from the decode table (exact
    inverse on decoder outputs; nearest-neighbor elsewhere)."""
    order = np.argsort(table, kind="stable")
    sorted_vals = table[order].astype(np.int32)
    s = np.asarray(samples, np.int32)
    idx = np.searchsorted(sorted_vals, s)
    idx = idx.clip(0, 255)
    lo = (idx - 1).clip(0, 255)
    pick = np.where(np.abs(sorted_vals[lo] - s) <= np.abs(sorted_vals[idx] - s),
                    lo, idx)
    return order[pick].astype(np.uint8)


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    return _compand_encode(samples, _ULAW_DEC)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    return _compand_encode(samples, _ALAW_DEC)


def encode_wav_g711(samples: np.ndarray, sample_rate: int,
                    channels: int = 1, law: str = "ulaw") -> bytes:
    """int16 samples -> companded 8-bit WAV (codec 7 mu-law / 6 A-law)."""
    if samples.dtype != np.int16:
        raise MediaCodecError("samples must be int16")
    codec = 7 if law == "ulaw" else 6
    data = (ulaw_encode(samples) if law == "ulaw"
            else alaw_encode(samples)).tobytes()
    fmt = struct.pack("<HHIIHH", codec, channels, sample_rate,
                      sample_rate * channels, channels, 8)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# -- IMA ADPCM (WAV codec 17): 4-bit differential PCM ------------------------
#
# Block-structured: per channel a 4-byte state header (predictor int16,
# step index uint8, reserved), then nibble data interleaved in 4-byte
# groups per channel. The step/index tables are the IMA standard. Blocks
# are INDEPENDENT, so decode vectorizes across blocks x channels and only
# loops over the samples within one block.

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int32)

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_step(pred, index, nib):
    """One vectorized IMA step over arrays of block-states."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    diff += np.where(nib & 4, step, 0)
    diff += np.where(nib & 2, step >> 1, 0)
    diff += np.where(nib & 1, step >> 2, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff).clip(-32768, 32767)
    index = (index + _IMA_INDEX[nib & 7]).clip(0, 88)
    return pred, index


def ima_adpcm_decode(data: bytes, channels: int,
                     block_align: int) -> np.ndarray:
    """IMA ADPCM data chunk -> interleaved int16 samples."""
    if channels not in (1, 2) or block_align is None \
            or block_align < 4 * channels or block_align % 4:
        raise MediaCodecError(
            f"bad IMA ADPCM layout (ch={channels}, align={block_align})")
    nblocks = len(data) // block_align
    if nblocks == 0:
        return np.zeros(0, np.int16)
    blocks = np.frombuffer(data, np.uint8,
                           nblocks * block_align).reshape(nblocks, block_align)
    spb = (block_align - 4 * channels) * 2 // channels + 1
    out = np.zeros((nblocks, spb, channels), np.int32)
    pred = np.zeros((nblocks, channels), np.int32)
    index = np.zeros((nblocks, channels), np.int32)
    for ch in range(channels):
        hdr = blocks[:, 4 * ch: 4 * ch + 4]
        pred[:, ch] = hdr[:, :2].copy().view("<i2")[:, 0]
        index[:, ch] = np.clip(hdr[:, 2], 0, 88)
        out[:, 0, ch] = pred[:, ch]
    body = blocks[:, 4 * channels:]
    # nibble n of channel ch lives in 4-byte group (n//8), byte (n//2)%4;
    # low nibble first
    nib_lo = body & 0x0F
    nib_hi = body >> 4
    for n in range(spb - 1):
        grp, off = n // 8, (n // 2) % 4
        col = grp * 4 * channels + np.arange(channels) * 4 + off
        byte_lo = nib_lo[:, col] if n % 2 == 0 else nib_hi[:, col]
        p, ix = _ima_step(pred, index, byte_lo.astype(np.int32))
        pred, index = p, ix
        out[:, n + 1, :] = pred
    return out.reshape(-1).astype(np.int16) if channels == 1 else \
        out.reshape(nblocks * spb, channels).reshape(-1).astype(np.int16)


def ima_adpcm_encode(samples: np.ndarray, channels: int = 1,
                     block_align: int = 256) -> bytes:
    """int16 interleaved samples -> IMA ADPCM data chunk (zero-padded
    final block)."""
    if channels not in (1, 2) or block_align < 4 * channels \
            or block_align % 4:
        raise MediaCodecError("bad IMA ADPCM layout")
    spb = (block_align - 4 * channels) * 2 // channels + 1
    s = np.asarray(samples, np.int16).reshape(-1, channels)
    pad = (-len(s)) % spb
    if pad:
        s = np.vstack([s, np.zeros((pad, channels), np.int16)])
    nblocks = len(s) // spb
    frames = s.reshape(nblocks, spb, channels).astype(np.int32)
    out = np.zeros((nblocks, block_align), np.uint8)
    pred = frames[:, 0, :].copy()
    index = np.zeros((nblocks, channels), np.int32)
    for ch in range(channels):
        out[:, 4 * ch: 4 * ch + 2] = pred[:, ch].astype(
            "<i2").view(np.uint8).reshape(nblocks, 2)
        out[:, 4 * ch + 2] = 0          # initial index 0
    nibbles = np.zeros((nblocks, spb - 1, channels), np.uint8)
    for n in range(spb - 1):
        target = frames[:, n + 1, :]
        step = _IMA_STEPS[index]
        diff = target - pred
        nib = np.where(diff < 0, 8, 0)
        ad = np.abs(diff)
        b4 = ad >= step
        ad -= np.where(b4, step, 0)
        b2 = ad >= step >> 1
        ad -= np.where(b2, step >> 1, 0)
        b1 = ad >= step >> 2
        nib = nib | b4 * 4 | b2 * 2 | b1 * 1
        pred, index = _ima_step(pred, index, nib)
        nibbles[:, n, :] = nib.astype(np.uint8)
    for ch in range(channels):
        for n in range(spb - 1):
            grp, off = n // 8, (n // 2) % 4
            col = 4 * channels + grp * 4 * channels + ch * 4 + off
            if n % 2 == 0:
                out[:, col] |= nibbles[:, n, ch]
            else:
                out[:, col] |= nibbles[:, n, ch] << 4
    return out.tobytes()


def encode_wav_ima_adpcm(samples: np.ndarray, sample_rate: int,
                         channels: int = 1, block_align: int = 256) -> bytes:
    """int16 samples -> IMA ADPCM WAV (codec 17) with the fact chunk and
    wSamplesPerBlock extension real decoders expect."""
    if samples.dtype != np.int16:
        raise MediaCodecError("samples must be int16")
    data = ima_adpcm_encode(samples, channels, block_align)
    spb = (block_align - 4 * channels) * 2 // channels + 1
    nblocks = len(data) // block_align
    fmt = struct.pack("<HHIIHHHH", 17, channels, sample_rate,
                      sample_rate * block_align // spb, block_align, 4,
                      2, spb)
    fact = struct.pack("<I", nblocks * spb)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"fact" + struct.pack("<I", len(fact)) + fact
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


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


# -- WebP header parse (dims/channels without a pixel decoder) ---------------
#
# The feature-extraction kernel needs (w, h, channels), and every WebP
# variant carries them in a fixed-layout header: VP8 keyframe tag
# (lossy), VP8L stream header (lossless), VP8X canvas (extended). Pixel
# decode stays behind the PIL adapter seam — but METADATA is real here.

def parse_webp_dims(payload: bytes) -> tuple[int, int, int]:
    """WebP bytes -> (width, height, channels). Raises MediaCodecError
    on anything that is not a well-formed WebP header."""
    p = bytes(payload)
    if len(p) < 30 or p[:4] != b"RIFF" or p[8:12] != b"WEBP":
        raise MediaCodecError("not a WebP payload")
    fourcc, size = p[12:16], struct.unpack_from("<I", p, 16)[0]
    body = p[20:20 + size]
    try:
        if fourcc == b"VP8 ":           # lossy keyframe
            if body[3:6] != b"\x9d\x01\x2a":
                raise MediaCodecError("VP8 keyframe start code missing")
            w = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
            h = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
            return w, h, 3
        if fourcc == b"VP8L":           # lossless
            if body[0] != 0x2F:
                raise MediaCodecError("VP8L signature missing")
            bits = struct.unpack_from("<I", body, 1)[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return w, h, 4 if (bits >> 28) & 1 else 3
        if fourcc == b"VP8X":           # extended: canvas size + flags
            flags = body[0]
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return w, h, 4 if flags & 0x10 else 3
    except (IndexError, struct.error) as e:
        raise MediaCodecError(f"truncated WebP header: {e}") from e
    raise MediaCodecError(f"unknown WebP chunk {fourcc!r}")


def looks_like_webp(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"


# -- MP3 frame walk (stream metadata without a sample decoder) ---------------
#
# Layer III's Huffman codebooks and synthesis window are static spec
# tables that are NOT carried in the bitstream, so a trustworthy pure-
# Python sample decoder cannot be validated in this environment (no
# reference decoder, no fixtures) — samples stay behind the soundfile
# adapter seam. The FRAME HEADERS, however, are four fixed-layout bytes
# each: walking them yields sample rate, frame/sample counts and
# duration — the metadata a corpus pipeline filters on.

_MP3_RATES = {3: (44100, 48000, 32000),    # MPEG1
              2: (22050, 24000, 16000),    # MPEG2
              0: (11025, 12000, 8000)}     # MPEG2.5
_MP3_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                      160, 192, 224, 256, 320)
_MP3_BITRATES_V2L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                      96, 112, 128, 144, 160)


def mp3_stream_info(payload: bytes) -> tuple[int, int, int]:
    """MP3 bytes -> (sample_rate, n_samples, n_frames) by walking Layer
    III frame headers (ID3v2 tag skipped). Raises MediaCodecError when
    no valid frame exists."""
    p = bytes(payload)
    pos = 0
    if p[:3] == b"ID3" and len(p) >= 10:
        syncsafe = ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14) \
            | ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
        pos = 10 + syncsafe
    rate = None
    n_frames = n_samples = 0
    while pos + 4 <= len(p):
        b0, b1, b2 = p[pos], p[pos + 1], p[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if n_frames:
                break                   # trailing junk after last frame
            pos += 1                    # resync before the first frame
            continue
        version = (b1 >> 3) & 0x03      # 3=MPEG1 2=MPEG2 0=MPEG2.5
        layer = (b1 >> 1) & 0x03        # 1 = Layer III
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        padding = (b2 >> 1) & 0x01
        if version == 1 or layer != 1 or br_idx in (0, 15) or sr_idx == 3:
            if n_frames:
                break
            pos += 1
            continue
        sr = _MP3_RATES[version][sr_idx]
        kbps = (_MP3_BITRATES_V1L3 if version == 3
                else _MP3_BITRATES_V2L3)[br_idx]
        spf = 1152 if version == 3 else 576
        frame_len = spf // 8 * kbps * 1000 // sr + padding
        if frame_len <= 4 or pos + frame_len > len(p):
            break                       # truncated final frame: stop
        if rate is None:
            rate = sr
        elif sr != rate:
            break                       # rate change = corrupt stream
        n_frames += 1
        n_samples += spf
        pos += frame_len
    if rate is None or n_frames == 0:
        raise MediaCodecError("no valid MPEG Layer III frame found")
    return rate, n_samples, n_frames
