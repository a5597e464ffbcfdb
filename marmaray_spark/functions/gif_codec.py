"""Pure-Python GIF decoder (GIF87a/GIF89a, LZW) + minimal encoder.

Web corpora carry GIFs everywhere; with PIL absent the multimodal image
kernel previously stubbed them. This module decodes the PUBLIC GIF
spec (W3C GIF89a): logical screen + color tables, graphic-control
extensions (transparency, disposal), per-image LZW with dynamic code
widths, interlacing, and multi-frame animation compositing — so GIF
joins BMP/PNG/JPEG as a really-decoded format, and animated GIFs give
the frame-sampling operator real frames (operators/multimodal.py).

The encoder writes valid single- or multi-frame GIFs (octree-free: the
caller supplies palette-indexed frames or RGB quantized to a provided
palette) — enough to build test corpora any decoder accepts.

Corrupt input raises MediaCodecError only, same contract as every codec.
"""

from __future__ import annotations

import struct

import numpy as np

from marmaray_spark.functions.media_codec import MediaCodecError


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    """GIF-flavor LZW: dynamic code width, CLEAR/END codes, 4096 cap."""
    if not 2 <= min_code_size <= 11:
        raise MediaCodecError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    # bit cursor (LSB-first within bytes, per GIF spec)
    acc = 0
    nbits = 0
    pos = 0

    def reset():
        return ({i: [i] for i in range(clear)}, clear + 2,
                min_code_size + 1)

    table, next_code, width = reset()
    prev: list[int] | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise MediaCodecError("gif: LZW stream ended without END")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise MediaCodecError("gif: first LZW code not a literal")
            out.extend(entry)
            prev = entry
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]
            else:
                raise MediaCodecError(f"gif: LZW code {code} out of order")
            out.extend(entry)
            if next_code < 4096:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
        if len(out) > max_pixels:
            raise MediaCodecError("gif: LZW output exceeds frame size")


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    """Stream rows arrive in 8/8/4/2 pass order; map them back to
    display order: display row r is stream row rows[r]."""
    rows = np.empty(h, np.int64)
    k = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for r in range(start, h, step):
            rows[r] = k
            k += 1
    return idx.reshape(h, w)[rows, :]


def decode_gif_frames(payload: bytes, max_frames: int = 64) -> list[np.ndarray]:
    """GIF bytes -> list of (h, w, 3) uint8 RGB frames (composited on
    the logical screen, disposal methods 0-3 handled)."""
    try:
        return _decode_gif_impl(payload, max_frames)
    except MediaCodecError:
        raise
    except (IndexError, KeyError, ValueError, OverflowError,
            struct.error, MemoryError) as e:
        raise MediaCodecError(f"gif: corrupt stream: {e}") from e


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame only — the image-features contract."""
    return decode_gif_frames(payload, max_frames=1)[0]


def _decode_gif_impl(payload: bytes, max_frames: int) -> list[np.ndarray]:
    data = bytes(payload)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaCodecError("gif: bad signature")
    if len(data) < 13:
        raise MediaCodecError("gif: truncated header")
    sw, sh = struct.unpack("<HH", data[6:10])
    if sw == 0 or sh == 0 or sw * sh > (1 << 26):
        raise MediaCodecError(f"gif: implausible screen {sw}x{sh}")
    flags = data[10]
    bg_index = data[11]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        global_pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8)
        if len(global_pal) != 3 * n:
            raise MediaCodecError("gif: truncated global color table")
        global_pal = global_pal.reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((sh, sw, 3), np.uint8)
    if global_pal is not None and bg_index < len(global_pal):
        canvas[:, :] = global_pal[bg_index]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    prev_canvas = None

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(data):
                raise MediaCodecError("gif: truncated sub-blocks")
            n = data[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            chunks.append(data[p:p + n])
            if len(data[p:p + n]) != n:
                raise MediaCodecError("gif: truncated sub-block")
            p += n

    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:                               # trailer
            break
        if b == 0x21:                               # extension
            if pos >= len(data):
                raise MediaCodecError("gif: truncated extension")
            label = data[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 4:    # graphic control
                disposal = (body[0] >> 2) & 7
                transparent = body[3] if body[0] & 1 else None
            continue
        if b != 0x2C:
            raise MediaCodecError(f"gif: unexpected block 0x{b:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise MediaCodecError("gif: truncated image descriptor")
        left, top, w, h = struct.unpack("<HHHH", data[pos:pos + 8])
        iflags = data[pos + 8]
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise MediaCodecError("gif: frame outside logical screen")
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8)
            if len(pal) != 3 * n:
                raise MediaCodecError("gif: truncated local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise MediaCodecError("gif: no color table for frame")
        if pos >= len(data):
            raise MediaCodecError("gif: truncated LZW header")
        mcs = data[pos]
        pos += 1
        lzw, pos = read_subblocks(pos)
        idx = np.asarray(_lzw_decode(lzw, mcs, w * h), np.int64)
        if len(idx) < w * h:
            raise MediaCodecError("gif: LZW underrun")
        idx = idx[:w * h]
        if (idx >= len(pal)).any():
            raise MediaCodecError("gif: palette index out of range")
        if iflags & 0x40:                           # interlaced
            grid = _deinterlace(idx, h, w)
        else:
            grid = idx.reshape(h, w)

        if disposal == 3:
            prev_canvas = canvas.copy()
        region = canvas[top:top + h, left:left + w]
        rgb = pal[grid]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if len(frames) >= max_frames:
            return frames
        if disposal == 2:                           # restore background
            bg = pal[bg_index] if bg_index < len(pal) else 0
            canvas[top:top + h, left:left + w] = bg
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        transparent = None
        disposal = 0
    if not frames:
        raise MediaCodecError("gif: no image data")
    return frames


# -- encoder ----------------------------------------------------------------

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    cur = b""
    for i in indices:
        nxt = cur + bytes([int(i)])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([j]): j for j in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        cur = bytes([int(i)])
    if cur:
        emit(table[cur], width)
        # the decoder adds its LAST table entry while processing this
        # final code — an allocation the encoder never mirrors (its
        # adds happen between emits, lagged one code behind). If that
        # allocation lands exactly on 2^width the decoder bumps and
        # reads END one bit wider than we wrote it (hypothesis-found:
        # a 540-px frame whose final entry was code 256). At the tail
        # both counters are equal, so apply the decoder's own bump
        # rule here.
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: list[np.ndarray], palette: np.ndarray,
               delay_cs: int = 10) -> bytes:
    """Palette-indexed frames (each (h, w) uint8 of indices into
    ``palette`` (n<=256, 3) uint8) -> GIF89a bytes (animated when
    len(frames) > 1)."""
    if not frames:
        raise MediaCodecError("gif: no frames")
    palette = np.asarray(palette, np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise MediaCodecError("gif: palette must be (n<=256, 3) uint8")
    h, w = frames[0].shape[:2]
    bits = max(2, int(len(palette) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), np.uint8)
    pal[:len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += pal.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise MediaCodecError("gif: frame size mismatch")
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + bytes([0]) \
                + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        mcs = max(2, bits)
        out.append(mcs)
        lzw = _lzw_encode(np.asarray(fr, np.uint8).ravel(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
