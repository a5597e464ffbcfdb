"""Pure-Python FLAC codec (no libsndfile/soundfile wheel in env).

The multimodal audio kernels (operators/multimodal.py) decode PCM-16 WAV
for real and lean on a soundfile import-try adapter for compressed
formats; this module makes FLAC — the dominant LOSSLESS audio format in
real corpora — decode for real in this container, the same no-deps
discipline as the JPEG (functions/jpeg_codec.py), PNG/zlib and snappy
work. Implemented from the PUBLIC spec (RFC 9639 / xiph FLAC format):

- decoder: STREAMINFO + metadata walk, frame sync + header (UTF-8-style
  coded numbers, all block-size/sample-rate/sample-size codes, CRC-8),
  subframes CONSTANT/VERBATIM/FIXED(0-4)/LPC(1-32) with wasted bits,
  partitioned Rice residuals (4- and 5-bit params, escape codes),
  stereo decorrelation (left/side, right/side, mid/side), CRC-16;
- encoder: independent or mid/side channels, per-subframe best FIXED
  order (0-4), one-partition Rice residuals, correct CRCs — valid
  streams any FLAC implementation accepts (soundfile parity test
  auto-skips when the wheel is absent).

Throughput note: entropy decode is a Python bit loop (same caveat as
the JPEG codec); soundfile slots in ahead of this codec when present.
Corrupt input raises MediaCodecError only — uniform with every other
codec so hostile payloads fork to the error channel.
"""

from __future__ import annotations

import struct

import numpy as np

from marmaray_spark.functions.media_codec import MediaCodecError

_FIXED_COEFFS = {           # prediction x^[i] = sum(c * x[i-1-k])
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader with byte-position tracking (CRC spans)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.pos >= len(self.data):
                raise MediaCodecError("flac: bitstream exhausted")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while True:
            if self.pos >= len(self.data):
                raise MediaCodecError("flac: bitstream exhausted in unary")
            if (self.data[self.pos] >> (7 - self.bit)) & 1:
                self.bit += 1
                if self.bit == 8:
                    self.bit = 0
                    self.pos += 1
                return q
            q += 1
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise MediaCodecError("flac: bad UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise MediaCodecError("flac: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(n: int, out: bytearray) -> None:
    if n < 0x80:
        out.append(n)
        return
    chunks = []
    v = n
    while True:
        chunks.append(v & 0x3F)
        v >>= 6
        lead_bits = 6 - len(chunks)
        if lead_bits < 0:
            raise MediaCodecError("flac: frame number too large")
        if v < (1 << lead_bits):
            break
    nb = len(chunks)
    lead = (0xFF << (7 - nb)) & 0xFF
    out.append(lead | v)
    for c in reversed(chunks):
        out.append(0x80 | c)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise MediaCodecError("flac: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise MediaCodecError("flac: partition order does not divide "
                              "block size")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise MediaCodecError("flac: negative partition sample count")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            for _ in range(n):
                out.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = bits.unary()
                v = (q << param) | bits.read(param)
                out.append((v >> 1) ^ -(v & 1))     # zigzag
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise MediaCodecError("flac: subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
    eff = bps - wasted
    if eff <= 0:
        raise MediaCodecError("flac: no effective bits in subframe")
    if stype == 0:                                  # CONSTANT
        v = bits.read_signed(eff)
        samples = np.full(blocksize, v, np.int64)
    elif stype == 1:                                # VERBATIM
        samples = np.fromiter((bits.read_signed(eff)
                               for _ in range(blocksize)),
                              np.int64, blocksize)
    elif 8 <= stype <= 12:                          # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise MediaCodecError("flac: fixed order exceeds block size")
        warm = [bits.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coeffs = _FIXED_COEFFS[order]
        data = warm + [0] * len(resid)
        for i, r in enumerate(resid):
            k = order + i
            pred = 0
            for j, c in enumerate(coeffs):
                pred += c * data[k - 1 - j]
            data[k] = r + pred
        samples = np.asarray(data, np.int64)
    elif stype >= 32:                               # LPC order 1-32
        order = (stype & 31) + 1
        if order > blocksize:
            raise MediaCodecError("flac: lpc order exceeds block size")
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise MediaCodecError("flac: invalid lpc precision")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise MediaCodecError("flac: negative lpc shift")
        coeffs = [bits.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        data = warm + [0] * len(resid)
        for i, r in enumerate(resid):
            k = order + i
            acc = 0
            for j, c in enumerate(coeffs):
                acc += c * data[k - 1 - j]
            data[k] = r + (acc >> shift)
        samples = np.asarray(data, np.int64)
    else:
        raise MediaCodecError(f"flac: reserved subframe type {stype}")
    return samples << wasted


def decode_flac(payload: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC bytes -> (sample_rate, channels, interleaved int samples) —
    the same contract as media_codec.decode_wav, so the multimodal
    kernels treat both identically."""
    try:
        return _decode_flac_impl(payload)
    except MediaCodecError:
        raise
    except (IndexError, KeyError, ValueError, OverflowError,
            ZeroDivisionError, struct.error, MemoryError) as e:
        raise MediaCodecError(f"flac: corrupt stream: {e}") from e


def _decode_flac_impl(payload: bytes) -> tuple[int, int, np.ndarray]:
    data = bytes(payload)
    if data[:4] != b"fLaC":
        raise MediaCodecError("flac: missing fLaC magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise MediaCodecError("flac: truncated metadata")
        hdr = data[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + length]
        if len(body) != length:
            raise MediaCodecError("flac: truncated metadata block")
        if btype == 0:                              # STREAMINFO
            if length < 34:
                raise MediaCodecError("flac: short STREAMINFO")
            b = _Bits(body)
            b.read(16)                              # min block
            b.read(16)                              # max block
            b.read(24)
            b.read(24)
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            info = (rate, channels, bps, total)
        pos += 4 + length
        if last:
            break
    if info is None:
        raise MediaCodecError("flac: no STREAMINFO block")
    rate, channels, bps, total = info
    if rate == 0 or channels < 1:
        raise MediaCodecError("flac: bad STREAMINFO")

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        frame_start = pos
        bits = _Bits(data, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise MediaCodecError("flac: lost frame sync")
        if bits.read(1):
            raise MediaCodecError("flac: reserved frame bit")
        bits.read(1)                                # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise MediaCodecError("flac: reserved frame header bit")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise MediaCodecError("flac: reserved block size code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise MediaCodecError("flac: invalid sample rate code")
        fbps = bps if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
        if fbps is None:
            raise MediaCodecError("flac: reserved sample size code")
        bits.align()
        crc8_got = data[bits.pos] if bits.pos < len(data) else None
        if crc8_got is None or \
                _crc8(data[frame_start:bits.pos]) != crc8_got:
            raise MediaCodecError("flac: frame header CRC mismatch")
        bits.pos += 1

        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise MediaCodecError("flac: channel count mismatch")
            subs = [_decode_subframe(bits, blocksize, fbps)
                    for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise MediaCodecError("flac: stereo decorrelation in "
                                      "non-stereo stream")
            if ch_code == 8:                        # left/side
                left = _decode_subframe(bits, blocksize, fbps)
                side = _decode_subframe(bits, blocksize, fbps + 1)
                subs = [left, left - side]
            elif ch_code == 9:                      # right/side
                side = _decode_subframe(bits, blocksize, fbps + 1)
                right = _decode_subframe(bits, blocksize, fbps)
                subs = [right + side, right]
            else:                                   # mid/side
                mid = _decode_subframe(bits, blocksize, fbps)
                side = _decode_subframe(bits, blocksize, fbps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise MediaCodecError("flac: reserved channel assignment")

        bits.align()
        if bits.pos + 2 > len(data):
            raise MediaCodecError("flac: truncated frame CRC")
        crc16_got = int.from_bytes(data[bits.pos:bits.pos + 2], "big")
        if _crc16(data[frame_start:bits.pos]) != crc16_got:
            raise MediaCodecError("flac: frame CRC-16 mismatch")
        bits.pos += 2
        pos = bits.pos
        for c in range(channels):
            chans[c].append(subs[c])
        got += blocksize

    if not chans[0]:
        raise MediaCodecError("flac: no audio frames")
    planes = [np.concatenate(c) for c in chans]
    if total:
        planes = [p[:total] for p in planes]
    interleaved = np.empty(len(planes[0]) * channels, np.int64)
    for c, p in enumerate(planes):
        interleaved[c::channels] = p
    return rate, channels, interleaved


# -- encoder ----------------------------------------------------------------

def _write_residual(w: _BitWriter, resid: np.ndarray, pbits: int) -> None:
    """One-partition Rice residual with param chosen from the mean."""
    escape = (1 << pbits) - 1
    mean = float(np.abs(resid).mean()) if len(resid) else 0.0
    param = 0
    while (1 << param) < mean + 1 and param < escape - 1:
        param += 1
    w.write(0 if pbits == 4 else 1, 2)
    w.write(0, 4)                                   # partition order 0
    w.write(param, pbits)
    for r in resid:
        v = (int(r) << 1) ^ (int(r) >> 63)          # zigzag
        w.unary(v >> param)
        w.write(v & ((1 << param) - 1), param)


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    """Best FIXED order (0-4) with Rice residuals; CONSTANT when flat."""
    x = x.astype(np.int64)
    if len(x) and bool((x == x[0]).all()):
        w.write(0, 1)
        w.write(0, 6)                               # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    best_order, best_resid, best_cost = 0, x, float(np.abs(x).sum())
    diff = x
    for order in range(1, 5):
        if order >= len(x):
            break
        diff = np.diff(diff)
        cost = float(np.abs(diff).sum())
        if cost < best_cost:
            best_order, best_resid, best_cost = order, diff, cost
    w.write(0, 1)
    w.write(8 + best_order, 6)                      # FIXED
    w.write(0, 1)                                   # no wasted bits
    for i in range(best_order):
        w.write(int(x[i]), bps)
    _write_residual(w, best_resid, 4)


def encode_flac(samples: np.ndarray, sample_rate: int, channels: int = 1,
                bits_per_sample: int = 16, block_size: int = 4096,
                mid_side: bool = False) -> bytes:
    """Interleaved int samples -> FLAC bytes (fixed predictors, Rice
    residuals, optional mid/side for stereo). Lossless by construction;
    any spec-conforming decoder accepts the stream."""
    x = np.asarray(samples, np.int64)
    if channels < 1 or len(x) % channels:
        raise MediaCodecError("flac: samples not divisible by channels")
    lim = 1 << (bits_per_sample - 1)
    if len(x) and (x.max() >= lim or x.min() < -lim):
        raise MediaCodecError(f"flac: samples exceed {bits_per_sample}-bit "
                              "range")
    if mid_side and channels != 2:
        raise MediaCodecError("flac: mid_side requires stereo")
    n_frames_samples = len(x) // channels
    planes = [x[c::channels] for c in range(channels)]

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n_frames_samples, 36)
    si.out += b"\x00" * 16                          # md5 unset (allowed)
    body = bytes(si.out)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n_frames_samples, block_size):
        bs = min(block_size, n_frames_samples - start)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)                               # fixed blocksize strategy
        w.write(7, 4)                               # 16-bit blocksize at end
        w.write(0, 4)                               # rate from STREAMINFO
        w.write(10 if mid_side else channels - 1, 4)
        w.write(0, 3)                               # size from STREAMINFO
        w.write(0, 1)
        # header fields above are exactly 32 bits -> byte-aligned here,
        # so the coded number/blocksize/CRC write straight to the stream
        _write_utf8_number(frame_no, w.out)
        w.out += struct.pack(">H", bs - 1)
        w.out.append(_crc8(bytes(w.out)))

        if mid_side:
            left = planes[0][start:start + bs]
            right = planes[1][start:start + bs]
            mid = (left + right) >> 1
            side = left - right
            _encode_subframe(w, mid, bits_per_sample)
            _encode_subframe(w, side, bits_per_sample + 1)
        else:
            for c in range(channels):
                _encode_subframe(w, planes[c][start:start + bs],
                                 bits_per_sample)
        w.align()
        w.out += struct.pack(">H", _crc16(bytes(w.out)))
        out += bytes(w.out)
        frame_no += 1
    return bytes(out)
