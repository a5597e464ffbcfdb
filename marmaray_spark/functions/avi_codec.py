"""Minimal MJPEG-in-AVI codec (pure Python) — real VIDEO frame access.

The frame-sampling operator (operators/multimodal.py sample_frames)
previously synthesized frame payloads for every container; with the
pure-numpy JPEG codec in place (functions/jpeg_codec.py), Motion-JPEG
AVI — the simplest real video container, every frame an independent
baseline JPEG — can decode FOR REAL: this module walks the RIFF/AVI
chunk tree ('hdrl' avih for dims/rate, 'movi' for '##dc'/'##db' video
chunks) and hands each frame's JPEG bytes to the image codec.

Writer emits spec-valid single-stream MJPEG AVIs (RIFF AVI , LIST hdrl
with avih+strl, LIST movi, idx1) that standard tools accept — used to
build test corpora. Corrupt input raises MediaCodecError only.
"""

from __future__ import annotations

import struct

import numpy as np

from marmaray_spark.functions.media_codec import MediaCodecError


def parse_avi(payload: bytes) -> dict:
    """-> {width, height, n_frames, usec_per_frame, frames: [bytes]}
    where frames are the raw video-chunk payloads (JPEG bytes for
    MJPEG)."""
    try:
        return _parse_avi_impl(payload)
    except MediaCodecError:
        raise
    except (IndexError, KeyError, ValueError, OverflowError,
            struct.error, MemoryError) as e:
        raise MediaCodecError(f"avi: corrupt container: {e}") from e


def _parse_avi_impl(payload: bytes) -> dict:
    data = bytes(payload)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise MediaCodecError("avi: not a RIFF/AVI container")
    info = {"width": 0, "height": 0, "n_frames": 0, "usec_per_frame": 0,
            "frames": []}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise MediaCodecError("avi: chunk overruns parent")
            if fourcc == b"LIST":
                walk(body_start + 4, body_end)     # skip list type fourcc
            elif fourcc == b"avih":
                if size < 40:
                    raise MediaCodecError("avi: short avih")
                (usec, _maxbps, _pad, _flags, nframes, _initial, _streams,
                 _bufsize, w, h) = struct.unpack(
                    "<10I", data[body_start:body_start + 40])
                info.update(width=w, height=h, n_frames=nframes,
                            usec_per_frame=usec)
            elif len(fourcc) == 4 and fourcc[2:4] in (b"dc", b"db") \
                    and fourcc[:2].isdigit():
                info["frames"].append(data[body_start:body_end])
            pos = body_end + (size & 1)            # chunks are word-aligned

    walk(12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0]))
    if not info["frames"]:
        raise MediaCodecError("avi: no video chunks")
    if info["width"] == 0 or info["height"] == 0:
        raise MediaCodecError("avi: missing avih header")
    return info


def decode_avi_frames(payload: bytes,
                      max_frames: int = 16) -> list[np.ndarray]:
    """MJPEG AVI -> list of (h, w, 3) uint8 RGB frames (JPEG per frame,
    decoded through decode_jpeg_best: PIL when present, numpy codec
    otherwise)."""
    from marmaray_spark.functions.media_codec import (decode_jpeg_best,
                                                      looks_like_jpeg)
    info = parse_avi(payload)
    out = []
    for raw in info["frames"][:max_frames]:
        if not looks_like_jpeg(raw[:3]):
            raise MediaCodecError("avi: non-MJPEG video chunk")
        out.append(decode_jpeg_best(raw))
    return out


def encode_avi_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """JPEG byte frames -> single-stream MJPEG AVI."""
    if not jpeg_frames:
        raise MediaCodecError("avi: no frames")
    usec = 1_000_000 // max(fps, 1)
    n = len(jpeg_frames)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    avih = struct.pack("<10I", usec, 0, 0, 0x10, n, 0, 1, 0, width,
                       height) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<I", 0)
            + struct.pack("<HHIIIIIIII", 0, 0, 0, 1, fps, 0, n, 0,
                          0xFFFFFFFF, 0)
            + struct.pack("<hhhh", 0, 0, width, height))
    strf = struct.pack("<IiiHHII", 40, width, height, 1, 24, 0x47504A4D,
                       width * height * 3) + struct.pack("<iiII", 0, 0, 0, 0)
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf))) \
        + b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body

    movi_chunks = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_chunks)) + b"movi" \
        + movi_chunks

    # idx1: offsets relative to the start of 'movi' list body
    idx = bytearray()
    off = 4
    for f in jpeg_frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", bytes(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def looks_like_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
