"""TFRecord container + tf.train.Example wire codec, pure Python.

Both formats are PUBLIC specs:

- TFRecord framing (TensorFlow ``io/record_writer.cc``): each record is
  a little-endian uint64 payload length, a masked CRC32C of those 8
  length bytes, the payload, then a masked CRC32C of the payload, where
  ``mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)``.
- ``tf.train.Example`` (``core/example/feature.proto``) is protobuf:
  ``Example{ Features features = 1 }``;
  ``Features{ map<string, Feature> feature = 1 }``;
  ``Feature`` = oneof ``BytesList bytes_list = 1`` /
  ``FloatList float_list = 2`` / ``Int64List int64_list = 3``, each a
  ``repeated value = 1`` (numeric lists packed).

No tensorflow/protobuf/crc32c wheel ships in this environment, so both
are hand-rolled against the specs with pinned golden bytes in tests.
Encoding is CANONICAL — sorted feature names, packed numeric lists — so
shard bytes are reproducible no matter the partitioning. CRC32C uses
the ``crc32c`` wheel when importable (import-try seam, the PIL
pattern); the table-driven fallback is exact but serial (measured
9.0 MiB/s per core on this box) — fine for verify paths and sharded
writes (each task crcs only its own shard), swap the wheel in when the
crc becomes the write bottleneck.
"""

from __future__ import annotations

import struct
from typing import Iterator

_POLY = 0x82F63B78
_TABLE: list[int] = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _TABLE.append(_c)


def _crc32c_py(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


try:                                    # import-try seam: native wheel
    import crc32c as _crc32c_mod

    def crc32c(data: bytes) -> int:
        return _crc32c_mod.crc32c(data)
except ImportError:
    crc32c = _crc32c_py


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def encode_varint(n: int) -> bytes:
    # protobuf int64: negatives ride as 64-bit two's complement
    n &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = res = 0
    while True:
        b = buf[pos]
        pos += 1
        res |= (b & 0x7F) << shift
        if not b & 0x80:
            return res, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint overruns 64 bits")


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= 1 << 63 else n


def _len_field(field_num: int, payload: bytes) -> bytes:
    return (encode_varint((field_num << 3) | 2)
            + encode_varint(len(payload)) + payload)


def encode_feature(values) -> bytes:
    """One ``Feature`` message from a homogeneous value list (or scalar):
    bytes/str -> BytesList, int -> packed Int64List, float -> packed
    FloatList (float32 — the proto's width; round-tripping doubles
    through it loses precision by SPEC, not by bug)."""
    if not isinstance(values, (list, tuple)):
        values = [values]
    if not values:
        raise ValueError("empty feature (the oneof needs a kind)")
    v0 = values[0]
    if isinstance(v0, (bytes, bytearray, str)):
        inner = b"".join(
            _len_field(1, v if isinstance(v, (bytes, bytearray))
                       else v.encode("utf-8")) for v in values)
        return _len_field(1, inner)                       # bytes_list
    if isinstance(v0, bool):
        raise ValueError("bool feature is ambiguous — cast to int")
    if isinstance(v0, int):
        packed = b"".join(encode_varint(v) for v in values)
        return _len_field(3, _len_field(1, packed))       # int64_list
    if isinstance(v0, float):
        packed = struct.pack(f"<{len(values)}f", *values)
        return _len_field(2, _len_field(1, packed))       # float_list
    raise ValueError(f"unsupported feature value type {type(v0)!r}")


def encode_example(features: dict) -> bytes:
    """Canonical ``tf.train.Example`` bytes: map entries emitted in
    sorted-key order (protobuf map order is unspecified; fixing it makes
    shard bytes reproducible)."""
    entries = b""
    for name in sorted(features):
        entry = (_len_field(1, name.encode("utf-8"))
                 + _len_field(2, encode_feature(features[name])))
        entries += _len_field(1, entry)
    return _len_field(1, entries)


def _expect_len(buf: bytes, pos: int, field: int) -> tuple[bytes, int]:
    tag, pos = decode_varint(buf, pos)
    if tag != (field << 3) | 2:
        raise ValueError(f"expected field {field} LEN, got tag {tag}")
    n, pos = decode_varint(buf, pos)
    return buf[pos:pos + n], pos + n


def decode_example(buf: bytes) -> dict:
    """Inverse of encode_example: {name: list} — bytes for bytes_list,
    int for int64_list, float for float_list."""
    feats_msg, pos = _expect_len(buf, 0, 1)
    if pos != len(buf):
        raise ValueError("trailing bytes after Example.features")
    out: dict = {}
    pos = 0
    while pos < len(feats_msg):
        entry, pos = _expect_len(feats_msg, pos, 1)
        key_b, epos = _expect_len(entry, 0, 1)
        feat, epos = _expect_len(entry, epos, 2)
        tag, fpos = decode_varint(feat, 0)
        n, fpos = decode_varint(feat, fpos)
        body = feat[fpos:fpos + n]
        kind = tag >> 3
        vals: list = []
        if kind == 1:                                     # BytesList
            bpos = 0
            while bpos < len(body):
                v, bpos = _expect_len(body, bpos, 1)
                vals.append(v)
        elif kind == 3:                                   # Int64List
            packed, _ = _expect_len(body, 0, 1)
            ppos = 0
            while ppos < len(packed):
                v, ppos = decode_varint(packed, ppos)
                vals.append(_signed64(v))
        elif kind == 2:                                   # FloatList
            packed, _ = _expect_len(body, 0, 1)
            vals = list(struct.unpack(f"<{len(packed) // 4}f", packed))
        else:
            raise ValueError(f"unknown Feature kind {kind}")
        out[key_b.decode("utf-8")] = vals
    return out


def frame_record(payload: bytes) -> bytes:
    """One TFRecord frame: len(8 LE) + masked_crc(len) + payload +
    masked_crc(payload)."""
    ln = struct.pack("<Q", len(payload))
    return (ln + struct.pack("<I", masked_crc(ln)) + payload
            + struct.pack("<I", masked_crc(payload)))


def iter_records(buf: bytes, verify: bool = True) -> Iterator[bytes]:
    """Walk a TFRecord stream, yielding payloads; CRC mismatches raise
    (a torn shard must fail loudly, not yield garbage examples)."""
    pos = 0
    while pos < len(buf):
        if pos + 12 > len(buf):
            raise ValueError("truncated record header")
        (n,) = struct.unpack_from("<Q", buf, pos)
        (lcrc,) = struct.unpack_from("<I", buf, pos + 8)
        if verify and masked_crc(buf[pos:pos + 8]) != lcrc:
            raise ValueError(f"length crc mismatch at {pos}")
        pos += 12
        if pos + n + 4 > len(buf):
            raise ValueError("truncated record payload")
        payload = bytes(buf[pos:pos + n])
        (pcrc,) = struct.unpack_from("<I", buf, pos + n)
        if verify and masked_crc(payload) != pcrc:
            raise ValueError(f"payload crc mismatch at {pos}")
        pos += n + 4
        yield payload
