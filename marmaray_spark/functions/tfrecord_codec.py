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
pattern); the fallback is the numpy column-parallel slice-by-4 CRC
below (244 MiB/s/core measured — 28x the serial table loop it
replaced, enough that the shard writer's crc is no longer the
training-output bottleneck), dropping to the serial loop only for
sub-4-KiB inputs where numpy setup costs more than it saves.
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


# -- numpy-vectorized CRC32C -------------------------------------------------
# The CRC register update is LINEAR over GF(2): processing message M from
# init I gives raw(M, 0) XOR Z_{|M|}(I), where Z_m is the linear operator
# "feed m zero bytes". That decomposition makes the whole CRC
# parallelizable: split the data into equal chunks, run the word loop
# COLUMN-WISE across all chunks at once (slice-by-4: per 4-byte column,
# new = Z4(reg ^ word), evaluated as two 65536-entry gathers — 512 KiB
# of tables, L2-resident), then fold the per-chunk registers pairwise
# with precomputed Z_{chunk_bytes * 2^t} operators (log-doubling — each
# a 4x256 byte-table form, built once by operator squaring from the
# single-zero-byte step). Same linear-combine construction as zlib's
# crc32_combine. Measured 244 MiB/s vs 8.8 MiB/s serial on this box
# (28x/core; ~7.6 GiB/s aggregate across 32 shard-writer cores — the
# crc is no longer the training-output bottleneck) — see NOTES r9. The
# word view is little-endian, which is what every platform this runs on
# is; frombuffer('<u4') is explicit so a big-endian host would still be
# CORRECT, just unaligned with its native order.

_CHUNK = 1024          # bytes per parallel chunk (word-loop length / 4)


def _apply_op(op, vals):
    """Apply a 4x256 byte-table operator to uint32 value(s)."""
    return (op[0][vals & 0xFF] ^ op[1][(vals >> 8) & 0xFF]
            ^ op[2][(vals >> 16) & 0xFF] ^ op[3][(vals >> 24) & 0xFF])


def _build_tables():
    """(UL, UH, ops): the two slice-by-4 gather tables for Z4 and the
    fold operators ops[t] = Z_{_CHUNK * 2^t}, all by operator squaring
    from Z1."""
    import numpy as np

    table = np.array(_TABLE, dtype=np.uint32)
    basis = np.arange(256, dtype=np.uint64)
    # Z1 (one zero byte) as four byte tables: byte p of the register,
    # placed at its bit position, pushed through one zero-byte step
    op = []
    for p in range(4):
        reg = basis << (8 * p)
        stepped = (table[(reg & 0xFF).astype(np.intp)]
                   ^ (reg >> 8).astype(np.uint32))
        op.append(stepped.astype(np.uint32))

    def square(o):
        return [_apply_op(o, o[p]) for p in range(4)]

    z4 = square(square(op))
    v16 = np.arange(65536, dtype=np.uint32)
    ul, uh = _apply_op(z4, v16), _apply_op(z4, v16 << 16)
    # Z1 -> Z_CHUNK by squaring log2(_CHUNK) times, then the fold ladder
    for _ in range(_CHUNK.bit_length() - 1):
        op = square(op)
    ops = [op]                           # ops[t] = Z_{_CHUNK * 2^t}
    for _ in range(40):
        ops.append(square(ops[-1]))
    return ul, uh, ops


_NUMPY_TABLES = None


def _crc32c_numpy(data: bytes) -> int:
    import numpy as np

    global _NUMPY_TABLES
    if _NUMPY_TABLES is None:
        _NUMPY_TABLES = _build_tables()
    ul, uh, ops = _NUMPY_TABLES
    n = len(data)
    nchunks = n // _CHUNK
    # largest power-of-two block of chunks folds in log levels; the rest
    # of the data (remainder chunks + tail bytes) runs through the
    # serial loop seeded with the folded register
    p2 = 1 << (nchunks.bit_length() - 1)
    head = p2 * _CHUNK
    words = np.frombuffer(data, dtype="<u4",
                          count=head // 4).reshape(p2, _CHUNK // 4)
    reg = np.zeros(p2, dtype=np.uint32)
    for j in range(_CHUNK // 4):         # word loop, vectorized over chunks
        x = reg ^ words[:, j]
        reg = (ul[(x & 0xFFFF).astype(np.intp)]
               ^ uh[(x >> 16).astype(np.intp)])
    t = 0
    while len(reg) > 1:                  # pairwise fold: Z(left) ^ right
        reg = _apply_op(ops[t], reg[0::2]) ^ reg[1::2]
        t += 1
    folded = int(reg[0])
    # init 0xFFFFFFFF enters as Z_{head}(init) — ops[t] is exactly Z_{head}
    crc = folded ^ int(_apply_op(ops[t], np.uint32(0xFFFFFFFF)))
    for b in data[head:]:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _crc32c_best(data: bytes) -> int:
    if len(data) >= 4 * _CHUNK:
        # numpy is its own import-try seam: this module's contract is
        # stdlib-only top-level imports (it targets hosts with no
        # tensorflow/protobuf/crc32c wheel, and numpy must not become a
        # hard requirement through the back door)
        try:
            return _crc32c_numpy(data)
        except ImportError:
            return _crc32c_py(data)
    return _crc32c_py(data)


try:                                    # import-try seam: native wheel
    import crc32c as _crc32c_mod

    def crc32c(data: bytes) -> int:
        return _crc32c_mod.crc32c(data)
except ImportError:
    crc32c = _crc32c_best


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
