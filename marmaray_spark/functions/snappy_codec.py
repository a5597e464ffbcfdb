"""Pure-Python Snappy block-format codec (no external wheel in env).

Real-world Avro object container files are overwhelmingly
``avro.codec=snappy``; the OCF source supports them through this module
(the Avro spec wraps each snappy-compressed block with a trailing 4-byte
big-endian CRC32 of the UNCOMPRESSED bytes — handled by the caller in
sources/avro_file.py). The format implemented is the PUBLIC snappy block
format (google/snappy format_description.txt): an uncompressed-length
preamble as little-endian base-128 varint, then tagged elements —
literals and back-references (copy1/copy2/copy4).

Same no-external-deps discipline as the deflate leg (zlib is stdlib) and
the round-4 PNG work. Throughput note: this is Python-side bytes work —
fine for the executor-side per-block path where the decode itself is
already Python, and a ``python-snappy`` wheel can slot in transparently
when present (import-try in ``compress``/``uncompress``).
"""

from __future__ import annotations

from marmaray_spark.functions.avro_codec import AvroCodecError

try:                              # optional fast path when a wheel exists
    import snappy as _snappy      # pragma: no cover - not in sandbox
except Exception:                 # pragma: no cover
    _snappy = None


def uncompress(data: bytes) -> bytes:
    """Snappy block-format decompress. Corrupt input raises
    AvroCodecError (never Index/ValueError) — the OCF quarantine fork
    relies on that contract."""
    if _snappy is not None:       # pragma: no cover
        try:
            return _snappy.uncompress(data)
        except Exception as e:
            raise AvroCodecError(f"snappy: {e}") from e
    n = 0
    shift = 0
    pos = 0
    ln = len(data)
    while True:
        if pos >= ln:
            raise AvroCodecError("truncated snappy preamble")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise AvroCodecError("snappy preamble varint too long")
    out = bytearray()
    while pos < ln:
        tag = data[pos]
        pos += 1
        ttype = tag & 3
        if ttype == 0:                          # literal
            v = tag >> 2
            if v < 60:
                length = v + 1
            else:
                nb = v - 59                     # 60..63 -> 1..4 bytes
                if pos + nb > ln:
                    raise AvroCodecError("truncated snappy literal length")
                length = int.from_bytes(data[pos:pos + nb], "little") + 1
                pos += nb
            if pos + length > ln:
                raise AvroCodecError("truncated snappy literal")
            out += data[pos:pos + length]
            pos += length
            continue
        if ttype == 1:                          # copy, 1-byte offset
            if pos >= ln:
                raise AvroCodecError("truncated snappy copy1")
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif ttype == 2:                        # copy, 2-byte offset
            if pos + 2 > ln:
                raise AvroCodecError("truncated snappy copy2")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:                                   # copy, 4-byte offset
            if pos + 4 > ln:
                raise AvroCodecError("truncated snappy copy4")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise AvroCodecError("bad snappy copy offset")
        start = len(out) - offset
        if offset >= length:
            out += out[start:start + length]
        else:                                   # overlapping: repeat pattern
            for k in range(length):
                out.append(out[start + k])
    if len(out) != n:
        raise AvroCodecError(
            f"snappy length mismatch: preamble {n}, got {len(out)}")
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Snappy block-format compress: greedy 4-byte hash matching with
    copy2 back-references (what the reference C++ encoder emits for the
    common case). Always produces a VALID stream; compression ratio is
    secondary to correctness here."""
    if _snappy is not None:       # pragma: no cover
        return _snappy.compress(data)
    out = bytearray()
    n = len(data)
    v = n
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)

    def emit_literal(s: int, e: int) -> None:
        while s < e:
            chunk = min(e - s, 1 << 16)
            if chunk <= 60:
                out.append((chunk - 1) << 2)
            elif chunk <= 256:
                out.append(60 << 2)
                out.append(chunk - 1)
            else:
                out.append(61 << 2)
                out.extend((chunk - 1).to_bytes(2, "little"))
            out.extend(data[s:s + chunk])
            s += chunk

    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = bytes(data[i:i + 4])
        j = table.get(key, -1)
        table[key] = i
        if 0 <= j and i - j <= 0xFFFF:
            length = 4
            while i + length < n and length < 64 \
                    and data[j + length] == data[i + length]:
                length += 1
            emit_literal(lit_start, i)
            out.append(((length - 1) << 2) | 2)         # copy2
            out.extend((i - j).to_bytes(2, "little"))
            i += length
            lit_start = i
        else:
            i += 1
    emit_literal(lit_start, n)
    return bytes(out)
