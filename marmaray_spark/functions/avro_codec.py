"""Avro binary wire codec + Arrow-batched Spark decode/encode kernels.

Reference parity: the reference's canonical Kafka flow decodes ``byte[]``
payloads against versioned ``.avsc`` schemas served by a schema service
(M/common/schema/HDFSSchemaService.java:62,173-195 getReader for an
explicit version and for latest). This engine keeps that wire-format
contract: payloads are standard Avro binary (no container header), the
schema rides in the registry, not the message.

The container ships neither the spark-avro jar (``from_avro`` raises
AVRO_NOT_LOADED) nor the avro/fastavro wheels, so the codec below
implements the public Avro 1.x binary spec directly: zigzag-varint
int/long, little-endian IEEE float/double, length-prefixed utf8/bytes,
1-byte booleans, union branch index + value, block-encoded arrays/maps,
depth-first records. Supported subset — records of primitives, nullable
unions ``["null", T]``, arrays/maps of these, nested records — covers the
event-payload shapes the reference moves.

Scale posture: per-record binary decode is inherently Python-side work
here; it runs as an Arrow-batched ``mapInPandas`` kernel (batch framing,
zero-copy column transfer), the same pattern as operators/multimodal.py —
never a row-at-a-time UDF. With the spark-avro jar present, the
`decode_avro` kernel swaps for ``from_avro`` with no plan-shape change.
"""

from __future__ import annotations

import datetime as _DT
import decimal as _DEC
import json
import struct
import uuid as _UUID
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "string", "bytes"}


def parse_schema(avsc: str | dict) -> dict | list | str:
    return json.loads(avsc) if isinstance(avsc, str) else avsc


class AvroCodecError(ValueError):
    pass


# -- logical types ----------------------------------------------------------
#
# Public Avro corpora annotate primitives with ``logicalType``
# (decimal/date/timestamp-millis/micros — Avro 1.x spec §Logical Types);
# the reference sidesteps them with its custom ``timestamp=true`` prop
# (M/common/util/SchemaUtil.java:160-199, ported in scalars.py), but a
# drop-in engine must read real-world ``.avsc`` files. Wire layout is the
# underlying primitive; the codec converts at the value boundary:
#   date (int, days)                <-> datetime.date
#   timestamp-millis/micros (long)  <-> tz-aware UTC datetime
#   local-timestamp-millis/micros   <-> naive datetime (NTZ semantics)
#   decimal (bytes, big-endian two's-complement unscaled) <-> Decimal
# Unknown logical annotations are IGNORED per spec (underlying type
# stands), and schema RESOLUTION ignores logical types entirely (spec:
# resolution is on underlying types) — avro_compat relies on that.

_EPOCH_DATE = _DT.date(1970, 1, 1)
_EPOCH_UTC = _DT.datetime(1970, 1, 1, tzinfo=_DT.timezone.utc)
_EPOCH_NAIVE = _DT.datetime(1970, 1, 1)


def _logical_of(s) -> dict | None:
    """Supported logicalType spec for a primitive dict schema, else None."""
    if not isinstance(s, dict):
        return None
    lt, t = s.get("logicalType"), s.get("type")
    if lt == "date" and t == "int":
        return {"lt": "date"}
    if lt in ("timestamp-millis", "timestamp-micros",
              "local-timestamp-millis", "local-timestamp-micros") \
            and t == "long":
        return {"lt": lt}
    if lt == "time-millis" and t == "int":
        return {"lt": lt}
    if lt == "time-micros" and t == "long":
        return {"lt": lt}
    if lt == "uuid" and t == "string":
        return {"lt": "uuid"}
    if lt == "decimal" and t == "bytes":
        return {"lt": "decimal", "precision": int(s.get("precision", 38)),
                "scale": int(s.get("scale", 0))}
    if lt == "decimal" and t == "fixed":
        return {"lt": "decimal", "precision": int(s.get("precision", 38)),
                "scale": int(s.get("scale", 0)),
                "fixed_size": int(s.get("size", 0))}
    return None


def _from_wire(lg: dict, v):
    """Underlying-primitive wire value -> logical Python value. A wire
    value outside the logical type's domain (e.g. a day count past
    year 9999) is a codec error, not a task-killing OverflowError —
    hostile payloads must fork to the error channel."""
    lt = lg["lt"]
    try:
        if lt == "date":
            return _EPOCH_DATE + _DT.timedelta(days=int(v))
        if lt == "timestamp-millis":
            return _EPOCH_UTC + _DT.timedelta(milliseconds=int(v))
        if lt == "timestamp-micros":
            return _EPOCH_UTC + _DT.timedelta(microseconds=int(v))
        if lt == "local-timestamp-millis":
            return _EPOCH_NAIVE + _DT.timedelta(milliseconds=int(v))
        if lt == "local-timestamp-micros":
            return _EPOCH_NAIVE + _DT.timedelta(microseconds=int(v))
        if lt in ("time-millis", "time-micros"):
            # surface stays the VALIDATED wire ticks (int ms / long us of
            # day) — the public spark-avro mapping. Spark 4.1's TimeType
            # was probed and rejected: observe(), deserialized caching,
            # and string<->time casts all raise UNSUPPORTED_TIME_TYPE, so
            # a TIME column cannot pass through the fork/persist machinery
            # every production decode rides.
            unit = 1000 if lt == "time-millis" else 1
            v = int(v)
            if not 0 <= v * unit < 86_400_000_000:
                raise AvroCodecError(f"{lt} value {v!r} not a time of day")
            return v
        if lt == "uuid":
            try:
                _UUID.UUID(v)           # RFC-4122 validation only; the
            except (ValueError, AttributeError, TypeError) as e:
                raise AvroCodecError(f"invalid uuid {v!r}: {e}") from e
            return v                    # string surface stays byte-exact
    except OverflowError as e:
        raise AvroCodecError(f"{lt} value {v!r} out of range: {e}") from e
    # decimal
    unscaled = int.from_bytes(v, "big", signed=True)
    return _DEC.Decimal(unscaled).scaleb(-lg["scale"])


def _to_wire(lg: dict, v):
    """Logical Python value -> underlying-primitive wire value. Raises
    AvroCodecError on a type/scale mismatch so hostile values fork to
    the error channel like any other codec failure."""
    lt = lg["lt"]
    try:
        if lt == "date":
            if isinstance(v, _DT.datetime):
                v = v.date()
            if isinstance(v, _DT.date):
                return (v - _EPOCH_DATE).days
            return int(v)                      # already wire-form days
        if lt in ("time-millis", "time-micros"):
            unit = 1000 if lt == "time-millis" else 1
            if isinstance(v, _DT.time):
                us = ((v.hour * 3600 + v.minute * 60 + v.second) * 1_000_000
                      + v.microsecond)
                return us // unit
            v = int(v)
            if not 0 <= v * unit < 86_400_000_000:
                raise AvroCodecError(f"{lt} value {v!r} not a time of day")
            return v                           # already wire-form ticks
        if lt == "uuid":
            if isinstance(v, _UUID.UUID):
                return str(v)
            _UUID.UUID(v)                      # raises on hostile strings
            return v
        if lt.endswith("millis") or lt.endswith("micros"):
            unit = 1000 if lt.endswith("millis") else 1
            if isinstance(v, _DT.datetime):
                epoch = _EPOCH_UTC if v.tzinfo is not None else _EPOCH_NAIVE
                delta = v - epoch
                return delta // _DT.timedelta(microseconds=unit)
            return int(v)                      # already wire-form ticks
        # decimal
        if isinstance(v, (int,)) and not isinstance(v, bool):
            v = _DEC.Decimal(v)
        if not isinstance(v, _DEC.Decimal):
            raise AvroCodecError(f"decimal field got {type(v).__name__}")
        unscaled_d = v.scaleb(lg["scale"])
        unscaled = int(unscaled_d)
        if unscaled != unscaled_d:
            raise AvroCodecError(
                f"decimal {v} does not fit scale {lg['scale']}")
        length = lg.get("fixed_size") or \
            max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(length, "big", signed=True)
    except AvroCodecError:
        raise
    except (TypeError, ValueError, OverflowError,
            _DEC.InvalidOperation) as e:
        raise AvroCodecError(f"bad {lt} value {v!r}: {e}") from e


# -- schema mapping ---------------------------------------------------------

_AVRO_TO_SPARK = {
    "boolean": T.BooleanType(), "int": T.IntegerType(), "long": T.LongType(),
    "float": T.FloatType(), "double": T.DoubleType(), "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def avro_to_structtype(avsc: str | dict) -> T.StructType:
    """Avro record schema -> Spark StructType (the engine's schema currency).
    Mirrors the reference's Avro-Schema->internal-schema converter role."""
    schema = parse_schema(avsc)

    def field_type(s) -> tuple[T.DataType, bool]:
        if isinstance(s, str):
            if s == "null":
                return T.NullType(), True
            return _AVRO_TO_SPARK[s], False
        if isinstance(s, list):      # union: only ["null", X] supported
            branches = [b for b in s if b != "null"]
            if len(branches) != 1 or "null" not in s:
                raise AvroCodecError(f"unsupported union {s}")
            dt, _ = field_type(branches[0])
            return dt, True
        lg = _logical_of(s)
        if lg is not None:
            lt = lg["lt"]
            if lt == "date":
                return T.DateType(), False
            if lt in ("timestamp-millis", "timestamp-micros"):
                return T.TimestampType(), False
            if lt in ("local-timestamp-millis", "local-timestamp-micros"):
                return T.TimestampNTZType(), False
            if lt == "time-millis":
                return T.IntegerType(), False      # validated ms-of-day
            if lt == "time-micros":
                return T.LongType(), False         # validated us-of-day
            if lt == "uuid":
                return T.StringType(), False
            return T.DecimalType(lg["precision"], lg["scale"]), False
        t = s["type"]
        if t == "record":
            return avro_to_structtype(s), False
        if t == "enum":
            return T.StringType(), False
        if t == "fixed":
            return T.BinaryType(), False
        if t == "array":
            dt, nullable = field_type(s["items"])
            return T.ArrayType(dt, nullable), False
        if t == "map":
            dt, nullable = field_type(s["values"])
            return T.MapType(T.StringType(), dt, nullable), False
        if isinstance(t, str) and t in PRIMITIVES:
            # unknown logicalType annotation: underlying type stands
            return field_type(t)
        raise AvroCodecError(f"unsupported avro type {s!r}")

    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise AvroCodecError("top-level schema must be a record")
    fields = []
    for f in schema["fields"]:
        dt, nullable = field_type(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


# -- binary encode ----------------------------------------------------------

def _write_long(n: int, out: bytearray) -> None:
    n = (n << 1) ^ (n >> 63)        # zigzag
    while (n & ~0x7F) != 0:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _encode(schema, val, out: bytearray) -> None:
    if isinstance(schema, list):
        branches = list(schema)
        if val is None:
            _write_long(branches.index("null"), out)
            return
        concrete = next(b for b in branches if b != "null")
        _write_long(branches.index(concrete), out)
        _encode(concrete, val, out)
        return
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if val else 0)
        elif t in ("int", "long"):
            _write_long(int(val), out)
        elif t == "float":
            out.extend(struct.pack("<f", float(val)))
        elif t == "double":
            out.extend(struct.pack("<d", float(val)))
        elif t == "string":
            b = str(val).encode("utf-8")
            _write_long(len(b), out)
            out.extend(b)
        elif t == "bytes":
            _write_long(len(val), out)
            out.extend(val)
        else:
            raise AvroCodecError(f"unsupported primitive {t!r}")
        return
    lg = _logical_of(schema)
    if lg is not None:
        wire = _to_wire(lg, val)
        if "fixed_size" in lg:
            out += wire                      # fixed: raw bytes, no prefix
        else:
            _encode(schema["type"], wire, out)
        return
    t = schema["type"]
    if t == "enum":
        symbols = schema.get("symbols", [])
        if val not in symbols:
            raise AvroCodecError(f"enum value {val!r} not in {symbols}")
        _write_long(symbols.index(val), out)
        return
    if t == "fixed":
        size = int(schema.get("size", 0))
        if not isinstance(val, (bytes, bytearray)) or len(val) != size:
            raise AvroCodecError(f"fixed({size}) got {val!r}")
        out += val
        return
    if t == "record":
        for f in schema["fields"]:
            _encode(f["type"], None if val is None else val.get(f["name"]), out)
    elif t == "array":
        items = list(val or [])
        if items:
            _write_long(len(items), out)
            for it in items:
                _encode(schema["items"], it, out)
        _write_long(0, out)
    elif t == "map":
        entries = dict(val or {})
        if entries:
            _write_long(len(entries), out)
            for k, v in entries.items():
                _encode("string", k, out)
                _encode(schema["values"], v, out)
        _write_long(0, out)
    elif t in PRIMITIVES:
        _encode(t, val, out)
    else:
        raise AvroCodecError(f"unsupported avro type {schema!r}")


def encode_record(avsc: str | dict, value: dict) -> bytes:
    out = bytearray()
    _encode(parse_schema(avsc), value, out)
    return bytes(out)


def _flat_record_steps(schema):
    """(field, primitive, null_branch_index|None, logical|None) per field
    for flat records of primitives / logical-annotated primitives /
    ["null", either] unions; None when the schema needs the general
    recursive codec."""
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        return None

    def prim_of(t) -> "tuple[str, dict | None] | None":
        if isinstance(t, str) and t in PRIMITIVES:
            return t, None
        lg = _logical_of(t)
        # only logical annotations over PLAIN primitives ride the fast
        # paths; fixed-backed decimals (no length prefix) need the
        # general codec's byte-exact handling
        if lg is not None and t.get("type") in PRIMITIVES:
            return t["type"], lg
        return None

    steps: list[tuple[str, str, int | None, dict | None]] = []
    for f in schema.get("fields", []):
        t = f["type"]
        p = prim_of(t)
        if p is not None:
            steps.append((f["name"], p[0], None, p[1]))
            continue
        if isinstance(t, list) and len(t) == 2 and "null" in t:
            p = prim_of(t[1 - t.index("null")])
            if p is not None:
                steps.append((f["name"], p[0], t.index("null"), p[1]))
                continue
        return None
    return steps


def compile_encoder(avsc: str | dict):
    """Specialize the wire encoder for one schema — the write-side twin
    of ``compile_decoder``: flat records encode through one precomputed
    loop (no schema-tree walk per record); deeper schemas fall back to
    the general recursive encoder."""
    schema = parse_schema(avsc)
    steps = _flat_record_steps(schema)
    if steps is None:
        def general(value: dict) -> bytes:
            out = bytearray()
            _encode(schema, value, out)
            return bytes(out)
        return general

    pack = struct.pack

    def fast(value: dict) -> bytes:
        out = bytearray()
        for name, t, null_idx, lg in steps:
            v = value.get(name)
            if null_idx is not None:
                if v is None:
                    out.append(null_idx << 1)          # zigzag(idx)
                    continue
                out.append((1 - null_idx) << 1)
            elif v is None:
                if t == "null":
                    continue
                raise AvroCodecError(f"field {name!r}: None for "
                                     f"non-nullable {t!r}")
            if lg is not None:
                v = _to_wire(lg, v)
            if t == "long" or t == "int":
                n = int(v)
                n = (n << 1) ^ (n >> 63)
                while (n & ~0x7F) != 0:
                    out.append((n & 0x7F) | 0x80)
                    n >>= 7
                out.append(n)
            elif t == "string":
                b = str(v).encode("utf-8")
                _write_long(len(b), out)
                out += b
            elif t == "bytes":
                _write_long(len(v), out)
                out += v
            elif t == "double":
                out += pack("<d", float(v))
            elif t == "float":
                out += pack("<f", float(v))
            elif t == "boolean":
                out.append(1 if v else 0)
        return bytes(out)

    return fast


# -- binary decode ----------------------------------------------------------

def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(buf):
            raise AvroCodecError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise AvroCodecError("varint too long")
    return (acc >> 1) ^ -(acc & 1), pos      # un-zigzag


def _decode(schema, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(schema, list):
        idx, pos = _read_long(buf, pos)
        if not 0 <= idx < len(schema):
            raise AvroCodecError(f"union branch {idx} out of range")
        return _decode(schema[idx], buf, pos)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None, pos
        if t == "boolean":
            if pos >= len(buf):
                raise AvroCodecError("truncated boolean")
            return buf[pos] != 0, pos + 1
        if t in ("int", "long"):
            return _read_long(buf, pos)
        if t == "float":
            if pos + 4 > len(buf):
                raise AvroCodecError("truncated float")
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        if t == "double":
            if pos + 8 > len(buf):
                raise AvroCodecError("truncated double")
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        if t in ("string", "bytes"):
            n, pos = _read_long(buf, pos)
            if n < 0 or pos + n > len(buf):
                raise AvroCodecError(f"truncated {t}")
            raw = bytes(buf[pos:pos + n])
            if t == "string":
                try:
                    return raw.decode("utf-8"), pos + n
                except UnicodeDecodeError as e:
                    # error-contract: a hostile payload must fork the ONE
                    # record to the error channel, never kill the task —
                    # so invalid UTF-8 is a codec error like any other
                    raise AvroCodecError(f"invalid utf-8 in string: {e}") \
                        from e
            return raw, pos + n
        raise AvroCodecError(f"unsupported primitive {t!r}")
    lg = _logical_of(schema)
    if lg is not None:
        if "fixed_size" in lg:
            size = lg["fixed_size"]
            if pos + size > len(buf):
                raise AvroCodecError("truncated fixed decimal")
            return _from_wire(lg, bytes(buf[pos:pos + size])), pos + size
        v, pos = _decode(schema["type"], buf, pos)
        return _from_wire(lg, v), pos
    t = schema["type"]
    if t == "enum":
        idx, pos = _read_long(buf, pos)
        symbols = schema.get("symbols", [])
        if not 0 <= idx < len(symbols):
            raise AvroCodecError(f"enum index {idx} out of range")
        return symbols[idx], pos
    if t == "fixed":
        size = int(schema.get("size", 0))
        if pos + size > len(buf):
            raise AvroCodecError("truncated fixed")
        return bytes(buf[pos:pos + size]), pos + size
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(f["type"], buf, pos)
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:                 # block with byte-size prefix
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                v, pos = _decode(schema["items"], buf, pos)
                items.append(v)
    if t == "map":
        entries = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return entries, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                k, pos = _decode("string", buf, pos)
                entries[k], pos = _decode(schema["values"], buf, pos)
    if t in PRIMITIVES:
        return _decode(t, buf, pos)
    raise AvroCodecError(f"unsupported avro type {schema!r}")


def decode_record(avsc: str | dict, payload: bytes) -> dict:
    """Strict decode: trailing bytes are corruption, not tolerated."""
    val, pos = _decode(parse_schema(avsc), payload, 0)
    if pos != len(payload):
        raise AvroCodecError(f"{len(payload) - pos} trailing bytes")
    return val


def compile_decoder(avsc: str | dict):
    """Specialize the wire decoder for one schema: flat records of
    primitives / ["null", primitive] unions decode through a closure
    whose per-field dispatch was resolved at COMPILE time (one flat loop,
    no schema-tree walk, no per-field isinstance ladder); anything deeper
    falls back to the general recursive decoder. Same strict
    trailing-bytes contract as ``decode_record``. This is the per-row
    hot path of the mixed-version Kafka decode kernels — at 100 TB every
    record pays it, so the constant factor matters.

    The returned callable also exposes ``.at(buf, pos, n) -> (record,
    next_pos)`` — the streaming entry for back-to-back records with no
    per-record framing (OCF block bodies), skipping the trailing-bytes
    check that only makes sense for framed payloads."""
    schema = parse_schema(avsc)

    def general(payload: bytes) -> dict:
        val, pos = _decode(schema, payload, 0)
        if pos != len(payload):
            raise AvroCodecError(f"{len(payload) - pos} trailing bytes")
        return val

    # streaming entry (``.at``): decode ONE record starting at pos and
    # return (record, next_pos) — the shape OCF block bodies need, where
    # records are back-to-back with no per-record framing
    general.at = lambda buf, pos, n: _decode(schema, buf, pos)

    steps = _flat_record_steps(schema)
    if steps is None:
        return general

    # plain module functions, not bound struct.Struct methods — the
    # closure must survive cloudpickle into the executors
    unpack_f = struct.unpack_from
    unpack_d = struct.unpack_from

    def fast_at(buf: bytes, pos: int, n: int) -> tuple[dict, int]:
        out = {}
        for name, t, null_idx, lg in steps:
            if null_idx is not None:
                # union tag varint (branch index is 0 or 1 -> one byte)
                if pos >= n:
                    raise AvroCodecError("truncated varint")
                tag = buf[pos]
                pos += 1
                if tag not in (0, 2):    # zigzag(0)=0, zigzag(1)=2
                    raise AvroCodecError(f"union branch {tag} out of range")
                if tag >> 1 == null_idx:
                    out[name] = None
                    continue
            if t == "long" or t == "int":
                acc = shift = 0
                while True:
                    if pos >= n:
                        raise AvroCodecError("truncated varint")
                    b = buf[pos]
                    pos += 1
                    acc |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                    if shift > 70:
                        raise AvroCodecError("varint too long")
                out[name] = (acc >> 1) ^ -(acc & 1)
            elif t == "string" or t == "bytes":
                ln, pos2 = _read_long(buf, pos)
                if ln < 0 or pos2 + ln > n:
                    raise AvroCodecError(f"truncated {t}")
                raw = bytes(buf[pos2:pos2 + ln])
                if t == "string":
                    try:
                        out[name] = raw.decode("utf-8")
                    except UnicodeDecodeError as e:
                        raise AvroCodecError(
                            f"invalid utf-8 in string: {e}") from e
                else:
                    out[name] = raw
                pos = pos2 + ln
            elif t == "double":
                if pos + 8 > n:
                    raise AvroCodecError("truncated double")
                out[name] = unpack_d("<d", buf, pos)[0]
                pos += 8
            elif t == "float":
                if pos + 4 > n:
                    raise AvroCodecError("truncated float")
                out[name] = unpack_f("<f", buf, pos)[0]
                pos += 4
            elif t == "boolean":
                if pos >= n:
                    raise AvroCodecError("truncated boolean")
                out[name] = buf[pos] != 0
                pos += 1
            else:   # "null"
                out[name] = None
            if lg is not None and out[name] is not None:
                out[name] = _from_wire(lg, out[name])
        return out, pos

    def fast(payload: bytes) -> dict:
        out, pos = fast_at(payload, 0, len(payload))
        if pos != len(payload):
            raise AvroCodecError(f"{len(payload) - pos} trailing bytes")
        return out

    fast.at = fast_at
    return fast


def compile_batch_encoder(avsc: str | dict):
    """Vectorized whole-batch encoder for FLAT record schemas, or None.

    The write-side twin of ``compile_batch_decoder``: all rows encode
    into ONE flat numpy buffer by scatter — per-field offsets are
    prefix sums, varints write as <= 10 vectorized column passes,
    doubles/floats as one reshape scatter — and the final per-row
    ``bytes`` objects are plain slices of that buffer. Strings pay one
    utf-8 encode + one memcpy per value (inherent: the outputs are
    Python bytes). Any row the vector path does not handle (a value
    whose type needs the reference coercion rules, a None in a
    non-nullable field, a non-finite float in an int slot) is encoded
    by the reference per-row encoder instead — its bytes (or its
    exception) are authoritative, so parity is by construction (pinned
    by a hypothesis property in tests/test_avro.py).

    Accepts a dict of column -> sequence (pandas Series or list).
    NaN is normalized to null exactly like ``encode_avro``'s ``clean``.
    Returns ``batch(cols, n_rows) -> list[bytes]``, or None for
    non-flat schemas.
    """
    import numpy as np

    schema = parse_schema(avsc)
    steps = _flat_record_steps(schema)
    if steps is None:
        return None
    row_encode = compile_encoder(schema)
    names = [s[0] for s in steps]

    INT_KINDS = ("i", "u")

    def batch(cols, n_rows: int) -> list:
        slow = np.zeros(n_rows, bool)
        # per-field prepared plans: (kind, data...) with per-row lengths
        plans = []
        lens = np.zeros(n_rows, np.int64)

        def as_object(seq):
            arr = np.empty(n_rows, object)
            for i, v in enumerate(seq):
                arr[i] = None if v is None or (isinstance(v, float) and v != v) \
                    else v
            return arr

        for name, t, null_idx, lg in steps:
            seq = cols[name]
            dtype_kind = getattr(getattr(seq, "dtype", None), "kind", None)
            none_mask = np.zeros(n_rows, bool)
            vals = None
            logical_done = False
            if lg is not None:
                lt = lg["lt"]
                if dtype_kind == "M" and "timestamp" in lt:
                    # datetime64 column -> epoch ticks in ONE vector op
                    # (the per-value datetime arithmetic was the measured
                    # hot spot: 3.6s/150k rows -> vectorized)
                    arr = np.asarray(seq, "datetime64[ns]")
                    none_mask = np.isnat(arr)
                    div = 1_000_000 if lt.endswith("millis") else 1_000
                    vals = np.where(none_mask, np.int64(0),
                                    arr.astype(np.int64) // div)
                    logical_done = True
                elif lt == "date":
                    obj = as_object(seq)
                    none_mask = np.fromiter((v is None for v in obj),
                                            bool, n_rows)
                    vals = np.zeros(n_rows, np.int64)
                    ep = _EPOCH_DATE.toordinal()
                    for i in np.nonzero(~none_mask)[0]:
                        try:            # toordinal is a C method: cheap
                            vals[i] = obj[i].toordinal() - ep
                        except (AttributeError, TypeError):
                            slow[i] = True
                    logical_done = True
                else:
                    # decimal / exotic: per-value reference conversion;
                    # a value _to_wire rejects routes the ROW to the
                    # per-row encoder, whose outcome is authoritative
                    src = as_object(seq)
                    conv = np.empty(n_rows, object)
                    for i, v in enumerate(src):
                        if v is None:
                            continue
                        try:
                            if v != v:           # NaT / Decimal('NaN')
                                continue
                            conv[i] = _to_wire(lg, v)
                        except Exception:
                            slow[i] = True
                    seq = conv
                    dtype_kind = None
            if logical_done:
                pass                    # vals/none_mask ready for plans
            elif dtype_kind in INT_KINDS and t in ("int", "long"):
                vals = np.asarray(seq, np.int64)
            elif dtype_kind == "f" and t in ("int", "long"):
                f = np.asarray(seq, np.float64)
                none_mask = np.isnan(f)
                hostile = ~none_mask & (~np.isfinite(f)
                                        | (np.abs(f) >= 2.0 ** 62))
                slow |= hostile
                vals = np.where(none_mask | hostile, 0,
                                f).astype(np.int64)   # trunc == int()
            elif dtype_kind == "f" and t in ("double", "float"):
                f = np.asarray(seq, np.float64)
                # NaN means SQL null here (Arrow nullability), not a
                # payload NaN — a payload NaN arrives as a Python float
                # in an object column and goes through the slow path
                none_mask = np.isnan(f)
                vals = f
            elif dtype_kind == "b" and t == "boolean":
                vals = np.asarray(seq, bool)
            else:
                obj = as_object(seq)
                none_mask = np.fromiter((v is None for v in obj), bool,
                                        n_rows)
                if t in ("int", "long"):
                    okt = np.fromiter(
                        (v is None or isinstance(v, (int, np.integer))
                         for v in obj), bool, n_rows)
                    slow |= ~okt
                    vals = np.fromiter(
                        (int(v) if isinstance(v, (int, np.integer))
                         and -2**63 <= int(v) < 2**63 else 0
                         for v in obj), np.int64, n_rows)
                    big = np.fromiter(
                        (isinstance(v, (int, np.integer))
                         and not -2**63 <= int(v) < 2**63 for v in obj),
                        bool, n_rows)
                    slow |= big
                elif t in ("double", "float"):
                    okt = np.fromiter(
                        (v is None or isinstance(v, (int, float, np.integer,
                                                     np.floating))
                         for v in obj), bool, n_rows)
                    slow |= ~okt
                    vals = np.fromiter(
                        (float(v) if isinstance(v, (int, float, np.integer,
                                                    np.floating)) else 0.0
                         for v in obj), np.float64, n_rows)
                elif t == "boolean":
                    okt = np.fromiter(
                        (v is None or isinstance(v, (bool, np.bool_))
                         for v in obj), bool, n_rows)
                    slow |= ~okt
                    vals = np.fromiter(
                        (bool(v) if isinstance(v, (bool, np.bool_)) else False
                         for v in obj), bool, n_rows)
                elif t == "string":
                    enc = np.empty(n_rows, object)
                    for i, v in enumerate(obj):
                        if v is None:
                            continue
                        if isinstance(v, str):
                            enc[i] = v.encode("utf-8")
                        else:
                            slow[i] = True     # str(v) coercion: reference
                    vals = enc
                elif t == "bytes":
                    enc = np.empty(n_rows, object)
                    for i, v in enumerate(obj):
                        if v is None:
                            continue
                        if isinstance(v, (bytes, bytearray)):
                            enc[i] = bytes(v)
                        else:
                            slow[i] = True
                    vals = enc
                else:   # "null"
                    vals = obj

            if null_idx is None and t != "null":
                slow |= none_mask      # reference raises for these rows
            present = ~none_mask

            tag_len = np.zeros(n_rows, np.int64)
            if null_idx is not None:
                tag_len[:] = 1
            flen = np.zeros(n_rows, np.int64)
            if t in ("int", "long"):
                u = ((vals.astype(np.int64) << np.int64(1))
                     ^ (vals.astype(np.int64) >> np.int64(63))).astype(np.uint64)
                nb = np.ones(n_rows, np.int64)
                for j in range(1, 10):
                    nb += (u >= np.uint64(1) << np.uint64(7 * j)).astype(np.int64)
                flen = np.where(present, nb, 0)
                plans.append(("varint", null_idx, none_mask, u, flen, tag_len))
            elif t in ("double", "float"):
                width = 8 if t == "double" else 4
                flen = np.where(present, width, 0)
                plans.append(("fixed", null_idx, none_mask,
                              vals.astype(np.float64 if width == 8
                                          else np.float32),
                              flen, tag_len))
            elif t == "boolean":
                flen = np.where(present, 1, 0)
                plans.append(("bool", null_idx, none_mask, vals, flen, tag_len))
            elif t in ("string", "bytes"):
                blen = np.fromiter(
                    (len(v) if v is not None else 0 for v in vals),
                    np.int64, n_rows)
                u = (blen.astype(np.int64) << np.int64(1)).astype(np.uint64)
                nb = np.ones(n_rows, np.int64)
                for j in range(1, 10):
                    nb += (u >= np.uint64(1) << np.uint64(7 * j)).astype(np.int64)
                flen = np.where(present, nb + blen, 0)
                plans.append(("blob", null_idx, none_mask, (u, nb, vals),
                              flen, tag_len))
            else:       # "null" type: zero bytes
                plans.append(("nul", null_idx, none_mask, None, flen, tag_len))
            lens += tag_len + flen

        lens[slow] = 0
        starts = np.zeros(n_rows, np.int64)
        if n_rows > 1:
            np.cumsum(lens[:-1], out=starts[1:])
        out = np.zeros(int(lens.sum()), np.uint8)
        live = ~slow
        offs = starts.copy()

        for kind, null_idx, none_mask, data, flen, tag_len in plans:
            if null_idx is not None:
                sel = np.nonzero(live)[0]
                tags = np.where(none_mask, null_idx << 1, (1 - null_idx) << 1)
                out[offs[sel]] = tags[sel].astype(np.uint8)
                offs[live] += 1
            active = live & ~none_mask
            if kind == "varint":
                u = data
                done = ~active
                for j in range(10):
                    part = ~done
                    if not part.any():
                        break
                    byte = ((u >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
                    # j == 9 is the 10th and final byte a 64-bit zigzag
                    # can need; a >= 64-bit numpy shift is undefined
                    more = ((u >> np.uint64(7 * (j + 1))) != 0) if j < 9 \
                        else np.zeros(n_rows, bool)
                    byte = byte | np.where(more, 0x80, 0).astype(np.uint8)
                    sel = np.nonzero(part)[0]
                    out[offs[sel] + j] = byte[sel]
                    done |= part & ~more
            elif kind == "fixed":
                sel = np.nonzero(active)[0]
                if len(sel):
                    width = data.dtype.itemsize
                    rows = data[sel].copy().view(np.uint8).reshape(len(sel), width)
                    out[offs[sel][:, None] + np.arange(width)] = rows
            elif kind == "bool":
                sel = np.nonzero(active)[0]
                out[offs[sel]] = data[sel].astype(np.uint8)
            elif kind == "blob":
                u, nb, blobs = data
                done = ~active
                for j in range(10):
                    part = ~done
                    if not part.any():
                        break
                    byte = ((u >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
                    # j == 9 is the 10th and final byte a 64-bit zigzag
                    # can need; a >= 64-bit numpy shift is undefined
                    more = ((u >> np.uint64(7 * (j + 1))) != 0) if j < 9 \
                        else np.zeros(n_rows, bool)
                    byte = byte | np.where(more, 0x80, 0).astype(np.uint8)
                    sel = np.nonzero(part)[0]
                    out[offs[sel] + j] = byte[sel]
                    done |= part & ~more
                for i in np.nonzero(active)[0]:
                    b = blobs[i]
                    if b:
                        o = offs[i] + nb[i]
                        out[o:o + len(b)] = np.frombuffer(b, np.uint8)
            offs[live] += flen[live] if flen is not None else 0

        result: list = [None] * n_rows
        ob = out.tobytes()
        for i in range(n_rows):
            result[i] = ob[starts[i]:starts[i] + lens[i]]
        if slow.any():
            cleaned = {n: None for n in names}
            for i in np.nonzero(slow)[0]:
                rec = {}
                for n in names:
                    v = cols[n][i] if not hasattr(cols[n], "iloc") \
                        else cols[n].iloc[i]
                    if v is not None:
                        try:
                            # NaN AND NaT (datetime64 null) are SQL nulls
                            if bool(v != v):
                                v = None
                        except (TypeError, ValueError):
                            pass
                    rec[n] = v
                result[i] = row_encode(rec)    # raises exactly as before
        return result

    return batch


def compile_batch_decoder(avsc: str | dict):
    """Vectorized whole-batch decoder for FLAT record schemas, or None.

    The per-row compiled decoder (``compile_decoder``) still walks a
    Python byte loop per varint — at 100 TB every record pays that
    interpreter tax. This decoder processes one Arrow batch of payloads
    with numpy gathers instead: all rows' varints resolve in <= 10
    vectorized passes (one per varint byte position), fixed-width
    doubles/floats in one gather + view, and only the final utf-8
    string materialization stays per row.

    Error-contract parity is by CONSTRUCTION, not re-implementation:
    any row the vector path cannot prove clean (truncation, bad union
    tag, over-long or 64-bit-overflowing varint, negative/overrunning
    length, trailing bytes, non-bytes payload) is re-decoded through
    the reference per-row decoder, whose exception (or success) decides
    the row's fate exactly as the row-at-a-time kernel would
    (hypothesis parity property in tests/test_avro.py).

    Returns ``batch(payloads) -> (cols: dict[name, list], ok: list)``,
    or None when the schema is not a flat record (caller keeps the
    per-row path).
    """
    import numpy as np

    schema = parse_schema(avsc)
    steps = _flat_record_steps(schema)
    if steps is None:
        return None
    row_decode = compile_decoder(schema)
    names = [s[0] for s in steps]

    def batch(payloads) -> tuple[dict, list]:
        n_rows = len(payloads)
        if n_rows == 0:
            return {n: [] for n in names}, []
        norm: list[bytes] = []
        slow = np.zeros(n_rows, bool)
        for i, p in enumerate(payloads):
            if isinstance(p, (bytes, bytearray)):
                norm.append(bytes(p))
            else:
                try:
                    norm.append(bytes(p))
                except TypeError:
                    norm.append(b"")
                    slow[i] = True
        lens = np.fromiter((len(b) for b in norm), np.int64, count=n_rows)
        starts = np.zeros(n_rows, np.int64)
        if n_rows > 1:
            np.cumsum(lens[:-1], out=starts[1:])
        ends = starts + lens
        # one sentinel byte so the index-0 fallback used for INACTIVE
        # rows (their gathered value is always discarded by a mask) is
        # in bounds even when every payload is empty
        A = np.frombuffer(b"".join(norm) + b"\x00", np.uint8)
        pos = starts.copy()
        cols = {n: np.full(n_rows, None, dtype=object) for n in names}

        def read_varint(active: np.ndarray) -> np.ndarray:
            """Unsigned varint accumulate for active rows; advances pos.
            Rows that truncate, run past 10 bytes, or would overflow
            64 bits in the last byte are routed to the slow path."""
            acc = np.zeros(n_rows, np.uint64)
            done = ~active
            for j in range(10):
                live = ~done & (pos + j < ends)
                trunc = ~done & ~live
                slow[trunc] = True
                done |= trunc
                if bool(done.all()):
                    break
                b = A[np.where(live, pos + j, 0)]
                b = np.where(live, b, 0).astype(np.uint8)
                acc |= (b.astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
                term = live & ((b & 0x80) == 0)
                if j == 9:
                    # 10th byte may only carry bit 0 for an int64; more
                    # means the pure-Python big-int path must decide
                    over = term & (b > 1)
                    slow[over] = True
                pos[term] += j + 1
                done |= term
            leftover = ~done
            slow[leftover] = True        # >10-byte varint
            return acc

        for name, t, null_idx, lg in steps:
            active = ~slow
            if null_idx is not None:
                has_tag = active & (pos < ends)
                slow[active & ~has_tag] = True
                active = has_tag & ~slow
                tag = np.where(active, A[np.where(active, pos, 0)], 0)
                bad = active & ~((tag == 0) | (tag == 2))
                slow[bad] = True
                active &= ~bad
                pos[active] += 1
                isnull = active & ((tag >> 1) == null_idx)
                active &= ~isnull        # null rows keep the None default
            if t in ("long", "int"):
                acc = read_varint(active)
                active &= ~slow
                vals = ((acc >> np.uint64(1)).astype(np.int64)
                        ^ -((acc & np.uint64(1)).astype(np.int64)))
                cols[name][active] = vals[active]
            elif t in ("string", "bytes"):
                acc = read_varint(active)
                active &= ~slow
                ln = ((acc >> np.uint64(1)).astype(np.int64)
                      ^ -((acc & np.uint64(1)).astype(np.int64)))
                bad = active & ((ln < 0) | (pos + ln > ends))
                slow[bad] = True
                active &= ~bad
                col = cols[name]
                if t == "string":
                    for i in np.nonzero(active)[0]:
                        raw = A[pos[i]:pos[i] + ln[i]].tobytes()
                        try:
                            col[i] = raw.decode("utf-8")
                        except UnicodeDecodeError:
                            # hostile byte sequence: route THIS row to the
                            # per-row slow path (which nulls it with
                            # ok=False) instead of crashing the kernel
                            slow[i] = True
                            active[i] = False
                else:
                    for i in np.nonzero(active)[0]:
                        col[i] = A[pos[i]:pos[i] + ln[i]].tobytes()
                pos[active] += ln[active]
            elif t in ("double", "float"):
                width = 8 if t == "double" else 4
                fits = active & (pos + width <= ends)
                slow[active & ~fits] = True
                active = fits & ~slow
                sel = np.nonzero(active)[0]
                if len(sel):
                    gather = A[pos[sel][:, None] + np.arange(width)]
                    vals = gather.copy().view("<f8" if width == 8 else "<f4").ravel()
                    cols[name][sel] = vals.astype(np.float64)
                pos[active] += width
            elif t == "boolean":
                fits = active & (pos < ends)
                slow[active & ~fits] = True
                active = fits & ~slow
                b = A[np.where(active, pos, 0)]
                cols[name][active] = (b != 0)[active]
                pos[active] += 1
            # t == "null": the None default stands, no bytes consumed

        slow[~slow & (pos != ends)] = True   # trailing bytes
        # logical conversion for vector-decoded rows (slow rows get the
        # already-converted values from the per-row decoder below).
        # Timestamps convert through ONE pandas vector op when the ticks
        # fit datetime64[ns]; out-of-range ticks (or hostile values past
        # the logical domain) fall back per value, where AvroCodecError
        # routes the row to the slow path.
        for name, t, null_idx, lg in steps:
            if lg is None:
                continue
            col = cols[name]
            lt = lg["lt"]
            sel = [i for i in np.nonzero(~slow)[0] if col[i] is not None]
            if not sel:
                continue
            if "timestamp" in lt or lt == "date":
                done = False
                if lt != "date":
                    import pandas as pd
                    ticks = np.fromiter((col[i] for i in sel), np.int64,
                                        len(sel))
                    try:
                        vals = pd.to_datetime(
                            ticks,
                            unit="ms" if lt.endswith("millis") else "us",
                            utc=not lt.startswith("local")).to_pydatetime()
                        if lt.startswith("local"):
                            pass        # already naive
                        for j, i in enumerate(sel):
                            col[i] = vals[j]
                        done = True
                    except Exception:
                        done = False    # out-of-ns-range: per-value path
                if not done:
                    ep = _EPOCH_DATE.toordinal()
                    for i in sel:
                        try:
                            if lt == "date":
                                col[i] = _DT.date.fromordinal(
                                    ep + int(col[i]))
                            else:
                                col[i] = _from_wire(lg, col[i])
                        except (AvroCodecError, ValueError, OverflowError):
                            slow[i] = True
            else:
                # decimal / time-of-day / uuid: per-value conversion; a
                # value past the logical domain (hostile time ticks, a
                # non-RFC-4122 uuid string) routes the ROW to the per-row
                # decoder, whose ok=False verdict is authoritative
                for i in sel:
                    try:
                        col[i] = _from_wire(lg, col[i])
                    except (AvroCodecError, ValueError, OverflowError):
                        slow[i] = True
        ok = np.ones(n_rows, bool)
        for i in np.nonzero(slow)[0]:
            try:
                rec = row_decode(bytes(payloads[i]))
            except (AvroCodecError, TypeError, UnicodeDecodeError):
                for n in names:
                    cols[n][i] = None
                ok[i] = False
            else:
                for n in names:
                    cols[n][i] = rec.get(n)
        return {n: list(cols[n]) for n in names}, list(ok)

    return batch


# -- Spark kernels ----------------------------------------------------------

def encode_avro(df: DataFrame, avsc: str | dict,
                out_col: str = "value") -> DataFrame:
    """Encode every row into one Avro-binary column (the Kafka-producer
    side of the wire contract) — Arrow-batched mapInPandas."""
    schema = parse_schema(avsc)
    names = [f["name"] for f in schema["fields"]]
    missing = [n for n in names if n not in df.columns]
    if missing:
        raise AvroCodecError(f"dataframe lacks schema fields {missing}")

    def kernel(batches) -> Iterator:
        import pandas as pd
        batch_enc = compile_batch_encoder(schema)
        enc = compile_encoder(schema) if batch_enc is None else None

        def clean(v):
            # Arrow->pandas nulls arrive as None (object cols) or NaN
            # (numeric cols); both mean Avro null
            return None if v is None or (isinstance(v, float) and v != v) \
                else v

        for pdf in batches:
            if batch_enc is not None:
                payloads = batch_enc({n: pdf[n] for n in names}, len(pdf))
            else:
                data = [pdf[n].tolist() for n in names]
                payloads = [enc({n: clean(v) for n, v in zip(names, row)})
                            for row in zip(*data)]
            yield pd.DataFrame({out_col: payloads})

    return df.select(*names).mapInPandas(kernel, schema=f"{out_col} binary")


def roundtrip_avro(df: DataFrame, avsc: str | dict,
                   ok_col: str = "__avro_ok__") -> DataFrame:
    """Encode then decode every row through the wire format in ONE
    Arrow-batched mapInPandas pass — the wire bytes live only inside the
    kernel. Returns the decoded field columns plus ``ok_col``.

    Why this exists: the encode_avro -> decode_avro chain is two chained
    Python stages, and NOTES measured the declared roundtrip query as
    ORCHESTRATION-bound (codec kernels run 182k/358k rows/s single-core;
    the chained query benched 2.4-3.2s in-bench vs 0.13-0.5s isolated —
    per-stage Arrow transfer + job floors, not codec cost). Fusing the
    two kernels halves the Python-stage count while still exercising the
    REAL encoder and decoder on real bytes (losslessness is what the
    oracle hash checks; hostile-payload forking stays on the unfused
    decode_avro path, which remains the ingest-side API).

    Same-schema only (writer == reader): the resolving-reader path
    (functions/avro_compat.py) keeps its own chain, where resolution IS
    the thing under test."""
    schema = parse_schema(avsc)
    names = [f["name"] for f in schema["fields"]]
    missing = [n for n in names if n not in df.columns]
    if missing:
        raise AvroCodecError(f"dataframe lacks schema fields {missing}")
    out_struct = avro_to_structtype(schema)
    full = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in out_struct.fields]
        + [T.StructField(ok_col, T.BooleanType(), False)])

    def kernel(batches) -> Iterator:
        import pandas as pd
        batch_enc = compile_batch_encoder(schema)
        enc = compile_encoder(schema) if batch_enc is None else None
        batch_decode = compile_batch_decoder(schema)
        decode = compile_decoder(schema) if batch_decode is None else None

        def clean(v):
            return None if v is None or (isinstance(v, float) and v != v) \
                else v

        for pdf in batches:
            if batch_enc is not None:
                payloads = batch_enc({n: pdf[n] for n in names}, len(pdf))
            else:
                data = [pdf[n].tolist() for n in names]
                payloads = [enc({n: clean(v) for n, v in zip(names, row)})
                            for row in zip(*data)]
            if batch_decode is not None:
                decoded, oks = batch_decode(list(payloads))
            else:
                decoded = {n: [] for n in names}
                oks = []
                for payload in payloads:
                    try:
                        rec = decode(bytes(payload))
                        oks.append(True)
                    except (AvroCodecError, TypeError, UnicodeDecodeError):
                        rec = {}
                        oks.append(False)
                    for n in names:
                        decoded[n].append(rec.get(n))
            out = pd.DataFrame({n: decoded[n] for n in names})
            out[ok_col] = oks
            yield out

    return df.select(*names).mapInPandas(kernel, schema=full)


def decode_avro(df: DataFrame, avsc: str | dict, value_col: str = "value",
                ok_col: str = "__avro_ok__") -> DataFrame:
    """Decode an Avro-binary column into typed fields + an ``ok`` marker
    (False = malformed payload; decoded fields null). Non-value columns
    pass through untouched, so the caller can fork errors with the raw
    payload preserved — the AbstractDataConverter valid|error contract."""
    schema = parse_schema(avsc)
    out_struct = avro_to_structtype(schema)
    clash = [f.name for f in out_struct.fields if f.name in df.columns]
    if clash:
        raise AvroCodecError(f"decoded fields collide with input columns: {clash}")

    # every decoded field is nullable HERE regardless of the avro schema:
    # corrupt payloads emit a null-filled row tagged ok=False
    decoded_fields = [T.StructField(f.name, f.dataType, True)
                      for f in out_struct.fields]
    full = T.StructType(list(df.schema.fields) + decoded_fields
                        + [T.StructField(ok_col, T.BooleanType(), False)])
    names = [f.name for f in out_struct.fields]

    def kernel(batches) -> Iterator:
        import pandas as pd
        batch_decode = compile_batch_decoder(schema)
        decode = compile_decoder(schema) if batch_decode is None else None
        for pdf in batches:
            if batch_decode is not None:
                decoded, oks = batch_decode(list(pdf[value_col]))
            else:
                decoded = {n: [] for n in names}
                oks = []
                for payload in pdf[value_col]:
                    try:
                        rec = decode(bytes(payload))
                        oks.append(True)
                    except (AvroCodecError, TypeError, UnicodeDecodeError):
                        rec = {}
                        oks.append(False)
                    for n in names:
                        decoded[n].append(rec.get(n))
            out = pdf.copy()
            for n in names:
                out[n] = decoded[n]
            out[ok_col] = oks
            yield out

    return df.mapInPandas(kernel, schema=full)
