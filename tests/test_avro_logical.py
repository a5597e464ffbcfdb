"""Avro logical types (decimal / date / timestamp-millis / micros):
decode + encode + schema mapping through the general, compiled-per-row,
and vectorized batch codecs, plus the resolving reader.

Public Avro corpora carry ``logicalType`` annotations; the reference
sidesteps them with its custom ``timestamp=true`` schema prop
(M/common/util/SchemaUtil.java:160-199 — ported in functions/scalars.py),
but a drop-in engine must read real-world ``.avsc`` files directly.
"""

import datetime as dt
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marmaray_spark.functions.avro_codec import (
    AvroCodecError,
    avro_to_structtype,
    compile_batch_decoder,
    compile_batch_encoder,
    compile_decoder,
    compile_encoder,
    decode_avro,
    decode_record,
    encode_avro,
    encode_record,
)

UTC = dt.timezone.utc

LOGICAL_AVSC = {"type": "record", "name": "ev", "fields": [
    {"name": "id", "type": "long"},
    {"name": "day", "type": {"type": "int", "logicalType": "date"}},
    {"name": "at_ms", "type": ["null", {"type": "long",
                                        "logicalType": "timestamp-millis"}]},
    {"name": "at_us", "type": ["null", {"type": "long",
                                        "logicalType": "timestamp-micros"}]},
    {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                "precision": 12, "scale": 2}},
]}

ROW = {
    "id": 7,
    "day": dt.date(2024, 3, 1),
    "at_ms": dt.datetime(2024, 3, 1, 12, 30, 45, 123000, tzinfo=UTC),
    "at_us": dt.datetime(2024, 3, 1, 12, 30, 45, 123456, tzinfo=UTC),
    "amount": Decimal("12345.67"),
}


def test_structtype_mapping():
    struct = avro_to_structtype(LOGICAL_AVSC)
    by = {f.name: f.dataType for f in struct.fields}
    assert by["day"] == T.DateType()
    assert by["at_ms"] == T.TimestampType()
    assert by["at_us"] == T.TimestampType()
    assert by["amount"] == T.DecimalType(12, 2)


def test_structtype_local_timestamp_and_unknown_logical():
    avsc = {"type": "record", "name": "r", "fields": [
        {"name": "lt", "type": {"type": "long",
                                "logicalType": "local-timestamp-micros"}},
        {"name": "u", "type": {"type": "string", "logicalType": "uuid"}},
    ]}
    by = {f.name: f.dataType for f in avro_to_structtype(avsc).fields}
    assert by["lt"] == T.TimestampNTZType()
    assert by["u"] == T.StringType()   # unknown logical: underlying stands


def test_general_codec_roundtrip():
    assert decode_record(LOGICAL_AVSC, encode_record(LOGICAL_AVSC, ROW)) == ROW


def test_nullable_logical_roundtrip():
    row = dict(ROW, at_ms=None, at_us=None)
    assert decode_record(LOGICAL_AVSC, encode_record(LOGICAL_AVSC, row)) == row


def test_negative_pre_epoch_values():
    row = {"id": 1, "day": dt.date(1969, 12, 25),
           "at_ms": dt.datetime(1969, 7, 20, 20, 17, tzinfo=UTC),
           "at_us": dt.datetime(1, 1, 1, tzinfo=UTC),
           "amount": Decimal("-0.01")}
    assert decode_record(LOGICAL_AVSC, encode_record(LOGICAL_AVSC, row)) == row


def test_compiled_fast_paths_engage_and_match():
    """LOGICAL_AVSC is flat, so the compiled (non-general) per-row paths
    must engage — pinned by checking decode of the reference encoding."""
    from marmaray_spark.functions.avro_codec import _flat_record_steps
    steps = _flat_record_steps(LOGICAL_AVSC)
    assert steps is not None and steps[1][3] == {"lt": "date"}
    enc, dec = compile_encoder(LOGICAL_AVSC), compile_decoder(LOGICAL_AVSC)
    assert enc(ROW) == encode_record(LOGICAL_AVSC, ROW)
    assert dec(enc(ROW)) == ROW


def test_wire_layout_is_underlying_primitive():
    """Logical annotations change the VALUE surface, not the wire: the
    same bytes decode as plain primitives under the stripped schema."""
    plain = {"type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "day", "type": "int"},
        {"name": "at_ms", "type": ["null", "long"]},
        {"name": "at_us", "type": ["null", "long"]},
        {"name": "amount", "type": "bytes"},
    ]}
    raw = decode_record(plain, encode_record(LOGICAL_AVSC, ROW))
    assert raw["day"] == (ROW["day"] - dt.date(1970, 1, 1)).days
    assert raw["at_ms"] == int(ROW["at_ms"].timestamp() * 1000)
    assert int.from_bytes(raw["amount"], "big", signed=True) == 1234567


def test_decimal_scale_mismatch_is_codec_error():
    row = dict(ROW, amount=Decimal("1.234"))   # 3 fractional digits, scale 2
    with pytest.raises(AvroCodecError, match="scale"):
        encode_record(LOGICAL_AVSC, row)


def test_batch_decoder_parity_on_logical_schema():
    rows = [ROW,
            dict(ROW, id=8, at_ms=None, amount=Decimal("-99999999.99")),
            dict(ROW, id=9, day=dt.date(1970, 1, 1), amount=Decimal("0.00"))]
    payloads = [encode_record(LOGICAL_AVSC, r) for r in rows]
    payloads.append(b"\x02\x02")               # truncated
    batch = compile_batch_decoder(LOGICAL_AVSC)
    assert batch is not None
    cols, ok = batch(payloads)
    assert ok == [True, True, True, False]
    for i, r in enumerate(rows):
        for k, v in r.items():
            assert cols[k][i] == v, (k, i)
    assert all(cols[k][3] is None for k in cols)


def test_batch_encoder_parity_on_logical_schema():
    rows = [ROW, dict(ROW, id=8, at_ms=None, at_us=None,
                      amount=Decimal("0.05"))]
    names = [f["name"] for f in LOGICAL_AVSC["fields"]]
    cols = {n: [r[n] for r in rows] for n in names}
    enc = compile_batch_encoder(LOGICAL_AVSC)
    assert enc is not None
    got = enc(cols, len(rows))
    want = [encode_record(LOGICAL_AVSC, r) for r in rows]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.one_of(st.none(), st.integers(min_value=-(2**53), max_value=2**53)),
    st.decimals(min_value=Decimal("-9999999999.99"),
                max_value=Decimal("9999999999.99"), places=2),
)
def test_logical_roundtrip_property(days, us, amount):
    row = {"id": 0,
           "day": dt.date(1970, 1, 1) + dt.timedelta(days=min(max(days, -719162), 2932896)),
           "at_ms": None,
           "at_us": None if us is None
           else dt.datetime(1970, 1, 1, tzinfo=UTC) + dt.timedelta(microseconds=us),
           "amount": amount}
    assert decode_record(LOGICAL_AVSC, encode_record(LOGICAL_AVSC, row)) == row
    # batch decoder agrees
    cols, ok = compile_batch_decoder(LOGICAL_AVSC)(
        [encode_record(LOGICAL_AVSC, row)])
    assert ok == [True] and all(cols[k][0] == row[k] for k in row)


# -- resolving reader -------------------------------------------------------

def test_resolve_plain_writer_to_logical_reader():
    from marmaray_spark.functions.avro_compat import resolve_record
    writer = {"type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "day", "type": "int"},
    ]}
    reader = {"type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
    ]}
    payload = encode_record(writer, {"id": 3, "day": 19783})
    out = resolve_record(reader, writer, payload)
    assert out == {"id": 3, "day": dt.date(1970, 1, 1) + dt.timedelta(days=19783)}


def test_resolve_logical_writer_to_plain_reader():
    from marmaray_spark.functions.avro_compat import resolve_record
    reader = {"type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "at_ms", "type": "long"},
    ]}
    payload = encode_record(LOGICAL_AVSC, ROW)
    out = resolve_record(reader, LOGICAL_AVSC, payload)
    assert out == {"id": 7, "at_ms": int(ROW["at_ms"].timestamp() * 1000)}


def test_resolve_same_logical_identity_and_column_resolver():
    from marmaray_spark.functions.avro_compat import (compile_column_resolver,
                                                      resolve_record)
    payload = encode_record(LOGICAL_AVSC, ROW)
    assert resolve_record(LOGICAL_AVSC, LOGICAL_AVSC, payload) == ROW
    rc = compile_column_resolver(LOGICAL_AVSC, LOGICAL_AVSC)
    cols = {k: [v] for k, v in ROW.items()}
    out, ok = rc(cols, [True])
    assert ok == [True] and all(out[k][0] == ROW[k] for k in ROW)


def test_resolved_decode_spark_with_logical_types(spark):
    """Mixed writer versions (v1 plain long ticks, v2 timestamp-millis)
    resolving to a logical reader, through the Spark kernel."""
    from marmaray_spark.functions.avro_compat import decode_avro_resolved
    v1 = {"type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "at", "type": "long"}]}
    v2 = {"type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "at", "type": {"type": "long",
                                "logicalType": "timestamp-millis"}}]}
    t = dt.datetime(2024, 5, 6, 7, 8, 9, tzinfo=UTC)
    ms = int(t.timestamp() * 1000)
    df = spark.createDataFrame(
        [(encode_record(v1, {"id": 1, "at": ms}), 1),
         (encode_record(v2, {"id": 2, "at": t}), 2)],
        "value binary, writer_version int")
    out = {r["id"]: r for r in
           decode_avro_resolved(df, v2, {1: v1, 2: v2}).collect()}
    assert out[1]["__avro_ok__"] and out[2]["__avro_ok__"]
    naive = t.replace(tzinfo=None)
    for rid in (1, 2):
        got = out[rid]["at"]
        assert got.replace(tzinfo=None) == naive or \
            got.astimezone(UTC).replace(tzinfo=None) == naive


# -- Spark kernels e2e ------------------------------------------------------

def test_spark_encode_decode_roundtrip_logical(spark):
    src = spark.createDataFrame(
        [(1, dt.date(2024, 1, 2), dt.datetime(2024, 1, 2, 3, 4, 5),
          Decimal("10.50")),
         (2, dt.date(1999, 12, 31), None, Decimal("-0.25"))],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("day", T.DateType()),
            T.StructField("at_us", T.TimestampType()),
            T.StructField("amount", T.DecimalType(12, 2)),
        ]))
    avsc = {"type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "at_us", "type": ["null", {"type": "long",
                                            "logicalType": "timestamp-micros"}]},
        {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                    "precision": 12, "scale": 2}},
    ]}
    wire = encode_avro(src, avsc, out_col="payload")
    back = decode_avro(wire, avsc, value_col="payload") \
        .select("id", "day", "at_us", "amount")
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, src.collect()))
    assert got == want


# -- enum / fixed (named types on the wire) ---------------------------------

ENUM_FIXED_AVSC = {"type": "record", "name": "ef", "fields": [
    {"name": "color", "type": {"type": "enum", "name": "Color",
                               "symbols": ["RED", "GREEN", "BLUE"]}},
    {"name": "digest", "type": {"type": "fixed", "name": "MD5", "size": 4}},
    {"name": "price", "type": {"type": "fixed", "name": "Dec", "size": 5,
                               "logicalType": "decimal",
                               "precision": 10, "scale": 2}},
    {"name": "maybe", "type": ["null", {"type": "enum", "name": "Flag",
                                        "symbols": ["ON", "OFF"]}]},
]}

EF_ROW = {"color": "GREEN", "digest": b"\x01\x02\x03\x04",
          "price": Decimal("-12.34"), "maybe": "OFF"}


def test_enum_fixed_roundtrip():
    payload = encode_record(ENUM_FIXED_AVSC, EF_ROW)
    assert decode_record(ENUM_FIXED_AVSC, payload) == EF_ROW
    # fixed decimal occupies EXACTLY size bytes on the wire
    # enum GREEN = index 1 -> zigzag varint 0x02
    assert payload[0] == 0x02


def test_enum_fixed_structtype():
    by = {f.name: f.dataType for f in
          avro_to_structtype(ENUM_FIXED_AVSC).fields}
    assert by["color"] == T.StringType()
    assert by["digest"] == T.BinaryType()
    assert by["price"] == T.DecimalType(10, 2)


def test_enum_fixed_hostile_values():
    with pytest.raises(AvroCodecError, match="enum"):
        encode_record(ENUM_FIXED_AVSC, dict(EF_ROW, color="MAGENTA"))
    with pytest.raises(AvroCodecError, match="fixed"):
        encode_record(ENUM_FIXED_AVSC, dict(EF_ROW, digest=b"\x01"))
    with pytest.raises(AvroCodecError):
        encode_record(ENUM_FIXED_AVSC,
                      dict(EF_ROW, price=Decimal("99999999.99")
                           * 10**10))          # overflows 5 bytes
    good = encode_record(ENUM_FIXED_AVSC, EF_ROW)
    with pytest.raises(AvroCodecError):
        decode_record(ENUM_FIXED_AVSC, good[:3])   # truncated fixed
    with pytest.raises(AvroCodecError, match="enum index"):
        decode_record(ENUM_FIXED_AVSC, b"\x63" + good[1:])


def test_enum_fixed_spark_roundtrip(spark):
    src = [(("RED", b"\xAA\xBB\xCC\xDD", Decimal("7.77"), None)),
           (("BLUE", b"\x00\x00\x00\x00", Decimal("-0.05"), "ON"))]
    df = spark.createDataFrame(
        src, T.StructType([
            T.StructField("color", T.StringType()),
            T.StructField("digest", T.BinaryType()),
            T.StructField("price", T.DecimalType(10, 2)),
            T.StructField("maybe", T.StringType()),
        ]))
    wire = encode_avro(df, ENUM_FIXED_AVSC, out_col="p")
    back = decode_avro(wire, ENUM_FIXED_AVSC, value_col="p") \
        .select("color", "digest", "price", "maybe")
    assert sorted(map(tuple, back.collect()), key=str) == \
        sorted(src, key=str)


def test_out_of_range_logical_values_fork_not_crash():
    """A wire value past the logical domain (day count beyond year 9999)
    must produce ok=False through BOTH decoder paths, never a raw
    OverflowError (task-killer)."""
    plain = {"type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"}, {"name": "day", "type": "int"}]}
    logical = {"type": "record", "name": "ev", "fields": [
        {"name": "id", "type": "long"},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}}]}
    hostile = encode_record(plain, {"id": 1, "day": 2**30})   # ~2.9M years
    good = encode_record(plain, {"id": 2, "day": 100})
    with pytest.raises(AvroCodecError, match="out of range"):
        decode_record(logical, hostile)
    cols, ok = compile_batch_decoder(logical)([good, hostile])
    assert ok == [True, False]
    assert cols["day"][0] == dt.date(1970, 4, 11) and cols["day"][1] is None


def test_batch_decode_timestamps_beyond_ns_range():
    """Ticks outside pandas' datetime64[ns] window (year 2262+) must
    still decode exactly via the per-value fallback."""
    far = dt.datetime(2400, 6, 1, 12, 0, 0, tzinfo=UTC)
    row = dict(ROW, at_us=far, at_ms=None)
    cols, ok = compile_batch_decoder(LOGICAL_AVSC)(
        [encode_record(LOGICAL_AVSC, row)])
    assert ok == [True] and cols["at_us"][0] == far


# -- time-of-day / uuid logical types (r6) ----------------------------------
#
# Per the public spark-avro mapping, time-of-day surfaces as VALIDATED
# wire ticks (int ms / long us of day), not Spark TimeType: the engine
# probe showed observe()/deserialized-cache/string casts all raise
# UNSUPPORTED_TIME_TYPE on TIME columns in this Spark build, so a TIME
# surface could never ride the converter fork. datetime.time is accepted
# on ENCODE (the Arrow form of a TimeType input column).

TIME_UUID_AVSC = {"type": "record", "name": "tu", "fields": [
    {"name": "id", "type": "long"},
    {"name": "t_ms", "type": {"type": "int", "logicalType": "time-millis"}},
    {"name": "t_us", "type": ["null", {"type": "long",
                                       "logicalType": "time-micros"}]},
    {"name": "uid", "type": {"type": "string", "logicalType": "uuid"}},
]}

TU_IN = {"id": 1, "t_ms": dt.time(13, 45, 30, 250000),
         "t_us": dt.time(23, 59, 59, 999999),
         "uid": "f81d4fae-7dec-11d0-a765-00a0c91e6bf6"}
TU_WIRE = {"id": 1, "t_ms": 49530250, "t_us": 86399999999,
           "uid": "f81d4fae-7dec-11d0-a765-00a0c91e6bf6"}


def test_time_uuid_roundtrip_to_validated_ticks():
    payload = encode_record(TIME_UUID_AVSC, TU_IN)
    assert decode_record(TIME_UUID_AVSC, payload) == TU_WIRE
    # ticks-in == ticks-out as well
    assert decode_record(TIME_UUID_AVSC,
                         encode_record(TIME_UUID_AVSC, TU_WIRE)) == TU_WIRE


def test_time_uuid_wire_layout_is_underlying_primitive():
    plain = {"type": "record", "name": "tu", "fields": [
        {"name": "id", "type": "long"},
        {"name": "t_ms", "type": "int"},
        {"name": "t_us", "type": ["null", "long"]},
        {"name": "uid", "type": "string"}]}
    raw = decode_record(plain, encode_record(TIME_UUID_AVSC, TU_IN))
    assert raw == TU_WIRE


def test_time_uuid_structtype_mapping():
    st_ = avro_to_structtype(TIME_UUID_AVSC)
    assert isinstance(st_["t_ms"].dataType, T.IntegerType)
    assert isinstance(st_["t_us"].dataType, T.LongType)
    assert isinstance(st_["uid"].dataType, T.StringType)


def test_time_uuid_hostile_values_fork_not_crash():
    # out-of-day tick counts and non-RFC-4122 strings are codec errors
    bad_time = {"type": "record", "name": "t", "fields": [
        {"name": "t", "type": {"type": "int", "logicalType": "time-millis"}}]}
    payload = encode_record({"type": "record", "name": "t", "fields": [
        {"name": "t", "type": "int"}]}, {"t": 86_400_000})
    with pytest.raises(AvroCodecError):
        decode_record(bad_time, payload)
    with pytest.raises(AvroCodecError):
        encode_record(bad_time, {"t": -1})
    bad_uuid = {"type": "record", "name": "u", "fields": [
        {"name": "u", "type": {"type": "string", "logicalType": "uuid"}}]}
    with pytest.raises(AvroCodecError):
        encode_record(bad_uuid, {"u": "not-a-uuid"})
    payload = encode_record({"type": "record", "name": "u", "fields": [
        {"name": "u", "type": "string"}]}, {"u": "nope"})
    with pytest.raises(AvroCodecError):
        decode_record(bad_uuid, payload)


def test_time_uuid_batch_codec_parity():
    ins = [TU_IN,
           dict(TU_IN, id=2, t_us=None, t_ms=dt.time(0, 0)),
           dict(TU_IN, id=3, uid="00000000-0000-0000-0000-000000000000")]
    wires = [TU_WIRE,
             dict(TU_WIRE, id=2, t_us=None, t_ms=0),
             dict(TU_WIRE, id=3,
                  uid="00000000-0000-0000-0000-000000000000")]
    payloads = [encode_record(TIME_UUID_AVSC, r) for r in ins]
    # hostile rows: out-of-range time ticks / invalid uuid, wire-valid
    plain = {"type": "record", "name": "tu", "fields": [
        {"name": "id", "type": "long"},
        {"name": "t_ms", "type": "int"},
        {"name": "t_us", "type": ["null", "long"]},
        {"name": "uid", "type": "string"}]}
    payloads.append(encode_record(plain, {"id": 4, "t_ms": 86_400_000,
                                          "t_us": None, "uid": TU_WIRE["uid"]}))
    payloads.append(encode_record(plain, {"id": 5, "t_ms": 1, "t_us": 2,
                                          "uid": "zzz"}))
    batch = compile_batch_decoder(TIME_UUID_AVSC)
    assert batch is not None
    cols, ok = batch(payloads)
    assert ok == [True, True, True, False, False]
    for i, r in enumerate(wires):
        for k, v in r.items():
            assert cols[k][i] == v, (k, i)

    enc = compile_batch_encoder(TIME_UUID_AVSC)
    assert enc is not None
    names = [f["name"] for f in TIME_UUID_AVSC["fields"]]
    got = enc({n: [r[n] for r in ins] for n in names}, len(ins))
    assert got == [encode_record(TIME_UUID_AVSC, r) for r in ins]


def test_time_uuid_resolution_follows_reader():
    from marmaray_spark.functions.avro_compat import resolve_record

    # plain-int writer -> time-millis reader: value validated, ticks kept
    writer = {"type": "record", "name": "tu", "fields": [
        {"name": "t", "type": "int"}]}
    reader = {"type": "record", "name": "tu", "fields": [
        {"name": "t", "type": {"type": "int", "logicalType": "time-millis"}}]}
    payload = encode_record(writer, {"t": 1000})
    assert resolve_record(reader, writer, payload) == {"t": 1000}
    # ... and a HOSTILE plain value fails reader-side validation
    with pytest.raises(AvroCodecError):
        resolve_record(reader, writer, encode_record(writer, {"t": -5}))
    # time-micros writer -> plain long reader: ticks pass through
    w2 = {"type": "record", "name": "tu", "fields": [
        {"name": "t", "type": {"type": "long", "logicalType": "time-micros"}}]}
    r2 = {"type": "record", "name": "tu", "fields": [
        {"name": "t", "type": "long"}]}
    assert resolve_record(r2, w2, encode_record(w2, {"t": dt.time(0, 0, 2)})) \
        == {"t": 2_000_000}


def test_time_uuid_spark_roundtrip(spark):
    src = spark.createDataFrame(
        [(1, dt.time(1, 2, 3), dt.time(4, 5, 6, 789000),
          "f81d4fae-7dec-11d0-a765-00a0c91e6bf6"),
         (2, dt.time(0, 0), None,
          "00000000-0000-0000-0000-000000000000")],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("t_ms", T.TimeType()),
            T.StructField("t_us", T.TimeType()),
            T.StructField("uid", T.StringType()),
        ]))
    wire = encode_avro(src, TIME_UUID_AVSC, out_col="payload")
    back = decode_avro(wire, TIME_UUID_AVSC, value_col="payload") \
        .select("id", "t_ms", "t_us", "uid")
    got = {r["id"]: r for r in back.collect()}
    assert got[1]["t_ms"] == (1 * 3600 + 2 * 60 + 3) * 1000
    assert got[1]["t_us"] == ((4 * 3600 + 5 * 60 + 6) * 1000 + 789) * 1000
    assert got[1]["uid"] == "f81d4fae-7dec-11d0-a765-00a0c91e6bf6"
    assert got[2]["t_ms"] == 0 and got[2]["t_us"] is None
