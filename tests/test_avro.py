"""Avro wire codec + registry reader tests — modeled on the reference's
schema-service coverage (T/common/schema/: TestHDFSSchemaService reader
for latest and pinned versions, decode failures)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from marmaray_spark.converters import AvroDecodeConverter
from marmaray_spark.functions.avro_codec import (
    AvroCodecError,
    avro_to_structtype,
    decode_avro,
    decode_record,
    encode_avro,
    encode_record,
)
from marmaray_spark.schema_registry import (
    FileSystemSchemaRegistry,
    SchemaNotFoundError,
)

AVSC = {"type": "record", "name": "event", "fields": [
    {"name": "id", "type": "long"},
    {"name": "name", "type": ["null", "string"]},
    {"name": "score", "type": ["null", "double"]},
]}


# -- pure codec -------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1),
       st.one_of(st.none(), st.text(max_size=50)),
       st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False)))
def test_codec_roundtrip_property(i, s, f):
    rec = {"id": i, "name": s, "score": f}
    assert decode_record(AVSC, encode_record(AVSC, rec)) == rec


def test_codec_rejects_truncated_and_trailing():
    payload = encode_record(AVSC, {"id": 1, "name": "x", "score": 2.5})
    with pytest.raises(AvroCodecError):
        decode_record(AVSC, payload[:-1])
    with pytest.raises(AvroCodecError):
        decode_record(AVSC, payload + b"\x00")


def test_avro_to_structtype():
    st_ = avro_to_structtype(AVSC)
    assert st_.simpleString() == "struct<id:bigint,name:string,score:double>"
    assert [f.nullable for f in st_.fields] == [False, True, True]


# -- registry reader semantics (HDFSSchemaService.java:59-195) ---------------

def test_registry_avro_versions_latest_and_pinned(tmp_path):
    reg = FileSystemSchemaRegistry(tmp_path)
    v1 = dict(AVSC)
    v2 = {**AVSC, "fields": AVSC["fields"] + [
        {"name": "extra", "type": ["null", "long"]}]}
    assert reg.put_avro_schema("event", v1) == 1
    assert reg.put_avro_schema("event", v2) == 2
    assert len(reg.get_avro_schema("event")["fields"]) == 4          # latest
    assert len(reg.get_avro_schema("event", 1)["fields"]) == 3       # pinned
    with pytest.raises(SchemaNotFoundError):
        reg.get_avro_schema("event", 9)
    with pytest.raises(SchemaNotFoundError):
        reg.get_avro_schema("nope")
    with pytest.raises(FileExistsError):
        reg.put_avro_schema("event", v1, version=2)


def test_registry_reader_decodes_with_pinned_version(spark, tmp_path):
    reg = FileSystemSchemaRegistry(tmp_path)
    reg.put_avro_schema("event", AVSC)
    payloads = [(encode_record(AVSC, {"id": i, "name": f"n{i}", "score": i / 2}),)
                for i in range(5)]
    df = spark.createDataFrame(payloads, "value binary")
    out = reg.get_reader("event")(df)
    rows = {r["id"]: (r["name"], r["score"], r["__avro_ok__"])
            for r in out.collect()}
    assert rows == {i: (f"n{i}", i / 2, True) for i in range(5)}


# -- Spark kernels + converter fork ------------------------------------------

def test_encode_decode_spark_roundtrip(spark, customer):
    avsc = {"type": "record", "name": "cust", "fields": [
        {"name": "c_custkey", "type": ["null", "long"]},
        {"name": "c_name", "type": ["null", "string"]},
        {"name": "c_acctbal", "type": ["null", "double"]},
    ]}
    src = customer.select("c_custkey", "c_name", "c_acctbal").limit(200)
    wire = encode_avro(src, avsc, out_col="payload")
    back = decode_avro(wire, avsc, value_col="payload") \
        .select("c_custkey", "c_name", "c_acctbal")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_fused_roundtrip_matches_chained_path(spark, customer):
    """roundtrip_avro (one fused Arrow pass) must produce exactly the
    chained encode_avro -> decode_avro surface — same rows, same typed
    values, every row ok — including logical-typed fields (date /
    timestamp-micros / decimal), nulls, and an empty partition."""
    from marmaray_spark.functions.avro_codec import roundtrip_avro

    avsc = {"type": "record", "name": "cust", "fields": [
        {"name": "c_custkey", "type": ["null", "long"]},
        {"name": "c_name", "type": ["null", "string"]},
        {"name": "c_acctbal", "type": ["null", "double"]},
        {"name": "since", "type": ["null",
                                   {"type": "int", "logicalType": "date"}]},
    ]}
    src = (customer.select("c_custkey", "c_name", "c_acctbal")
           .limit(200)
           .withColumn("c_name", F.when(F.col("c_custkey") % 7 == 0,
                                        F.lit(None)).otherwise(F.col("c_name")))
           .withColumn("since", F.to_date(F.lit("2024-03-01")))
           .repartition(8))   # guarantees some empty/small partitions
    wire = encode_avro(src, avsc, out_col="payload")
    chained = decode_avro(wire, avsc, value_col="payload") \
        .select("c_custkey", "c_name", "c_acctbal", "since")
    fused = roundtrip_avro(src, avsc, ok_col="__ok")
    assert fused.filter(~F.col("__ok")).count() == 0
    got = fused.select("c_custkey", "c_name", "c_acctbal", "since")
    assert got.schema == chained.schema
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, chained.collect()))


def test_fused_roundtrip_rejects_missing_fields(spark, customer):
    from marmaray_spark.functions.avro_codec import roundtrip_avro

    avsc = {"type": "record", "name": "cust", "fields": [
        {"name": "nope", "type": ["null", "long"]}]}
    with pytest.raises(AvroCodecError, match="lacks schema fields"):
        roundtrip_avro(customer, avsc)


def test_converter_forks_malformed_payloads(spark, tmp_path):
    reg = FileSystemSchemaRegistry(tmp_path)
    reg.put_avro_schema("event", AVSC)
    good = [(encode_record(AVSC, {"id": i, "name": "ok", "score": 1.0}),)
            for i in range(3)]
    bad = [(b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff",), (b"",)]
    df = spark.createDataFrame(good + bad, "value binary")
    res = AvroDecodeConverter(reg, "event").map(df)
    assert res.valid_count == 3 and res.error_count == 2
    assert res.valid.filter(F.col("name") == "ok").count() == 3
    errs = res.errors.collect()
    assert len(errs) == 2
    assert all("avro" in r["hadoop_error_exception"].lower()
               or "avro" in str(r).lower() for r in errs)


# -- vectorized batch decoder ----------------------------------------------

WIDE_AVSC = {"type": "record", "name": "wide", "fields": [
    {"name": "id", "type": "long"},
    {"name": "name", "type": ["null", "string"]},
    {"name": "score", "type": ["null", "double"]},
    {"name": "flag", "type": "boolean"},
    {"name": "ratio", "type": "float"},
    {"name": "blob", "type": ["null", "bytes"]},
    {"name": "n", "type": ["null", "int"]},
]}


def _rowwise_reference(payloads):
    """What decode_avro's per-row loop would produce for these payloads."""
    from marmaray_spark.functions.avro_codec import compile_decoder
    dec = compile_decoder(WIDE_AVSC)
    names = [f["name"] for f in WIDE_AVSC["fields"]]
    cols = {n: [] for n in names}
    oks = []
    for p in payloads:
        try:
            rec = dec(bytes(p))
            oks.append(True)
        except (AvroCodecError, TypeError):
            rec = {}
            oks.append(False)
        for n in names:
            cols[n].append(rec.get(n))
    return cols, oks


def _assert_batch_matches(payloads):
    import math

    from marmaray_spark.functions.avro_codec import compile_batch_decoder
    batch = compile_batch_decoder(WIDE_AVSC)
    assert batch is not None
    got_cols, got_ok = batch(payloads)
    want_cols, want_ok = _rowwise_reference(payloads)
    assert list(got_ok) == want_ok
    for n in want_cols:
        assert len(got_cols[n]) == len(want_cols[n])
        for g, w in zip(got_cols[n], want_cols[n]):
            if isinstance(w, float) and math.isnan(w):
                assert isinstance(g, float) and math.isnan(float(g)), (n, g, w)
            elif w is None:
                assert g is None, (n, g, w)
            else:
                assert g == w, (n, g, w)


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.fixed_dictionaries({
        "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "name": st.one_of(st.none(), st.text(max_size=30)),
        "score": st.one_of(st.none(), st.floats(allow_nan=True,
                                                allow_infinity=True)),
        "flag": st.booleans(),
        "ratio": st.floats(allow_nan=False, allow_infinity=False,
                           width=32),
        "blob": st.one_of(st.none(), st.binary(max_size=20)),
        "n": st.one_of(st.none(),
                       st.integers(min_value=-(2**31), max_value=2**31 - 1)),
    }), max_size=25))
def test_batch_decoder_matches_rowwise_on_valid(recs):
    payloads = [encode_record(WIDE_AVSC, r) for r in recs]
    _assert_batch_matches(payloads)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(
    st.binary(max_size=40),                       # arbitrary garbage
    st.builds(lambda r, cut: encode_record(WIDE_AVSC, r)[:cut] if cut
              else encode_record(WIDE_AVSC, r) + b"\x00",
              st.fixed_dictionaries({
                  "id": st.integers(min_value=-10**9, max_value=10**9),
                  "name": st.one_of(st.none(), st.text(max_size=10)),
                  "score": st.one_of(st.none(), st.floats(allow_nan=False,
                                                          allow_infinity=False)),
                  "flag": st.booleans(),
                  "ratio": st.floats(allow_nan=False, allow_infinity=False,
                                     width=32),
                  "blob": st.one_of(st.none(), st.binary(max_size=8)),
                  "n": st.one_of(st.none(), st.integers(min_value=-100,
                                                        max_value=100)),
              }), st.integers(min_value=0, max_value=12)),
), max_size=25))
def test_batch_decoder_matches_rowwise_on_corrupt(payloads):
    """Truncations, trailing bytes, and garbage must produce EXACTLY the
    per-row decoder's ok/None outcomes (the slow-path fallback IS the
    per-row decoder, so parity is by construction — this pins it)."""
    _assert_batch_matches(payloads)


def test_batch_decoder_mixed_none_payloads():
    good = encode_record(WIDE_AVSC, {"id": 5, "name": "a", "score": 1.5,
                                     "flag": True, "ratio": 0.25,
                                     "blob": b"zz", "n": None})
    _assert_batch_matches([None, good, b"", good, None])


def test_batch_decoder_hostile_varints():
    """Over-long and 64-bit-overflowing varints route through the
    per-row decoder rather than silently wrapping."""
    good = encode_record(WIDE_AVSC, {"id": 1, "name": None, "score": None,
                                     "flag": False, "ratio": 0.0,
                                     "blob": None, "n": 3})
    hostile = [b"\xff" * 11,               # >10-byte varint for id
               b"\xff" * 9 + b"\x7f",      # 10-byte, high bits overflow
               good]
    _assert_batch_matches(hostile)


# -- vectorized batch encoder ----------------------------------------------

def _clean(v):
    return None if v is None or (isinstance(v, float) and v != v) else v


def _rowwise_encode(cols, n_rows):
    from marmaray_spark.functions.avro_codec import compile_encoder
    enc = compile_encoder(WIDE_AVSC)
    names = [f["name"] for f in WIDE_AVSC["fields"]]
    return [enc({n: _clean(cols[n][i]) for n in names}) for i in range(n_rows)]


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.fixed_dictionaries({
        "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "name": st.one_of(st.none(), st.text(max_size=30)),
        "score": st.one_of(st.none(), st.floats(allow_nan=False,
                                                allow_infinity=True)),
        "flag": st.booleans(),
        "ratio": st.floats(allow_nan=False, allow_infinity=False, width=32),
        "blob": st.one_of(st.none(), st.binary(max_size=20)),
        "n": st.one_of(st.none(),
                       st.integers(min_value=-(2**31), max_value=2**31 - 1)),
    }), max_size=25))
def test_batch_encoder_matches_rowwise(recs):
    """Flat-buffer scatter encode == the reference per-row encoder,
    byte for byte, over object columns (the shape Arrow hands the
    kernel when nulls are present)."""
    from marmaray_spark.functions.avro_codec import compile_batch_encoder
    names = [f["name"] for f in WIDE_AVSC["fields"]]
    cols = {n: [r[n] for r in recs] for n in names}
    batch = compile_batch_encoder(WIDE_AVSC)
    assert batch is not None
    assert batch(cols, len(recs)) == _rowwise_encode(cols, len(recs))


def test_batch_encoder_typed_numpy_columns():
    """int64/float64/bool dtype columns (the no-null Arrow shapes) take
    the fully vectorized paths and still match, including NaN-as-null
    in nullable float columns and truncation of integral floats feeding
    long fields."""
    import numpy as np
    import pandas as pd

    from marmaray_spark.functions.avro_codec import compile_batch_encoder
    n = 7
    cols = {
        "id": pd.Series(np.array([0, 1, -1, 2**62, -(2**62), 63, -64],
                                 np.int64)),
        "name": pd.Series(["a", None, "xyz", "", None, "q", "r"]),
        "score": pd.Series(np.array([1.5, np.nan, -0.0, 3e300, np.nan,
                                     0.125, -7.5], np.float64)),
        "flag": pd.Series(np.array([True, False, True, True, False, False,
                                    True], bool)),
        "ratio": pd.Series(np.array([0.25, -1.5, 0.0, 2.0, 3.5, -0.125, 1.0],
                                    np.float64)),
        "blob": pd.Series([b"", None, b"\x00\xff", b"abc", None, b"z", b". "]),
        "n": pd.Series(np.array([5.0, np.nan, -3.0, 100.0, np.nan, 0.0, -1.0],
                                np.float64)),   # nullable int as float col
    }
    batch = compile_batch_encoder(WIDE_AVSC)
    got = batch(cols, n)
    want = _rowwise_encode({k: list(v) for k, v in cols.items()}, n)
    # rowwise reference gets the same clean()-normalized values
    assert got == want


def test_batch_encoder_roundtrips_through_batch_decoder():
    from marmaray_spark.functions.avro_codec import (compile_batch_decoder,
                                                     compile_batch_encoder)
    names = [f["name"] for f in WIDE_AVSC["fields"]]
    rows = [
        {"id": 9, "name": "hello", "score": 2.25, "flag": True,
         "ratio": 0.5, "blob": b"\x01\x02", "n": -7},
        {"id": -(2**62), "name": None, "score": None, "flag": False,
         "ratio": -3.75, "blob": None, "n": None},
    ]
    cols = {n: [r[n] for r in rows] for n in names}
    enc = compile_batch_encoder(WIDE_AVSC)
    dec = compile_batch_decoder(WIDE_AVSC)
    out_cols, ok = dec(enc(cols, len(rows)))
    assert all(ok)
    for n in names:
        assert list(out_cols[n]) == cols[n]


# -- invalid-UTF-8 error contract (e2e) -------------------------------------

# id=1 (varint 0x02), name branch=string (0x02), len=1 (0x02), byte 0x80
# (not valid UTF-8), score=null (0x00): a syntactically well-formed wire
# record whose string payload is hostile. ONE such message must fork to
# the error channel, never kill the task (the reference routes any
# converter exception to the error table,
# M/common/converters/data/AbstractDataConverter.java:102-171).
HOSTILE_UTF8 = b"\x02\x02\x02\x80\x00"


def test_invalid_utf8_forks_to_error_channel_e2e(spark):
    good = [(encode_record(AVSC, {"id": i, "name": f"n{i}", "score": 1.0}),)
            for i in range(4)]
    df = spark.createDataFrame(good + [(HOSTILE_UTF8,)], "value binary")
    out = decode_avro(df, AVSC, value_col="value").collect()
    ok_rows = [r for r in out if r["__avro_ok__"]]
    bad_rows = [r for r in out if not r["__avro_ok__"]]
    assert len(ok_rows) == 4 and len(bad_rows) == 1
    assert sorted(r["id"] for r in ok_rows) == [0, 1, 2, 3]
    assert bad_rows[0]["name"] is None      # nulled, not corrupted


def test_invalid_utf8_forks_through_resolving_kernel(spark):
    from marmaray_spark.functions.avro_compat import decode_avro_resolved
    good = encode_record(AVSC, {"id": 7, "name": "ok", "score": 2.0})
    df = spark.createDataFrame(
        [(good, 1), (HOSTILE_UTF8, 1)], "value binary, writer_version int")
    out = decode_avro_resolved(df, AVSC, {1: AVSC}).collect()
    by_ok = {r["__avro_ok__"]: r for r in out}
    assert len(out) == 2 and True in by_ok and False in by_ok
    assert by_ok[True]["name"] == "ok"
    assert by_ok[False]["name"] is None


def test_invalid_utf8_rowwise_raises_codec_error():
    with pytest.raises(AvroCodecError, match="utf-8"):
        decode_record(AVSC, HOSTILE_UTF8)
