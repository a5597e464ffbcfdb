"""Avro schema-resolution compatibility gate + resolving decode.

Mirrors the public Avro 1.x "Schema Resolution" rule table the way the
reference mirrors it operationally: non-backward-compatible schemas are
rejected at registration, incompatible-writer records route to the error
channel instead of failing the decode (README.md:55-57,
HDFSSchemaService.java:59-170)."""

import pytest
from pyspark.sql import functions as F

from marmaray_spark.functions.avro_codec import encode_record
from marmaray_spark.functions.avro_compat import (
    compat_errors,
    is_compatible,
    resolve_record,
)
from marmaray_spark.schema_registry import (
    FileSystemSchemaRegistry,
    SchemaCompatibilityError,
)


def rec(*fields) -> dict:
    return {"type": "record", "name": "r", "fields": list(fields)}


def f(name, typ, **kw) -> dict:
    return {"name": name, "type": typ, **kw}


# -- rule matrix ------------------------------------------------------------

@pytest.mark.parametrize("reader_t,writer_t,ok", [
    ("long", "int", True),       # widening promotions
    ("double", "int", True),
    ("double", "long", True),
    ("double", "float", True),
    ("float", "long", True),
    ("int", "long", False),      # narrowing rejected
    ("long", "double", False),
    ("float", "double", False),
    ("string", "bytes", True),   # string<->bytes promotable
    ("bytes", "string", True),
    ("string", "long", False),
    ("boolean", "boolean", True),
    ("boolean", "int", False),
])
def test_primitive_promotion_matrix(reader_t, writer_t, ok):
    assert is_compatible(rec(f("x", reader_t)), rec(f("x", writer_t))) is ok


def test_added_field_needs_default():
    v1 = rec(f("a", "long"))
    with_default = rec(f("a", "long"), f("b", "string", default="d"))
    without_default = rec(f("a", "long"), f("b", "string"))
    assert is_compatible(with_default, v1)
    errs = compat_errors(without_default, v1)
    assert errs and "no default" in errs[0]


def test_removed_field_is_fine_backward():
    v1 = rec(f("a", "long"), f("b", "string"))
    v2 = rec(f("a", "long"))           # reader ignores extra writer fields
    assert is_compatible(v2, v1)


def test_union_rules():
    nullable_long = rec(f("x", ["null", "long"]))
    plain_int = rec(f("x", "int"))
    nullable_int = rec(f("x", ["null", "int"]))
    # non-union writer into union reader: some branch must match
    assert is_compatible(nullable_long, plain_int)
    # union writer into union reader: EVERY writer branch must resolve
    assert is_compatible(nullable_long, nullable_int)
    assert not is_compatible(plain_int, nullable_int)  # null branch unreadable


def test_nested_record_array_map():
    inner_v1 = rec(f("n", "int"))
    inner_v2 = rec(f("n", "long"), f("tag", "string", default=""))
    v1 = rec(f("xs", {"type": "array", "items": inner_v1}),
             f("m", {"type": "map", "values": "int"}))
    v2 = rec(f("xs", {"type": "array", "items": inner_v2}),
             f("m", {"type": "map", "values": "long"}))
    assert is_compatible(v2, v1)
    assert not is_compatible(v1, v2)
    errs = compat_errors(v1, v2)
    assert any("$.xs[]" in e for e in errs) and any("$.m{}" in e for e in errs)


def test_enum_symbols():
    e1 = {"type": "enum", "name": "c", "symbols": ["A", "B"]}
    e2 = {"type": "enum", "name": "c", "symbols": ["A", "B", "C"]}
    assert is_compatible(rec(f("e", e2)), rec(f("e", e1)))
    assert not is_compatible(rec(f("e", e1)), rec(f("e", e2)))


# -- resolving decode -------------------------------------------------------

V1 = rec(f("id", ["null", "long"]), f("cents", ["null", "int"]))
V2 = rec(f("id", ["null", "long"]), f("cents", ["null", "long"]),
         f("src", "string", default="legacy"))


def test_resolve_record_defaults_and_widening():
    payload = encode_record(V1, {"id": 7, "cents": 42})
    out = resolve_record(V2, V1, payload)
    assert out == {"id": 7, "cents": 42, "src": "legacy"}


def test_registry_backward_gate(tmp_path):
    reg = FileSystemSchemaRegistry(tmp_path)
    reg.put_avro_schema("r", V1)
    reg.put_avro_schema("r", V2, compatibility="backward")
    narrowed = rec(f("id", ["null", "long"]), f("cents", ["null", "int"]),
                   f("src", "string", default="legacy"))
    with pytest.raises(SchemaCompatibilityError) as ei:
        reg.put_avro_schema("r", narrowed, compatibility="backward")
    assert "v2" in str(ei.value)          # names the offending old version
    # rejection left the registry untouched
    assert sorted(reg._avro_versions("r")) == [1, 2]


def test_resolving_reader_routes_incompatible_to_error(spark, tmp_path):
    reg = FileSystemSchemaRegistry(tmp_path)
    reg.put_avro_schema("r", V1)
    reg.put_avro_schema("r", V2, compatibility="backward")

    rows = [(encode_record(V1, {"id": i, "cents": i * 10}), 1)
            for i in range(5)]
    rows += [(encode_record(V2, {"id": 100 + i, "cents": i, "src": "s"}), 2)
             for i in range(3)]
    rows += [(encode_record(V1, {"id": 999, "cents": 1}), 9)]   # unknown ver
    rows += [(b"\x99" * 3, 1)]                                  # corrupt
    df = spark.createDataFrame(rows, "value binary, writer_version int")

    out = reg.get_resolving_reader("r")(df)
    ok = out.filter(F.col("__avro_ok__")).collect()
    bad = out.filter(~F.col("__avro_ok__")).collect()
    assert len(ok) == 8 and len(bad) == 2
    by_id = {r.id: r for r in ok}
    assert by_id[0].src == "legacy" and by_id[100].src == "s"
    assert by_id[3].cents == 30          # widened int -> long
    assert {r.writer_version for r in bad} == {9, 1}


# -- property tests: resolution laws over generated schemas -----------------

from hypothesis import given, settings
from hypothesis import strategies as st

_PRIM = st.sampled_from(["int", "long", "float", "double", "string",
                         "bytes", "boolean"])
_NAMES = st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=4),
                  min_size=1, max_size=5, unique=True)


@st.composite
def record_schemas(draw):
    names = draw(_NAMES)
    return rec(*[f(n, draw(_PRIM)) for n in names])


@given(record_schemas())
@settings(max_examples=50, deadline=None)
def test_self_compat_is_reflexive(schema):
    assert is_compatible(schema, schema)


@given(record_schemas())
@settings(max_examples=50, deadline=None)
def test_projection_always_backward(schema):
    """Dropping any suffix of fields keeps the reader compatible."""
    fields = schema["fields"]
    for cut in range(1, len(fields) + 1):
        assert is_compatible(rec(*fields[:cut]), schema)


_VALUES = {"int": 41, "long": 1 << 40, "float": 1.5, "double": 2.25,
           "string": "xyz", "bytes": b"\x01\x02", "boolean": True}
_WIDEN = {"int": "long", "float": "double"}


@given(record_schemas())
@settings(max_examples=50, deadline=None)
def test_resolving_decode_roundtrip_with_widening_and_default(schema):
    """Encode under the writer, read with a reader that widens every
    widenable field and appends a defaulted one: every original value
    survives (ints exactly; floats as floats), the default fills in."""
    value = {fl["name"]: _VALUES[fl["type"]] for fl in schema["fields"]}
    reader = rec(*[f(fl["name"], _WIDEN.get(fl["type"], fl["type"]))
                   for fl in schema["fields"]],
                 f("zz_added", "string", default="dflt"))
    assert is_compatible(reader, schema)
    out = resolve_record(reader, schema, encode_record(schema, value))
    assert out.pop("zz_added") == "dflt"
    for k, v in value.items():
        if isinstance(v, float):
            assert abs(out[k] - v) < 1e-6
        else:
            assert out[k] == v


# -- named-type resolution rules (name/alias match, refs, recursion) --------

def test_record_name_must_match_or_alias():
    r_named = {"type": "record", "name": "New",
               "fields": [{"name": "x", "type": "long"}]}
    w_named = {"type": "record", "name": "Old",
               "fields": [{"name": "x", "type": "long"}]}
    assert not is_compatible(r_named, w_named)
    aliased = dict(r_named, aliases=["Old"])
    assert is_compatible(aliased, w_named)
    # namespaces are ignored for matching (unqualified-name rule)
    assert is_compatible(dict(r_named, name="ns.a.Old"), w_named)


def test_enum_and_fixed_name_and_size_rules():
    re_ = {"type": "enum", "name": "ColorsNew", "symbols": ["R", "G"]}
    we = {"type": "enum", "name": "Colors", "symbols": ["R", "G"]}
    assert not is_compatible(rec(f("e", re_)), rec(f("e", we)))
    assert is_compatible(rec(f("e", dict(re_, aliases=["Colors"]))),
                         rec(f("e", we)))
    rf_ = {"type": "fixed", "name": "h", "size": 16}
    assert is_compatible(rec(f("x", rf_)), rec(f("x", dict(rf_))))
    assert not is_compatible(rec(f("x", rf_)),
                             rec(f("x", dict(rf_, size=32))))
    assert not is_compatible(rec(f("x", rf_)),
                             rec(f("x", dict(rf_, name="other"))))


def test_named_type_reference_resolves():
    # second field refers to the first field's record definition by name
    inner = {"type": "record", "name": "Point",
             "fields": [{"name": "x", "type": "long"}]}
    schema = {"type": "record", "name": "Seg", "fields": [
        {"name": "a", "type": inner},
        {"name": "b", "type": "Point"},
    ]}
    assert is_compatible(schema, schema)
    # widened copy on the reader side still resolves through the ref
    winner = {"type": "record", "name": "Point",
              "fields": [{"name": "x", "type": "int"}]}
    wschema = {"type": "record", "name": "Seg", "fields": [
        {"name": "a", "type": winner},
        {"name": "b", "type": "Point"},
    ]}
    assert is_compatible(schema, wschema)
    assert not is_compatible(wschema, schema)   # narrowing via the ref


def test_recursive_schema_terminates():
    def linked(extra_fields=()):
        return {"type": "record", "name": "Node", "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Node"]},
            *extra_fields,
        ]}
    assert compat_errors(linked(), linked()) == []
    # incompatibility inside the recursive type still surfaces
    widened = {"type": "record", "name": "Node", "fields": [
        {"name": "v", "type": "int"},
        {"name": "next", "type": ["null", "Node"]},
    ]}
    assert not is_compatible(widened, linked())


def test_enum_out_of_set_symbol_resolves_to_reader_default():
    from marmaray_spark.functions.avro_compat import _resolve_value

    reader_e = {"type": "enum", "name": "c", "symbols": ["A", "B"],
                "default": "A"}
    writer_e = {"type": "enum", "name": "c", "symbols": ["A", "B", "C"]}
    assert _resolve_value(reader_e, writer_e, "B") == "B"
    assert _resolve_value(reader_e, writer_e, "C") == "A"


# -- compiled decode/resolve fast paths -------------------------------------

@st.composite
def nullable_record_schemas(draw):
    names = draw(_NAMES)
    return rec(*[
        f(n, draw(_PRIM) if draw(st.booleans())
          else ["null", draw(_PRIM)])
        for n in names
    ])


@given(nullable_record_schemas(), st.data())
@settings(max_examples=50, deadline=None)
def test_compiled_decoder_matches_general(schema, data):
    from marmaray_spark.functions.avro_codec import (compile_decoder,
                                                     decode_record)

    value = {}
    for fl in schema["fields"]:
        t = fl["type"]
        if isinstance(t, list):
            value[fl["name"]] = (None if data.draw(st.booleans())
                                 else _VALUES[t[1]])
        else:
            value[fl["name"]] = _VALUES[t]
    payload = encode_record(schema, value)
    assert compile_decoder(schema)(payload) == decode_record(schema, payload)


def test_compiled_decoder_strictness_matches_general():
    from marmaray_spark.functions.avro_codec import (AvroCodecError,
                                                     compile_decoder,
                                                     decode_record)

    schema = rec(f("a", "long"), f("b", ["null", "string"]))
    payload = encode_record(schema, {"a": 7, "b": "x"})
    fast = compile_decoder(schema)
    for bad in (payload + b"\x00", payload[:-1], b""):
        with pytest.raises(AvroCodecError):
            fast(bad)
        with pytest.raises(AvroCodecError):
            decode_record(schema, bad)
    # nested record -> general decoder fallback, same results
    nested = rec(f("a", "long"), f("r", rec(f("x", "int"))))
    nested["fields"][1]["type"]["name"] = "inner"
    p2 = encode_record(nested, {"a": 1, "r": {"x": 2}})
    assert compile_decoder(nested)(p2) == decode_record(nested, p2)


@given(record_schemas())
@settings(max_examples=50, deadline=None)
def test_compiled_resolver_matches_general(schema):
    from marmaray_spark.functions.avro_compat import (_resolve_value,
                                                      compile_resolver)

    value = {fl["name"]: _VALUES[fl["type"]] for fl in schema["fields"]}
    reader = rec(*[f(fl["name"], _WIDEN.get(fl["type"], fl["type"]))
                   for fl in schema["fields"]],
                 f("zz_added", "string", default="dflt"))
    compiled = compile_resolver(reader, schema)
    assert compiled(dict(value)) == _resolve_value(reader, schema, dict(value))


def test_native_seam_absent_jar(spark):
    """No spark-avro jar in this container: auto falls back to the Python
    kernel (oracle-checked elsewhere), on raises cleanly."""
    from marmaray_spark.functions.avro_codec import AvroCodecError, encode_record
    from marmaray_spark.functions.avro_compat import (decode_avro_resolved,
                                                      native_from_avro_usable)

    if native_from_avro_usable(spark):
        pytest.skip("spark-avro present: native leg active")
    payload = encode_record(V1, {"id": 1, "cents": 5})
    df = spark.createDataFrame([(payload, 1)], "value binary, writer_version int")
    out = decode_avro_resolved(df, V2, {1: V1}).collect()
    assert out[0]["src"] == "legacy" and out[0]["__avro_ok__"]
    with pytest.raises(AvroCodecError, match="native=on"):
        decode_avro_resolved(df, V2, {1: V1}, native="on")


@given(nullable_record_schemas(), st.data())
@settings(max_examples=50, deadline=None)
def test_compiled_encoder_matches_general(schema, data):
    from marmaray_spark.functions.avro_codec import (compile_encoder,
                                                     encode_record)

    value = {}
    for fl in schema["fields"]:
        t = fl["type"]
        if isinstance(t, list):
            value[fl["name"]] = (None if data.draw(st.booleans())
                                 else _VALUES[t[1]])
        else:
            value[fl["name"]] = _VALUES[t]
    assert compile_encoder(schema)(value) == encode_record(schema, value)
