"""Avro reader/writer schema-resolution compatibility + resolving decode.

Reference parity: the reference rejects records whose schema is not
backward-compatible with the registered one into the error table
(README.md:55-57) and serves versioned schemas through HDFSSchemaService
(M/common/schema/HDFSSchemaService.java:59-170). The rules implemented
here are the PUBLIC Avro 1.x "Schema Resolution" spec:

- a reader field absent from the writer schema MUST carry a default,
  otherwise the pair is incompatible;
- writer fields absent from the reader are ignored (projection);
- numeric promotions int->long/float/double, long->float/double,
  float->double are allowed; narrowing is not;
- string<->bytes are mutually promotable;
- unions resolve if every writer branch resolves against some reader
  branch; a non-union writer resolves against a union reader if any
  branch matches.

``compat_errors`` returns the human-readable incompatibility list (empty
= compatible), ``resolve_record`` projects a writer-decoded dict onto
the reader schema (defaults + promotions applied), and
``decode_avro_resolved`` is the Arrow-batched Spark kernel that decodes
a binary column written under per-row writer versions against one
reader schema — incompatible writer versions come back ``ok=False`` so
the caller can fork them to the error channel instead of failing the
decode mid-stream.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from marmaray_spark.functions.avro_codec import (
    PRIMITIVES,
    AvroCodecError,
    avro_to_structtype,
    decode_record,
    parse_schema,
)


def _parse(avsc: Any) -> Any:
    # bare type names ("null", "long", ...) are valid Avro schemas but NOT
    # JSON documents — json.loads("null") is None, the rest raise
    if isinstance(avsc, str) and avsc in PRIMITIVES:
        return avsc
    return parse_schema(avsc)

_PROMOTIONS: dict[str, set[str]] = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "boolean": {"boolean"},
    "null": {"null"},
}


def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema.get("type", "?")


def _branches(schema: Any) -> list[Any]:
    return schema if isinstance(schema, list) else [schema]


def compat_errors(reader: Any, writer: Any, path: str = "$") -> list[str]:
    """Avro schema-resolution check: can data WRITTEN with ``writer`` be
    READ with ``reader``? Empty list = compatible."""
    reader, writer = _parse(reader), _parse(writer)

    # unions: every writer branch must resolve against some reader branch
    if isinstance(writer, list) or isinstance(reader, list):
        errs: list[str] = []
        for wb in _branches(writer):
            if not any(not compat_errors(rb, wb, path)
                       for rb in _branches(reader)):
                errs.append(f"{path}: writer branch {_type_name(wb)!r} has no "
                            f"compatible reader branch")
        return errs

    wt, rt = _type_name(writer), _type_name(reader)

    if wt == "record" and rt == "record":
        errs = []
        wfields = {f["name"]: f for f in writer.get("fields", [])}
        for rf in reader.get("fields", []):
            fname = rf["name"]
            if fname in wfields:
                errs.extend(compat_errors(rf["type"], wfields[fname]["type"],
                                          f"{path}.{fname}"))
            elif "default" not in rf:
                errs.append(f"{path}.{fname}: reader field missing from "
                            f"writer and has no default")
        return errs

    if wt == "array" and rt == "array":
        return compat_errors(reader["items"], writer["items"], f"{path}[]")
    if wt == "map" and rt == "map":
        return compat_errors(reader["values"], writer["values"], f"{path}{{}}")
    if wt == "enum" and rt == "enum":
        missing = set(writer.get("symbols", [])) - set(reader.get("symbols", []))
        if missing and "default" not in reader:
            return [f"{path}: writer enum symbols {sorted(missing)} unknown "
                    f"to reader (no enum default)"]
        return []

    if wt in _PROMOTIONS and rt in _PROMOTIONS[wt]:
        return []
    return [f"{path}: writer type {wt!r} not readable as {rt!r}"]


def is_compatible(reader: Any, writer: Any) -> bool:
    return not compat_errors(reader, writer)


def _resolve_value(reader: Any, writer: Any, val: Any) -> Any:
    """Project one writer-decoded value onto the reader schema (assumes
    compat_errors(reader, writer) == [])."""
    reader, writer = _parse(reader), _parse(writer)
    if val is None:
        return None
    if isinstance(writer, list):
        # decoded unions lose their branch tag; pick the reader branch by
        # the runtime type of the value
        writer = _runtime_branch(writer, val)
    if isinstance(reader, list):
        for rb in _branches(reader):
            if not compat_errors(rb, writer):
                return _resolve_value(rb, writer, val)
        return val

    wt, rt = _type_name(writer), _type_name(reader)
    if wt == "record":
        wfields = {f["name"]: f for f in writer.get("fields", [])}
        out = {}
        for rf in reader.get("fields", []):
            fname = rf["name"]
            if fname in wfields:
                out[fname] = _resolve_value(rf["type"], wfields[fname]["type"],
                                            val.get(fname))
            else:
                out[fname] = rf.get("default")
        return out
    if wt == "array":
        return [_resolve_value(reader["items"], writer["items"], v) for v in val]
    if wt == "map":
        return {k: _resolve_value(reader["values"], writer["values"], v)
                for k, v in val.items()}
    if rt in ("long", "int") and isinstance(val, int):
        return val
    if rt in ("float", "double"):
        return float(val)
    if rt == "string" and isinstance(val, bytes):
        return val.decode("utf-8", errors="replace")
    if rt == "bytes" and isinstance(val, str):
        return val.encode("utf-8")
    return val


def _runtime_branch(union: list, val: Any) -> Any:
    for b in union:
        t = _type_name(b)
        if val is None and t == "null":
            return b
        if isinstance(val, bool):
            if t == "boolean":
                return b
        elif isinstance(val, int) and t in ("int", "long"):
            return b
        elif isinstance(val, float) and t in ("float", "double"):
            return b
        elif isinstance(val, str) and t == "string":
            return b
        elif isinstance(val, bytes) and t == "bytes":
            return b
        elif isinstance(val, dict) and t in ("record", "map"):
            return b
        elif isinstance(val, list) and t == "array":
            return b
    return union[-1]


def resolve_record(reader: Any, writer: Any, payload: bytes) -> dict:
    """Decode ``payload`` (written under ``writer``) and project it onto
    ``reader`` — the Avro resolving-decoder contract."""
    rec = decode_record(writer, payload)
    out = _resolve_value(reader, writer, rec)
    if not isinstance(out, dict):
        raise AvroCodecError("resolved top-level value is not a record")
    return out


def decode_avro_resolved(df: DataFrame, reader_avsc: Any,
                         writers_by_version: dict[int, Any],
                         value_col: str = "value",
                         version_col: str = "writer_version",
                         ok_col: str = "__avro_ok__") -> DataFrame:
    """Resolving decode over mixed writer versions: each row's binary
    payload is decoded with ITS writer schema then projected onto the
    single reader schema (defaults filled, promotions widened).

    Rows whose writer version is unknown, incompatible with the reader,
    or whose payload is corrupt come back null-filled with ``ok=False``
    — the valid|error fork decides their fate downstream, mirroring the
    reference's route-incompatible-to-error-table behavior instead of a
    mid-decode job failure. Compatibility per distinct version is decided
    ONCE (driver-side, against the version dict) — the per-row kernel
    only dispatches on the precomputed verdicts."""
    reader = _parse(reader_avsc)
    writers = {int(v): _parse(s) for v, s in writers_by_version.items()}
    compat = {v: not compat_errors(reader, w) for v, w in writers.items()}
    out_struct = avro_to_structtype(reader)
    clash = [f.name for f in out_struct.fields if f.name in df.columns]
    if clash:
        raise AvroCodecError(f"decoded fields collide with input columns: {clash}")
    decoded_fields = [T.StructField(f.name, f.dataType, True)
                      for f in out_struct.fields]
    full = T.StructType(list(df.schema.fields) + decoded_fields
                        + [T.StructField(ok_col, T.BooleanType(), False)])
    names = [f.name for f in out_struct.fields]

    def kernel(batches) -> Iterator:
        import pandas as pd
        for pdf in batches:
            decoded: dict[str, list] = {n: [] for n in names}
            oks = []
            for payload, ver in zip(pdf[value_col], pdf[version_col]):
                rec: dict = {}
                ver = int(ver)
                if compat.get(ver, False):
                    try:
                        rec = resolve_record(reader, writers[ver],
                                             bytes(payload))
                        oks.append(True)
                    except (AvroCodecError, TypeError):
                        rec = {}
                        oks.append(False)
                else:
                    oks.append(False)
                for n in names:
                    decoded[n].append(rec.get(n))
            out = pdf.copy()
            for n in names:
                out[n] = decoded[n]
            out[ok_col] = oks
            yield out

    return df.mapInPandas(kernel, schema=full)
