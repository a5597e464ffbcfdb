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
    _from_wire,
    _logical_of,
    _to_wire,
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


_NAMED_TYPES = ("record", "enum", "fixed")


def _unqual(name: str | None) -> str | None:
    return name.rsplit(".", 1)[-1] if name else name


def _fullname(schema: dict) -> str | None:
    name = schema.get("name")
    if not name:
        return None
    ns = schema.get("namespace")
    return name if ("." in name or not ns) else f"{ns}.{name}"


def _register(schema: Any, env: dict[str, Any]) -> None:
    """Record a named-type definition so later string references to its
    full or unqualified name resolve (Avro named-type references)."""
    if isinstance(schema, dict) and schema.get("type") in _NAMED_TYPES \
            and schema.get("name"):
        full = _fullname(schema)
        env[full] = schema
        env[_unqual(full)] = schema


def _deref(schema: Any, env: dict[str, Any]) -> Any:
    """Resolve a string type that is not a primitive as a reference to a
    previously defined named type; unknown references come back as-is
    (the caller reports them as unreadable)."""
    if isinstance(schema, str) and schema not in PRIMITIVES:
        return env.get(schema, env.get(_unqual(schema), schema))
    return schema


def _name_mismatch(reader: dict, writer: dict, path: str) -> list[str]:
    """Avro resolution: record/enum/fixed match only if the unqualified
    names are equal, or the writer's name is among the reader's aliases."""
    rn, wn = _unqual(reader.get("name")), _unqual(writer.get("name"))
    if rn is None or wn is None or rn == wn:
        return []
    aliases = {_unqual(a) for a in reader.get("aliases", [])}
    if wn in aliases:
        return []
    return [f"{path}: writer {reader.get('type')} name {wn!r} does not match "
            f"reader name {rn!r} or its aliases"]


def compat_errors(reader: Any, writer: Any, path: str = "$") -> list[str]:
    """Avro schema-resolution check: can data WRITTEN with ``writer`` be
    READ with ``reader``? Empty list = compatible.

    Implements the named-type rules too: record/enum/fixed names (or
    reader aliases) must match, string references to earlier named
    definitions resolve, and recursive schemas terminate through a
    visited-(reader,writer)-pair guard (co-inductive: a revisited pair
    is compatible unless some other path proves otherwise)."""
    return _compat(_parse(reader), _parse(writer), path, {}, {}, set())


def _compat(reader: Any, writer: Any, path: str,
            renv: dict[str, Any], wenv: dict[str, Any],
            visited: set[tuple[int, int]]) -> list[str]:
    reader, writer = _deref(reader, renv), _deref(writer, wenv)
    _register(reader, renv)
    _register(writer, wenv)

    # unions: every writer branch must resolve against some reader branch
    if isinstance(writer, list) or isinstance(reader, list):
        errs: list[str] = []
        for wb in _branches(writer):
            if not any(not _compat(rb, wb, path, dict(renv), dict(wenv),
                                   set(visited))
                       for rb in _branches(reader)):
                errs.append(f"{path}: writer branch {_type_name(wb)!r} has no "
                            f"compatible reader branch")
        return errs

    wt, rt = _type_name(writer), _type_name(reader)

    if wt == "record" and rt == "record":
        errs = _name_mismatch(reader, writer, path)
        if errs:
            return errs
        # keyed on OBJECT identity, not names: a recursive reference
        # dereferences to the same dict, while two distinct nested records
        # that happen to share a name stay distinguishable
        pair = (id(reader), id(writer))
        if pair in visited:           # recursive schema: already being checked
            return []
        visited = visited | {pair}
        wfields = {f["name"]: f for f in writer.get("fields", [])}
        for rf in reader.get("fields", []):
            fname = rf["name"]
            if fname in wfields:
                errs.extend(_compat(rf["type"], wfields[fname]["type"],
                                    f"{path}.{fname}", renv, wenv, visited))
            elif "default" not in rf:
                errs.append(f"{path}.{fname}: reader field missing from "
                            f"writer and has no default")
        return errs

    if wt == "array" and rt == "array":
        return _compat(reader["items"], writer["items"], f"{path}[]",
                       renv, wenv, visited)
    if wt == "map" and rt == "map":
        return _compat(reader["values"], writer["values"], f"{path}{{}}",
                       renv, wenv, visited)
    if wt == "enum" and rt == "enum":
        errs = _name_mismatch(reader, writer, path)
        if errs:
            return errs
        missing = set(writer.get("symbols", [])) - set(reader.get("symbols", []))
        if missing and "default" not in reader:
            return [f"{path}: writer enum symbols {sorted(missing)} unknown "
                    f"to reader (no enum default)"]
        return []
    if wt == "fixed" and rt == "fixed":
        errs = _name_mismatch(reader, writer, path)
        if errs:
            return errs
        if reader.get("size") != writer.get("size"):
            return [f"{path}: fixed size {writer.get('size')} != reader "
                    f"size {reader.get('size')}"]
        return []

    if wt in _PROMOTIONS and rt in _PROMOTIONS[wt]:
        return []
    return [f"{path}: writer type {wt!r} not readable as {rt!r}"]


def is_compatible(reader: Any, writer: Any) -> bool:
    return not compat_errors(reader, writer)


def _resolve_value(reader: Any, writer: Any, val: Any,
                   renv: dict[str, Any] | None = None,
                   wenv: dict[str, Any] | None = None) -> Any:
    """Project one writer-decoded value onto the reader schema (assumes
    compat_errors(reader, writer) == []). Recursion is bounded by VALUE
    depth, so recursive schemas terminate; named references resolve
    through the same environments as the compat check."""
    renv = {} if renv is None else renv
    wenv = {} if wenv is None else wenv
    reader = _deref(_parse(reader), renv)
    writer = _deref(_parse(writer), wenv)
    _register(reader, renv)
    _register(writer, wenv)
    if val is None:
        return None
    if isinstance(writer, list):
        # decoded unions lose their branch tag; pick the reader branch by
        # the runtime type of the value
        writer = _runtime_branch(writer, val)
    if isinstance(reader, list):
        for rb in _branches(reader):
            if not compat_errors(rb, writer):
                return _resolve_value(rb, writer, val, renv, wenv)
        return val

    wt, rt = _type_name(writer), _type_name(reader)
    if wt == "record":
        wfields = {f["name"]: f for f in writer.get("fields", [])}
        out = {}
        for rf in reader.get("fields", []):
            fname = rf["name"]
            if fname in wfields:
                out[fname] = _resolve_value(rf["type"], wfields[fname]["type"],
                                            val.get(fname), renv, wenv)
            else:
                out[fname] = rf.get("default")
        return out
    if wt == "array":
        return [_resolve_value(reader["items"], writer["items"], v, renv, wenv)
                for v in val]
    if wt == "map":
        return {k: _resolve_value(reader["values"], writer["values"], v,
                                  renv, wenv)
                for k, v in val.items()}
    if rt == "enum":
        # a writer symbol outside the reader's set resolves to the
        # reader's enum default (the rule the compat check relied on)
        if val in set(reader.get("symbols", [])):
            return val
        return reader.get("default")
    # logical types: resolution matched on UNDERLYING types (spec), but
    # the value surface follows the READER's logical annotation — a
    # logical-typed writer value converts back to wire form for a plain
    # reader, and a plain writer primitive converts forward for a
    # logical reader
    rlg, wlg = _logical_of(reader), _logical_of(writer)
    if rlg is not None and wlg is not None:
        # both logical: the decoded value surface (date/datetime/Decimal)
        # is already the reader's surface — even across
        # millis<->micros or scale changes, the VALUE is the number
        return val
    if rlg is not None:
        # plain writer primitive -> logical reader surface
        return _from_wire(rlg, val)
    if wlg is not None:
        # logical writer -> plain reader: back to the wire primitive;
        # the standard coercions below finish the job
        val = _to_wire(wlg, val)
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


def _simple_coercer(reader: Any, writer: Any):
    """A fast per-value callable when both types are primitives or
    ["null", primitive] unions; None when the pair needs the general
    (schema-walking) resolver."""
    def prim(s):
        if isinstance(s, str) and s in PRIMITIVES:
            return s
        if isinstance(s, list):
            nn = [b for b in s if b != "null"]
            if "null" in s and len(nn) == 1:
                return prim(nn[0])
        if _logical_of(s) is not None:
            # matching logical pairs are identity at the value surface;
            # mixed logical/plain pairs take the general resolver
            return ("logical", s.get("logicalType"))
        return None

    rt, wt = prim(reader), prim(writer)
    if rt is None or wt is None:
        return None
    if isinstance(rt, tuple) or isinstance(wt, tuple):
        if isinstance(rt, tuple) and isinstance(wt, tuple):
            return lambda v: v
        return None
    if rt in ("int", "long", "boolean", "null"):
        return lambda v: v
    if rt in ("float", "double"):
        return lambda v: None if v is None else float(v)
    if rt == "string":
        return lambda v: v.decode("utf-8", errors="replace") \
            if isinstance(v, bytes) else v
    if rt == "bytes":
        return lambda v: v.encode("utf-8") if isinstance(v, str) else v
    return lambda v: v


def compile_resolver(reader: Any, writer: Any):
    """Precompute the field-resolution plan for one (reader, writer) pair
    — returns ``fn(writer_decoded_dict) -> reader_dict``.

    ``_resolve_value`` re-walks both schema trees for EVERY value; in the
    mixed-version decode kernel that walk happened per row. Compiling
    turns the per-row work into a flat loop of (name, coercer|default)
    slots: primitives/nullable-primitives get closure-free coercers,
    anything deeper falls back to the general resolver for just that
    field. Assumes compat_errors(reader, writer) == [] (the kernel checks
    per-version before compiling)."""
    reader, writer = _parse(reader), _parse(writer)
    if _type_name(reader) != "record" or _type_name(writer) != "record":
        return lambda v: _resolve_value(reader, writer, v)
    plan = _resolver_plan(reader, writer)

    def resolve(rec: dict) -> dict:
        return {fname: (co(rec.get(fname)) if co is not None else default)
                for fname, co, default in plan}

    return resolve


def _resolver_plan(reader: dict, writer: dict) -> "list[tuple[str, Any, Any]]":
    wfields = {f["name"]: f for f in writer.get("fields", [])}
    plan: list[tuple[str, Any, Any]] = []
    for rf in reader.get("fields", []):
        fname = rf["name"]
        if fname not in wfields:
            plan.append((fname, None, rf.get("default")))
            continue
        rt, wt = rf["type"], wfields[fname]["type"]
        co = _simple_coercer(rt, wt)
        if co is None:
            co = (lambda rt=rt, wt=wt:
                  lambda v: _resolve_value(rt, wt, v))()
        plan.append((fname, co, None))
    return plan


def compile_column_resolver(reader: Any, writer: Any):
    """Column-wise twin of ``compile_resolver`` for record/record pairs:
    ``fn(cols, ok) -> (reader_cols, ok2)`` applies each field's
    coercer/default down a whole decoded column instead of rebuilding a
    dict per row. A value the coercer rejects fails ITS row exactly like
    the per-row resolver (whole row nulled, ok2=False). None when either
    side is not a record (the kernel keeps the per-row path)."""
    reader, writer = _parse(reader), _parse(writer)
    if _type_name(reader) != "record" or _type_name(writer) != "record":
        return None
    plan = _resolver_plan(reader, writer)

    def resolve_cols(cols: dict, ok: list) -> tuple[dict, list]:
        n = len(ok)
        ok2 = list(ok)
        out: dict[str, list] = {}
        for fname, co, default in plan:
            if co is None:
                out[fname] = [default if k else None for k in ok2]
                continue
            src = cols.get(fname, None) or [None] * n
            res = [None] * n
            for i, k in enumerate(ok2):
                if not k:
                    continue
                try:
                    res[i] = co(src[i])
                except (AvroCodecError, TypeError, UnicodeDecodeError):
                    # the same two classes the per-row kernel catches;
                    # anything else propagates there and must here too
                    ok2[i] = False
            out[fname] = res
        for i in range(n):
            if ok[i] and not ok2[i]:        # failed mid-plan: null the row
                for fname in out:
                    out[fname][i] = None
        return out, ok2

    return resolve_cols


def native_from_avro_usable(spark) -> bool:
    """True when the spark-avro jar is on the session's classpath —
    constructing a ``from_avro`` column touches the JVM class, so an
    absent jar fails here, cheaply, instead of mid-job."""
    try:
        from pyspark.sql import functions as F
        from pyspark.sql.avro.functions import from_avro
        col = from_avro(F.lit(b""),
                        '{"type":"record","name":"t","fields":[]}')
        spark.range(1).select(col).schema
        return True
    except Exception:
        return False


def _decode_native(df: DataFrame, reader: Any, writers: dict[int, Any],
                   compat: dict[int, bool], out_struct: T.StructType,
                   value_col: str, version_col: str,
                   ok_col: str) -> DataFrame:
    """JVM-side resolving decode via spark-avro: one ``from_avro`` leg
    per writer version (versions are few; rows are many), projected onto
    the reader fields with defaults/promotions as column expressions,
    unioned back. No Python in the per-row path at all."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.avro.functions import from_avro

    rfields = {f["name"]: f for f in reader.get("fields", [])}
    spark_type = {f.name: f.dataType for f in out_struct.fields}
    legs = []
    for ver, writer in writers.items():
        leg = df.filter(F.col(version_col) == ver)
        if not compat.get(ver, False):
            proj = [F.lit(None).cast(spark_type[n]).alias(n)
                    for n in spark_type]
            legs.append(leg.select("*", *proj,
                                   F.lit(False).alias(ok_col)))
            continue
        wnames = {f["name"] for f in writer.get("fields", [])}
        rec = from_avro(F.col(value_col), _json.dumps(writer),
                        {"mode": "PERMISSIVE"})
        leg = leg.withColumn("__rec__", rec)
        proj = []
        for n in spark_type:
            if n in wnames:
                proj.append(F.col(f"__rec__.{n}").cast(spark_type[n])
                            .alias(n))
            else:
                proj.append(F.lit(rfields[n].get("default"))
                            .cast(spark_type[n]).alias(n))
        legs.append(leg.select(*df.columns, *proj,
                               F.col("__rec__").isNotNull().alias(ok_col)))
    known = list(writers)
    unknown = df.filter(~F.col(version_col).isin(known)).select(
        "*", *[F.lit(None).cast(spark_type[n]).alias(n) for n in spark_type],
        F.lit(False).alias(ok_col))
    out = unknown
    for leg in legs:
        out = out.unionByName(leg)
    return out


def decode_avro_resolved(df: DataFrame, reader_avsc: Any,
                         writers_by_version: dict[int, Any],
                         value_col: str = "value",
                         version_col: str = "writer_version",
                         ok_col: str = "__avro_ok__",
                         native: str = "auto") -> DataFrame:
    """Resolving decode over mixed writer versions: each row's binary
    payload is decoded with ITS writer schema then projected onto the
    single reader schema (defaults filled, promotions widened).

    Rows whose writer version is unknown, incompatible with the reader,
    or whose payload is corrupt come back null-filled with ``ok=False``
    — the valid|error fork decides their fate downstream, mirroring the
    reference's route-incompatible-to-error-table behavior instead of a
    mid-decode job failure. Compatibility per distinct version is decided
    ONCE (driver-side, against the version dict) — the per-row kernel
    only dispatches on the precomputed verdicts.

    ``native``: "auto" uses the spark-avro jar's ``from_avro`` when it is
    on the classpath (per-version JVM decode legs, zero Python per row —
    the 100 TB path), falling back to the pure-Python Arrow kernel in
    codec-less containers; "off" forces the Python kernel; "on" requires
    the jar. The Python kernel itself runs per-version decoders and
    resolvers COMPILED once on the driver (compile_decoder /
    compile_resolver), not a schema walk per row."""
    reader = _parse(reader_avsc)
    writers = {int(v): _parse(s) for v, s in writers_by_version.items()}
    compat = {v: not compat_errors(reader, w) for v, w in writers.items()}
    out_struct = avro_to_structtype(reader)
    clash = [f.name for f in out_struct.fields if f.name in df.columns]
    if clash:
        raise AvroCodecError(f"decoded fields collide with input columns: {clash}")

    if native not in ("auto", "on", "off"):
        raise ValueError(f"native must be auto/on/off, got {native!r}")
    if native in ("auto", "on"):
        usable = native_from_avro_usable(df.sparkSession)
        if native == "on" and not usable:
            raise AvroCodecError("native=on but the spark-avro jar is not "
                                 "on the classpath")
        if usable:
            return _decode_native(df, reader, writers, compat, out_struct,
                                  value_col, version_col, ok_col)

    decoded_fields = [T.StructField(f.name, f.dataType, True)
                      for f in out_struct.fields]
    full = T.StructType(list(df.schema.fields) + decoded_fields
                        + [T.StructField(ok_col, T.BooleanType(), False)])
    names = [f.name for f in out_struct.fields]
    from marmaray_spark.functions.avro_codec import compile_decoder
    decoders = {v: compile_decoder(w) for v, w in writers.items()
                if compat[v]}
    resolvers = {v: compile_resolver(reader, w) for v, w in writers.items()
                 if compat[v]}

    from marmaray_spark.functions.avro_codec import compile_batch_decoder
    batch_decoders = {v: compile_batch_decoder(w)
                      for v, w in writers.items() if compat[v]}
    col_resolvers = {v: compile_column_resolver(reader, w)
                     for v, w in writers.items() if compat[v]}

    def kernel(batches) -> Iterator:
        import pandas as pd

        def group(payload_group, ver):
            """-> (reader_cols, ok_list) for one writer version's rows."""
            dec_b = batch_decoders.get(ver)
            col_resolve = col_resolvers.get(ver)
            if dec_b is not None and col_resolve is not None:
                # vectorized wire parse, then column-wise resolution
                # (defaults/promotions applied down whole columns)
                return col_resolve(*dec_b(payload_group))
            decode, resolve = decoders[ver], resolvers[ver]
            cols = {n: [None] * len(payload_group) for n in names}
            ok = [False] * len(payload_group)
            for i, payload in enumerate(payload_group):
                try:
                    rec = resolve(decode(bytes(payload)))
                except (AvroCodecError, TypeError, UnicodeDecodeError):
                    continue
                for n in names:
                    cols[n][i] = rec.get(n)
                ok[i] = True
            return cols, ok

        for pdf in batches:
            n_rows = len(pdf)
            payloads = list(pdf[value_col])
            vers = [int(v) for v in pdf[version_col]]
            distinct = set(vers)
            if len(distinct) == 1 and next(iter(distinct)) in decoders:
                # steady state: one writer version per batch — columns
                # pass straight through, no per-row scatter at all
                decoded, oks = group(payloads, next(iter(distinct)))
            else:
                decoded = {n: [None] * n_rows for n in names}
                oks = [False] * n_rows
                for ver in distinct:
                    if ver not in decoders:  # unknown/incompatible
                        continue
                    idxs = [i for i, v in enumerate(vers) if v == ver]
                    gcols, gok = group([payloads[i] for i in idxs], ver)
                    for gi, i in enumerate(idxs):
                        if gok[gi]:
                            oks[i] = True
                            for n in names:
                                decoded[n][i] = gcols[n][gi]
            out = pdf.copy()
            for n in names:
                out[n] = decoded[n]
            out[ok_col] = oks
            yield out

    return df.mapInPandas(kernel, schema=full)
