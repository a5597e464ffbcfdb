"""Versioned schema registry on a filesystem directory.

Reference parity: HDFSSchemaService reads versioned ``<name>.<version>.avsc``
files from an HDFS dir, serving the max version unless one is pinned
(M/common/schema/HDFSSchemaService.java:59-170); readers decode Kafka
byte[] payloads against the registered schema
(ISchemaService.ISchemaServiceReader, getReader :173-195).

Two schema currencies live side by side in one directory:

- ``<name>.<version>.json`` — StructType JSON, the engine's native
  schema; decode path ``from_json`` (JsonDecodeConverter).
- ``<name>.<version>.avsc`` — Avro record schemas for binary wire
  payloads (the reference's canonical Kafka format); decode path
  ``get_reader(...)`` -> functions/avro_codec.decode_avro.

Both serve max-version-unless-pinned, the HDFSSchemaService contract.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_FILE_RE = re.compile(r"^(?P<name>.+)\.(?P<version>\d+)\.json$")
_AVSC_RE = re.compile(r"^(?P<name>.+)\.(?P<version>\d+)\.avsc$")


class SchemaNotFoundError(KeyError):
    pass


class SchemaCompatibilityError(ValueError):
    """New schema version cannot read data written under an existing one."""


class FileSystemSchemaRegistry:
    def __init__(self, directory: str | Path) -> None:
        self.directory = Path(directory)

    def _versions(self, name: str) -> dict[int, Path]:
        out: dict[int, Path] = {}
        if not self.directory.is_dir():
            return out
        for p in self.directory.iterdir():
            m = _FILE_RE.match(p.name)
            if m and m.group("name") == name:
                out[int(m.group("version"))] = p
        return out

    def list_schemas(self) -> list[str]:
        names = set()
        if self.directory.is_dir():
            for p in self.directory.iterdir():
                m = _FILE_RE.match(p.name)
                if m:
                    names.add(m.group("name"))
        return sorted(names)

    def latest_version(self, name: str) -> int:
        versions = self._versions(name)
        if not versions:
            raise SchemaNotFoundError(f"no schema files for {name!r}")
        return max(versions)

    def get_schema(self, name: str, version: int | None = None) -> T.StructType:
        """Max version unless pinned (HDFSSchemaService.java:122-147)."""
        versions = self._versions(name)
        if not versions:
            raise SchemaNotFoundError(f"no schema files for {name!r}")
        v = version if version is not None else max(versions)
        if v not in versions:
            raise SchemaNotFoundError(f"schema {name!r} has no version {v}")
        return T.StructType.fromJson(json.loads(versions[v].read_text()))

    def put_schema(self, name: str, schema: T.StructType,
                   version: int | None = None) -> int:
        """Register a new version (next sequential unless given)."""
        self.directory.mkdir(parents=True, exist_ok=True)
        versions = self._versions(name)
        v = version if version is not None else (max(versions) + 1 if versions else 1)
        if v in versions:
            raise FileExistsError(f"schema {name!r} version {v} already exists")
        (self.directory / f"{name}.{v}.json").write_text(json.dumps(schema.jsonValue()))
        return v

    # -- Avro (.avsc) leg — HDFSSchemaService.java:59-170 semantics --------

    def _avro_versions(self, name: str) -> dict[int, Path]:
        out: dict[int, Path] = {}
        if not self.directory.is_dir():
            return out
        for p in self.directory.iterdir():
            m = _AVSC_RE.match(p.name)
            if m and m.group("name") == name:
                out[int(m.group("version"))] = p
        return out

    def put_avro_schema(self, name: str, avsc: str | dict,
                        version: int | None = None,
                        compatibility: str = "none") -> int:
        """Register an Avro record schema version (``<name>.<version>.avsc``).

        ``compatibility='backward'`` enforces the registry-side evolution
        gate: the NEW schema must be able to READ data written under every
        already-registered version (Avro schema-resolution rules —
        functions/avro_compat.py). Incompatible registrations raise
        ``SchemaCompatibilityError`` with the rule-by-rule reasons, the
        registry-side half of the reference's
        reject-non-backward-compatible contract (README.md:55-57)."""
        from marmaray_spark.functions.avro_codec import parse_schema

        schema = parse_schema(avsc)
        if not (isinstance(schema, dict) and schema.get("type") == "record"):
            raise ValueError("avsc must be a record schema")
        versions = self._avro_versions(name)
        if compatibility == "backward" and versions:
            from marmaray_spark.functions.avro_compat import compat_errors
            problems = []
            for old_v in sorted(versions):
                old = json.loads(versions[old_v].read_text())
                problems += [f"v{old_v}: {e}" for e in compat_errors(schema, old)]
            if problems:
                raise SchemaCompatibilityError(
                    f"schema {name!r} is not backward-compatible: "
                    + "; ".join(problems))
        elif compatibility not in ("none", "backward"):
            raise ValueError(f"unknown compatibility mode {compatibility!r}")
        self.directory.mkdir(parents=True, exist_ok=True)
        v = version if version is not None else (max(versions) + 1 if versions else 1)
        if v in versions:
            raise FileExistsError(f"avro schema {name!r} version {v} already exists")
        (self.directory / f"{name}.{v}.avsc").write_text(json.dumps(schema))
        return v

    def get_avro_schema(self, name: str, version: int | None = None) -> dict:
        """Max version unless pinned (HDFSSchemaService.java:122-147)."""
        versions = self._avro_versions(name)
        if not versions:
            raise SchemaNotFoundError(f"no .avsc files for {name!r}")
        v = version if version is not None else max(versions)
        if v not in versions:
            raise SchemaNotFoundError(f"avro schema {name!r} has no version {v}")
        return json.loads(versions[v].read_text())

    def get_reader(self, name: str, version: int | None = None,
                   value_col: str = "value") -> Callable[[DataFrame], DataFrame]:
        """Decode callable for Avro-binary payloads against the registered
        schema — HDFSSchemaService.getReader (:173-195): explicit version
        when pinned, latest otherwise. The returned function maps a
        DataFrame with a binary ``value_col`` to one with typed decoded
        columns plus the ``__avro_ok__`` corruption marker."""
        from marmaray_spark.functions.avro_codec import decode_avro

        schema = self.get_avro_schema(name, version)
        return lambda df: decode_avro(df, schema, value_col=value_col)

    def get_resolving_reader(self, name: str, version: int | None = None,
                             value_col: str = "value",
                             version_col: str = "writer_version",
                             ) -> Callable[[DataFrame], DataFrame]:
        """Decode payloads written under ANY registered version against one
        reader schema (latest unless pinned), per-row dispatch on a
        ``writer_version`` column: defaults filled for added fields,
        numeric/string promotions widened, incompatible or unknown writer
        versions tagged ``__avro_ok__=False`` for the error channel
        instead of failing the decode (functions/avro_compat.py)."""
        from marmaray_spark.functions.avro_compat import decode_avro_resolved

        reader = self.get_avro_schema(name, version)
        writers = {v: json.loads(p.read_text())
                   for v, p in self._avro_versions(name).items()}
        return lambda df: decode_avro_resolved(
            df, reader, writers, value_col=value_col, version_col=version_col)
