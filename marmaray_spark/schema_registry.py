"""Versioned schema registry on a filesystem directory.

Reference parity: HDFSSchemaService reads versioned ``<name>.<version>.avsc``
files from an HDFS dir, serving the max version unless one is pinned
(M/common/schema/HDFSSchemaService.java:59-170); readers decode Kafka
byte[] payloads against the registered schema
(ISchemaService.ISchemaServiceReader).

Spark-first: schemas are StructType JSON (``<name>.<version>.json``) —
the engine's one schema currency — and the decode path is
``from_json(value, registry.get_schema(name))`` (JsonDecodeConverter),
covering the wire-format role Avro played in the reference.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from pyspark.sql import types as T

_FILE_RE = re.compile(r"^(?P<name>.+)\.(?P<version>\d+)\.json$")


class SchemaNotFoundError(KeyError):
    pass


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
