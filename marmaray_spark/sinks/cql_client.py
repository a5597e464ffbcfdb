"""Client-protocol Cassandra sink: execute DDL + prepared INSERTs through
a pluggable CQL session, per partition.

Reference parity: CassandraClientSink
(M/common/sinks/cassandra/CassandraClientSink.java:60-131) opens a cluster
session per executor partition and drains the partition through prepared
INSERT statements (the SSTable-streaming sibling is CassandraSSTableSink,
ported as CassandraBulkSink). This module ports the *execution* half the
verdict called environment-gated: the sink really runs statements — what
varies is the session behind them.

The seam is ``CqlSession``: ``execute(cql, params, timestamp_us)`` +
``close()``. A production deployment hands ``session_factory`` a thin
adapter over the DataStax driver; this container has no cluster, so
``DirectoryCqlCluster`` provides an in-process double that SPOOLS every
executed statement to a shared directory (sessions run inside Python
worker processes — a spool is exactly what a mocked wire looks like) and
replays them with Cassandra's semantics: last-write-wins per primary key
by write timestamp (``USING TIMESTAMP``), upsert on conflict. Tests drive
the full path: DDL on the driver, inserts on executors, LWW readback.

100 TB posture: one session per partition (not per row), prepared
statement reused, rows streamed — the driver never sees data; the only
driver-side work is DDL + the row-count accumulator.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Iterable, Protocol, runtime_checkable

from pyspark.sql import DataFrame

from marmaray_spark.sinks.cassandra import ORDER_TS_FIELD, CassandraSchema


@runtime_checkable
class CqlSession(Protocol):
    def execute(self, cql: str, params: tuple | None = None,
                timestamp_us: int | None = None) -> None: ...
    def close(self) -> None: ...


@dataclass(frozen=True)
class DirectoryCqlSessionFactory:
    """Picklable factory shipped to executors; each call opens a session
    that spools statements to a unique file under ``root``."""

    root: str

    def __call__(self) -> "DirectorySpoolSession":
        return DirectorySpoolSession(self.root)


class DirectorySpoolSession:
    """A CqlSession that appends executed statements to a spool file.
    Write is atomic-per-file (tmp + rename on close) so a crashed executor
    partition never leaves a half-spool — the retry's spool replaces it."""

    def __init__(self, root: str) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._name = f"session-{os.getpid()}-{uuid.uuid4().hex[:12]}"
        self._tmp = self.root / f".{self._name}.tmp"
        self._out = self.root / f"{self._name}.jsonl"
        self._fh = self._tmp.open("w")
        self._seq = 0

    def execute(self, cql: str, params: tuple | None = None,
                timestamp_us: int | None = None) -> None:
        self._fh.write(json.dumps(
            {"cql": cql, "params": list(params) if params is not None else None,
             "ts": timestamp_us, "seq": self._seq}) + "\n")
        self._seq += 1

    def close(self) -> None:
        self._fh.close()
        os.replace(self._tmp, self._out)


class DirectoryCqlCluster:
    """In-process cluster double: hand ``session_factory()`` to
    CqlInsertSink, then read back materialized tables with ``table()``."""

    def __init__(self, root: str | Path) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def session_factory(self) -> DirectoryCqlSessionFactory:
        return DirectoryCqlSessionFactory(str(self.root))

    # -- replay ------------------------------------------------------------

    def statements(self) -> list[dict[str, Any]]:
        stmts: list[dict[str, Any]] = []
        for f in sorted(self.root.glob("session-*.jsonl")):
            with f.open() as fh:
                for line in fh:
                    rec = json.loads(line)
                    rec["file"] = f.name
                    stmts.append(rec)
        return stmts

    def table(self, schema: CassandraSchema) -> dict[tuple, dict[str, Any]]:
        """Materialize a table from the spool with Cassandra semantics:
        INSERT is an upsert; per primary key the row with the greatest
        write timestamp wins (``USING TIMESTAMP``); untimestamped writes
        order by session arrival (file, seq) below any timestamped one —
        matching client-provided-timestamp precedence."""
        import re

        keys = schema.partition_keys + schema.clustering_keys
        pat = re.compile(
            rf"INSERT INTO {re.escape(schema.keyspace)}\.{re.escape(schema.table)} "
            rf"\(([^)]*)\) VALUES")
        rows: dict[tuple, tuple[tuple, dict[str, Any]]] = {}
        for rec in self.statements():
            m = pat.match(rec["cql"])
            if m is None or rec["params"] is None:
                continue
            cols = [c.strip() for c in m.group(1).split(",")]
            row = dict(zip(cols, rec["params"]))
            pk = tuple(row[k] for k in keys)
            ts = rec["ts"] if rec["ts"] is not None else -1
            order = (ts, rec["file"], rec["seq"])
            if pk not in rows or order > rows[pk][0]:
                rows[pk] = (order, row)
        return {pk: row for pk, (order, row) in rows.items()}


class CqlInsertSink:
    """Execute the dispersal through the client protocol: keyspace/table
    DDL once on the driver, then one session per executor partition
    draining prepared INSERTs (CassandraClientSink.java:60-131 shape).

    ``use_write_timestamp``: statements carry ``USING TIMESTAMP`` from the
    microsecond ``orderTsField`` column (CassandraSinkDataConverter
    ordering semantics) — requires the frame to have been prepared with
    ``written_time_field``.
    """

    def __init__(self, schema: CassandraSchema, session_factory,
                 use_write_timestamp: bool = False,
                 ttl_s: int | None = None) -> None:
        self.schema = schema
        self.session_factory = session_factory
        self.use_write_timestamp = use_write_timestamp
        self.ttl_s = ttl_s      # USING TTL on every insert (schema manager TTL leg)

    def setup(self, existing_columns: set[str] | None = None,
              replication_factor: int = 3) -> list[str]:
        """Driver-side DDL: create keyspace + table, or ALTER ADD the new
        columns when the table pre-exists. Returns executed statements."""
        stmts = ([self.schema.create_keyspace_cql(replication_factor),
                  self.schema.create_table_cql()]
                 if existing_columns is None
                 else self.schema.alter_add_cql(existing_columns))
        session = self.session_factory()
        try:
            for s in stmts:
                session.execute(s)
        finally:
            session.close()
        return stmts

    def write(self, df: DataFrame) -> int:
        """Stream every row through a per-partition session; returns rows
        written (Spark accumulator — the only driver-side traffic)."""
        cols = [c for c in df.columns if c in self.schema.fields]
        missing = [k for k in self.schema.partition_keys
                   + self.schema.clustering_keys if k not in cols]
        if missing:
            raise KeyError(f"key columns missing from frame: {missing}")
        insert = self.schema.insert_cql_for(cols, ttl_s=self.ttl_s)
        if self.use_write_timestamp and ORDER_TS_FIELD not in df.columns:
            raise KeyError(f"use_write_timestamp needs {ORDER_TS_FIELD!r}; "
                           "prepare the frame with written_time_field")

        factory = self.session_factory
        use_ts = self.use_write_timestamp
        sc = df.sparkSession.sparkContext
        written = sc.accumulator(0)
        ts_field = ORDER_TS_FIELD

        def drain(rows: Iterable) -> None:
            session, n = factory(), 0
            try:
                for row in rows:
                    ts = row[ts_field] if use_ts else None
                    session.execute(insert,
                                    tuple(row[c] for c in cols),
                                    timestamp_us=ts)
                    n += 1
            finally:
                session.close()
            written.add(n)

        df.foreachPartition(drain)
        return written.value
