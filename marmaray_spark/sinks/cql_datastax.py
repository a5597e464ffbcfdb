"""DataStax-driver adapter for the ``CqlSession`` seam: the production
leg of CqlInsertSink (sinks/cql_client.py).

Reference parity: CassandraClientSink
(M/common/sinks/cassandra/CassandraClientSink.java:60-131) opens a
driver session per executor partition and drains prepared INSERTs. The
sandbox has no cluster and no ``cassandra-driver`` wheel, so this module
is import-guarded: constructing the factory is always safe (it is a
frozen dataclass that pickles into executor closures); the driver import
happens inside ``__call__`` on the executor, exactly where the reference
opens its cluster session.

Semantics mapping onto the seam's ``execute(cql, params, timestamp_us)``:

- DDL (``params is None``): executed as a plain statement.
- Inserts: prepared ONCE per distinct CQL text per session (the seam
  already reuses one INSERT text per partition drain, so this is one
  prepare per partition) and executed with bound params.
- ``timestamp_us``: Cassandra accepts a bind marker in the USING clause,
  so the adapter rewrites the INSERT to ``... USING TIMESTAMP ?`` (or
  ``USING TIMESTAMP ? AND TTL n`` when the sink already appended a TTL)
  and binds the microsecond timestamp as the extra parameter — the
  CassandraSinkDataConverter orderTsField ordering lands server-side
  byte-for-byte like the reference's writetime.
"""

from __future__ import annotations

from dataclasses import dataclass


def datastax_available() -> bool:
    try:
        import cassandra.cluster  # noqa: F401
        return True
    except ImportError:
        return False


def with_timestamp_marker(cql: str) -> str:
    """Append a bindable ``USING TIMESTAMP ?`` to an INSERT, merging with
    an existing ``USING TTL n`` clause (CQL allows one USING clause:
    ``USING TIMESTAMP ? AND TTL n``)."""
    if " USING TIMESTAMP" in cql:
        return cql
    if " USING TTL " in cql:
        head, ttl = cql.rsplit(" USING TTL ", 1)
        return f"{head} USING TIMESTAMP ? AND TTL {ttl}"
    return f"{cql} USING TIMESTAMP ?"


@dataclass(frozen=True)
class DataStaxSessionFactory:
    """Picklable factory shipped to executors; each call connects through
    the DataStax driver and returns a seam-conformant session."""

    contact_points: tuple[str, ...]
    port: int = 9042
    keyspace: str | None = None
    username: str | None = None
    password: str | None = None
    local_dc: str | None = None

    def __call__(self) -> "DataStaxCqlSession":
        from cassandra.cluster import Cluster

        auth = None
        if self.username is not None:
            from cassandra.auth import PlainTextAuthProvider
            auth = PlainTextAuthProvider(username=self.username,
                                         password=self.password or "")
        kwargs = {"port": self.port, "auth_provider": auth}
        if self.local_dc is not None:
            from cassandra.policies import (DCAwareRoundRobinPolicy,
                                            TokenAwarePolicy)
            kwargs["load_balancing_policy"] = TokenAwarePolicy(
                DCAwareRoundRobinPolicy(local_dc=self.local_dc))
        cluster = Cluster(list(self.contact_points), **kwargs)
        session = cluster.connect(self.keyspace) if self.keyspace \
            else cluster.connect()
        return DataStaxCqlSession(cluster, session)


class DataStaxCqlSession:
    """CqlSession over a live driver session: prepare-cache per CQL text,
    bindable write timestamps, cluster shutdown on close."""

    def __init__(self, cluster, session) -> None:
        self._cluster = cluster
        self._session = session
        self._prepared: dict[str, object] = {}

    def execute(self, cql: str, params: tuple | None = None,
                timestamp_us: int | None = None) -> None:
        if params is None:                      # DDL / unparameterized
            self._session.execute(cql)
            return
        bind = tuple(params)
        if timestamp_us is not None:
            cql = with_timestamp_marker(cql)
            bind = bind + (int(timestamp_us),)
        ps = self._prepared.get(cql)
        if ps is None:
            ps = self._session.prepare(cql)
            self._prepared[cql] = ps
        self._session.execute(ps, bind)

    def close(self) -> None:
        try:
            self._session.shutdown()
        finally:
            self._cluster.shutdown()
