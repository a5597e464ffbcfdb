"""Cassandra-shaped dispersal sink: CQL DDL generation + sorted,
size-batched bulk output.

Reference parity:
- CassandraSchemaConverter / CassandraSinkSchemaManager generate keyspace/
  table DDL and ALTER TABLE ADD statements for new columns
  (M/common/schema/cassandra/CassandraSchemaManager.java:99-250,120-147);
  supported type names text,int,bigint,float,boolean,double,timestamp,blob
  (CassandraSchemaField.java:33-40); ``_``-prefixed and filtered fields
  dropped (CassandraSchemaConverter.java:41-113).
- CassandraSSTableSink sorts payloads by (partition keys, clustering keys)
  and writes size-capped batches, throttled, streamed to the cluster
  (M/common/sinks/cassandra/CassandraSSTableSink.java:74-345).

Spark-first: DDL generation is pure functions over StructType (trivially
unit-testable; feed them to any CQL session or the spark-cassandra
connector, neither of which ships in this container — the write path
degrades to sorted/batched parquet|csv that an SSTable loader consumes).
The sort is a range-partitioned repartitionByRange + sortWithinPartitions
(the scalable form of the reference's byte-concat total sortBy) and batch
ids come from operators/batching.py — bounded batch memory at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marmaray_spark.operators.batching import batched_by_size

# Spark type -> CQL type (CassandraSchemaField.java:33-40 name set)
_CQL_TYPES: dict[str, str] = {
    "string": "text",
    "int": "int",
    "bigint": "bigint",
    "long": "bigint",
    "float": "float",
    "boolean": "boolean",
    "double": "double",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "blob",
    "short": "int",          # ShortType widens (SparkUtil.java:82-85 lattice)
    "byte": "blob",
    "date": "text",          # DateType -> string (DataFrameSchemaConverter.java)
}


def cql_type_of(dt: T.DataType) -> str:
    name = dt.simpleString()
    if name not in _CQL_TYPES:
        raise TypeError(f"type {name!r} has no Cassandra mapping "
                        f"(reference supports scalars only, SURVEY §1.3)")
    return _CQL_TYPES[name]


@dataclass
class CassandraSchema:
    keyspace: str
    table: str
    partition_keys: list[str]
    clustering_keys: list[str] = field(default_factory=list)
    fields: dict[str, str] = field(default_factory=dict)   # name -> cql type

    @classmethod
    def from_struct(cls, schema: T.StructType, keyspace: str, table: str,
                    partition_keys: list[str],
                    clustering_keys: list[str] | None = None,
                    filtered_fields: list[str] | None = None) -> "CassandraSchema":
        """StructType -> Cassandra schema; drops ``_``-prefixed and
        filtered fields (CassandraSchemaConverter rules)."""
        drop = set(filtered_fields or [])
        fields = {f.name: cql_type_of(f.dataType) for f in schema.fields
                  if not f.name.startswith("_") and f.name not in drop}
        for k in partition_keys + (clustering_keys or []):
            if k not in fields:
                raise KeyError(f"key column {k!r} missing from schema")
        return cls(keyspace, table, list(partition_keys),
                   list(clustering_keys or []), fields)

    # -- DDL generation (pure string builders) -----------------------------

    def create_keyspace_cql(self, replication_factor: int = 3) -> str:
        return (f"CREATE KEYSPACE IF NOT EXISTS {self.keyspace} WITH REPLICATION = "
                f"{{'class': 'SimpleStrategy', 'replication_factor': {replication_factor}}}")

    def create_table_cql(self) -> str:
        cols = ", ".join(f"{n} {t}" for n, t in self.fields.items())
        pk = f"({', '.join(self.partition_keys)})"
        if self.clustering_keys:
            pk = f"({pk}, {', '.join(self.clustering_keys)})"
        return (f"CREATE TABLE IF NOT EXISTS {self.keyspace}.{self.table} "
                f"({cols}, PRIMARY KEY {pk})")

    def alter_add_cql(self, existing_columns: set[str]) -> list[str]:
        """ALTER TABLE ADD for schema evolution — one statement per new
        column (CassandraSchemaManager.java:120-147)."""
        return [f"ALTER TABLE {self.keyspace}.{self.table} ADD {n} {t}"
                for n, t in self.fields.items() if n not in existing_columns]

    def insert_cql(self) -> str:
        """Prepared-statement INSERT (CassandraSinkCQLDataConverter path)."""
        cols = list(self.fields)
        return (f"INSERT INTO {self.keyspace}.{self.table} "
                f"({', '.join(cols)}) VALUES ({', '.join('?' for _ in cols)})")


class CassandraBulkSink:
    """Bulk path: validate keys -> project -> total-sort by (partition,
    clustering) keys -> size-capped batches -> write sorted runs.

    Output is loader-ready sorted parquet (one dir per batch via
    partitionBy on batch_id); swap the final write for
    ``format("org.apache.spark.sql.cassandra")`` when the connector jar is
    present.
    """

    def __init__(self, schema: CassandraSchema, output_path: str | Path,
                 batch_rows: int = 100_000,
                 min_batch_duration_s: float = 0.0) -> None:
        """``min_batch_duration_s`` > 0 enables throttled mode: batches
        load one at a time with at least that much wall-clock between
        batch starts — the reference's cluster-protection throttle
        (CassandraSSTableSink.java:155-192 min batch duration sleep;
        streamthrottlembits is the connector-level analogue)."""
        self.schema = schema
        self.output_path = str(output_path)
        self.batch_rows = batch_rows
        self.min_batch_duration_s = min_batch_duration_s

    def _prepare(self, df: DataFrame) -> DataFrame:
        cols = [c for c in df.columns if c in self.schema.fields]
        keys = self.schema.partition_keys + self.schema.clustering_keys
        projected = df.select(*cols)
        for k in keys:  # required-key validation (null keys are rejects)
            projected = projected.filter(projected[k].isNotNull())
        return batched_by_size(projected, keys, self.batch_rows)

    def write(self, df: DataFrame) -> int:
        keys = self.schema.partition_keys + self.schema.clustering_keys
        batched = self._prepare(df)
        if self.min_batch_duration_s > 0:
            return self._write_throttled(batched, keys)
        (batched
         .repartitionByRange("batch_id", *keys)
         .sortWithinPartitions("batch_id", *keys)
         .write.mode("overwrite").partitionBy("batch_id")
         .parquet(self.output_path))
        return len(list(Path(self.output_path).glob("batch_id=*")))

    def _write_throttled(self, batched: DataFrame, keys: list[str]) -> int:
        """One batch per loader run, min duration between batch starts.
        The batched frame is persisted so each loop reads a slice, not a
        full recompute (the fork-persist rule)."""
        import time

        batched = batched.persist()
        batch_ids = sorted(r["batch_id"] for r in
                           batched.select("batch_id").distinct().collect())
        for i, b in enumerate(batch_ids):
            started = time.time()
            (batched.filter(F.col("batch_id") == b)
             .sortWithinPartitions(*keys)
             .write.mode("overwrite")
             .parquet(f"{self.output_path}/batch_id={b}"))
            if i < len(batch_ids) - 1:
                remaining = self.min_batch_duration_s - (time.time() - started)
                if remaining > 0:
                    time.sleep(remaining)
        batched.unpersist()
        return len(batch_ids)
