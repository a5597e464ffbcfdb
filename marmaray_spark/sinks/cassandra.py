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

ORDER_TS_FIELD = "orderTsField"  # CassandraSinkDataConverter.java:73
DEFAULT_DISPERSAL_TIMESTAMP_FIELD = "timestamp"  # CassandraSinkConfiguration.java:101


@dataclass(frozen=True)
class TimestampInfo:
    """Job-level dispersal timestamp appended to every row
    (utilities/TimestampInfo.java + CassandraSinkDataConverter.java:184-190):
    customers stamp dispersed data with the run's timestamp, written as a
    string column or — with ``save_as_long`` — a bigint."""

    timestamp: str | None = None
    save_as_long: bool = False
    field_name: str = DEFAULT_DISPERSAL_TIMESTAMP_FIELD

    @property
    def has_timestamp(self) -> bool:
        return self.timestamp is not None

    @classmethod
    def empty(cls) -> "TimestampInfo":
        return cls()


def to_microseconds(col_name: str, *, dtype: "T.DataType | None" = None,
                    unit: str | None = None) -> "F.Column":
    """Normalize an epoch value to MICROSECONDS.

    Exact legs (preferred whenever the caller knows what it has):
    - ``dtype`` Timestamp/TimestampNTZ -> ``unix_micros`` (no guessing);
    - ``unit`` in {s, ms, us, ns} -> exact integer scaling.

    Otherwise the reference's magnitude heuristic —
    TimeUnitUtil.convertToMicroSeconds (range [1e15, 1e18), multiply or
    integer-divide by 1000 until inside; out-of-range raises, matching the
    reference's JobRuntimeException). The heuristic misclassifies pre-2001
    nanosecond inputs (they fall in the "already-us" range), which is why
    typed callers must use the exact legs. Integer ``div`` keeps ns->us
    exact — a double division here would be off-by-one near 2^53."""
    if dtype is not None and isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(col_name).cast("timestamp"))
    if unit is not None:
        scaled = {
            "s": f"cast({col_name} as bigint) * 1000000",
            "ms": f"cast({col_name} as bigint) * 1000",
            "us": f"cast({col_name} as bigint)",
            "ns": f"cast({col_name} as bigint) div 1000",
        }
        if unit not in scaled:
            raise ValueError(f"unit must be one of s/ms/us/ns, got {unit!r}")
        return F.expr(scaled[unit])
    c = f"cast({col_name} as bigint)"
    lo, hi = 10**15, 10**18
    return F.expr(f"""CASE
        WHEN {c} IS NULL THEN NULL
        WHEN {c} >= {lo} AND {c} < {hi} THEN {c}
        WHEN {c} >= {hi} THEN {c} div 1000
        WHEN {c} >= {10**12} THEN {c} * 1000
        WHEN {c} >= {10**9} THEN {c} * 1000000
        WHEN {c} >= {10**6} THEN {c} * 1000000000
        ELSE cast(raise_error(concat('Input timestamp doesn''t have expected ',
             'time unit (s/ms/us/ns): ', cast({c} as string))) as bigint)
    END""")

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


@dataclass(frozen=True)
class ClusterKey:
    """Clustering key with sort order (ClusterKey.java: ``name:ORDER``
    config form, ASC default)."""

    name: str
    order: str = "ASC"

    def __post_init__(self) -> None:
        if self.order not in ("ASC", "DESC"):
            raise ValueError(f"order must be ASC or DESC, got {self.order!r}")

    @classmethod
    def parse(cls, spec: "str | ClusterKey") -> "ClusterKey":
        if isinstance(spec, ClusterKey):
            return spec
        name, _, order = spec.partition(":")
        return cls(name, order.upper() or "ASC")


@dataclass
class CassandraSchema:
    keyspace: str
    table: str
    partition_keys: list[str]
    clustering_keys: list[str] = field(default_factory=list)
    fields: dict[str, str] = field(default_factory=dict)   # name -> cql type
    # clustering sort orders, name -> ASC|DESC (only non-ASC matter for DDL)
    clustering_order: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_struct(cls, schema: T.StructType, keyspace: str, table: str,
                    partition_keys: list[str],
                    clustering_keys: list[str] | None = None,
                    filtered_fields: list[str] | None = None,
                    timestamp_info: "TimestampInfo | None" = None,
                    written_time_field: str | None = None) -> "CassandraSchema":
        """StructType -> Cassandra schema; drops ``_``-prefixed and
        filtered fields (CassandraSchemaConverter rules).

        ``timestamp_info``: adds the dispersal-timestamp column (text or
        bigint) to the table schema (CassandraSchemaConverter.java:48-69).
        ``written_time_field``: source column whose microsecond-normalized
        value is written as ``orderTsField`` bigint — the write-time
        ordering column (CassandraSinkDataConverter.java:160-162,208-212).
        ``clustering_keys`` entries may carry a sort order as ``name:desc``
        (ClusterKey.java config form; ASC default).
        """
        drop = set(filtered_fields or [])
        fields = {f.name: cql_type_of(f.dataType) for f in schema.fields
                  if not f.name.startswith("_") and f.name not in drop}
        cks = [ClusterKey.parse(k) for k in (clustering_keys or [])]
        clustering_keys = [ck.name for ck in cks]
        order = {ck.name: ck.order for ck in cks}
        for k in partition_keys + clustering_keys:
            if k not in fields:
                raise KeyError(f"key column {k!r} missing from schema")
        if timestamp_info is not None and timestamp_info.has_timestamp:
            fields[timestamp_info.field_name] = \
                "bigint" if timestamp_info.save_as_long else "text"
        if written_time_field is not None:
            if written_time_field not in fields:
                raise KeyError(f"written-time column {written_time_field!r} "
                               f"missing from schema")
            fields[ORDER_TS_FIELD] = "bigint"
        return cls(keyspace, table, list(partition_keys),
                   clustering_keys, fields, clustering_order=order)

    # -- DDL generation (pure string builders) -----------------------------

    def create_keyspace_cql(self, replication_factor: int = 3) -> str:
        return (f"CREATE KEYSPACE IF NOT EXISTS {self.keyspace} WITH REPLICATION = "
                f"{{'class': 'SimpleStrategy', 'replication_factor': {replication_factor}}}")

    def create_table_cql(self) -> str:
        cols = ", ".join(f"{n} {t}" for n, t in self.fields.items())
        pk = f"({', '.join(self.partition_keys)})"
        if self.clustering_keys:
            pk = f"({pk}, {', '.join(self.clustering_keys)})"
        ddl = (f"CREATE TABLE IF NOT EXISTS {self.keyspace}.{self.table} "
               f"({cols}, PRIMARY KEY {pk})")
        if any(self.clustering_order.get(k) == "DESC"
               for k in self.clustering_keys):
            # CassandraSchemaManager.java:251 — clause lists every
            # clustering key with its effective order
            order = ", ".join(
                f"{k} {self.clustering_order.get(k, 'ASC')}"
                for k in self.clustering_keys)
            ddl += f" WITH CLUSTERING ORDER BY ({order})"
        return ddl

    def alter_add_cql(self, existing_columns: set[str]) -> list[str]:
        """ALTER TABLE ADD for schema evolution — one statement per new
        column (CassandraSchemaManager.java:120-147)."""
        return [f"ALTER TABLE {self.keyspace}.{self.table} ADD {n} {t}"
                for n, t in self.fields.items() if n not in existing_columns]

    def insert_cql(self, ttl_s: int | None = None) -> str:
        """Prepared-statement INSERT (CassandraSinkCQLDataConverter path)."""
        return self.insert_cql_for(list(self.fields), ttl_s=ttl_s)

    def insert_cql_for(self, cols: list[str], ttl_s: int | None = None) -> str:
        """Prepared INSERT over a column subset (a frame missing optional
        columns writes only what it has — Cassandra unset-column rules).
        ``ttl_s`` appends USING TTL (CassandraSinkSchemaManager
        generateInsertStmt TTL leg)."""
        unknown = [c for c in cols if c not in self.fields]
        if unknown:
            raise KeyError(f"columns not in table schema: {unknown}")
        stmt = (f"INSERT INTO {self.keyspace}.{self.table} "
                f"({', '.join(cols)}) VALUES ({', '.join('?' for _ in cols)})")
        if ttl_s is not None:
            if ttl_s <= 0:
                raise ValueError("ttl_s must be positive")
            stmt += f" USING TTL {ttl_s}"
        return stmt

    def validate(self) -> list[str]:
        """Problems that make the schema unusable — empty when valid
        (CassandraSinkSchemaManager.getValidSchema checks): non-empty
        keyspace/table/fields/partition keys, no key shared between
        partition and clustering lists, every key a schema field."""
        problems = []
        if not self.keyspace:
            problems.append("empty keyspace")
        if not self.table:
            problems.append("empty table name")
        if not self.fields:
            problems.append("no fields")
        if not self.partition_keys:
            problems.append("no partition keys")
        shared = set(self.partition_keys) & set(self.clustering_keys)
        if shared:
            problems.append(f"keys in both partition and clustering: {sorted(shared)}")
        missing = [k for k in [*self.partition_keys, *self.clustering_keys]
                   if k not in self.fields]
        if missing:
            problems.append(f"keys not in fields: {missing}")
        return problems

    @property
    def is_valid(self) -> bool:
        return not self.validate()


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
                 min_batch_duration_s: float = 0.0,
                 timestamp_info: TimestampInfo | None = None,
                 written_time_field: str | None = None,
                 written_time_unit: str | None = None) -> None:
        """``min_batch_duration_s`` > 0 enables throttled mode: batches
        load one at a time with at least that much wall-clock between
        batch starts — the reference's cluster-protection throttle
        (CassandraSSTableSink.java:155-192 min batch duration sleep;
        streamthrottlembits is the connector-level analogue).

        ``timestamp_info`` / ``written_time_field`` mirror the sink data
        converter's extra columns: a constant dispersal timestamp on every
        row, and the microsecond-normalized write-time ordering column
        (CassandraSinkDataConverter.java:85,111,160-162,184-190,208-212).

        ``written_time_unit`` (s/ms/us/ns) pins the epoch unit of a LONG
        written-time column for EXACT conversion; timestamp-typed columns
        convert exactly regardless. Only an untyped long with no declared
        unit falls back to the reference's magnitude heuristic (which is
        wrong for pre-2001 nanosecond values — see ``to_microseconds``)."""
        self.schema = schema
        self.output_path = str(output_path)
        self.batch_rows = batch_rows
        self.min_batch_duration_s = min_batch_duration_s
        self.timestamp_info = timestamp_info or TimestampInfo.empty()
        self.written_time_field = written_time_field
        self.written_time_unit = written_time_unit

    def prepare(self, df: DataFrame) -> DataFrame:
        """Loader-ready frame: projection + key validation + dispersal
        timestamp + orderTsField (us) + stable size-capped batch ids."""
        cols = [c for c in df.columns if c in self.schema.fields]
        keys = self.schema.partition_keys + self.schema.clustering_keys
        projected = df.select(*cols)
        for k in keys:  # required-key validation (null keys are rejects)
            projected = projected.filter(projected[k].isNotNull())
        if self.written_time_field is not None:
            projected = projected.withColumn(
                ORDER_TS_FIELD,
                to_microseconds(
                    self.written_time_field,
                    dtype=df.schema[self.written_time_field].dataType,
                    unit=self.written_time_unit))
        ti = self.timestamp_info
        if ti.has_timestamp:
            value = F.lit(int(ti.timestamp)).cast("bigint") if ti.save_as_long \
                else F.lit(ti.timestamp)
            projected = projected.withColumn(ti.field_name, value)
        return batched_by_size(projected, keys, self.batch_rows)

    # backwards-compatible private alias
    _prepare = prepare

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
