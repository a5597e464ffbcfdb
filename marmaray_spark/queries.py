"""The engine's declared query surface: operator semantics as (Spark, SQL)
pairs.

Every operator claimed in SURVEY.md §2 surfaces here twice:
- a PySpark builder ``(spark, sf_dir) -> DataFrame``
- an equivalent ANSI-SQL oracle string (DuckDB dialect-compatible)

The driver hash-compares both at sf0.01 (order-insensitive, column-name
sorted) — so every computed column is aliased identically on both sides,
floats are rounded where engine summation order could differ, and
timestamps rely on the session being pinned to UTC.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects by default; read as epoch-nanos long (ordering and
        # arithmetic preserved; convert at the edge with event_ts_ntz()).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def event_ts_ntz(col: str = "ts"):
    """Epoch-nanos long -> TIMESTAMP_NTZ via tz-independent arithmetic
    (truncates to micros, matching the oracle's ns->us normalization)."""
    return F.expr(f"timestampadd(MICROSECOND, {col} div 1000, "
                  f"TIMESTAMP_NTZ '1970-01-01 00:00:00')")


# ---------------------------------------------------------------------------
# Converter / validation semantics (SURVEY §2.3)
# ---------------------------------------------------------------------------

@register(
    "validate_required_keys_valid",
    """
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL AND c_acctbal >= 0
    """,
)
def validate_required_keys_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SchemaProjectionConverter valid stream: required keys present +
    domain predicate (SparkSourceDataConverter.java:61-159 semantics)."""
    from marmaray_spark.converters import SchemaProjectionConverter

    customer = load(spark, sf_dir, "customer")

    class _Conv(SchemaProjectionConverter):
        def validity(self, df):
            return super().validity(df) & (F.col("c_acctbal") >= 0)

    conv = _Conv(required_keys=["c_custkey", "c_name"],
                 fields_to_convert=["c_custkey", "c_name", "c_acctbal", "c_mktsegment"])
    return conv.map(customer).valid


@register(
    "validate_required_keys_error_count",
    """
    SELECT count(*) AS error_count
    FROM customer
    WHERE NOT (c_custkey IS NOT NULL AND c_name IS NOT NULL AND c_acctbal >= 0)
    """,
)
def validate_required_keys_error_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from marmaray_spark.converters import SchemaProjectionConverter

    customer = load(spark, sf_dir, "customer")

    class _Conv(SchemaProjectionConverter):
        def validity(self, df):
            return super().validity(df) & (F.col("c_acctbal") >= 0)

    res = _Conv(required_keys=["c_custkey", "c_name"]).map(customer)
    return res.errors.groupBy().agg(F.count(F.lit(1)).alias("error_count"))


@register(
    "fork_tag_counts",
    """
    SELECT CASE WHEN value IS NOT NULL AND value >= 0 THEN 'valid' ELSE 'error' END
             AS fork_tag,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def fork_tag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ForkOperator per-key counts (ForkFunction accumulator semantics,
    M/common/forkoperator/ForkFunction.java:54-83) as a groupBy."""
    events = load(spark, sf_dir, "events")
    tag = F.when(F.col("value").isNotNull() & (F.col("value") >= 0), F.lit("valid")) \
        .otherwise(F.lit("error"))
    return events.groupBy(tag.alias("fork_tag")).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Sink write semantics (SURVEY §2.5, HoodieSink ops)
# ---------------------------------------------------------------------------

@register(
    "dedup_insert_anti_join",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND NOT EXISTS (
        SELECT 1 FROM orders e
        WHERE e.o_orderdate < TIMESTAMP '1995-01-01'
          AND e.o_custkey = o.o_custkey)
    """,
)
def dedup_insert_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP_INSERT: drop incoming records whose key already exists in the
    sink (HoodieSink.dedupRecords filterExists anti-join,
    M/common/sinks/hoodie/HoodieSink.java:446-449). Existing table =
    pre-1995 orders keyed by customer; incoming = 1995+ orders."""
    orders = load(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderdate") < "1995-01-01").select("o_custkey")
    incoming = orders.filter(F.col("o_orderdate") >= "1995-01-01")
    return (incoming.join(existing, "o_custkey", "left_anti")
            .select("o_orderkey", "o_custkey", "o_totalprice"))


@register(
    "upsert_last_write_wins",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def upsert_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPSERT semantics: per key, the latest record wins (HoodieSink UPSERT,
    HoodieSink.java:533-546). Deterministic tiebreak on event_id."""
    events = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (events.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("user_id",
                    F.col("event_id").alias("last_event_id"),
                    F.col("event_type").alias("last_event_type"),
                    F.col("value").alias("last_value")))


@register(
    "sorted_batched_output",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(floor((row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1)
                      / 1000) AS BIGINT) AS batch_id
    FROM lineitem
    """,
)
def sorted_batched_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CassandraSSTableSink bulk path: total sort by (partition, clustering)
    keys + stable size-capped batch assignment
    (CassandraSSTableSink.java:155-192,262-284). Batch = 1000 rows."""
    lineitem = load(spark, sf_dir, "lineitem")
    w = W.orderBy("l_orderkey", "l_linenumber")
    return (lineitem
            .select("l_orderkey", "l_linenumber")
            .withColumn("batch_id",
                        F.floor((F.row_number().over(w) - 1) / 1000).cast("bigint")))


@register(
    "table_upsert_readback",
    """
    WITH old_batch AS (
      SELECT user_id, event_id, event_type, value FROM events
      WHERE event_id % 2 = 0
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ),
    new_batch AS (
      SELECT user_id, event_id, event_type, value FROM events
      WHERE event_id % 2 = 1
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT user_id, event_id, event_type, value FROM new_batch
    UNION ALL
    SELECT o.user_id, o.event_id, o.event_type, o.value FROM old_batch o
    WHERE NOT EXISTS (SELECT 1 FROM new_batch n WHERE n.user_id = o.user_id)
    """,
)
def table_upsert_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END sink parity: INSERT one batch into a real managed table,
    UPSERT a second batch, read the snapshot back. Exercises the commit
    log, partition-scoped copy-on-write, and last-write-wins key merge
    (HoodieSink UPSERT + HoodieBasedMetadataManager atomicity)."""
    import tempfile

    from marmaray_spark.sinks.table import TableSink, WriteOp

    events = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

    def latest_per_user(df: DataFrame) -> DataFrame:
        return (df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select("user_id", "event_id", "event_type", "value"))

    old_batch = latest_per_user(events.filter(F.col("event_id") % 2 == 0))
    new_batch = latest_per_user(events.filter(F.col("event_id") % 2 == 1))

    table = tempfile.mkdtemp(prefix="upsert_readback_")
    sink = TableSink(spark, table, "user_id", partition_field="event_type")
    sink.write(old_batch, WriteOp.INSERT)
    sink.write(new_batch, WriteOp.UPSERT)
    return sink.read().select("user_id", "event_id", "event_type", "value")


@register(
    "kafka_incremental_fair_split",
    """
    WITH RECURSIVE evt AS (
      SELECT event_id, CAST(user_id % 8 AS INT) AS partition,
             CAST(row_number() OVER (PARTITION BY user_id % 8 ORDER BY event_id) - 1
                  AS BIGINT) AS msg_offset
      FROM events
    ),
    backlog AS (
      SELECT partition, count(*) AS messages
      FROM evt WHERE msg_offset >= 100 GROUP BY partition
    ),
    ordered AS (
      SELECT partition, messages,
             CAST(row_number() OVER (ORDER BY messages, partition) AS INT) AS rn,
             CAST(count(*) OVER () AS INT) AS np,
             CAST(sum(messages) OVER () AS BIGINT) AS total
      FROM backlog
    ),
    alloc AS (
      SELECT 0 AS rn, CAST(LEAST((SELECT max(total) FROM ordered), 3000) AS BIGINT)
               AS pending,
             (SELECT max(np) FROM ordered) AS remaining,
             CAST(NULL AS BIGINT) AS take, CAST(NULL AS INT) AS partition,
             (SELECT max(total) FROM ordered) > 3000 AS has_extra
      UNION ALL
      SELECT o.rn,
             CASE WHEN a.has_extra
                  THEN a.pending - LEAST(a.pending // a.remaining, o.messages)
                  ELSE a.pending END,
             a.remaining - 1,
             CASE WHEN a.has_extra
                  THEN LEAST(a.pending // a.remaining, o.messages)
                  ELSE o.messages END,
             o.partition, a.has_extra
      FROM alloc a JOIN ordered o ON o.rn = a.rn + 1
    )
    SELECT e.partition, e.msg_offset, e.event_id
    FROM evt e JOIN alloc a ON e.partition = a.partition
    WHERE e.msg_offset >= 100 AND e.msg_offset < 100 + a.take
    """,
)
def kafka_incremental_fair_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-style incremental consume: events as an 8-partition stream
    (partition = user_id % 8, dense per-partition offsets), checkpoint at
    offset 100 per partition, cap 3000 messages fair-split across
    partitions — the REAL KafkaWorkUnitCalculator plans the ranges
    (driver-side, like the reference's consumer-RPC planner), the data
    path is a pushed-down range filter. Oracle replicates the split
    arithmetic with a recursive CTE."""
    from marmaray_spark.metadata import InMemoryMetadataManager
    from marmaray_spark.sources.kafka import (
        KafkaWorkUnitCalculator,
        StaticBroker,
        filter_by_offset_ranges,
    )

    events = load(spark, sf_dir, "events")
    stream = events.select(
        "event_id",
        (F.col("user_id") % 8).cast("int").alias("partition"),
        (F.row_number().over(
            W.partitionBy(F.col("user_id") % 8).orderBy("event_id")) - 1)
        .cast("bigint").alias("msg_offset"),
    )
    # broker metadata: latest offset (= next offset after last message, i.e.
    # the partition's message count for a dense 0-based log) — driver-side
    # aggregate, mirroring the reference's consumer metadata RPC
    latest = {int(r["partition"]): int(r["n"])
              for r in stream.groupBy("partition").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    meta = InMemoryMetadataManager()
    for p in latest:
        meta.set(f"kafka.offset.t.{p}", "100")  # next-to-read position
    calc = KafkaWorkUnitCalculator(
        "t", StaticBroker({p: 0 for p in latest}, latest), meta, max_messages=3000)
    ranges = calc.compute_work_units()
    return (filter_by_offset_ranges(stream, ranges, "partition", "msg_offset")
            .select("partition", "msg_offset", "event_id"))


# ---------------------------------------------------------------------------
# Relational capability (the DataFrame surface the operators imply)
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style scan+agg (the flagship query)."""
    lineitem = load(spark, sf_dir, "lineitem")
    return (lineitem
            .filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.count(F.lit(1)).alias("count_order")))


@register(
    "top_revenue_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style join+agg+topk; the dimension join broadcasts."""
    customer = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return (lineitem
            .join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.col("revenue").desc(), "o_orderkey")
            .limit(10))
