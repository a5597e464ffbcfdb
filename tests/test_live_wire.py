"""Env-gated LIVE-WIRE integration tests for the two §2 wire legs that
cannot run in this sandbox (no Kafka broker, no ``cassandra-driver``
wheel / cluster). They auto-skip here with a reason naming the missing
resource, and light up the day an environment provides it — the same
auto-skip parity pattern the PIL/soundfile codec adapters use.

Enable with:
  KAFKA_BOOTSTRAP=host:9092            (broker; the session also needs the
                                        spark-sql-kafka connector package,
                                        e.g. --packages org.apache.spark:
                                        spark-sql-kafka-0-10_2.13:<ver>)
  CASSANDRA_CONTACT_POINTS=host[,host] (cluster; needs `cassandra-driver`
                                        installed)
"""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

KAFKA = os.environ.get("KAFKA_BOOTSTRAP")
CASSANDRA = os.environ.get("CASSANDRA_CONTACT_POINTS")


def _kafka_connector_available(spark) -> bool:
    try:
        spark.read.format("kafka").option("kafka.bootstrap.servers", KAFKA) \
            .option("subscribe", "__probe__").load()
        return True
    except Exception as e:  # noqa: BLE001 — classify, don't die
        return "Failed to find data source" not in str(e)


@pytest.mark.skipif(
    not KAFKA,
    reason="no live Kafka broker: set KAFKA_BOOTSTRAP=host:port (plus the "
           "spark-sql-kafka connector package on the session)")
def test_kafka_wire_batch_roundtrip_and_planner_integration(spark):
    """The real connector-option seam: produce via the kafka batch WRITER,
    read back with the exact startingOffsets/endingOffsets JSON the
    planner emits (ranges_to_kafka_json), and check the work-unit filter
    agrees with the broker's own offsets."""
    from marmaray_spark.sources.kafka import (fair_split,
                                              filter_by_offset_ranges,
                                              ranges_to_kafka_json)

    if not _kafka_connector_available(spark):
        pytest.skip("KAFKA_BOOTSTRAP set but the spark-sql-kafka connector "
                    "jar is not on the session classpath")

    topic = f"marmaray_spark_wire_{uuid.uuid4().hex[:10]}"
    n = 25
    (spark.range(n)
     .select(F.col("id").cast("string").alias("key"),
             F.concat(F.lit("payload-"), F.col("id")).cast("string")
             .alias("value"))
     .write.format("kafka")
     .option("kafka.bootstrap.servers", KAFKA)
     .option("topic", topic).save())
    time.sleep(1.0)  # broker metadata propagation

    full = (spark.read.format("kafka")
            .option("kafka.bootstrap.servers", KAFKA)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .option("endingOffsets", "latest").load()
            .select(F.col("partition").cast("int"),
                    F.col("offset").cast("long"),
                    F.col("value").cast("string")))
    rows = full.collect()
    assert len(rows) == n
    assert {r["value"] for r in rows} == {f"payload-{i}" for i in range(n)}

    # planner leg: per-partition extents from the broker itself -> fair
    # split -> endingOffsets JSON -> a bounded re-read returns the capped
    # message count exactly
    extents = {r["partition"]: r["cnt"] for r in
               full.groupBy("partition").agg(F.count("*").alias("cnt"))
               .collect()}
    starts = {r["partition"]: r["lo"] for r in
              full.groupBy("partition").agg(F.min("offset").alias("lo"))
              .collect()}
    cap = n // 2
    ranges = fair_split(extents, starts, cap)
    assert sum(r.size for r in ranges) == cap
    start_json, end_json = ranges_to_kafka_json(topic, ranges)
    bounded = (spark.read.format("kafka")
               .option("kafka.bootstrap.servers", KAFKA)
               .option("subscribe", topic)
               .option("startingOffsets", start_json)
               .option("endingOffsets", end_json).load())
    want = sum(r.until_offset - r.from_offset for r in ranges)
    assert bounded.count() == want
    # and the client-side range filter agrees with the broker-side bound
    filtered = filter_by_offset_ranges(
        full.select("partition", "offset", "value"), ranges,
        partition_col="partition", offset_col="offset")
    assert filtered.count() == want


@pytest.mark.skipif(
    not CASSANDRA,
    reason="no live Cassandra cluster: set CASSANDRA_CONTACT_POINTS="
           "host[,host] (and pip install cassandra-driver)")
def test_datastax_adapter_end_to_end_writetime(spark):
    """CqlInsertSink through the REAL DataStax adapter: keyspace/table
    DDL, per-partition prepared-INSERT drain with bound write
    timestamps, and a server-side writetime() read-back equal to the
    orderTsField microseconds."""
    from marmaray_spark.sinks.cassandra import CassandraSchema
    from marmaray_spark.sinks.cql_client import CqlInsertSink
    from marmaray_spark.sinks.cql_datastax import (DataStaxSessionFactory,
                                                   datastax_available)

    if not datastax_available():
        pytest.skip("CASSANDRA_CONTACT_POINTS set but cassandra-driver is "
                    "not installed")

    ks = f"marmaray_wire_{uuid.uuid4().hex[:8]}"
    schema = CassandraSchema(
        ks, "docs", ["doc_id"], [],
        {"doc_id": "bigint", "body": "text", "_order_ts": "bigint"})
    factory = DataStaxSessionFactory(
        contact_points=tuple(CASSANDRA.split(",")))
    sink = CqlInsertSink(schema, factory, use_write_timestamp=True)
    sink.setup(replication_factor=1)

    base_us = 1_700_000_000_000_000
    df = spark.createDataFrame(
        [(i, f"body-{i}", base_us + i) for i in range(10)],
        "doc_id long, body string, _order_ts long")
    assert sink.write(df) == 10

    session = factory()
    try:
        got = {r.doc_id: (r.body, r.wt) for r in session._session.execute(
            f"SELECT doc_id, body, writetime(body) AS wt FROM {ks}.docs")}
        assert got == {i: (f"body-{i}", base_us + i) for i in range(10)}
        session._session.execute(f"DROP KEYSPACE {ks}")
    finally:
        session.close()
