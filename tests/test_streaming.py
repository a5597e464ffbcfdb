"""Structured Streaming tests: AvailableNow incremental ingestion into the
managed table (exactly-once via epoch ids), windowed/session aggs, and
batch-stream result parity."""

import pytest
from pyspark.sql import functions as F

from marmaray_spark.sinks.table import CommitLog, TableSink
from marmaray_spark.streaming.incremental import (
    dedup_stream,
    foreach_batch_table_sink,
    read_parquet_stream,
    run_available_now,
    session_windows,
    windowed_counts,
)


@pytest.fixture()
def event_batches(spark, tmp_path):
    """Two parquet drops shaped like micro-batches (ts as timestamps)."""
    src = tmp_path / "stream_src"
    rows1 = [(1, "2024-01-01 10:00:00", 7, "click", 1.0),
             (2, "2024-01-01 10:10:00", 7, "click", 2.0),
             (3, "2024-01-01 11:05:00", 8, "view", 3.0)]
    rows2 = [(4, "2024-01-01 11:20:00", 7, "view", 4.0),
             (4, "2024-01-01 11:20:00", 7, "view", 4.0),   # duplicate event
             (5, "2024-01-01 12:40:00", 8, "click", 5.0)]
    schema = "event_id long, ts string, user_id long, event_type string, value double"
    for i, rows in enumerate([rows1, rows2]):
        (spark.createDataFrame(rows, schema)
         .withColumn("ts", F.to_timestamp("ts"))
         .write.parquet(str(src / f"batch{i}")))
    full_schema = (spark.read.parquet(str(src / "batch0"))).schema
    return src, full_schema


def test_available_now_ingest_into_table(spark, event_batches, tmp_path):
    src, schema = event_batches
    table = tmp_path / "stream_table"
    stream = read_parquet_stream(spark, f"{src}/batch*", schema)
    writer = foreach_batch_table_sink(
        stream, str(table), record_key_field="event_id",
        partition_field="event_type", op="dedup_insert",
        checkpoint_dir=str(tmp_path / "ckpt"))
    run_available_now(writer)

    sink = TableSink(spark, table, "event_id", "event_type")
    back = sink.read()
    # 5 distinct event ids (the in-batch duplicate of id 4 collapses via
    # dedup_insert's anti-join... which only filters vs existing; same-batch
    # dupes need the stream-side dedup below, so expect 6 rows here)
    assert back.count() in (5, 6)
    commits = CommitLog(table).commits()
    assert all("epoch" in c.metadata for c in commits)

    # a re-run with the same checkpoint ingests nothing new
    stream2 = read_parquet_stream(spark, f"{src}/batch*", schema)
    run_available_now(foreach_batch_table_sink(
        stream2, str(table), "event_id", "event_type", "dedup_insert",
        str(tmp_path / "ckpt")))
    assert sink.read().count() == back.count()


def test_stream_dedup_then_ingest(spark, event_batches, tmp_path):
    src, schema = event_batches
    table = tmp_path / "dedup_table"
    stream = dedup_stream(read_parquet_stream(spark, f"{src}/batch*", schema),
                          ["event_id"])
    run_available_now(foreach_batch_table_sink(
        stream, str(table), "event_id", "event_type", "dedup_insert",
        str(tmp_path / "ckpt2")))
    back = TableSink(spark, table, "event_id", "event_type").read()
    assert back.count() == 5
    assert back.select("event_id").distinct().count() == 5


def test_dedup_stream_bounded_state_drops_in_horizon_dupes(
        spark, event_batches, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    horizon collapse (in-batch AND cross-batch while state lives); the
    bounded-state form must agree with dedup_stream on this corpus."""
    from marmaray_spark.streaming.incremental import dedup_stream_bounded

    src, schema = event_batches
    stream = dedup_stream_bounded(
        read_parquet_stream(spark, f"{src}/batch*", schema),
        ["event_id"], watermark="4 hours")
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName("ddwm_out").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("select event_id from ddwm_out").collect()
    ids = sorted(r["event_id"] for r in got)
    assert ids == [1, 2, 3, 4, 5]          # the doubled id-4 collapsed


def test_dedup_stream_by_content_matches_batch_digests(spark, tmp_path):
    """Content-digest streaming dedup emits exactly one survivor per
    distinct text, and its digest contract is the BATCH exact_dedup's
    content_digest (same md5) — stream survivors == batch keepers by
    content."""
    from marmaray_spark.operators.dedup import exact_dedup
    from marmaray_spark.streaming.incremental import (
        dedup_stream_by_content, read_parquet_stream)

    src = tmp_path / "docsrc"
    rows = [(1, "2024-01-01 10:00:00", "alpha beta gamma"),
            (2, "2024-01-01 10:01:00", "delta epsilon"),
            (3, "2024-01-01 10:02:00", "alpha beta gamma"),   # dup of 1
            (4, "2024-01-01 10:03:00", "zeta eta")]
    df = (spark.createDataFrame(rows, "doc_id long, ts string, text string")
          .withColumn("ts", F.to_timestamp("ts")))
    df.write.parquet(str(src / "batch0"))
    schema = spark.read.parquet(str(src / "batch0")).schema

    out = dedup_stream_by_content(
        read_parquet_stream(spark, f"{src}/batch*", schema),
        watermark="1 hour")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("cdd_out").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("select doc_id, text from cdd_out").collect()
    assert len(got) == 3                       # one survivor per text
    assert "__digest" not in spark.sql("select * from cdd_out").columns
    stream_texts = sorted(r["text"] for r in got)
    batch_keep = exact_dedup(df, "doc_id", "text")
    assert stream_texts == sorted(
        r["text"] for r in
        df.join(batch_keep.select(F.col("keeper_id").alias("doc_id")),
                "doc_id", "left_semi").collect())


def test_windowed_counts_matches_batch(spark, event_batches, tmp_path):
    src, schema = event_batches
    stream = read_parquet_stream(spark, f"{src}/batch*", schema)
    agg = windowed_counts(stream, window="1 hour", watermark="10 minutes")
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("win_out")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["window"]["start"].hour, r["event_type"]): r["n"]
           for r in spark.sql("SELECT * FROM win_out").collect()}
    batch = spark.read.parquet(f"{src}/batch0", f"{src}/batch1")
    expected = {(r["h"], r["event_type"]): r["n"] for r in
                batch.groupBy(F.hour("ts").alias("h"), "event_type")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == expected


def test_session_windows(spark, event_batches):
    src, schema = event_batches
    stream = read_parquet_stream(spark, f"{src}/batch*", schema)
    sess = session_windows(stream, gap="30 minutes", watermark="10 minutes")
    q = (sess.writeStream.outputMode("complete")
         .format("memory").queryName("sess_out")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT user_id, n_events FROM sess_out").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    # user 7: 10:00+10:10 in one session; 11:20 (x2 dup) separate -> [2, 2]
    assert sorted(per_user[7]) == [2, 2]
    # user 8: 11:05 and 12:40 far apart -> two singleton sessions
    assert sorted(per_user[8]) == [1, 1]


def test_stateful_running_totals_across_batches(spark, event_batches, tmp_path):
    """applyInPandasWithState carries per-user state across micro-batches:
    with maxFilesPerTrigger=1 the two parquet drops arrive as separate
    triggers and the second trigger's totals include the first's."""
    from marmaray_spark.streaming.incremental import stateful_running_totals

    src, schema = event_batches
    stream = read_parquet_stream(spark, f"{src}/batch*", schema,
                                 max_files_per_trigger=1)
    out = stateful_running_totals(stream, "user_id", "value")
    seen = []

    def capture(batch_df, epoch_id):
        seen.append({(r["user_id"]): (r["events_total"], r["value_total"])
                     for r in batch_df.collect()})

    q = (out.writeStream.foreachBatch(capture)
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "state_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    assert len(seen) >= 2
    final = {}
    for batch in seen:
        final.update(batch)
    # user 7: events 1,2 (batch0) + 4,4-dup (batch1) = 4 events, sum 1+2+4+4
    assert final[7] == (4, 11.0)
    # user 8: events 3 (batch0) + 5 (batch1) = 2 events, sum 3+5
    assert final[8] == (2, 8.0)
    # intermediate state was visible: some batch saw user 7 with fewer events
    assert any(batch.get(7, (0, 0))[0] < 4 for batch in seen if 7 in batch)


def test_read_kafka_stream_construction(spark):
    """No broker/connector in this container: the reader must build its
    options and fail only at .load() with the connector-missing error —
    proving the construction path is wired for a real deployment."""
    import pytest
    from pyspark.errors import AnalysisException

    from marmaray_spark.streaming.incremental import read_kafka_stream

    with pytest.raises(AnalysisException, match="kafka"):
        read_kafka_stream(spark, "localhost:9092", "events_topic")


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed agg: an event older than the watermark arrives
    in a later micro-batch and is dropped from its (already finalized)
    window — the late-data contract the reference delegated to sink key
    semantics, first-class here."""
    src = tmp_path / "late_src"
    schema = "event_id long, ts string, user_id long, event_type string, value double"
    # b0 advances max event time to 12:00 (wm 11:50 once committed);
    # b1 lets the engine finalize+emit the 10:00 window under that wm;
    # b2 then delivers a LATE 10:30 event for the already-emitted window.
    batch0 = [(1, "2024-01-01 10:00:00", 7, "click", 1.0),
              (2, "2024-01-01 12:00:00", 7, "click", 1.0)]
    batch1 = [(3, "2024-01-01 12:05:00", 7, "click", 1.0)]
    batch2 = [(4, "2024-01-01 10:30:00", 7, "click", 1.0),   # LATE
              (5, "2024-01-01 12:10:00", 7, "click", 1.0)]
    import os
    import time as _time

    for i, rows in enumerate([batch0, batch1, batch2]):
        (spark.createDataFrame(rows, schema)
         .withColumn("ts", F.to_timestamp("ts"))
         .coalesce(1).write.parquet(str(src / f"b{i}")))
        # distinct mtimes pin trigger order (file source sorts by mod time)
        now = _time.time() + i * 10
        for root, _dirs, files in os.walk(src / f"b{i}"):
            for f in files:
                os.utime(os.path.join(root, f), (now, now))

    full_schema = spark.read.parquet(str(src / "b0")).schema
    stream = read_parquet_stream(spark, f"{src}/b*", full_schema,
                                 max_files_per_trigger=1)
    agg = windowed_counts(stream, window="1 hour", watermark="10 minutes")
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName("late_out")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM late_out").collect()
    got = {}
    for r in rows:
        got.setdefault(r["window"]["start"].hour, []).append(r["n"])
    # the 10:00 window was finalized+emitted ONCE with only the on-time
    # event; the later 10:30 arrival neither merged nor re-emitted it
    # (append mode emits each window exactly once)
    assert got.get(10) == [1]
    # the 12:00 window never finalized (wm stops at 12:00)
    assert 12 not in got


def test_stream_static_enrichment_join(spark, event_batches, tmp_path):
    from marmaray_spark.streaming.incremental import enrich_with_dimension

    src, schema = event_batches
    dim = spark.createDataFrame([(7, "gold"), (8, "basic")],
                                ["user_id", "tier"])
    stream = read_parquet_stream(spark, f"{src}/batch*", schema)
    out = enrich_with_dimension(stream, dim, on="user_id")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("enrich_out").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT user_id, tier FROM enrich_out").collect()
    tiers = {r["user_id"]: r["tier"] for r in rows}
    assert tiers == {7: "gold", 8: "basic"}
    assert len(rows) == 6  # every event enriched


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join: clicks join views per user within the
    event-time constraint, state bounded by watermarks on both sides —
    the join shape no incremental-batch framework can express."""
    src = tmp_path / "ss_src"
    schema = "event_id long, ts string, user_id long, event_type string, value double"
    rows = [(1, "2024-01-01 10:00:00", 7, "click", 1.0),
            (2, "2024-01-01 10:05:00", 7, "view", 2.0),
            (3, "2024-01-01 10:07:00", 8, "click", 3.0),
            (4, "2024-01-01 11:30:00", 8, "view", 4.0)]  # too far from click
    (spark.createDataFrame(rows, schema)
     .withColumn("ts", F.to_timestamp("ts"))
     .coalesce(1).write.parquet(str(src / "b0")))
    full_schema = spark.read.parquet(str(src / "b0")).schema

    base = read_parquet_stream(spark, f"{src}/b*", full_schema)
    clicks = (base.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("click_ts"))
              .withWatermark("click_ts", "10 minutes"))
    views = (base.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", "10 minutes"))
    joined = clicks.join(
        views,
        F.expr("user_id = v_user AND "
               "view_ts BETWEEN click_ts AND click_ts + INTERVAL 30 MINUTES"))
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("ss_out").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user_id"], r["view_ts"].minute)
           for r in spark.sql("SELECT * FROM ss_out").collect()}
    assert got == {(7, 5)}   # user 7's view within 30 min; user 8's is not


def test_fresh_query_on_existing_table_not_skipped(spark, event_batches, tmp_path):
    """Epoch ids restart at 0 with a fresh checkpointLocation; the replay
    guard is namespaced by query id so a NEW query's first batches are not
    mistaken for replays of an old query's epochs (silent data loss)."""
    src, schema = event_batches
    table = tmp_path / "ns_table"
    run_available_now(foreach_batch_table_sink(
        read_parquet_stream(spark, f"{src}/batch*", schema),
        str(table), "event_id", None, "insert", str(tmp_path / "ck_a")))
    sink = TableSink(spark, table, "event_id")
    n1 = sink.read().count()
    assert n1 > 0

    # brand-new query (fresh checkpoint) over the same source, same table
    run_available_now(foreach_batch_table_sink(
        read_parquet_stream(spark, f"{src}/batch*", schema),
        str(table), "event_id", None, "insert", str(tmp_path / "ck_b")))
    assert sink.read().count() == 2 * n1


def test_avro_wire_stream_to_table_e2e(spark, tmp_path):
    """The canonical marmaray Kafka topology end-to-end, minus only the
    broker: binary Avro payloads arrive as a stream -> registry-served
    .avsc decode (AvroDecodeConverter) -> valid|error fork -> table
    upsert via foreachBatch; a second micro-batch upserts over the first
    and the malformed payload lands in the error channel, not the table."""
    from pyspark.sql import functions as F

    from marmaray_spark.converters import AvroDecodeConverter
    from marmaray_spark.functions.avro_codec import encode_record
    from marmaray_spark.schema_registry import FileSystemSchemaRegistry
    from marmaray_spark.sinks.table import TableSink
    from marmaray_spark.streaming.incremental import foreach_batch_table_sink

    avsc = {"type": "record", "name": "Rider", "fields": [
        {"name": "rider_id", "type": "long"},
        {"name": "city", "type": "string"},
        {"name": "fare", "type": "double"}]}
    registry = FileSystemSchemaRegistry(tmp_path / "registry")
    registry.put_avro_schema("rider", avsc)

    inbox = tmp_path / "inbox"
    inbox.mkdir()

    def land(batch_name, records, garbage=False):
        rows = [(encode_record(avsc, r),) for r in records]
        if garbage:
            rows.append((b"\x02\x04ab",))  # truncated: fare bytes missing
        spark.createDataFrame(rows, "value binary") \
            .write.mode("overwrite").parquet(str(inbox / batch_name))

    land("b0", [{"rider_id": 1, "city": "sf", "fare": 10.0},
                {"rider_id": 2, "city": "la", "fare": 20.0}])

    conv = AvroDecodeConverter(registry, "rider")
    errors = []

    def transform(batch_df):
        res = conv.map(batch_df)
        errors.append(res.errors.count())
        return res.valid.select("rider_id", "city", "fare")

    stream = (spark.readStream.schema("value binary")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(inbox / "*")))
    q = foreach_batch_table_sink(
        stream, tmp_path / "table", record_key_field="rider_id",
        partition_field=None, op="upsert",
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=transform).trigger(availableNow=True).start()
    q.awaitTermination(120)

    t = TableSink(spark, tmp_path / "table", record_key_field="rider_id")
    got = {r["rider_id"]: (r["city"], r["fare"]) for r in t.read().collect()}
    assert got == {1: ("sf", 10.0), 2: ("la", 20.0)}
    assert sum(errors) == 0

    # second wave: update rider 1, new rider 3, one malformed payload
    land("b1", [{"rider_id": 1, "city": "nyc", "fare": 33.0},
                {"rider_id": 3, "city": "chi", "fare": 7.5}], garbage=True)
    q2 = foreach_batch_table_sink(
        stream, tmp_path / "table", record_key_field="rider_id",
        partition_field=None, op="upsert",
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=transform).trigger(availableNow=True).start()
    q2.awaitTermination(120)

    got = {r["rider_id"]: (r["city"], r["fare"]) for r in t.read().collect()}
    assert got == {1: ("nyc", 33.0), 2: ("la", 20.0), 3: ("chi", 7.5)}
    assert sum(errors) == 1          # the garbage payload forked to errors


def test_streaming_near_dup_filter_across_batches(spark, tmp_path):
    """Streaming LSH dedup: stateful bucket memory carries across
    micro-batches (checkpointed), so a wave-2 near-duplicate of a wave-1
    doc is flagged while novel docs pass; per-doc decision is the batch-
    side ANY over band flags."""
    from pyspark.sql import functions as F

    from marmaray_spark.streaming.incremental import streaming_near_dup_flags

    base = ("spark engine reads parquet files and writes tables with "
            "commits and checkpoints for incremental runs " * 2)
    near = base.replace("writes", "stores")          # near-dup of base
    other = ("completely different vocabulary about cooking pasta sauce "
             "at home tonight with garlic and fresh basil leaves " * 2)
    novel = ("yet another topic entirely about mountain hiking trails "
             "maps compasses and weather forecasts for the weekend " * 2)

    inbox = tmp_path / "docs"
    inbox.mkdir()
    decisions = {}

    def land(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.mode("overwrite").parquet(str(inbox / name))

    def run_wave():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).parquet(str(inbox / "*")))
        flags = streaming_near_dup_flags(stream)

        def sink(batch_df, epoch_id):
            for r in (batch_df.groupBy("doc_id")
                      .agg(F.max(F.col("known").cast("int")).alias("dup"))
                      .collect()):
                decisions[r["doc_id"]] = max(decisions.get(r["doc_id"], 0),
                                             r["dup"])

        q = (flags.writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    land("w1", [(1, base), (2, other)])
    run_wave()
    assert decisions == {1: 0, 2: 0}            # first sighting: both pass

    land("w2", [(3, near), (4, novel)])
    run_wave()
    assert decisions[3] == 1                    # near-dup of doc 1 flagged
    assert decisions[4] == 0                    # novel doc passes


def test_streaming_near_dup_epoch_scoped_state(spark, tmp_path):
    """Epoch-bounded dedup state: with epoch_col the bucket memory is
    scoped per (epoch, band, bucket) — a duplicate WITHIN an epoch is
    flagged, the same text arriving under a NEW epoch is not (fresh
    state), and the state store's numRowsTotal is observable via query
    progress (the budget signal a corpus build watches)."""
    from pyspark.sql import functions as F

    from marmaray_spark.streaming.incremental import streaming_near_dup_flags

    text = ("spark engine reads parquet files and writes tables with "
            "commits and checkpoints for incremental runs " * 2)
    inbox = tmp_path / "docs"
    inbox.mkdir()
    decisions = {}
    state_rows = []

    def land(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string, epoch long") \
            .write.mode("overwrite").parquet(str(inbox / name))

    def run_wave():
        stream = (spark.readStream.schema("doc_id long, text string, epoch long")
                  .option("maxFilesPerTrigger", 1).parquet(str(inbox / "*")))
        flags = streaming_near_dup_flags(stream, epoch_col="epoch",
                                         epoch_idle_timeout_ms=3_600_000)

        def sink(batch_df, epoch_id):
            for r in (batch_df.groupBy("doc_id")
                      .agg(F.max(F.col("known").cast("int")).alias("dup"))
                      .collect()):
                decisions[r["doc_id"]] = max(decisions.get(r["doc_id"], 0),
                                             r["dup"])

        q = (flags.writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        for p in q.recentProgress:
            for op in p["stateOperators"]:
                state_rows.append(op["numRowsTotal"])

    land("w1", [(1, text, 10)])
    run_wave()
    assert decisions == {1: 0}

    land("w2", [(2, text, 10), (3, text, 20)])   # dup in epoch 10; fresh in 20
    run_wave()
    assert decisions[2] == 1                     # same epoch -> flagged
    assert decisions[3] == 0                     # new epoch -> fresh state
    # state grew to both epochs' buckets and is reported per trigger
    assert state_rows and max(state_rows) >= 16  # 8 bands x 2 epochs


def test_stream_to_table_to_maintained_rollup_chain(spark, tmp_path):
    """The full chained pipeline: files stream -> managed table
    (exactly-once foreachBatch) -> incrementally-maintained rollup via
    the table's change stream. After every wave the rollup equals a
    from-scratch aggregate of the table — streams, tables and derived
    tables compose through the same work-unit/commit contracts."""
    from marmaray_spark.metadata import InMemoryMetadataManager
    from marmaray_spark.operators.rollup import maintain_rollup
    from marmaray_spark.sinks.table import TableSink, WriteOp

    src = tmp_path / "in"
    src.mkdir()
    schema = "event_id long, user_id long, amount double"
    table = tmp_path / "events_table"
    rollup_path = tmp_path / "user_totals"
    meta = InMemoryMetadataManager()
    aggs = {"n": ("count", "*"), "total": ("sum", "amount")}

    def land(name, rows):
        spark.createDataFrame(rows, schema).write.parquet(str(src / name))

    def ingest_wave():
        stream = read_parquet_stream(spark, f"{src}/w*", spark.createDataFrame(
            [], schema).schema)
        run_available_now(foreach_batch_table_sink(
            stream, str(table), record_key_field="event_id",
            partition_field=None, op="upsert",
            checkpoint_dir=str(tmp_path / "ckpt")))

    def check():
        base = TableSink(spark, table, "event_id")
        rollup = TableSink(spark, rollup_path, "user_id")
        maintain_rollup(base, rollup, meta, "user_id", aggs)
        expect = {(r["user_id"], r["n"], round(r["total"], 2)) for r in
                  base.read().groupBy("user_id")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum("amount").alias("total")).collect()}
        got = {(r["user_id"], r["n"], round(r["total"], 2)) for r in
               rollup.read().select("user_id", "n", "total").collect()}
        assert got == expect

    land("w0", [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 1.0)])
    ingest_wave()
    check()

    land("w1", [(2, 10, 70.0), (4, 30, 9.0)])   # update + new user
    ingest_wave()
    check()


def test_text_quality_ops_run_in_streaming_unchanged(spark, tmp_path):
    """The round-6 text operators (C4 line cleaning, Gopher gates,
    quality score) are pure Catalyst expressions, so the SAME Column
    objects run in a Structured Streaming pipeline with no code changes
    — the batch/stream unification contract the PII corpus_hygiene op
    established."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from marmaray_spark.operators.text import (c4_clean,
                                               gopher_repetition_pass,
                                               quality_score, words)

    src = tmp_path / "docs_src"
    src.mkdir()
    rows = [(1, "this is a proper sentence with enough words to score.\n"
                "enable javascript now."),
            (2, "spam spam spam spam spam spam spam spam")]
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    spark.createDataFrame(rows, schema).write.parquet(str(src / "b0"))

    stream = (spark.readStream.schema(schema).parquet(str(src) + "/*")
              .withColumn("w", words("text"))
              .withColumn("c4", c4_clean("text"))
              .select("doc_id",
                      quality_score("text", "w").alias("quality"),
                      gopher_repetition_pass("w").alias("gopher_pass"),
                      F.col("c4.lines_total").alias("lines_total"),
                      F.col("c4.lines_kept").alias("lines_kept")))
    out = tmp_path / "out"
    q = (stream.writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert got[1]["lines_total"] == 2 and got[1]["lines_kept"] == 1
    assert got[1]["quality"] > got[2]["quality"]
    assert not got[2]["gopher_pass"]        # pure repetition fails the gate
