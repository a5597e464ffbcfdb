"""Structured Streaming incremental ingestion — the streaming twin of the
batch work-unit path.

The reference has no true streaming (SURVEY §1.6/§2.10): Kafka is bounded
micro-batch RDDs over checkpointed OffsetRanges. The modern equivalent is
``readStream`` + ``Trigger.AvailableNow`` (bounded catch-up per run, rate
capped by maxOffsetsPerTrigger == max_messages semantics) with Spark's own
checkpointLocation replacing the metadata manager, plus watermarked
event-time operators the reference lacks entirely (late/duplicate handling
was pushed to sink key semantics; here it's first-class).

Sinks go through ``foreachBatch`` so every micro-batch reuses the exact
batch writers (TableSink ops, FileSink) — one code path for both modes.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import DataStreamWriter


def read_parquet_stream(spark: SparkSession, path: str, schema: T.StructType,
                        max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based incremental source: new files become micro-batches (the
    streaming twin of the partition work-unit calculator)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def read_kafka_stream(spark: SparkSession, bootstrap_servers: str, topic: str,
                      max_offsets_per_trigger: int | None = 1_000_000,
                      starting_offsets: str = "latest") -> DataFrame:
    """Kafka incremental source: the streaming twin of
    sources/kafka.KafkaWorkUnitCalculator.

    ``maxOffsetsPerTrigger`` IS the reference's max_messages rate cap
    (KafkaSourceConfiguration.java:43-44) enforced by Spark per trigger
    with the same fair per-partition proration; ``failOnDataLoss`` stays
    true so missing offsets raise (KafkaWorkUnitCalculator data-loss
    semantics — pass a reset policy downstream to mimic
    KafkaOffsetResetter instead). Value arrives as binary; decode with
    converters.AvroDecodeConverter (registry-served .avsc, the
    reference's canonical wire format) or JsonDecodeConverter at the
    edge.

    Untestable in this container (no broker) — construction only; the
    offset planning logic itself is covered via sources/kafka.py and the
    option contract by tests/test_kafka_workunits.py seam goldens.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_stream_options(bootstrap_servers, topic,
                                     max_offsets_per_trigger,
                                     starting_offsets).items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_stream_options(bootstrap_servers: str, topic: str,
                         max_offsets_per_trigger: int | None = 1_000_000,
                         starting_offsets: str = "latest",
                         min_partitions: int | None = None) -> dict[str, str]:
    """The exact option dict handed to the kafka connector — split out so
    the wire contract is testable without a broker in the environment.

    ``min_partitions`` is the parallel-broker-read contract (the
    reference's >=256-reader fan-out, KafkaSource.java:117-127): the
    connector splits topic-partitions into at least this many offset
    slices so read parallelism is decoupled from the topic's partition
    count."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def windowed_counts(events: DataFrame, ts_col: str = "ts",
                    window: str = "1 hour", watermark: str = "2 hours",
                    keys: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Watermarked tumbling-window aggregation (batch twin:
    queries.hourly_windowed_agg)."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window), *keys)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("sum_value")))


def session_windows(events: DataFrame, ts_col: str = "ts",
                    gap: str = "30 minutes", watermark: str = "2 hours",
                    key: str = "user_id") -> DataFrame:
    """Gap-based session windows (batch twin: sessionization_gap30m)."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap), key)
            .agg(F.count(F.lit(1)).alias("n_events")))


def dedup_stream(events: DataFrame, key_cols: list[str], ts_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup within the watermark horizon — the streaming
    face of DEDUP_INSERT (state-store backed instead of sink anti-join).

    State caveat: ``dropDuplicates`` keeps EVERY seen key forever unless
    the event-time column itself is part of ``key_cols`` — the watermark
    only bounds how late a duplicate may arrive, not the state size. For
    an unbounded key domain use ``dedup_stream_bounded`` below, whose
    state expires at the watermark."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def dedup_stream_bounded(events: DataFrame, key_cols: list[str],
                         ts_col: str = "ts",
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` expires each key's state once the
    watermark passes its first-seen event time, so state size follows
    the watermark window's key arrival rate, never the lifetime key
    count — the only shape that survives an unbounded ingest at 100 TB.
    Semantics trade-off (document, don't hide): a duplicate arriving
    AFTER its twin's state expired is re-emitted; the horizon is the
    dedup guarantee, exactly like the reference's retention-bounded
    Kafka replay window."""
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))


def dedup_stream_by_content(docs: DataFrame, text_col: str = "text",
                            ts_col: str = "ts",
                            watermark: str = "1 hour") -> DataFrame:
    """Content-digest streaming dedup: the batch exact_dedup contract
    (operators/dedup.py content_digest — same md5, so batch and stream
    CANNOT disagree on what counts as identical) behind bounded
    within-watermark state. One projection + the state-store lookup; no
    shuffle beyond the state partitioning."""
    from marmaray_spark.operators.dedup import content_digest

    tagged = docs.withColumn("__digest", content_digest(text_col))
    return (dedup_stream_bounded(tagged, ["__digest"], ts_col, watermark)
            .drop("__digest"))


def enrich_with_dimension(stream: DataFrame, dim: DataFrame,
                          on: str, how: str = "left") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins the CURRENT
    dimension snapshot (re-resolved per trigger for file-based dims).
    The static side broadcasts when small; no state store involved —
    the streaming twin of the dispersal flows' dimension projection."""
    return stream.join(F.broadcast(dim), on, how)


def stateful_running_totals(events: DataFrame, key_col: str = "user_id",
                            value_col: str = "value",
                            idle_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator: per-key running event count + value sum
    carried across micro-batches via ``applyInPandasWithState``.

    The shape Spark's built-in windowed aggs can't express: arbitrary
    per-key state with programmatic update logic and optional idle-state
    expiry (processing-time timeout emits a final row and frees the
    state). State lives in the executor state store, partitioned by key
    — no driver state, so the operator scales with the cluster exactly
    like a shuffle.

    Output (update mode): one row per key per trigger —
    (key, events_total, value_total, expired).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} long, events_total long, value_total double, expired boolean"
    state_schema = "cnt long, total double"

    def update_fn(key, pdf_iter, state):
        if state.hasTimedOut:
            cnt, total = state.get
            state.remove()
            yield pd.DataFrame({key_col: [key[0]], "events_total": [cnt],
                                "value_total": [float(total)], "expired": [True]})
            return
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            cnt += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((cnt, float(total)))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({key_col: [key[0]], "events_total": [cnt],
                            "value_total": [float(total)], "expired": [False]})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_timeout_ms is not None else GroupStateTimeout.NoTimeout)
    return (events.groupBy(key_col)
            .applyInPandasWithState(update_fn, out_schema, state_schema,
                                    "update", timeout))


def streaming_near_dup_flags(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text", bands: int = 8,
                             rows_per_band: int = 2, k: int = 16,
                             shingle_n: int = 3,
                             epoch_col: str | None = None,
                             epoch_idle_timeout_ms: int | None = None) -> DataFrame:
    """Streaming corpus near-dup detection, stage 1: stateful LSH bucket
    memory (the incremental twin of operators/dedup.lsh_candidate_pairs).

    Each arriving document computes its MinHash signature and explodes to
    ``bands`` (band, bucket) keys — pure expressions, same hashes as the
    batch operator. Per key, ``applyInPandasWithState`` remembers the
    minimum doc id ever seen in that bucket (executor state store,
    partitioned by bucket — no driver state) and emits (doc_id, band,
    known): known = the bucket already held an EARLIER doc (a previous
    micro-batch, or a lower id in this one).

    Stage 2 is batch-side in the sink (foreachBatch): a doc is a near-dup
    candidate iff ANY of its bands is known — aggregations can't follow a
    stateful operator in update mode, and the per-doc ANY is a plain
    groupBy inside each micro-batch anyway.

    100 TB posture: state is one long per occupied bucket; the shuffle
    key (band, bucket) is the same O(rows x bands) key set the batch LSH
    join uses. Watermark-free by default (bucket memory lives for the
    whole corpus build). To keep state under a BUDGET on an unbounded
    build, pass ``epoch_col`` (a corpus-build partition id carried on
    each doc — ingest day, shard range, ...): dedup state is then scoped
    per (epoch, band, bucket) and, with ``epoch_idle_timeout_ms``,
    buckets of finished epochs expire after going idle — state size
    tracks the ACTIVE epochs only, observable via the query's
    stateOperators.numRowsTotal progress metric. Cross-epoch near-dups
    are deliberately out of scope for the stream (run the batch
    fuzzy-dedup across epoch outputs for that).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from marmaray_spark.operators.dedup import (lsh_band_buckets,
                                                minhash_digests,
                                                minhash_signature)
    from marmaray_spark.operators.text import word_shingles, words

    group_cols = ["band", "bucket"] + (["epoch"] if epoch_col else [])
    sel = [F.col(id_col).cast("long").alias("doc_id"),
           F.posexplode("__bk").alias("band", "bucket")]
    if epoch_col:
        sel.append(F.col(epoch_col).cast("long").alias("epoch"))
    tagged = (docs
              .withColumn("__w", words(text_col))
              .withColumn("__sh", word_shingles("__w", shingle_n))
              .withColumn("__hh", minhash_digests("__sh"))
              .withColumn("__sig", minhash_signature("__hh", k))
              .withColumn("__bk", lsh_band_buckets("__sig", bands, rows_per_band))
              .select(*sel))

    use_timeout = epoch_col is not None and epoch_idle_timeout_ms is not None

    def update_fn(key, pdf_iter, state):
        if use_timeout and state.hasTimedOut:
            state.remove()          # finished epoch's bucket leaves the store
            return
        seen = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdf_iter)).sort_values("doc_id")
        known = []
        for did in pdf["doc_id"]:
            known.append(seen is not None and int(seen) != int(did))
            seen = int(did) if seen is None else min(int(seen), int(did))
        state.update((int(seen),))
        if use_timeout:
            state.setTimeoutDuration(epoch_idle_timeout_ms)
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                            "band": pdf["band"].astype("int32"),
                            "known": known})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if use_timeout
               else GroupStateTimeout.NoTimeout)
    return (tagged.groupBy(*group_cols)
            .applyInPandasWithState(update_fn,
                                    outputStructType="doc_id long, band int, known boolean",
                                    stateStructType="min_seen long",
                                    outputMode="update",
                                    timeoutConf=timeout))


def foreach_batch_table_sink(stream: DataFrame, table_path: str,
                             record_key_field: str,
                             partition_field: str | None,
                             op: str,
                             checkpoint_dir: str,
                             transform: Callable[[DataFrame], DataFrame] | None = None,
                             precombine_field: str | None = None,
                             ) -> DataStreamWriter:
    """Route a stream into a managed TableSink via foreachBatch.

    Exactly-once: Spark's checkpoint makes batch delivery at-least-once
    across restarts; TableSink's commit log plus the per-batch epoch id in
    commit metadata makes replayed batches detectable/idempotent (the
    HoodieBasedMetadataManager pattern carried to streaming).

    The epoch key is namespaced by the streaming query's id (read from the
    checkpoint metadata), because epoch ids restart from 0 with every fresh
    checkpointLocation — an un-namespaced guard would silently drop the
    first batches of a NEW query pointed at an existing table when its
    epochs 0..N collide with a previous query's commits.
    """
    import hashlib
    import json as _json
    from pathlib import Path

    from marmaray_spark.sinks.table import TableSink, WriteOp

    def query_namespace() -> str:
        # Structured Streaming writes {"id": "<uuid>"} into
        # <checkpoint>/metadata at query start; a reset checkpoint dir gets
        # a fresh uuid. Fall back to the path when not yet present.
        try:
            return _json.loads((Path(checkpoint_dir) / "metadata").read_text())["id"]
        except (OSError, ValueError, KeyError):
            return hashlib.sha1(
                str(Path(checkpoint_dir).resolve()).encode()).hexdigest()[:16]

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # precombine matters MOST here: an availableNow backlog drain
        # can deliver several versions of one key in a single batch,
        # which upsert's unique-per-key contract otherwise rejects
        # silently (duplicate rows)
        sink = TableSink(batch_df.sparkSession, table_path, record_key_field,
                         partition_field,
                         precombine_field=precombine_field)
        epoch_key = f"{query_namespace()}:{epoch_id}"
        if any(c.metadata.get("epoch") == epoch_key for c in sink.log.commits()):
            return  # replayed batch of THIS query — already committed
        df = transform(batch_df) if transform is not None else batch_df
        sink.write(df, WriteOp(op), metadata={"epoch": epoch_key})

    return (stream.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir))


def run_available_now(writer: DataStreamWriter) -> None:
    """Process everything currently available, then stop — one bounded
    incremental run, the reference's micro-batch execution model."""
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
