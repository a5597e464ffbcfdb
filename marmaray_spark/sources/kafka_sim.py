"""File-backed fake Kafka broker: a consumer-surface double for the
offset-planning and ranged-read legs the sandbox can't exercise against
a real cluster.

Reference parity: the reference consumes real broker offset ranges
(marmaray/src/main/java/com/uber/marmaray/common/sources/kafka/
KafkaSource.java:261-292 — assign, seek to range start, poll until the
range end). This double implements exactly the surface our engine needs
from that consumer:

- ``earliest_offsets`` / ``latest_offsets`` — the BrokerState protocol
  the work-unit calculator plans against (retention moves earliest);
- ``poll(ranges)`` — the ranged read: records of the assigned ranges in
  (partition, offset) order, the contract ``filter_by_offset_ranges``
  re-expresses as a pushed-down DataFrame predicate;
- ``to_dataframe`` — the same log as a Kafka-connector-shaped frame
  (partition / offset / key / value / timestamp_ms), so poll-vs-filter
  parity is a testable equality, not an assumption.

File-backed (JSON-lines per partition under ``root/<topic>/p<N>``) so a
"restarted" consumer sees the same log — checkpoint/replay tests cross a
process boundary for real. Driver-scale only by design: this is a
contract double, not a data path; the production path stays
``spark.read/readStream.format("kafka")`` with the planner's offsets
(streaming/incremental.py kafka_stream_options).
"""

from __future__ import annotations

import base64
import json
from pathlib import Path
from typing import Iterable

from marmaray_spark.sources.kafka import OffsetRange


class DirectoryKafkaBroker:
    """One topic per instance; partitions are append-only JSONL files
    plus a meta file carrying the retention floor (earliest offset)."""

    def __init__(self, root: str | Path, topic: str,
                 n_partitions: int | None = None) -> None:
        self.topic = topic
        self.dir = Path(root) / topic
        self.dir.mkdir(parents=True, exist_ok=True)
        existing = sorted(int(p.name[1:]) for p in self.dir.glob("p*")
                          if p.name[1:].isdigit())
        if n_partitions is None:
            if not existing:
                raise ValueError(f"topic {topic!r} does not exist at {root}")
            self.partitions = existing
        else:
            self.partitions = list(range(n_partitions))
            for p in self.partitions:
                (self.dir / f"p{p}").touch()

    # -- producer side -----------------------------------------------------

    def append(self, partition: int, value: bytes,
               key: bytes | None = None, timestamp_ms: int = 0) -> int:
        """Append one record; returns its offset."""
        if partition not in self.partitions:
            raise KeyError(f"unknown partition {partition}")
        offset = self.latest_offsets()[partition]
        rec = {"offset": offset,
               "key": None if key is None else base64.b64encode(key).decode(),
               "value": base64.b64encode(value).decode(),
               "timestamp_ms": timestamp_ms}
        with open(self.dir / f"p{partition}", "a") as f:
            f.write(json.dumps(rec) + "\n")
        return offset

    def expire(self, partition: int, up_to_offset: int) -> None:
        """Retention: drop records with offset < up_to_offset. Earliest
        advances; a consumer checkpointed before it has lost data."""
        floors = self._floors()
        floors[str(partition)] = max(floors.get(str(partition), 0), up_to_offset)
        (self.dir / "_meta.json").write_text(json.dumps({"floors": floors}))

    # -- BrokerState protocol ---------------------------------------------

    def _floors(self) -> dict[str, int]:
        meta = self.dir / "_meta.json"
        if meta.exists():
            return dict(json.loads(meta.read_text()).get("floors", {}))
        return {}

    def earliest_offsets(self) -> dict[int, int]:
        floors = self._floors()
        return {p: int(floors.get(str(p), 0)) for p in self.partitions}

    def latest_offsets(self) -> dict[int, int]:
        out = {}
        for p in self.partitions:
            lines = (self.dir / f"p{p}").read_text().splitlines()
            out[p] = (json.loads(lines[-1])["offset"] + 1) if lines else 0
        return out

    # -- consumer side -----------------------------------------------------

    def poll(self, ranges: Iterable[OffsetRange]) -> list[dict]:
        """All records of the assigned ranges, (partition, offset)-ordered
        — KafkaSource.java:261-292's seek+poll loop as one call. Reading
        an expired offset raises, like failOnDataLoss=true."""
        earliest = self.earliest_offsets()
        out = []
        for r in sorted(ranges, key=lambda r: (r.partition, r.from_offset)):
            if r.from_offset < earliest.get(r.partition, 0):
                raise OSError(
                    f"offset {r.from_offset} expired on partition "
                    f"{r.partition} (earliest {earliest[r.partition]})")
            for line in (self.dir / f"p{r.partition}").read_text().splitlines():
                rec = json.loads(line)
                if r.from_offset <= rec["offset"] < r.until_offset:
                    out.append({
                        "partition": r.partition,
                        "offset": rec["offset"],
                        "key": (None if rec["key"] is None
                                else base64.b64decode(rec["key"])),
                        "value": base64.b64decode(rec["value"]),
                        "timestamp_ms": rec["timestamp_ms"],
                    })
        return out

    def to_dataframe(self, spark):
        """The whole log as a Kafka-connector-shaped DataFrame."""
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("timestamp_ms", T.LongType()),
        ])
        earliest = self.earliest_offsets()
        rows = self.poll([OffsetRange(p, earliest[p], hi)
                          for p, hi in self.latest_offsets().items()])
        return spark.createDataFrame(
            [(r["partition"], r["offset"], r["key"], r["value"],
              r["timestamp_ms"]) for r in rows], schema)


def split_ranges(ranges: Iterable[OffsetRange],
                 min_partitions: int) -> list[OffsetRange]:
    """The connector's ``minPartitions`` fan-out contract, reproduced for
    the double: slice the planned ranges so at least ``min_partitions``
    read tasks exist (largest ranges split first), offsets preserved
    exactly. The reference's >=256-parallel-reader behavior
    (KafkaSource.java:117-127) decoupled from topic partition count."""
    out = [r for r in ranges if r.size > 0]
    if not out:
        return []
    while len(out) < min_partitions:
        out.sort(key=lambda r: -r.size)
        big = out[0]
        if big.size <= 1:
            break
        mid = big.from_offset + big.size // 2
        out = ([OffsetRange(big.partition, big.from_offset, mid),
                OffsetRange(big.partition, mid, big.until_offset)]
               + out[1:])
    return sorted(out, key=lambda r: (r.partition, r.from_offset))


def run_incremental_epoch(spark, broker: DirectoryKafkaBroker,
                          metadata, sink_path: str, *,
                          max_messages: int = 1_000_000,
                          bootstrap_at: str = "earliest",
                          reset_on_data_loss: str | None = None,
                          min_partitions: int | None = None) -> int:
    """ONE full marmaray-style incremental run against the broker double:
    plan (KafkaWorkUnitCalculator) -> ranged read (the pushed-down
    ``filter_by_offset_ranges`` predicate over the connector-shaped
    frame, optionally ``split_ranges``-fanned) -> append to the sink ->
    commit next-run offsets through the metadata manager. Returns rows
    written.

    This is the loop the reference runs per execution
    (KafkaSource.java:261-292 seek+poll inside, KafkaWorkUnitCalculator
    planning outside); with a FileSystemMetadataManager and the
    file-backed broker every piece of state crosses a process boundary,
    so bootstrap -> consume -> restart -> data-loss -> reset -> resume is
    testable end to end (tests/test_kafka_contract.py)."""
    from marmaray_spark.sources.kafka import (KafkaWorkUnitCalculator,
                                              filter_by_offset_ranges)

    calc = KafkaWorkUnitCalculator(
        broker.topic, broker, metadata, max_messages=max_messages,
        bootstrap_at=bootstrap_at, reset_on_data_loss=reset_on_data_loss)
    ranges = calc.compute_work_units()
    wrote = 0
    if ranges:
        read_ranges = split_ranges(ranges, min_partitions) \
            if min_partitions else ranges
        df = filter_by_offset_ranges(broker.to_dataframe(spark), read_ranges)
        df.write.mode("append").parquet(str(sink_path))
        wrote = sum(r.size for r in ranges)
    calc.save_next_run_state(ranges)
    metadata.save_changes()
    return wrote
