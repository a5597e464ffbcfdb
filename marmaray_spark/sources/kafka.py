"""Kafka-style incremental source: offset work units, fair-split cap,
data-loss detection, checkpointed run state.

Reference parity (M/common/sources/kafka/KafkaWorkUnitCalculator.java:70-509):

- computeWorkUnits(): diff checkpointed offsets against broker
  earliest/latest; first run bootstraps at latest (no work units,
  KafkaBootstrapOffsetSelector.java:34-46); new partitions start at
  earliest; cap total messages at ``max_messages`` (default 1,000,000,
  KafkaSourceConfiguration.java:43-44).
- Fair split (:224-255): sort partitions by backlog ascending; for each,
  take = min(pending // remaining_partitions, backlog) — small partitions
  drain fully, the remainder splits evenly across big ones.
  (Divergence from reference: ties in backlog are ordered by partition id
  for determinism; the reference inherits JVM map iteration order.)
- Data loss (:318-362): checkpoint < broker earliest => raise, or — when a
  reset policy is configured — reset all offsets (earliest or latest per
  policy) and report the number of messages lost.
- createNextRunState (:267-281): per partition, max untilOffset of its
  work units; untouched partitions carry their start offset forward.

The planner is driver-side pure Python (the reference's is driver-side
Java over consumer RPCs); the *data* path is a DataFrame filter/join that
scales with the cluster. For real Kafka, feed the ranges to
``spark.read.format("kafka")`` as startingOffsets/endingOffsets JSON.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Mapping, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marmaray_spark.metadata.manager import MetadataManager

DEFAULT_MAX_MESSAGES = 1_000_000  # KafkaSourceConfiguration.java:43-44
OFFSET_KEY_PREFIX = "kafka.offset."


@dataclass(frozen=True)
class OffsetRange:
    """Half-open consume range [from_offset, until_offset) of one partition."""

    partition: int
    from_offset: int
    until_offset: int

    @property
    def size(self) -> int:
        return self.until_offset - self.from_offset


class DataLossError(RuntimeError):
    """DATA_LOSS:MISSED_KAFKA_MESSAGES (KafkaWorkUnitCalculator.java:326-330)."""


class BrokerState(Protocol):
    """Earliest/latest available offsets per partition (consumer metadata)."""

    def earliest_offsets(self) -> dict[int, int]: ...
    def latest_offsets(self) -> dict[int, int]: ...


def fair_split(partition_messages: Mapping[int, int],
               start_offsets: Mapping[int, int],
               max_messages: int) -> list[OffsetRange]:
    """The cap-split arithmetic, ported 1:1 (KafkaWorkUnitCalculator.java:224-255)."""
    total = sum(partition_messages.values())
    has_extra = total > max_messages
    pending = min(total, max_messages)
    # ascending backlog, partition id as the deterministic tiebreak
    ordered = sorted(partition_messages.items(), key=lambda kv: (kv[1], kv[0]))
    remaining = len(ordered)
    ranges: list[OffsetRange] = []
    for partition, messages in ordered:
        if not has_extra:
            take = messages
        else:
            take = min(pending // remaining, messages)
            pending -= take
            remaining -= 1
        if take > 0:
            start = start_offsets[partition]
            ranges.append(OffsetRange(partition, start, start + take))
    return ranges


class KafkaWorkUnitCalculator:
    """Plans offset ranges for one run; persists next-run state on success."""

    def __init__(self, topic: str, broker: BrokerState, metadata: MetadataManager,
                 max_messages: int = DEFAULT_MAX_MESSAGES,
                 bootstrap_at: str = "latest",
                 reset_on_data_loss: str | None = None,
                 data_loss_reporter: Callable[[str, int], None] | None = None) -> None:
        if bootstrap_at not in ("latest", "earliest"):
            raise ValueError("bootstrap_at must be 'latest' or 'earliest'")
        if reset_on_data_loss not in (None, "latest", "earliest"):
            raise ValueError("reset_on_data_loss must be None, 'latest' or 'earliest'")
        self.topic = topic
        self.broker = broker
        self.metadata = metadata
        self.max_messages = max_messages
        self.bootstrap_at = bootstrap_at
        self.reset_on_data_loss = reset_on_data_loss
        self.data_loss_reporter = data_loss_reporter
        self._next_state: dict[int, int] | None = None

    # -- checkpoint IO -----------------------------------------------------

    def _meta_key(self, partition: int) -> str:
        return f"{OFFSET_KEY_PREFIX}{self.topic}.{partition}"

    def read_checkpointed_offsets(self) -> dict[int, int]:
        prefix = f"{OFFSET_KEY_PREFIX}{self.topic}."
        out = {}
        for k, v in self.metadata.all().items():
            if k.startswith(prefix):
                out[int(k[len(prefix):])] = int(v)
        return out

    # -- planning ----------------------------------------------------------

    def compute_work_units(self) -> list[OffsetRange]:
        earliest = self.broker.earliest_offsets()
        latest = self.broker.latest_offsets()
        checkpoint = self.read_checkpointed_offsets()

        if not checkpoint:
            # first run: bootstrap state, consume nothing this run
            self._next_state = dict(latest if self.bootstrap_at == "latest" else earliest)
            return []

        start = self._update_start_offsets(checkpoint, earliest, latest)
        backlog = {p: latest[p] - start[p] for p in latest
                   if p in start and latest[p] > start[p]}
        if not backlog:
            self._next_state = start
            return []
        ranges = fair_split(backlog, start, self.max_messages)
        self._next_state = dict(start)
        for r in ranges:
            self._next_state[r.partition] = max(self._next_state[r.partition],
                                                r.until_offset)
        return ranges

    def _update_start_offsets(self, checkpoint: dict[int, int],
                              earliest: Mapping[int, int],
                              latest: Mapping[int, int]) -> dict[int, int]:
        start = dict(checkpoint)
        for p, e in earliest.items():
            if p not in start:
                start[p] = e  # newly discovered partition starts at earliest
            elif e > start[p]:
                # messages in [checkpoint, earliest) are gone from the broker
                if self.reset_on_data_loss is None:
                    raise DataLossError(
                        f"DATA_LOSS:MISSED_KAFKA_MESSAGES:topic:{self.topic}:"
                        f"partition:{p}:startOffset:{start[p]}:endOffset:{e}")
                reset = dict(latest if self.reset_on_data_loss == "latest" else earliest)
                lost = sum(max(0, reset.get(q, 0) - start.get(q, reset.get(q, 0)))
                           for q in reset)
                if self.data_loss_reporter is not None:
                    self.data_loss_reporter(self.topic, lost)
                return reset
        return start

    # -- state commit ------------------------------------------------------

    def save_next_run_state(self, work_units: list[OffsetRange] | None = None) -> None:
        """Write planned next offsets to the metadata manager (in-memory;
        the manager's save_changes()/commit embedding persists them).

        Accepts the work-unit list to satisfy the WorkUnitCalculator
        protocol (JobDag passes it); the next state was already derived in
        compute_work_units, so the argument is advisory."""
        if self._next_state is None:
            raise RuntimeError("compute_work_units() has not run")
        for p, o in self._next_state.items():
            self.metadata.set(self._meta_key(p), str(o))


def ranges_to_kafka_json(topic: str, ranges: list[OffsetRange]) -> tuple[str, str]:
    """Offset ranges -> (startingOffsets, endingOffsets) JSON for
    ``spark.read.format("kafka")`` — the production data path."""
    start = {topic: {str(r.partition): r.from_offset for r in ranges}}
    end = {topic: {str(r.partition): r.until_offset for r in ranges}}
    return json.dumps(start), json.dumps(end)


def filter_by_offset_ranges(df: DataFrame, ranges: list[OffsetRange],
                            partition_col: str = "partition",
                            offset_col: str = "offset") -> DataFrame:
    """Data-path filter for a DataFrame-shaped stream (tests/simulation and
    any table with (partition, offset) addressing).

    The predicate is a literal OR-of-ranges — Catalyst pushes it into the
    scan, so at 100 TB only matching row groups are read; no shuffle.
    """
    if not ranges:
        return df.limit(0)
    cond = None
    for r in ranges:
        c = (F.col(partition_col) == r.partition) & \
            (F.col(offset_col) >= r.from_offset) & (F.col(offset_col) < r.until_offset)
        cond = c if cond is None else (cond | c)
    return df.filter(cond)


class StaticBroker:
    """In-memory BrokerState for tests and the events-table simulation."""

    def __init__(self, earliest: Mapping[int, int], latest: Mapping[int, int]) -> None:
        self._earliest = dict(earliest)
        self._latest = dict(latest)

    def earliest_offsets(self) -> dict[int, int]:
        return dict(self._earliest)

    def latest_offsets(self) -> dict[int, int]:
        return dict(self._latest)
