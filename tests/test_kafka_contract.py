"""Consumer-contract tests against the file-backed fake broker
(sources/kafka_sim.py): the bootstrap / data-loss / ranged-read /
minPartitions behaviors the sandbox cannot exercise on a real cluster
run here against SOME consumer implementation, end to end — planner,
checkpoint replay across broker "restarts", poll-vs-DataFrame parity.

Reference: KafkaSource.java:261-292 (assign/seek/poll loop),
KafkaWorkUnitCalculator.java (planning), KafkaSource.java:117-127
(parallel-reader fan-out).
"""

from __future__ import annotations

import pytest

from marmaray_spark.metadata import InMemoryMetadataManager
from marmaray_spark.sources.kafka import (DataLossError,
                                          KafkaWorkUnitCalculator,
                                          OffsetRange,
                                          filter_by_offset_ranges)
from marmaray_spark.sources.kafka_sim import DirectoryKafkaBroker, split_ranges


def _fill(broker, counts):
    for p, n in counts.items():
        for i in range(n):
            broker.append(p, f"m-{p}-{i}".encode(), key=str(p).encode(),
                          timestamp_ms=1000 + i)


def test_bootstrap_then_incremental_consume(tmp_path):
    broker = DirectoryKafkaBroker(tmp_path, "t", n_partitions=3)
    _fill(broker, {0: 5, 1: 3, 2: 0})
    meta = InMemoryMetadataManager()

    calc = KafkaWorkUnitCalculator("t", broker, meta, bootstrap_at="earliest")
    assert calc.compute_work_units() == []      # bootstrap consumes nothing
    calc.save_next_run_state()

    _fill(broker, {0: 2, 1: 1})
    calc = KafkaWorkUnitCalculator("t", broker, meta, bootstrap_at="earliest")
    units = calc.compute_work_units()
    got = broker.poll(units)
    # bootstrap_at=earliest: everything ever written is consumed
    assert {(r["partition"], r["offset"]) for r in got} == \
        {(0, i) for i in range(7)} | {(1, i) for i in range(4)}
    assert all(r["value"].startswith(b"m-") for r in got)
    calc.save_next_run_state()

    # restart EVERYTHING from disk state: new broker handle, consumed meta
    broker2 = DirectoryKafkaBroker(tmp_path, "t")
    _fill(broker2, {2: 4})
    calc2 = KafkaWorkUnitCalculator("t", broker2, meta)
    units2 = calc2.compute_work_units()
    got2 = broker2.poll(units2)
    assert {(r["partition"], r["offset"]) for r in got2} == \
        {(2, i) for i in range(4)}              # only the new backlog


def test_data_loss_raises_then_reset_policy_recovers(tmp_path):
    broker = DirectoryKafkaBroker(tmp_path, "t", n_partitions=1)
    _fill(broker, {0: 10})
    meta = InMemoryMetadataManager()
    calc = KafkaWorkUnitCalculator("t", broker, meta, bootstrap_at="earliest")
    calc.compute_work_units()
    calc.save_next_run_state()
    calc2 = KafkaWorkUnitCalculator("t", broker, meta)
    units = calc2.compute_work_units()
    assert len(broker.poll(units)) == 10
    calc2.save_next_run_state()                # checkpoint now at offset 10

    # retention expires PAST the checkpoint while more data lands
    _fill(broker, {0: 5})
    broker.expire(0, 12)
    with pytest.raises(DataLossError, match="MISSED_KAFKA_MESSAGES"):
        KafkaWorkUnitCalculator("t", broker, meta).compute_work_units()

    lost = []
    calc3 = KafkaWorkUnitCalculator(
        "t", broker, meta, reset_on_data_loss="earliest",
        data_loss_reporter=lambda topic, n: lost.append((topic, n)))
    units3 = calc3.compute_work_units()
    got = broker.poll(units3)                  # polls succeed after reset
    assert {r["offset"] for r in got} == {12, 13, 14}
    assert lost and lost[0][0] == "t"

    # polling an EXPIRED range fails loudly (failOnDataLoss=true shape)
    with pytest.raises(OSError, match="expired"):
        broker.poll([OffsetRange(0, 10, 15)])


def test_poll_equals_filter_by_offset_ranges(spark, tmp_path):
    """The ranged consumer read and the pushed-down DataFrame predicate
    are the same contract — assert the equality on real data."""
    broker = DirectoryKafkaBroker(tmp_path, "t", n_partitions=4)
    _fill(broker, {0: 20, 1: 7, 2: 0, 3: 13})
    ranges = [OffsetRange(0, 3, 11), OffsetRange(1, 0, 7),
              OffsetRange(3, 12, 13)]
    polled = {(r["partition"], r["offset"], bytes(r["value"]))
              for r in broker.poll(ranges)}
    df = filter_by_offset_ranges(broker.to_dataframe(spark), ranges)
    from_df = {(r["partition"], r["offset"], bytes(r["value"]))
               for r in df.collect()}
    assert polled == from_df and len(polled) == 8 + 7 + 1


def test_min_partitions_fanout_preserves_offsets(tmp_path):
    broker = DirectoryKafkaBroker(tmp_path, "t", n_partitions=2)
    _fill(broker, {0: 100, 1: 10})
    meta = InMemoryMetadataManager()
    calc = KafkaWorkUnitCalculator("t", broker, meta, bootstrap_at="earliest")
    calc.compute_work_units()
    calc.save_next_run_state()
    units = KafkaWorkUnitCalculator("t", broker, meta).compute_work_units()

    fanned = split_ranges(units, min_partitions=16)
    assert len(fanned) >= 16
    # slices tile the original ranges exactly: no gap, no overlap
    by_part: dict[int, list] = {}
    for r in fanned:
        by_part.setdefault(r.partition, []).append(r)
    for p, rs in by_part.items():
        rs.sort(key=lambda r: r.from_offset)
        for a, b in zip(rs, rs[1:]):
            assert a.until_offset == b.from_offset
    # and the fanned read returns byte-identical records
    assert broker.poll(fanned) == broker.poll(units)
    # read parallelism decoupled from partition count, like minPartitions
    assert len(by_part[0]) > 1
