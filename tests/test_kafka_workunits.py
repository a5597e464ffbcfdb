"""Kafka work-unit calculator tests — fair-split arithmetic, bootstrap,
data-loss handling, checkpoint round-trip. Modeled on the reference's
TestKafkaWorkUnitCalculator scenarios (SURVEY §2.2)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marmaray_spark.metadata import InMemoryMetadataManager
from marmaray_spark.sources.kafka import (
    DataLossError,
    KafkaWorkUnitCalculator,
    OffsetRange,
    StaticBroker,
    fair_split,
    filter_by_offset_ranges,
    ranges_to_kafka_json,
)


def test_fair_split_no_cap():
    ranges = fair_split({0: 100, 1: 50}, {0: 10, 1: 0}, max_messages=1000)
    assert ranges == [OffsetRange(1, 0, 50), OffsetRange(0, 10, 110)]


def test_fair_split_small_partitions_drain_first():
    # cap 100 across backlogs {5, 200, 300}: small gets all 5, the rest split
    ranges = fair_split({0: 300, 1: 5, 2: 200}, {0: 0, 1: 0, 2: 0}, max_messages=100)
    by_p = {r.partition: r.size for r in ranges}
    # iteration: p1 take min(100//3,5)=5; p2 take min(95//2,200)=47; p0 take min(48//1,300)=48
    assert by_p == {1: 5, 2: 47, 0: 48}
    assert sum(by_p.values()) == 100


def test_fair_split_even_split_when_all_large():
    ranges = fair_split({0: 500, 1: 500}, {0: 0, 1: 0}, max_messages=100)
    assert {r.partition: r.size for r in ranges} == {0: 50, 1: 50}


@settings(max_examples=200, deadline=None)
@given(
    backlogs=st.dictionaries(st.integers(0, 15), st.integers(0, 10_000),
                             min_size=1, max_size=16),
    cap=st.integers(1, 20_000),
)
def test_fair_split_properties(backlogs, cap):
    backlogs = {p: b for p, b in backlogs.items() if b > 0}
    if not backlogs:
        return
    starts = {p: 0 for p in backlogs}
    ranges = fair_split(backlogs, starts, cap)
    taken = {r.partition: r.size for r in ranges}
    total = sum(taken.values())
    # never exceeds cap or backlog; consumes min(total backlog, ~cap)
    assert total <= max(cap, sum(backlogs.values()))
    for p, t in taken.items():
        assert 0 < t <= backlogs[p]
    if sum(backlogs.values()) <= cap:
        assert total == sum(backlogs.values())
    else:
        assert total <= cap


def test_first_run_bootstraps_latest_no_work():
    meta = InMemoryMetadataManager()
    calc = KafkaWorkUnitCalculator("t", StaticBroker({0: 0, 1: 0}, {0: 900, 1: 500}), meta)
    assert calc.compute_work_units() == []
    calc.save_next_run_state()
    assert calc.read_checkpointed_offsets() == {0: 900, 1: 500}


def test_incremental_run_and_cap(tmp_path):
    meta = InMemoryMetadataManager()
    meta.set("kafka.offset.t.0", "100")
    meta.set("kafka.offset.t.1", "200")
    calc = KafkaWorkUnitCalculator(
        "t", StaticBroker({0: 0, 1: 0}, {0: 400, 1: 260}), meta, max_messages=120)
    ranges = calc.compute_work_units()
    # backlogs {0: 300, 1: 60}: p1 takes min(120//2,60)=60, p0 takes min(60//1,300)=60
    assert {r.partition: (r.from_offset, r.until_offset) for r in ranges} == {
        1: (200, 260), 0: (100, 160)}
    calc.save_next_run_state()
    assert calc.read_checkpointed_offsets() == {0: 160, 1: 260}


def test_new_partition_starts_at_earliest():
    meta = InMemoryMetadataManager()
    meta.set("kafka.offset.t.0", "50")
    calc = KafkaWorkUnitCalculator(
        "t", StaticBroker({0: 0, 1: 30}, {0: 60, 1: 40}), meta)
    ranges = {r.partition: r for r in calc.compute_work_units()}
    assert ranges[1].from_offset == 30 and ranges[1].until_offset == 40
    assert ranges[0].from_offset == 50


def test_data_loss_raises_without_reset_policy():
    meta = InMemoryMetadataManager()
    meta.set("kafka.offset.t.0", "10")
    calc = KafkaWorkUnitCalculator("t", StaticBroker({0: 100}, {0: 200}), meta)
    with pytest.raises(DataLossError, match="DATA_LOSS"):
        calc.compute_work_units()


def test_data_loss_reset_and_report():
    meta = InMemoryMetadataManager()
    meta.set("kafka.offset.t.0", "10")
    reported = {}
    calc = KafkaWorkUnitCalculator(
        "t", StaticBroker({0: 100}, {0: 200}), meta,
        reset_on_data_loss="earliest",
        data_loss_reporter=lambda topic, lost: reported.update({topic: lost}))
    ranges = calc.compute_work_units()
    assert ranges == [OffsetRange(0, 100, 200)]
    assert reported == {"t": 90}  # offsets 10..100 lost


def test_no_new_messages():
    meta = InMemoryMetadataManager()
    meta.set("kafka.offset.t.0", "500")
    calc = KafkaWorkUnitCalculator("t", StaticBroker({0: 0}, {0: 500}), meta)
    assert calc.compute_work_units() == []
    calc.save_next_run_state()
    assert calc.read_checkpointed_offsets() == {0: 500}


def test_ranges_to_kafka_json():
    s, e = ranges_to_kafka_json("t", [OffsetRange(0, 5, 10), OffsetRange(2, 0, 7)])
    assert '"t"' in s and '"0": 5' in s and '"2": 7' in e


def test_filter_by_offset_ranges(spark):
    df = spark.createDataFrame(
        [(p, o) for p in range(3) for o in range(10)], ["partition", "offset"])
    out = filter_by_offset_ranges(df, [OffsetRange(0, 2, 5), OffsetRange(2, 0, 1)])
    got = {(r["partition"], r["offset"]) for r in out.collect()}
    assert got == {(0, 2), (0, 3), (0, 4), (2, 0)}
    assert filter_by_offset_ranges(df, []).count() == 0


def test_first_run_bootstrap_persists_through_jobdag(spark, tmp_path, customer=None):
    """Empty bootstrap run must still persist the checkpoint (JobDag calls
    save_next_run_state unconditionally, JobDag.java:165) — otherwise a
    Kafka-fed DAG re-bootstraps forever and never consumes."""
    from marmaray_spark.metadata import FileSystemMetadataManager
    from marmaray_spark.plans.dag import JobDag, JobSubDag
    from marmaray_spark.sources.kafka import KafkaWorkUnitCalculator, StaticBroker

    meta = FileSystemMetadataManager(tmp_path / "ck")
    broker = StaticBroker({0: 0, 1: 0}, {0: 100, 1: 50})
    calc = KafkaWorkUnitCalculator("t", broker, meta)
    dag = JobDag("kjob", calc, lambda wu: None, JobSubDag([]), meta)
    assert dag.execute(spark) is False   # bootstrap: no work units

    # a FRESH manager over the same dir sees the bootstrapped offsets
    meta2 = FileSystemMetadataManager(tmp_path / "ck")
    calc2 = KafkaWorkUnitCalculator("t", broker, meta2)
    assert calc2.read_checkpointed_offsets() == {0: 100, 1: 50}
    assert calc2.compute_work_units() == []   # caught up, not re-bootstrapping


# -- seam goldens: the wire contract the env-blocked legs must satisfy ------

def test_kafka_batch_read_offsets_json_contract():
    """ranges_to_kafka_json must emit EXACTLY the JSON shape the kafka
    batch connector requires for startingOffsets/endingOffsets: topic ->
    stringified-partition -> long, every planned partition present in
    both maps, until >= from."""
    import json

    ranges = [OffsetRange(0, 10, 110), OffsetRange(3, 0, 47)]
    start, end = ranges_to_kafka_json("events", ranges)
    assert json.loads(start) == {"events": {"0": 10, "3": 0}}
    assert json.loads(end) == {"events": {"0": 110, "3": 47}}
    s, e = json.loads(start)["events"], json.loads(end)["events"]
    assert set(s) == set(e)
    assert all(isinstance(v, int) for v in {**s, **e}.values())
    assert all(e[p] >= s[p] for p in s)


def test_kafka_stream_options_contract():
    """The readStream option dict pinned against the public Structured
    Streaming + Kafka integration contract (option names are
    case-sensitive strings; values all strings)."""
    from marmaray_spark.streaming.incremental import kafka_stream_options

    opts = kafka_stream_options("broker1:9092,broker2:9092", "events",
                                max_offsets_per_trigger=1_000_000,
                                starting_offsets="earliest")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "1000000",
    }
    assert all(isinstance(v, str) for v in opts.values())
    # rate cap omitted entirely (not "None") when unset
    assert "maxOffsetsPerTrigger" not in kafka_stream_options(
        "b:9092", "t", max_offsets_per_trigger=None)
    # the parallel-broker-read contract: minPartitions decouples read
    # parallelism from the topic's partition count (>=256-reader fan-out)
    wide = kafka_stream_options("b:9092", "t", min_partitions=256)
    assert wide["minPartitions"] == "256"
    assert "minPartitions" not in kafka_stream_options("b:9092", "t")


def test_multi_topic_calculators_share_metadata_without_collision():
    """KafkaTestHelper-style multi-topic case: two topics checkpointing
    through ONE metadata manager keep independent offsets, including a
    partition id shared by both topics."""
    meta = InMemoryMetadataManager()
    b1 = StaticBroker({0: 0, 1: 0}, {0: 100, 1: 50})
    b2 = StaticBroker({0: 0}, {0: 900})
    c1 = KafkaWorkUnitCalculator("topicA", b1, meta, bootstrap_at="earliest")
    c2 = KafkaWorkUnitCalculator("topicB", b2, meta, bootstrap_at="earliest")
    # bootstrap both, then plan
    for c in (c1, c2):
        assert c.compute_work_units() == []
        c.save_next_run_state()
    wu1 = c1.compute_work_units()
    wu2 = c2.compute_work_units()
    assert {(r.partition, r.until_offset) for r in wu1} == {(0, 100), (1, 50)}
    assert {(r.partition, r.until_offset) for r in wu2} == {(0, 900)}
    c1.save_next_run_state(wu1)
    c2.save_next_run_state(wu2)
    assert c1.read_checkpointed_offsets() == {0: 100, 1: 50}
    assert c2.read_checkpointed_offsets() == {0: 900}


def test_partition_shrink_plans_remaining_partitions():
    """A topic recreated with fewer partitions: planning continues from
    the surviving partitions' checkpoints; the vanished partition's
    checkpoint is inert (nothing to read is not an offset gap — the
    data-loss path is earliest>checkpoint, covered above)."""
    meta = InMemoryMetadataManager()
    c = KafkaWorkUnitCalculator("t", StaticBroker({0: 0, 1: 0}, {0: 10, 1: 10}),
                                meta, bootstrap_at="earliest")
    c.compute_work_units(); c.save_next_run_state()
    wu = c.compute_work_units(); c.save_next_run_state(wu)

    shrunk = StaticBroker({0: 0}, {0: 20})
    lost = []
    c2 = KafkaWorkUnitCalculator(
        "t", shrunk, meta, reset_on_data_loss="earliest",
        data_loss_reporter=lambda why, n: lost.append((why, n)))
    wu2 = c2.compute_work_units()
    assert [(r.partition, r.from_offset, r.until_offset) for r in wu2] == [(0, 10, 20)]
    assert lost == []
