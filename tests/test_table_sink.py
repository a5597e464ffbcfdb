"""TableSink tests — modeled on T/common/sinks/hoodie/TestHoodieSink.java:
insert / dedup-insert / upsert, metadata-manager embedding (atomic
checkpoint+data), parallelism auto-tune, crash-orphan invisibility."""

import json

import pytest
from pyspark.sql import functions as F

from marmaray_spark.sinks.table import (
    CommitLog,
    SinkStatManager,
    TableMetadataManager,
    TableSink,
    WriteOp,
)
from marmaray_spark.metadata import InMemoryMetadataManager


@pytest.fixture()
def users(spark):
    rows = [(1, "a", "2024-01-01", 10.0), (2, "b", "2024-01-01", 20.0),
            (3, "c", "2024-01-02", 30.0), (4, "d", "2024-01-02", 40.0)]
    return spark.createDataFrame(rows, ["uid", "name", "dt", "score"])


def test_insert_and_read(spark, users, tmp_path):
    sink = TableSink(spark, tmp_path / "t", "uid", partition_field="dt")
    c = sink.write(users, WriteOp.INSERT)
    assert c is not None and c.counts["written"] == 4
    back = sink.read()
    assert back.count() == 4
    assert sorted(back.columns) == sorted(users.columns)


def test_dedup_insert_filters_existing_keys(spark, users, tmp_path):
    sink = TableSink(spark, tmp_path / "t", "uid", partition_field="dt")
    sink.write(users, WriteOp.INSERT)
    incoming = users.withColumn("uid", F.col("uid") + 2)  # uids 3..6; 3,4 exist
    c = sink.write(incoming, WriteOp.DEDUP_INSERT)
    assert c.counts["written"] == 2
    assert sink.read().count() == 6
    assert sink.read().filter(F.col("uid") == 3).count() == 1  # not duplicated


def test_upsert_partition_scoped(spark, users, tmp_path):
    sink = TableSink(spark, tmp_path / "t", "uid", partition_field="dt")
    sink.write(users, WriteOp.INSERT)
    # update uid=1 (dt=2024-01-01) and insert uid=9 in the same partition
    updates = spark.createDataFrame(
        [(1, "a2", "2024-01-01", 11.0), (9, "z", "2024-01-01", 90.0)],
        ["uid", "name", "dt", "score"])
    c = sink.write(updates, WriteOp.UPSERT)
    back = sink.read()
    assert back.count() == 5
    assert back.filter(F.col("uid") == 1).first()["name"] == "a2"
    assert back.filter(F.col("uid") == 9).count() == 1
    # untouched partition's slices were NOT rewritten
    assert all("2024-01-02" not in r for r in c.removes)
    removed_partitions = {r.rsplit("=", 1)[1] for r in c.removes}
    assert removed_partitions == {"2024-01-01"}


def test_upsert_unpartitioned_full_rewrite(spark, users, tmp_path):
    sink = TableSink(spark, tmp_path / "t", "uid")
    sink.write(users.drop("dt"), WriteOp.INSERT)
    updates = spark.createDataFrame([(2, "b2", 21.0)], ["uid", "name", "score"])
    sink.write(updates, WriteOp.UPSERT)
    back = sink.read()
    assert back.count() == 4
    assert back.filter(F.col("uid") == 2).first()["name"] == "b2"


def test_upsert_into_empty_table_is_insert(spark, users, tmp_path):
    sink = TableSink(spark, tmp_path / "t", "uid", partition_field="dt")
    sink.write(users, WriteOp.UPSERT)
    assert sink.read().count() == 4


def test_atomic_metadata_embedding(spark, users, tmp_path):
    """HoodieBasedMetadataManager parity: checkpoint rides the commit."""
    sink = TableSink(spark, tmp_path / "t", "uid", partition_field="dt")
    meta = TableMetadataManager(sink.log)
    meta.set("kafka.offset.p0", "1234")
    sink.write(users, WriteOp.INSERT, metadata=meta)
    # a fresh manager over the same log sees the committed checkpoint
    reloaded = TableMetadataManager(CommitLog(tmp_path / "t"))
    assert reloaded.get("kafka.offset.p0") == "1234"


def test_no_op(spark, users, tmp_path):
    sink = TableSink(spark, tmp_path / "t", "uid")
    assert sink.write(users, WriteOp.NO_OP) is None
    assert sink.is_empty()


def test_orphan_data_invisible_and_cleanable(spark, users, tmp_path):
    sink = TableSink(spark, tmp_path / "t", "uid", partition_field="dt")
    sink.write(users, WriteOp.INSERT)
    # simulate a crashed write: data lands but no commit JSON
    orphan = tmp_path / "t" / "data" / "999999999999"
    users.limit(1).write.parquet(str(orphan))
    assert sink.read().count() == 4  # orphan invisible
    removed = sink.clean_orphans()
    assert removed == ["data/999999999999"]
    assert not orphan.exists()
    assert sink.read().count() == 4


def test_parallelism_auto_tune():
    meta = InMemoryMetadataManager()
    stats = SinkStatManager(meta)
    assert stats.get_avg_record_size(default=100.0) == 100.0
    stats.update(written_bytes=1000, written_records=10)   # 100 B/rec
    stats.update(written_bytes=3000, written_records=10)   # 300 -> rolling 200
    assert stats.get_avg_record_size() == pytest.approx(200.0)


def test_commit_log_rejects_duplicate_commit(tmp_path):
    log = CommitLog(tmp_path / "t")
    from marmaray_spark.sinks.table import Commit
    log.write(Commit(commit_id="000000000000", op="insert", adds=["data/x"]))
    with pytest.raises(FileExistsError):
        log.write(Commit(commit_id="000000000000", op="insert"))
    assert json.loads((tmp_path / "t" / "_commits" / "000000000000.json")
                      .read_text())["adds"] == ["data/x"]


def test_time_travel_and_incremental_pull(spark, tmp_path):
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "tt", record_key_field="k")
    c0 = t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
                 WriteOp.INSERT)
    c1 = t.write(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]),
                 WriteOp.UPSERT)

    # snapshot now: upserted values
    assert {(r["k"], r["v"]) for r in t.read().collect()} == \
        {(1, "a"), (2, "B"), (3, "c")}
    # time travel to c0: pre-upsert table
    assert {(r["k"], r["v"]) for r in t.read(as_of=c0.commit_id).collect()} == \
        {(1, "a"), (2, "b")}
    # incremental since c0: only records first written by c1 — the
    # carried-over survivor k=1 is NOT re-emitted
    inc = {(r["k"], r["v"]) for r in t.read_incremental(since=c0.commit_id).collect()}
    assert inc == {(2, "B"), (3, "c")}
    # _commit_id never leaks into default reads
    assert "_commit_id" not in t.read().columns


def test_compaction_preserves_snapshot_and_stamps(spark, tmp_path):
    from marmaray_spark.sinks.table import CommitLog, TableSink, WriteOp

    t = TableSink(spark, tmp_path / "cp", record_key_field="k")
    c0 = t.write(spark.createDataFrame([(1, "a")], ["k", "v"]), WriteOp.INSERT,
                 metadata={"ckpt": "42"})
    t.write(spark.createDataFrame([(2, "b")], ["k", "v"]), WriteOp.INSERT,
            metadata={"ckpt": "43"})
    before = {(r["k"], r["v"]) for r in t.read().collect()}

    cc = t.compact()
    assert cc.op == "compact"
    assert {(r["k"], r["v"]) for r in t.read().collect()} == before
    # one active slice set now; old slices removed from the manifest
    assert t.log.active_slices() == cc.adds
    # checkpoint metadata carried forward through the compaction commit
    assert CommitLog(tmp_path / "cp").latest_metadata()["ckpt"] == "43"
    # incremental semantics survive compaction (stamps preserved)
    inc = {r["k"] for r in t.read_incremental(since=c0.commit_id).collect()}
    assert inc == {2}
    # orphan cleanup removes the replaced data dirs
    removed = t.clean_orphans()
    assert removed == []  # removed slices are still referenced by history


def test_key_stats_index_prunes_slices(spark, tmp_path):
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "ks", record_key_field="k")
    c0 = t.write(spark.createDataFrame([(i, "lo") for i in range(100)],
                                       ["k", "v"]), WriteOp.INSERT)
    c1 = t.write(spark.createDataFrame([(i, "hi") for i in range(1000, 1100)],
                                       ["k", "v"]), WriteOp.INSERT)
    stats = t.key_stats()
    assert set(stats) == set(c0.adds) | set(c1.adds)
    # a range inside the low slice prunes the high slice (and vice versa)
    assert set(t.slices_for_key_range(5, 10)) == set(c0.adds)
    assert set(t.slices_for_key_range(1050, 1060)) == set(c1.adds)
    assert t.slices_for_key_range(500, 600) == []

    # point lookup: correct row, pruned scan
    got = t.lookup(1042).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1042, "hi")]
    assert t.lookup(555).count() == 0


def test_dedup_insert_uses_range_pruning(spark, tmp_path):
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "dp", record_key_field="k")
    t.write(spark.createDataFrame([(i, "old") for i in range(50)], ["k", "v"]),
            WriteOp.INSERT)
    # disjoint key range: nothing to anti-join against (fast path)
    t.write(spark.createDataFrame([(i, "new") for i in range(100, 150)],
                                  ["k", "v"]), WriteOp.DEDUP_INSERT)
    assert t.read().count() == 100
    # overlapping range: existing keys are filtered out
    t.write(spark.createDataFrame([(40, "dup"), (41, "dup"), (200, "fresh")],
                                  ["k", "v"]), WriteOp.DEDUP_INSERT)
    back = {r["k"]: r["v"] for r in t.read().collect()}
    assert back[40] == "old" and back[41] == "old"
    assert back[200] == "fresh"
    assert len(back) == 101


def test_read_changes_insert_vs_update(spark, tmp_path):
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "cdc", record_key_field="k")
    c0 = t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
                 WriteOp.INSERT)
    c1 = t.write(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]),
                 WriteOp.UPSERT)

    ch0 = {(r["k"], r["change_op"]) for r in t.read_changes(c0.commit_id).collect()}
    assert ch0 == {(1, "insert"), (2, "insert")}
    ch1 = {(r["k"], r["v"], r["change_op"])
           for r in t.read_changes(c1.commit_id).collect()}
    assert ch1 == {(2, "B", "update"), (3, "c", "insert")}

    import pytest
    with pytest.raises(KeyError):
        t.read_changes("999999999999")


def test_read_changes_zero_adds_commit_returns_empty_frame(spark, tmp_path):
    """ADVICE r9: a partitioned write of an empty batch commits with NO
    adds; read_changes for it must return the documented empty change
    frame — not FileNotFoundError('no commits') — even when that commit
    is the ONLY one, so the table has no active snapshot to borrow a
    schema from."""
    t = TableSink(spark, tmp_path / "z", record_key_field="k",
                  partition_field="dt")
    empty = spark.createDataFrame([], "k int, v string, dt string")
    c0 = t.write(empty, WriteOp.INSERT)
    assert c0.adds == []
    ch = t.read_changes(c0.commit_id)
    assert ch.count() == 0 and "change_op" in ch.columns

    # once a real slice exists, the empty frame carries the table schema
    c1 = t.write(spark.createDataFrame([(1, "a", "d1")], ["k", "v", "dt"]),
                 WriteOp.INSERT)
    assert c1.adds
    c2 = t.write(empty, WriteOp.INSERT)
    assert c2.adds == []
    ch2 = t.read_changes(c2.commit_id)
    assert ch2.count() == 0
    assert {"k", "v", "dt", "change_op"} <= set(ch2.columns)


def test_vacuum_deletes_expired_slices_only(spark, tmp_path):
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "vac", record_key_field="k")
    mk = lambda v: spark.createDataFrame([(1, v)], ["k", "v"])  # noqa: E731
    commits = [t.write(mk(f"v{i}"), WriteOp.UPSERT) for i in range(6)]

    # retention window still covers every remove: nothing deleted
    assert t.vacuum(retain_last_n_commits=10) == []

    deleted = t.vacuum(retain_last_n_commits=2)
    assert deleted  # old rewritten slices are gone from disk
    for s in deleted:
        assert not (tmp_path / "vac" / s).exists()
    # snapshot unaffected
    assert [(r["k"], r["v"]) for r in t.read().collect()] == [(1, "v5")]
    # recent time travel still works; ancient does not
    assert t.read(as_of=commits[-2].commit_id).count() == 1
    import pytest
    with pytest.raises(Exception):
        t.read(as_of=commits[0].commit_id).collect()


def test_insert_overwrite_replaces_touched_partitions(spark, tmp_path):
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "ow", record_key_field="k",
                  partition_field="p")
    t.write(spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")], ["k", "v", "p"]),
        WriteOp.INSERT)
    # overwrite partition x only; y untouched
    t.write(spark.createDataFrame([(9, "NEW", "x")], ["k", "v", "p"]),
            WriteOp.INSERT_OVERWRITE)
    back = {(r["k"], r["v"], r["p"]) for r in t.read().collect()}
    assert back == {(9, "NEW", "x"), (3, "c", "y")}


def test_restore_rolls_back_and_is_reversible(spark, tmp_path):
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "rs", record_key_field="k")
    c0 = t.write(spark.createDataFrame([(1, "a")], ["k", "v"]), WriteOp.INSERT)
    c1 = t.write(spark.createDataFrame([(1, "b")], ["k", "v"]), WriteOp.UPSERT)
    assert t.read().collect()[0]["v"] == "b"

    t.restore(c0.commit_id)
    assert t.read().collect()[0]["v"] == "a"
    # rollback is itself a commit: roll forward again by restoring to c1
    t.restore(c1.commit_id)
    assert t.read().collect()[0]["v"] == "b"


def test_restore_fails_after_vacuum(spark, tmp_path):
    import pytest

    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "rv", record_key_field="k")
    mk = lambda v: spark.createDataFrame([(1, v)], ["k", "v"])  # noqa: E731
    commits = [t.write(mk(f"v{i}"), WriteOp.UPSERT) for i in range(6)]
    t.vacuum(retain_last_n_commits=2)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.restore(commits[0].commit_id)


def test_consume_changes_incrementally(spark, tmp_path):
    from marmaray_spark.metadata import InMemoryMetadataManager
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "cons", record_key_field="k")
    t.write(spark.createDataFrame([(1, "a")], ["k", "v"]), WriteOp.INSERT)
    t.write(spark.createDataFrame([(1, "b"), (2, "c")], ["k", "v"]),
            WriteOp.UPSERT)

    meta = InMemoryMetadataManager()
    batch1 = t.consume_changes(meta)
    assert [cid for cid, _ in batch1] == ["000000000000", "000000000001"]
    ops = {cid: {(r["k"], r["change_op"]) for r in df.collect()}
           for cid, df in batch1}
    assert ops["000000000000"] == {(1, "insert")}
    assert ops["000000000001"] == {(1, "update"), (2, "insert")}

    # nothing new -> empty; checkpoint advanced
    assert t.consume_changes(meta) == []

    # new commit + a compaction: only the data commit is consumed
    t.write(spark.createDataFrame([(3, "d")], ["k", "v"]), WriteOp.INSERT)
    t.compact()
    batch2 = t.consume_changes(meta)
    assert len(batch2) == 1
    assert {r["k"] for r in batch2[0][1].collect()} == {3}
    assert t.consume_changes(meta) == []


def test_consume_changes_respects_max_commits(spark, tmp_path):
    from marmaray_spark.metadata import InMemoryMetadataManager
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "cap", record_key_field="k")
    for i in range(3):
        t.write(spark.createDataFrame([(i, "v")], ["k", "v"]), WriteOp.INSERT)
    meta = InMemoryMetadataManager()
    assert len(t.consume_changes(meta, max_commits=2)) == 2
    assert len(t.consume_changes(meta)) == 1


def test_cluster_by_key_writes_sorted_disjoint_files(spark, tmp_path):
    import pyarrow.parquet as pq

    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "clus", record_key_field="k",
                  cluster_by_key=True, target_file_size_mb=0.001,
                  auto_tune_parallelism=True)
    import random
    rng = random.Random(5)
    rows = [(i, "x" * 50) for i in range(5000)]
    rng.shuffle(rows)
    t.write(spark.createDataFrame(rows, ["k", "v"]), WriteOp.BULK_INSERT)

    files = sorted((tmp_path / "clus").rglob("*.parquet"))
    assert len(files) >= 2
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        ci = next(i for i in range(md.num_columns)
                  if md.row_group(0).column(i).path_in_schema == "k")
        st = md.row_group(0).column(ci).statistics
        ranges.append((st.min, st.max))
    ranges.sort()
    # each file internally bounded AND files pairwise disjoint on key
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 < lo2
    # reads still correct
    assert t.read().count() == 5000


def test_change_stream_replicates_into_downstream_table(spark, tmp_path):
    """Chained pipelines: B consumes A's per-commit changes (checkpointed)
    and applies them as upserts — after any number of incremental runs,
    B's snapshot equals A's. The table-as-source contract end to end."""
    from marmaray_spark.metadata import InMemoryMetadataManager
    from marmaray_spark.sinks.table import TableSink, WriteOp

    a = TableSink(spark, tmp_path / "A", record_key_field="k")
    b = TableSink(spark, tmp_path / "B", record_key_field="k")
    meta = InMemoryMetadataManager()

    def replicate():
        for _cid, changes in a.consume_changes(meta):
            b.write(changes.drop("change_op"), WriteOp.UPSERT)

    a.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
            WriteOp.INSERT)
    replicate()
    a.write(spark.createDataFrame([(2, "B2"), (3, "c")], ["k", "v"]),
            WriteOp.UPSERT)
    a.write(spark.createDataFrame([(4, "d")], ["k", "v"]), WriteOp.INSERT)
    replicate()

    snap_a = {(r["k"], r["v"]) for r in a.read().collect()}
    snap_b = {(r["k"], r["v"]) for r in b.read().collect()}
    assert snap_a == snap_b == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}
    # replication is incremental: B saw 3 commits' worth of changes
    assert len(b.log.commits()) == 3


def test_vacuum_keeps_slices_reactivated_by_restore(spark, tmp_path):
    """A slice removed early, re-added by restore() inside the retention
    window, must survive vacuum — time travel to every retained commit
    stays readable (keying deletion off remove-commit ids alone broke this)."""
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "vrs", record_key_field="k")
    mk = lambda v: spark.createDataFrame([(1, v)], ["k", "v"])  # noqa: E731
    c0 = t.write(mk("v0"), WriteOp.INSERT)    # slice S0
    t.write(mk("v1"), WriteOp.UPSERT)         # removes S0, adds S1
    t.write(mk("v2"), WriteOp.UPSERT)         # removes S1, adds S2
    r = t.restore(c0.commit_id)               # re-activates S0 (in window)
    t.write(mk("v3"), WriteOp.UPSERT)         # removes S0 again, adds S3

    deleted = t.vacuum(retain_last_n_commits=3)   # window: c2, restore, c4
    # S1 (dead before the window) is deletable; S0 is referenced by the
    # restore commit's snapshot and must remain readable
    assert t.read(as_of=r.commit_id).collect()[0]["v"] == "v0"
    assert t.read().collect()[0]["v"] == "v3"
    for s in deleted:
        assert s not in t.log.active_slices(as_of=r.commit_id)


def test_two_phase_stage_then_commit(spark, tmp_path):
    """stage() lands data but publishes nothing; commit_staged() is the
    single visibility point (JobSubDag commit-by-priority contract)."""
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "tp", record_key_field="k")
    staged = t.stage(spark.createDataFrame([(1, "a")], ["k", "v"]),
                     WriteOp.INSERT, metadata={"ck": "1"})
    assert t.is_empty()                        # invisible until commit
    assert (tmp_path / "tp" / "data").exists()  # but data files staged
    c = t.commit_staged(staged)
    assert c is not None and not t.is_empty()
    assert t.read().collect()[0]["v"] == "a"
    assert t.log.latest_metadata() == {"ck": "1"}
    # NO_OP stages to None and commit_staged(None) is a no-op
    assert t.stage(t.read(), WriteOp.NO_OP) is None
    assert t.commit_staged(None) is None


def test_user_defined_commit_id(spark, tmp_path):
    """TestHoodieSink.testUserDefinedCommitTime parity: a caller-pinned
    commit id is used instead of the next sequential one; the log stays
    monotonic (stale or malformed ids rejected; duplicates fail at
    publish)."""
    import pytest

    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "uc", record_key_field="k")
    mk = lambda v: spark.createDataFrame([(1, v)], ["k", "v"])  # noqa: E731
    c0 = t.write(mk("a"), WriteOp.INSERT)
    assert c0.commit_id == "000000000000"

    c1 = t.write(mk("b"), WriteOp.UPSERT, commit_id="000000000042")
    assert c1.commit_id == "000000000042"
    # sequential numbering continues AFTER the pinned id
    c2 = t.write(mk("c"), WriteOp.UPSERT)
    assert c2.commit_id == "000000000043"
    # time travel to the pinned commit works like any other
    assert t.read(as_of="000000000042").collect()[0]["v"] == "b"

    with pytest.raises(ValueError, match="not after"):
        t.write(mk("x"), WriteOp.UPSERT, commit_id="000000000001")
    with pytest.raises(ValueError, match="12 digits"):
        t.write(mk("x"), WriteOp.UPSERT, commit_id="42")


def test_no_op_write_with_metadata_persists_nothing(spark, tmp_path):
    """TestHoodieSink NO_OP paths: no commit, no data, metadata manager
    NOT saved (the checkpoint must not advance on a no-op)."""
    from marmaray_spark.metadata import InMemoryMetadataManager
    from marmaray_spark.sinks.table import TableSink, WriteOp

    t = TableSink(spark, tmp_path / "noop", record_key_field="k")
    meta = InMemoryMetadataManager()
    meta.set("cp", "5")
    assert t.write(spark.createDataFrame([(1, "a")], ["k", "v"]),
                   WriteOp.NO_OP, metadata=meta) is None
    assert t.is_empty()
    assert not (tmp_path / "noop" / "data").exists()
    assert meta.saved_count == 0


def test_sink_write_metrics(spark, tmp_path):
    """TestHoodieSink.testHoodieSinkMetrics names: every published commit
    emits output_rowcount / total_file_count / total_write_size, tagged
    by commit and op; NO_OP emits nothing."""
    from marmaray_spark.metrics import DataFeedMetrics
    from marmaray_spark.sinks.table import TableSink, WriteOp

    metrics = DataFeedMetrics("feed-x")
    t = TableSink(spark, tmp_path / "m", record_key_field="k",
                  metrics=metrics)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(50)], ["k", "v"])
    c = t.write(df, WriteOp.INSERT)

    by_name = {}
    for m in metrics._metrics:
        by_name.setdefault(m.name, []).append(m)
    (rowcount,) = by_name["output_rowcount"]
    assert rowcount.value == 50
    assert rowcount.tags["commit"] == c.commit_id
    assert rowcount.tags["op"] == "insert"
    (files,) = by_name["total_file_count"]
    assert files.value >= 1
    (size,) = by_name["total_write_size"]
    assert size.value > 0

    n_before = len(metrics._metrics)
    assert t.write(df, WriteOp.NO_OP) is None
    assert len(metrics._metrics) == n_before


def test_incrementally_maintained_rollup_matches_full_recompute(spark, tmp_path):
    """Materialized rollup through the table's change stream: after every
    maintenance run the rollup table equals a from-scratch groupBy of the
    base snapshot, only TOUCHED groups are rewritten, and a replayed
    batch (crash before checkpoint save) is idempotent."""
    from marmaray_spark.metadata import InMemoryMetadataManager
    from marmaray_spark.operators.rollup import maintain_rollup
    from marmaray_spark.sinks.table import TableSink, WriteOp

    base = TableSink(spark, tmp_path / "base", record_key_field="id")
    rollup = TableSink(spark, tmp_path / "rollup", record_key_field="grp")
    meta = InMemoryMetadataManager()
    aggs = {"n": ("count", "*"), "total": ("sum", "amount")}

    def expect():
        return {(r["grp"], r["n"], round(r["total"], 2)) for r in
                base.read().groupBy("grp")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("amount").alias("total")).collect()}

    def got():
        return {(r["grp"], r["n"], round(r["total"], 2)) for r in
                rollup.read().select("grp", "n", "total").collect()}

    base.write(spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 1.0)],
        ["id", "grp", "amount"]), WriteOp.INSERT)
    assert maintain_rollup(base, rollup, meta, "grp", aggs) == 2
    assert got() == expect()

    # update one 'a' row + insert a 'c' row: groups a and c rewritten, b not
    base.write(spark.createDataFrame(
        [(1, "a", 100.0), (4, "c", 7.0)], ["id", "grp", "amount"]),
        WriteOp.UPSERT)
    assert maintain_rollup(base, rollup, meta, "grp", aggs) == 2
    assert got() == expect()

    # nothing new -> no-op
    assert maintain_rollup(base, rollup, meta, "grp", aggs) == 0

    # crash-replay: reset the consumer checkpoint to before the last batch
    # and run again — same groups rewritten with identical values
    meta.set("rollup.last_commit", "000000000000")
    assert maintain_rollup(base, rollup, meta, "grp", aggs) == 2
    assert got() == expect()


def test_rollup_group_move_reaggregates_old_group(spark, tmp_path):
    """An UPSERT that moves a record to a DIFFERENT grp value must
    re-aggregate the group it LEFT (the after-image alone never names
    it) — including deleting the rollup row when the old group empties."""
    from marmaray_spark.operators.rollup import maintain_rollup
    from marmaray_spark.sinks.table import TableSink, WriteOp

    base = TableSink(spark, tmp_path / "base", record_key_field="id")
    rollup = TableSink(spark, tmp_path / "rollup", record_key_field="grp")
    meta = InMemoryMetadataManager()
    aggs = {"n": ("count", "*"), "total": ("sum", "amount")}

    base.write(spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 1.0)],
        ["id", "grp", "amount"]), WriteOp.INSERT)
    maintain_rollup(base, rollup, meta, "grp", aggs)

    # move id=2 from a -> b: group a shrinks, change batch only says "b"
    base.write(spark.createDataFrame([(2, "b", 5.0)],
                                     ["id", "grp", "amount"]), WriteOp.UPSERT)
    maintain_rollup(base, rollup, meta, "grp", aggs)
    got = {r["grp"]: (r["n"], r["total"]) for r in rollup.read().collect()}
    assert got == {"a": (1, 10.0), "b": (2, 6.0)}

    # move id=3 AND id=2 out of b entirely -> b has zero rows: its rollup
    # row must be deleted, not left stale
    base.write(spark.createDataFrame([(2, "a", 5.0), (3, "a", 1.0)],
                                     ["id", "grp", "amount"]), WriteOp.UPSERT)
    maintain_rollup(base, rollup, meta, "grp", aggs)
    got = {r["grp"]: (r["n"], r["total"]) for r in rollup.read().collect()}
    assert got == {"a": (3, 16.0)}


def test_rollup_insert_overwrite_reaggregates_displaced_groups(spark, tmp_path):
    """INSERT_OVERWRITE replaces whole partitions: groups whose rows lived
    there but are absent from the new data must be re-aggregated (and
    dropped from the rollup when they vanish)."""
    from marmaray_spark.operators.rollup import maintain_rollup
    from marmaray_spark.sinks.table import TableSink, WriteOp

    base = TableSink(spark, tmp_path / "base", record_key_field="id")
    rollup = TableSink(spark, tmp_path / "rollup", record_key_field="grp")
    meta = InMemoryMetadataManager()
    aggs = {"n": ("count", "*"), "total": ("sum", "amount")}

    base.write(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 5.0), (3, "c", 1.0)],
        ["id", "grp", "amount"]), WriteOp.INSERT)
    maintain_rollup(base, rollup, meta, "grp", aggs)
    assert {r["grp"] for r in rollup.read().collect()} == {"a", "b", "c"}

    # overwrite (unpartitioned -> whole table): b and c disappear
    base.write(spark.createDataFrame(
        [(1, "a", 20.0), (4, "d", 2.0)], ["id", "grp", "amount"]),
        WriteOp.INSERT_OVERWRITE)
    maintain_rollup(base, rollup, meta, "grp", aggs)
    got = {r["grp"]: (r["n"], r["total"]) for r in rollup.read().collect()}
    assert got == {"a": (1, 20.0), "d": (1, 2.0)}


def test_rollup_vacuum_past_consumer_lag_fails_loud_not_stale(spark, tmp_path):
    """If vacuum deleted slices a lagging consumer still needs, the
    maintenance run must raise — the rollup is left at its previous
    (consistent) state, never silently advanced past unrecoverable
    history."""
    import pytest

    from marmaray_spark.operators.rollup import maintain_rollup
    from marmaray_spark.sinks.table import TableSink, WriteOp

    base = TableSink(spark, tmp_path / "base", record_key_field="id")
    rollup = TableSink(spark, tmp_path / "rollup", record_key_field="grp")
    meta = InMemoryMetadataManager()
    aggs = {"n": ("count", "*"), "total": ("sum", "amount")}

    base.write(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 5.0)], ["id", "grp", "amount"]),
        WriteOp.INSERT)
    maintain_rollup(base, rollup, meta, "grp", aggs)
    before = {r["grp"]: (r["n"], r["total"]) for r in rollup.read().collect()}

    # two commits pile up unconsumed; vacuum(1) deletes history the
    # consumer still needs to replay
    base.write(spark.createDataFrame([(1, "b", 10.0)],
                                     ["id", "grp", "amount"]), WriteOp.UPSERT)
    base.write(spark.createDataFrame([(3, "c", 2.0)],
                                     ["id", "grp", "amount"]), WriteOp.UPSERT)
    base.vacuum(retain_last_n_commits=1)
    saved_before = meta.saved_count
    ck_before = meta.get("rollup.last_commit")
    with pytest.raises(Exception):
        maintain_rollup(base, rollup, meta, "grp", aggs)
    # checkpoint not PERSISTED, rollup unchanged: re-runnable once the
    # operator restores history or accepts a full rebuild
    assert meta.saved_count == saved_before
    # ...and the IN-MEMORY checkpoint rolled back too (r10): a later
    # save_changes() by the caller must not persist the advanced value
    assert meta.get("rollup.last_commit") == ck_before
    got = {r["grp"]: (r["n"], r["total"]) for r in rollup.read().collect()}
    assert got == before


def test_unpartitioned_upsert_keeps_survivor_stamps_and_prunes_slices(
        spark, tmp_path):
    """r10 regression: the unpartitioned upsert read the old table via
    read(), which drops the commit stamp — every displaced survivor was
    re-written NULL-stamped and silently vanished from all incremental
    windows. Survivors must keep their ORIGINAL stamps, and the rewrite
    must touch only slices whose key range overlaps the batch."""
    from marmaray_spark.sinks.table import COMMIT_COL

    t = TableSink(spark, tmp_path / "u", record_key_field="k",
                  cluster_by_key=True)
    c0 = t.write(spark.createDataFrame([(i, "a") for i in range(10)],
                                       ["k", "v"]), WriteOp.INSERT)
    # a second, key-disjoint slice far away from the upsert's range
    c1 = t.write(spark.createDataFrame([(i, "b") for i in range(100, 110)],
                                       ["k", "v"]), WriteOp.INSERT)
    c2 = t.write(spark.createDataFrame([(5, "A")], ["k", "v"]),
                 WriteOp.UPSERT)

    stamps = {r["k"]: r[COMMIT_COL]
              for r in t.read(with_meta=True).collect()}
    assert stamps[5] == c2.commit_id
    assert stamps[4] == c0.commit_id        # survivor keeps its stamp
    assert stamps[105] == c1.commit_id
    # every key is visible to a full incremental pull (null stamps were
    # filtered out of every window)
    assert {r["k"] for r in t.read_incremental("")
            .collect()} == set(range(10)) | set(range(100, 110))
    # the key-disjoint slice was not rewritten
    assert set(c2.removes) == set(c0.adds)
    assert t.read().count() == 20


# ---------------------------------------------------------------------------
# merge-on-read (r10): delta upserts, latest-wins reads, compaction
# ---------------------------------------------------------------------------


def test_mor_upsert_appends_delta_and_reads_latest_wins(spark, tmp_path):
    from marmaray_spark.sinks.table import COMMIT_COL

    t = TableSink(spark, tmp_path / "m", record_key_field="k",
                  table_type="mor")
    c0 = t.write(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]), WriteOp.INSERT)
    c1 = t.write(spark.createDataFrame(
        [(2, "B"), (4, "d")], ["k", "v"]), WriteOp.UPSERT)
    # the MOR promise: the upsert REWROTE NOTHING — pure delta append
    assert c1.removes == [] and c1.delta is True
    # ...but reads resolve latest-wins
    assert {(r["k"], r["v"]) for r in t.read().collect()} == \
        {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    # shadowed version resolved away; stamps are the ORIGINAL ones
    stamps = {r["k"]: r[COMMIT_COL] for r in t.read(with_meta=True).collect()}
    assert stamps[1] == c0.commit_id and stamps[2] == c1.commit_id
    # time travel to before the delta: the pre-upsert table
    assert {(r["k"], r["v"]) for r in t.read(as_of=c0.commit_id).collect()} \
        == {(1, "a"), (2, "b"), (3, "c")}
    # incremental pull: only the delta's records
    assert {(r["k"], r["v"])
            for r in t.read_incremental(c0.commit_id).collect()} == \
        {(2, "B"), (4, "d")}
    # point lookup resolves too
    assert [r["v"] for r in t.lookup(2).collect()] == ["B"]


def test_mor_compact_folds_deltas_then_reads_like_cow(spark, tmp_path):
    t = TableSink(spark, tmp_path / "m", record_key_field="k",
                  table_type="mor")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
            WriteOp.INSERT)
    t.write(spark.createDataFrame([(2, "B")], ["k", "v"]), WriteOp.UPSERT)
    t.write(spark.createDataFrame([(1, "A2"), (3, "c")], ["k", "v"]),
            WriteOp.UPSERT)
    before = {(r["k"], r["v"]) for r in t.read().collect()}
    assert before == {(1, "A2"), (2, "B"), (3, "c")}
    assert t._has_active_delta()

    cc = t.compact()
    assert cc.op == "compact"
    # deltas folded: the active snapshot has no delta slices left, so
    # reads skip the latest-wins window entirely
    assert not t._has_active_delta()
    assert {(r["k"], r["v"]) for r in t.read().collect()} == before
    # row-level: exactly one physical row per key survives compaction
    raw = spark.read.option("mergeSchema", "true").parquet(
        *[str(t.table_path / s) for s in t.log.active_slices()])
    assert raw.count() == 3
    # and a post-compact upsert starts a fresh delta generation
    c = t.write(spark.createDataFrame([(3, "C")], ["k", "v"]),
                WriteOp.UPSERT)
    assert c.delta and t._has_active_delta()
    assert {(r["k"], r["v"]) for r in t.read().collect()} == \
        {(1, "A2"), (2, "B"), (3, "C")}


def test_mor_change_capture_and_dedup_insert(spark, tmp_path):
    t = TableSink(spark, tmp_path / "m", record_key_field="k",
                  table_type="mor")
    c0 = t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
                 WriteOp.INSERT)
    c1 = t.write(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]),
                 WriteOp.UPSERT)
    ch1 = {(r["k"], r["v"], r["change_op"])
           for r in t.read_changes(c1.commit_id).collect()}
    assert ch1 == {(2, "B", "update"), (3, "c", "insert")}
    # dedup-insert still filters against the RESOLVED key set
    t.write(spark.createDataFrame([(2, "dup"), (9, "new")], ["k", "v"]),
            WriteOp.DEDUP_INSERT)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c", 9: "new"}
    assert c0.delta is False


def test_mor_base_refused_by_subtraction_maintainers(spark, tmp_path):
    """A delta upsert displaces versions with no removes manifest —
    the sketch/rollup maintainers must refuse loudly (compact first),
    never silently diverge; the checkpoint rolls back so the drain is
    re-runnable after a compact."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.cms import maintain_term_sketch
    from marmaray_spark.operators.rollup import maintain_rollup

    base = TableSink(spark, tmp_path / "b", record_key_field="doc_id",
                     table_type="mor")
    sketch = TableSink(spark, tmp_path / "sk", record_key_field="cell_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    base.write(spark.createDataFrame([(1, "alpha beta")],
                                     ["doc_id", "text"]), WriteOp.INSERT)
    maintain_term_sketch(base, sketch, md, depth=4, width=64)
    good = md.get("term_sketch.last_commit")
    base.write(spark.createDataFrame([(1, "gamma")], ["doc_id", "text"]),
               WriteOp.UPSERT)
    with pytest.raises(ValueError, match="merge-on-read delta"):
        maintain_term_sketch(base, sketch, md, depth=4, width=64)
    assert md.get("term_sketch.last_commit") == good

    # after compact() the displaced version is physically gone and the
    # drain sees a plain commit stream again... compact is a
    # maintenance commit (skipped by consume_changes), but the delta
    # commit itself is still in the pending window — the refusal holds
    # until the consumer accepts a rebuild. Pin the rollup twin too.
    rollup = TableSink(spark, tmp_path / "r", record_key_field="grp")
    md2 = FileSystemMetadataManager(str(tmp_path / "md2"))
    base2 = TableSink(spark, tmp_path / "b2", record_key_field="id",
                      table_type="mor")
    base2.write(spark.createDataFrame([(1, "a", 1.0)],
                                      ["id", "grp", "x"]), WriteOp.INSERT)
    maintain_rollup(base2, rollup, md2, "grp", {"n": ("count", "*")})
    base2.write(spark.createDataFrame([(1, "b", 2.0)],
                                      ["id", "grp", "x"]), WriteOp.UPSERT)
    with pytest.raises(ValueError, match="merge-on-read delta"):
        maintain_rollup(base2, rollup, md2, "grp", {"n": ("count", "*")})


def test_mor_sparse_maintainer_works_without_removes(spark, tmp_path):
    """maintain_sparse_report (the projection family) needs no removes
    manifest — on a MOR base an update's stale rows are found through
    re-derivation of the changed keys, so link edges stay exact."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.web import maintain_link_edges
    from marmaray_spark.sinks.table import TableSink, WriteOp

    pages = TableSink(spark, tmp_path / "p", "target_uri",
                      table_type="mor")
    edges = TableSink(spark, tmp_path / "e", "report_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    pages.write(spark.createDataFrame(
        [("http://a.com/1", ["b.org", "c.net"])],
        "target_uri string, link_hosts array<string>"), WriteOp.INSERT)
    maintain_link_edges(pages, edges, md, "target_uri")
    # the MOR update appends a delta; the sparse maintainer re-derives
    # page a and rewrites its stale c.net edge away
    pages.write(spark.createDataFrame(
        [("http://a.com/1", ["b.org"])],
        "target_uri string, link_hosts array<string>"), WriteOp.UPSERT)
    maintain_link_edges(pages, edges, md, "target_uri")
    got = {(r["src"], r["dst"]) for r in edges.read().collect()}
    assert got == {("a.com", "b.org")}


# ---------------------------------------------------------------------------
# per-slice bloom key index (r10): Hudi BloomIndex parity
# ---------------------------------------------------------------------------


def test_bloom_index_prunes_where_ranges_cannot(spark, tmp_path):
    """Two slices with INTERLEAVED key ranges (every range overlaps
    every probe — the URL-key weakness the link-edges rehearsal hit):
    the bloom leg must prune a disjoint batch to zero slices, and a
    duplicate-bearing batch must still dedup correctly (false positives
    cost a scan, false negatives are impossible)."""
    t = TableSink(spark, tmp_path / "b", record_key_field="k",
                  bloom_min_bytes=0)
    # evens then odds: both slices span [0..99]-ish, ranges useless
    t.write(spark.createDataFrame([(i, "e") for i in range(0, 100, 2)],
                                  ["k", "v"]), WriteOp.INSERT)
    t.write(spark.createDataFrame([(i, "o") for i in range(1, 100, 2)],
                                  ["k", "v"]), WriteOp.INSERT)

    # range index admits both slices for any in-range probe...
    assert len(t.slices_for_key_range(4, 5)) == 2
    # ...the bloom narrows a point probe to the ONE slice that has it
    kdf = spark.createDataFrame([(4,)], ["k"])
    pruned = t._bloom_filter_slices(t.slices_for_key_range(4, 4), kdf)
    assert len(pruned) == 1
    assert [r["v"] for r in t.lookup(4).collect()] == ["e"]
    assert [r["v"] for r in t.lookup(5).collect()] == ["o"]

    # disjoint dedup batch: nothing survives the bloom -> pure append,
    # and the rows all land
    c = t.write(spark.createDataFrame([(i, "n") for i in range(200, 210)],
                                      ["k", "v"]), WriteOp.DEDUP_INSERT)
    assert c.counts["written"] == 10
    # overlapping dedup batch: true duplicates still filtered
    c2 = t.write(spark.createDataFrame([(4, "dup"), (5, "dup"),
                                        (300, "new")], ["k", "v"]),
                 WriteOp.DEDUP_INSERT)
    assert c2.counts["written"] == 1
    assert t.read().count() == 111
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[4] == "e" and got[5] == "o" and got[300] == "new"


def test_bloom_missing_file_is_conservative(spark, tmp_path):
    """A slice written before the index existed (or with bloom_index
    off) has no bitmap: pruning must KEEP it — never silently treat it
    as empty."""
    t0 = TableSink(spark, tmp_path / "b", record_key_field="k",
                   bloom_index=False)
    t0.write(spark.createDataFrame([(1, "a")], ["k", "v"]), WriteOp.INSERT)
    t = TableSink(spark, tmp_path / "b", record_key_field="k",
                  bloom_min_bytes=0)
    t.write(spark.createDataFrame([(2, "b")], ["k", "v"]), WriteOp.INSERT)
    # lookup of key 1 must still find it through the bloom-less slice
    assert [r["v"] for r in t.lookup(1).collect()] == ["a"]
    # and dedup against it still filters
    c = t.write(spark.createDataFrame([(1, "dup"), (9, "new")],
                                      ["k", "v"]), WriteOp.DEDUP_INSERT)
    assert c.counts["written"] == 1
    assert {r["k"] for r in t.read().collect()} == {1, 2, 9}


def test_mor_maybe_compact_policy(spark, tmp_path):
    """maybe_compact folds deltas only once the threshold is reached —
    the knob bounding the MOR read tax without per-tick rewrites."""
    t = TableSink(spark, tmp_path / "m", record_key_field="k",
                  table_type="mor")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
            WriteOp.INSERT)
    t.write(spark.createDataFrame([(1, "A")], ["k", "v"]), WriteOp.UPSERT)
    assert t.maybe_compact(max_delta_slices=2) is None   # 1 delta: wait
    t.write(spark.createDataFrame([(2, "B")], ["k", "v"]), WriteOp.UPSERT)
    cc = t.maybe_compact(max_delta_slices=2)             # 2 deltas: fold
    assert cc is not None and cc.op == "compact"
    assert not t._has_active_delta()
    assert {(r["k"], r["v"]) for r in t.read().collect()} == \
        {(1, "A"), (2, "B")}
    # COW tables: always a no-op
    c = TableSink(spark, tmp_path / "c", record_key_field="k")
    c.write(spark.createDataFrame([(1, "x")], ["k", "v"]), WriteOp.INSERT)
    assert c.maybe_compact(max_delta_slices=1) is None


def test_maintained_index_on_mor_derived_table(spark, tmp_path):
    """The MOR payoff scenario: a maintained projection whose DERIVED
    table is merge-on-read — every maintenance UPSERT lands as a delta
    append instead of rewriting the index, probes read latest-wins, and
    maybe_compact folds the deltas with identical content."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.maintained import maintain_projection

    base = TableSink(spark, tmp_path / "b", record_key_field="k")
    derived = TableSink(spark, tmp_path / "d", record_key_field="k",
                        table_type="mor")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    def proj(df):
        return df.select("k", (F.col("n") * 10).alias("feat"))

    base.write(spark.createDataFrame([(1, 5), (2, 7)], ["k", "n"]),
               WriteOp.INSERT)
    maintain_projection(base, derived, md, ["k", "n"], "k", proj,
                        checkpoint_key="proj.ck")
    base.write(spark.createDataFrame([(2, 9), (3, 1)], ["k", "n"]),
               WriteOp.UPSERT)
    maintain_projection(base, derived, md, ["k", "n"], "k", proj,
                        checkpoint_key="proj.ck")
    # the maintenance upsert appended a delta, not a rewrite
    assert derived.log.commits()[-1].delta is True
    assert derived.log.commits()[-1].removes == []
    want = {(1, 50), (2, 90), (3, 10)}
    assert {(r["k"], r["feat"]) for r in derived.read().collect()} == want
    # compaction changes storage, not content
    derived.maybe_compact(max_delta_slices=1)
    assert not derived._has_active_delta()
    assert {(r["k"], r["feat"]) for r in derived.read().collect()} == want


def test_bloom_probe_type_drift_cannot_false_negative(spark, tmp_path):
    """Review find (r10, repro'd): the first cut hashed string-cast keys
    while joins coerce numerically, so a DOUBLE probe against a LONG key
    false-negated — lookup(4.0) returned nothing and DEDUP_INSERT landed
    a duplicate. Probes now cast to the table's key type first: type
    drift can only add false positives, never lose a match."""
    t = TableSink(spark, tmp_path / "b", record_key_field="k",
                  bloom_min_bytes=0)
    t.write(spark.createDataFrame([(i, "a") for i in range(0, 100, 2)],
                                  ["k", "v"]), WriteOp.INSERT)
    t.write(spark.createDataFrame([(i, "o") for i in range(1, 100, 2)],
                                  ["k", "v"]), WriteOp.INSERT)
    assert [r["v"] for r in t.lookup(4.0).collect()] == ["a"]
    # the dedup DECISION on a drifted frame (a drifted WRITE is illegal
    # at the table level regardless — parquet schemas can't merge):
    # the coercing anti-join must still see 4.0 == 4, so the bloom leg
    # feeding it may not prune the slice that holds key 4
    drift = spark.createDataFrame([(4.0, "dup"), (300.0, "new")],
                                  "k double, v string")
    kept = t._dedup_against_existing(drift)
    assert [r["k"] for r in kept.collect()] == [300.0]


def test_bloom_header_mismatch_degrades_to_keep(spark, tmp_path):
    """A bitmap from another geometry/version must degrade to the
    conservative no-bloom keep, never silently false-negate."""
    t = TableSink(spark, tmp_path / "b", record_key_field="k",
                  bloom_min_bytes=0)
    c0 = t.write(spark.createDataFrame([(1, "a")], ["k", "v"]),
                 WriteOp.INSERT)
    from marmaray_spark.sinks.table import BLOOM_FILE
    p = t.table_path / c0.adds[0] / BLOOM_FILE
    p.write_bytes(b"JUNKJUNK" + b"\x00" * 64)     # bad magic
    t._bloom_cache.clear()
    assert [r["v"] for r in t.lookup(1).collect()] == ["a"]
    p.write_bytes(p.read_bytes()[:12])            # truncated header
    t._bloom_cache.clear()
    assert [r["v"] for r in t.lookup(1).collect()] == ["a"]


def test_bloom_survives_percent_encoded_partition_values(spark, tmp_path):
    """Partition values with URI-reserved chars (spaces, unicode) come
    back from input_file_name() percent-encoded; before the decode fix
    the slice-dir compare matched nothing and the build wrote an
    ALL-ZERO bitmap — a false-negative machine (lookup missed live
    keys, DEDUP_INSERT landed duplicates). The bloom must map
    correctly (non-zero bitmap) and point lookups/dedup must work."""
    import numpy as np

    from marmaray_spark.sinks.table import BLOOM_FILE

    t = TableSink(spark, tmp_path / "b", record_key_field="k",
                  partition_field="city", bloom_min_bytes=0)
    c = t.write(spark.createDataFrame(
        [(1, "New York"), (2, "São Paulo"), (3, "New York")],
        ["k", "city"]), WriteOp.INSERT)
    # every written slice carries a POPULATED bitmap (the mapping
    # survived percent-encoding); an absent file would also be safe
    # (conservative keep) but here the decode must have worked
    for s in c.adds:
        blm = t._slice_bloom(s)
        assert blm is not None, f"no bloom written for {s}"
        assert int(np.count_nonzero(blm[2])) > 0, f"all-zero bloom: {s}"
    assert [r["city"] for r in t.lookup(2).collect()] == ["São Paulo"]
    # duplicate keys must still be filtered (no false negatives)
    c2 = t.write(spark.createDataFrame(
        [(1, "New York"), (9, "Lisbon")], ["k", "city"]),
        WriteOp.DEDUP_INSERT)
    assert c2.counts["written"] == 1
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3, 9]


def test_bloom_unmappable_slice_fails_safe_to_no_bloom(spark, tmp_path, monkeypatch):
    """If the executor-reported file URI cannot be attributed to a
    slice directory at all, the build must SKIP that slice's bloom
    (missing file = conservative keep-all) rather than write zeros."""
    import urllib.parse

    from marmaray_spark.sinks.table import BLOOM_FILE

    # force every URI->dir mapping to miss
    monkeypatch.setattr(urllib.parse, "unquote",
                        lambda s, *a, **k: s + "/__nomatch__")
    t = TableSink(spark, tmp_path / "b", record_key_field="k",
                  bloom_min_bytes=0)
    c = t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
                WriteOp.INSERT)
    for s in c.adds:
        assert not (t.table_path / s / BLOOM_FILE).exists()
    # and the bloom-less slices stay fully visible
    assert [r["v"] for r in t.lookup(1).collect()] == ["a"]
    c2 = t.write(spark.createDataFrame([(1, "dup"), (5, "new")],
                                       ["k", "v"]), WriteOp.DEDUP_INSERT)
    assert c2.counts["written"] == 1


def test_table_type_is_pinned_per_table(spark, tmp_path):
    """The storage type persists with the table (advisor find, r10):
    reopening a MOR table as 'cow' must raise — its uncompacted delta
    slices would merge through the COW path without latest-wins
    resolution and shadowed key versions would come back as duplicate
    rows — while an opener that passes no type ADOPTS the pinned one."""
    t = TableSink(spark, tmp_path / "t", "k", table_type="mor")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
            WriteOp.INSERT)
    t.write(spark.createDataFrame([(1, "a2")], ["k", "v"]),
            WriteOp.UPSERT)   # delta slice now active

    with pytest.raises(ValueError, match="table_type"):
        TableSink(spark, tmp_path / "t", "k", table_type="cow")

    t2 = TableSink(spark, tmp_path / "t", "k")   # no type: adopt pin
    assert t2.table_type == "mor"
    assert {(r["k"], r["v"]) for r in t2.read().collect()} == {
        (1, "a2"), (2, "b")}
    # a fresh table with no argument pins to the 'cow' default
    t3 = TableSink(spark, tmp_path / "t3", "k")
    assert t3.table_type == "cow"
    assert TableSink(spark, tmp_path / "t3", "k",
                     table_type="cow").table_type == "cow"


# ---------------------------------------------------------------------------
# column-stats index (r11): Hudi metadata-table col_stats / data skipping
# ---------------------------------------------------------------------------


def test_col_stats_scan_skips_files_and_matches_filter(spark, tmp_path):
    """scan(col, lo, hi) must equal read().filter(...) while never
    listing slices whose recorded [min,max] cannot overlap; a slice
    written BEFORE the column was indexed has no stats and is scanned
    conservatively."""
    # slice written with stats off: must stay conservative forever
    t0 = TableSink(spark, tmp_path / "t", "k")
    t0.write(spark.createDataFrame([(0, 999, "old")], ["k", "v", "tag"]),
             WriteOp.INSERT)
    t = TableSink(spark, tmp_path / "t", "k", stats_cols=["v"])
    t.write(spark.createDataFrame(
        [(i, i * 10, "lo") for i in range(1, 6)], ["k", "v", "tag"]),
        WriteOp.INSERT)                       # v in [10, 50]
    t.write(spark.createDataFrame(
        [(i, i * 10, "hi") for i in range(10, 16)], ["k", "v", "tag"]),
        WriteOp.INSERT)                       # v in [100, 150]

    # pruning: only the overlapping slice + the stats-less one survive
    stats = t.col_stats()
    assert sum(1 for v in stats.values() if "v" in v) == 2
    admitted = t.slices_for_col_range("v", 100, 120)
    assert len(admitted) == 2                 # hi slice + stats-less t0
    assert len(t.slices_for_col_range("v", 60, 90)) == 1   # only t0

    # semantics == read().filter, in every band
    for lo, hi in [(100, 120), (60, 90), (None, 40), (140, None),
                   (999, 999)]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("v") >= lo)
        if hi is not None:
            cond = cond & (F.col("v") <= hi)
        got = sorted(r["k"] for r in t.scan("v", lo, hi).collect())
        want = sorted(r["k"] for r in t.read().filter(cond).collect())
        assert got == want, (lo, hi)


def test_col_stats_scan_mor_deltas_disable_skipping(spark, tmp_path):
    """With ACTIVE merge-on-read deltas, scan must not prune: a non-key
    predicate could admit the slice holding a SHADOWED version of a key
    while skipping the delta holding its latest — resurrecting an
    overwritten row. After compact, skipping returns."""
    t = TableSink(spark, tmp_path / "t", "k", table_type="mor",
                  stats_cols=["v"])
    t.write(spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"]),
            WriteOp.INSERT)
    # delta moves key 1 OUT of the probed band (10 -> 1000)
    t.write(spark.createDataFrame([(1, 1000)], ["k", "v"]),
            WriteOp.UPSERT)
    assert len(t.log.active_state()[1]) == 1
    got = {(r["k"], r["v"]) for r in t.scan("v", 0, 100).collect()}
    assert got == {(2, 20)}                   # key 1's old row must NOT
    # resurface even though its slice's range [10,20] overlaps the band
    t.compact()
    assert {(r["k"], r["v"]) for r in t.scan("v", 0, 100).collect()} \
        == {(2, 20)}
    assert {(r["k"], r["v"]) for r in t.scan("v", 900, None).collect()} \
        == {(1, 1000)}


def test_precombine_field_combines_before_upsert(spark, tmp_path):
    """Hudi preCombineField parity: a batch carrying several versions
    of one key keeps only the greatest-precombine row before the merge
    — without it, upsert's unique-per-key contract is violated
    SILENTLY and duplicates land."""
    t = TableSink(spark, tmp_path / "t", "k", precombine_field="ts")
    t.write(spark.createDataFrame(
        [(1, 10, "old"), (1, 30, "new"), (1, 20, "mid"), (2, 5, "only")],
        ["k", "ts", "v"]), WriteOp.UPSERT)
    assert {(r["k"], r["v"]) for r in t.read().collect()} == \
        {(1, "new"), (2, "only")}
    # next upsert batch: stale version loses even against the table
    # (precombine is intra-batch; cross-batch last-write-wins is the
    # upsert itself — arriving later means winning, Hudi semantics)
    t.write(spark.createDataFrame([(1, 25, "later-batch")],
                                  ["k", "ts", "v"]), WriteOp.UPSERT)
    assert {(r["k"], r["v"]) for r in t.read().collect()} == \
        {(1, "later-batch"), (2, "only")}
    # dedup_insert: intra-batch combine, then existing keys filtered
    c = t.write(spark.createDataFrame(
        [(3, 1, "a"), (3, 2, "b"), (2, 99, "dup")], ["k", "ts", "v"]),
        WriteOp.DEDUP_INSERT)
    assert c.counts["written"] == 1
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert got == {(1, "later-batch"), (2, "only"), (3, "b")}
    # a missing precombine column fails loudly, not silently raw
    import pytest as _pytest
    with _pytest.raises(ValueError, match="precombine_field"):
        t.write(spark.createDataFrame([(9, "x")], ["k", "v"]),
                WriteOp.UPSERT)


def test_cluster_tightens_ranges_and_preserves_everything(spark, tmp_path):
    """cluster(): interleaved commits that each span the whole key
    space become range-disjoint bucket slices — a point probe prunes
    to ONE slice — while contents, per-record commit stamps (the CDC /
    streaming-tail currency) and time travel stay byte-identical."""
    t = TableSink(spark, tmp_path / "t", "k", bloom_min_bytes=0)
    for r in range(4):   # every commit spans keys [r, 96+r]: all overlap
        t.write(spark.createDataFrame(
            [(i * 4 + r, f"c{r}") for i in range(25)], ["k", "v"]),
            WriteOp.INSERT)
    before = sorted(map(tuple, t.read(with_meta=True).collect()))
    assert len(t.slices_for_key_range(50, 50)) == 4   # ranges useless

    c = t.cluster(n_buckets=4)
    assert c.op == "cluster" and len(c.adds) == 4
    # disjoint ranges: the point probe now admits exactly one slice
    assert len(t.slices_for_key_range(50, 50)) == 1
    # contents AND stamps unchanged (storage reorganization only)
    assert sorted(map(tuple, t.read(with_meta=True).collect())) == before
    # time travel to the pre-cluster commit still works
    assert t.read(as_of=c.commit_id).count() == 100
    # lookup through the fresh blooms still lands
    assert [r["v"] for r in t.lookup(50).collect()] == ["c2"]
    # idempotent policy surface: clustering the clustered table again
    # is allowed and keeps content
    t.cluster(n_buckets=2)
    assert sorted(map(tuple, t.read(with_meta=True).collect())) == before


def test_cluster_skips_mor_deltas_and_keeps_resolution(spark, tmp_path):
    """Active MOR deltas are never clustered: the bases under them
    reorganize, the deltas keep shadowing by stamp, and latest-wins
    survives."""
    t = TableSink(spark, tmp_path / "t", "k", table_type="mor")
    t.write(spark.createDataFrame([(i, "base") for i in range(20)],
                                  ["k", "v"]), WriteOp.INSERT)
    t.write(spark.createDataFrame([(5, "newer")], ["k", "v"]),
            WriteOp.UPSERT)                      # delta shadows k=5
    c = t.cluster(n_buckets=2)
    assert all("000000000001" not in s for s in c.removes)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[5] == "newer" and got[4] == "base" and len(got) == 20
    # explicit delta target refuses loudly
    delta_slice = t.log.commits()[1].adds[0]
    with pytest.raises(ValueError, match="delta"):
        t.cluster(target_slices=[delta_slice])


def test_table_cli_surface(spark, tmp_path, capsys):
    """tools/table_cli.py — the hudi-cli analogue: commits/stats read
    the log without Spark; cluster/vacuum run the services and report
    one parseable JSON line each."""
    import json as _json
    import sys as _sys
    sys_path_added = str((tmp_path / "..").resolve())
    del sys_path_added
    _sys.path.insert(0, "/root/repo/tools")
    try:
        import table_cli
    finally:
        _sys.path.pop(0)

    t = TableSink(spark, tmp_path / "t", "k", stats_cols=["v"],
                  bloom_min_bytes=0)
    for r in range(3):
        t.write(spark.createDataFrame(
            [(i * 3 + r, i) for i in range(10)], ["k", "v"]),
            WriteOp.INSERT)

    assert table_cli.main(["commits", str(tmp_path / "t")]) == 0
    doc = _json.loads(capsys.readouterr().out.strip())
    assert len(doc["commits"]) == 3 and doc["active_slices"] == 3

    assert table_cli.main(["stats", str(tmp_path / "t")]) == 0
    doc = _json.loads(capsys.readouterr().out.strip())
    assert len(doc["key_ranges"]) == 3
    assert all("v" in v for v in doc["col_ranges"].values())

    assert table_cli.main(["cluster", str(tmp_path / "t"),
                           "--key", "k", "--buckets", "2"]) == 0
    doc = _json.loads(capsys.readouterr().out.strip())
    assert doc["buckets"] == 2 and doc["rewrote_slices"] == 3
    assert t.read().count() == 30

    assert table_cli.main(["vacuum", str(tmp_path / "t"),
                           "--key", "k", "--retain", "0"]) == 0
    doc = _json.loads(capsys.readouterr().out.strip())
    assert len(doc["deleted_slices"]) == 3   # the pre-cluster slices
    assert t.read().count() == 30


def test_clean_orphans_spares_cluster_slices(spark, tmp_path):
    """clean_orphans must keep a data dir whenever ANY referenced slice
    lives under it: cluster() registers slices as data/<cid>/__cb__=N
    (not data/<cid> itself, and not the __pp__= layout), so a layout
    allowlist in the orphan sweep rmtree'd the entire live cluster
    commit — table_cli exposes 'cluster' and 'orphans' back to back,
    making that a one-command table wipe."""
    t = TableSink(spark, tmp_path / "t", "k", bloom_min_bytes=0)
    for r in range(2):
        t.write(spark.createDataFrame(
            [(i * 2 + r, f"c{r}") for i in range(10)], ["k", "v"]),
            WriteOp.INSERT)
    before = sorted(map(tuple, t.read().collect()))
    c = t.cluster(n_buckets=2)
    assert all("__cb__=" in s for s in c.adds)

    # a genuine crash leftover must still be swept in the same pass
    orphan = tmp_path / "t" / "data" / "999999999999"
    spark.createDataFrame([(99, "x")], ["k", "v"]) \
        .write.parquet(str(orphan))

    removed = t.clean_orphans()
    assert removed == ["data/999999999999"]
    assert not orphan.exists()
    assert sorted(map(tuple, t.read().collect())) == before
    # and the clustered slices physically survived
    for s in c.adds:
        assert (tmp_path / "t" / s).is_dir()


def test_readonly_open_does_not_pin_table_type(spark, tmp_path):
    """A read-only opener (change-stream source, table_cli, example
    readers) must not write the table-type pin: a pre-existing
    unpinned MOR table first opened by a reader got pinned 'cow', and
    the legitimate MOR writer then hit a spurious ValueError — or,
    opening with None, silently adopted 'cow' and routed upserts
    through the COW merge. The pin lands only on an explicit request
    or at first actual write."""
    t = TableSink(spark, tmp_path / "t", "k", table_type="mor")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
            WriteOp.INSERT)
    t.write(spark.createDataFrame([(2, "B")], ["k", "v"]), WriteOp.UPSERT)
    props = tmp_path / "t" / "_commits" / "_table_props.json"
    props.unlink()                      # simulate a pre-pin-era table

    # reader opens with None: adopts in memory, writes NOTHING
    reader = TableSink(spark, tmp_path / "t", "k")
    assert reader.read().count() == 2
    assert not props.exists()

    # the real MOR writer reopens without conflict and keeps MOR
    w = TableSink(spark, tmp_path / "t", "k", table_type="mor")
    assert props.exists()               # explicit request pins at open
    w.write(spark.createDataFrame([(3, "c")], ["k", "v"]), WriteOp.UPSERT)
    assert json.loads(props.read_text())["table_type"] == "mor"
    got = {r["k"]: r["v"] for r in w.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_adopted_type_pins_at_first_write(spark, tmp_path):
    """Open-with-None on a fresh table stays unpinned until the first
    write actually uses the adopted default — then it pins, and a
    later conflicting opener is refused."""
    t = TableSink(spark, tmp_path / "t", "k")
    props = tmp_path / "t" / "_commits" / "_table_props.json"
    assert not props.exists()           # adoption alone writes nothing
    t.write(spark.createDataFrame([(1, "a")], ["k", "v"]), WriteOp.INSERT)
    assert json.loads(props.read_text())["table_type"] == "cow"
    with pytest.raises(ValueError, match="table_type"):
        TableSink(spark, tmp_path / "t", "k", table_type="mor")


def test_precombine_skips_nested_map_tiebreak(spark, tmp_path):
    """Any type EMBEDDING a map is unorderable in Spark, not just a
    top-level MapType: array<map<..>> in the tiebreak list made
    _precombine's orderBy raise AnalysisException. Such columns are
    skipped; orderable columns still break ties deterministically."""
    from pyspark.sql.types import (ArrayType, IntegerType, MapType,
                                   StringType, StructField, StructType)

    schema = StructType([
        StructField("k", IntegerType()),
        StructField("ts", IntegerType()),
        StructField("v", StringType()),
        StructField("tags", ArrayType(MapType(StringType(), StringType()))),
        StructField("props", StructType([
            StructField("m", MapType(StringType(), IntegerType()))])),
    ])
    t = TableSink(spark, tmp_path / "t", "k", precombine_field="ts")
    batch = spark.createDataFrame(
        [(1, 5, "old", [{"a": "1"}], {"m": {"x": 1}}),
         (1, 9, "new", [{"b": "2"}], {"m": {"y": 2}}),
         (2, 1, "only", None, None)], schema)
    t.write(batch, WriteOp.UPSERT)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "new", 2: "only"}


# -- WriteOp.DELETE (key-scoped removal; the GDPR/forget path) -------------


def test_delete_cow_prunes_rewrites_and_captures_changes(spark, tmp_path):
    """Copy-on-write DELETE: matching rows leave, survivors keep their
    original commit stamps (incremental windows undisturbed), the
    commit records the deleted count + tombstone manifest, change
    capture emits before-images tagged 'delete', and a replayed delete
    of the same keys is a zero-count no-op with no file churn."""
    t = TableSink(spark, tmp_path / "t", "k")
    c0 = t.write(spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], ["k", "v"]), WriteOp.INSERT)
    c = t.write(spark.createDataFrame([(3,), (5,), (99,)], ["k"]),
                WriteOp.DELETE)
    assert c.op == "delete" and c.counts == {"deleted": 2}
    assert c.tombstones.startswith(f"_tombstones/{c.commit_id}")
    assert sorted(r["k"] for r in t.read().collect()) == \
        [0, 1, 2, 4, 6, 7, 8, 9]
    # survivors keep their ORIGINAL stamps: nothing re-enters the
    # incremental window
    assert t.read_incremental(since=c0.commit_id).count() == 0
    # CDC: before-images, tagged
    ch = t.read_changes(c.commit_id)
    assert sorted((r["k"], r["v"], r["change_op"]) for r in ch.collect()) \
        == [(3, "v3", "delete"), (5, "v5", "delete")]
    # with_op=False keeps its after-image contract: a delete has none
    assert t.read_changes(c.commit_id, with_op=False).count() == 0
    # replay: nothing matches, zero-count commit, no slices touched
    c2 = t.write(spark.createDataFrame([(3,), (5,)], ["k"]),
                 WriteOp.DELETE)
    assert c2.counts == {"deleted": 0} and c2.adds == [] \
        and c2.removes == [] and c2.tombstones is None
    # time travel straddles the delete
    assert t.read(as_of=c0.commit_id).count() == 10


def test_delete_mor_tombstone_delta(spark, tmp_path):
    """Merge-on-read DELETE appends a tombstone delta (batch-scale, no
    rewrite): reads and lookups drop the key, the before-image is the
    LATEST pre-delete version, a deleted key can be re-inserted through
    DEDUP_INSERT (the tombstone must not read as 'existing'), and
    compact() folds tombstones out of storage."""
    m = TableSink(spark, tmp_path / "m", "k", table_type="mor")
    m.write(spark.createDataFrame([(i, f"v{i}") for i in range(10)],
                                  ["k", "v"]), WriteOp.INSERT)
    m.write(spark.createDataFrame([(4, "V4")], ["k", "v"]), WriteOp.UPSERT)
    c = m.write(spark.createDataFrame([(4,), (7,)], ["k"]), WriteOp.DELETE)
    assert c.delta is True and c.removes == [] \
        and c.counts == {"deleted": 2}
    assert sorted(r["k"] for r in m.read().collect()) == \
        [0, 1, 2, 3, 5, 6, 8, 9]
    assert m.lookup(4).count() == 0 and m.lookup(3).count() == 1
    # before-image picks the newest shadowed version (V4, not v4)
    assert sorted((r["k"], r["v"]) for r in
                  m.delete_preimages(c.commit_id).collect()) == \
        [(4, "V4"), (7, "v7")]
    # _deleted never leaks into reader-facing schemas
    assert "_deleted" not in m.read().columns
    assert "_deleted" not in m.read_changes(c.commit_id).columns
    # re-insert through the dedup gate: tombstoned key is NOT existing
    m.write(spark.createDataFrame([(4, "back"), (3, "dup")], ["k", "v"]),
            WriteOp.DEDUP_INSERT)
    got = {r["k"]: r["v"] for r in m.read().collect()}
    assert got[4] == "back" and got[3] == "v3" and len(got) == 9
    # compact folds the tombstones; content unchanged, deltas gone
    m.compact()
    assert len(m.log.active_state()[1]) == 0
    assert {r["k"]: r["v"] for r in m.read().collect()} == got
    # deleting an absent key on MOR is also a zero-count no-op
    assert m.write(spark.createDataFrame([(7,)], ["k"]),
                   WriteOp.DELETE).counts == {"deleted": 0}


def test_noop_delete_discards_staged_files(spark, tmp_path):
    """Absent-key deletes learn their zero count from the staged write's
    OBSERVED metric (no separate stats pass) — the staged survivor /
    tombstone / delta dirs must be retired, leaving storage exactly as
    before the no-op on both table types."""
    for ttype in ("cow", "mor"):
        t = TableSink(spark, tmp_path / ttype, "k", table_type=ttype)
        t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
                WriteOp.INSERT)
        before = sorted(p.name for p in (tmp_path / ttype / "data").iterdir())
        c = t.write(spark.createDataFrame([(9,)], ["k"]), WriteOp.DELETE)
        assert c.counts == {"deleted": 0} and c.adds == [] \
            and c.tombstones is None
        after = sorted(p.name for p in (tmp_path / ttype / "data").iterdir())
        assert after == before
        ts = tmp_path / ttype / "_tombstones"
        assert not ts.exists() or not any(ts.iterdir())
        assert sorted(r["k"] for r in t.read().collect()) == [1, 2]


def test_delete_partitioned_table(spark, tmp_path):
    t = TableSink(spark, tmp_path / "t", "k", partition_field="p")
    t.write(spark.createDataFrame(
        [(i, f"p{i % 2}", i * 10) for i in range(8)], ["k", "p", "x"]),
        WriteOp.INSERT)
    c = t.write(spark.createDataFrame([(0,), (1,)], ["k"]), WriteOp.DELETE)
    assert c.counts == {"deleted": 2}
    assert sorted(r["k"] for r in t.read().collect()) == list(range(2, 8))
    assert sorted((r["k"], r["p"]) for r in
                  t.read_changes(c.commit_id).select("k", "p").collect()) \
        == [(0, "p0"), (1, "p1")]


def test_delete_empties_table_and_reads_empty(spark, tmp_path):
    """A table whose every row was deleted reads as an EMPTY frame in
    its own schema (not an error), is_empty() is honest, and fresh
    inserts bring it back."""
    t = TableSink(spark, tmp_path / "t", "k")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
            WriteOp.INSERT)
    c = t.write(spark.createDataFrame([(1,), (2,)], ["k"]), WriteOp.DELETE)
    assert c.counts == {"deleted": 2} and c.adds == []
    assert t.is_empty()
    assert t.read().count() == 0
    assert set(t.read().columns) == {"k", "v"}
    t.write(spark.createDataFrame([(3, "c")], ["k", "v"]), WriteOp.INSERT)
    assert [(r["k"], r["v"]) for r in t.read().collect()] == [(3, "c")]
    # CDC for the emptying delete still serves before-images
    assert t.read_changes(c.commit_id).count() == 2


def test_delete_preimages_vacuumed_raises(spark, tmp_path):
    t = TableSink(spark, tmp_path / "t", "k")
    t.write(spark.createDataFrame([(i, str(i)) for i in range(5)],
                                  ["k", "v"]), WriteOp.INSERT)
    c = t.write(spark.createDataFrame([(2,)], ["k"]), WriteOp.DELETE)
    for _ in range(6):   # push the delete's removes out of retention
        t.write(spark.createDataFrame([(100, "x")], ["k", "v"]),
                WriteOp.UPSERT)
    t.vacuum(retain_last_n_commits=2)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.delete_preimages(c.commit_id).collect()


def test_delete_then_reinsert_tags_insert_in_cdc(spark, tmp_path):
    """A key re-inserted after a delete is a fresh 'insert' in change
    capture — the pre-delete incarnation must not make it an
    'update'."""
    t = TableSink(spark, tmp_path / "t", "k")
    t.write(spark.createDataFrame([(1, "a")], ["k", "v"]), WriteOp.INSERT)
    t.write(spark.createDataFrame([(1,)], ["k"]), WriteOp.DELETE)
    c = t.write(spark.createDataFrame([(1, "again")], ["k", "v"]),
                WriteOp.UPSERT)
    ch = t.read_changes(c.commit_id).collect()
    assert [(r["k"], r["change_op"]) for r in ch] == [(1, "insert")]


def test_rollup_tracks_base_deletes(spark, tmp_path):
    """maintain_rollup over a base that takes DELETEs: deleted rows
    leave their groups; a group emptied by the delete leaves the rollup
    via a key-scoped DELETE commit (no whole-rollup rewrite)."""
    from marmaray_spark.metadata.manager import InMemoryMetadataManager
    from marmaray_spark.operators.rollup import maintain_rollup

    base = TableSink(spark, tmp_path / "b", "k")
    rollup = TableSink(spark, tmp_path / "r", "grp")
    meta = InMemoryMetadataManager()
    aggs = {"n": ("count", "*"), "total": ("sum", "x")}
    base.write(spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)], ["k", "grp", "x"]),
        WriteOp.INSERT)
    maintain_rollup(base, rollup, meta, "grp", aggs)
    base.write(spark.createDataFrame([(2,), (3,)], ["k"]), WriteOp.DELETE)
    maintain_rollup(base, rollup, meta, "grp", aggs)
    got = sorted((r["grp"], r["n"], r["total"])
                 for r in rollup.read().collect())
    assert got == [("a", 1, 10)]          # b emptied, a re-aggregated
    assert any(c.op == "delete" for c in rollup.log.commits())
    # idle tick after the delete: nothing pending
    assert maintain_rollup(base, rollup, meta, "grp", aggs) == 0


def test_term_sketch_tracks_base_deletes(spark, tmp_path):
    """The linear CMS maintainer subtracts a DELETE's before-images:
    after the delete the maintained sketch equals a from-scratch build
    over the current corpus — for both COW and MOR bases."""
    from marmaray_spark.metadata.manager import InMemoryMetadataManager
    from marmaray_spark.operators.cms import cms_build, maintain_term_sketch

    for ttype in ("cow", "mor"):
        base = TableSink(spark, tmp_path / f"b_{ttype}", "k",
                         table_type=ttype)
        sketch = TableSink(spark, tmp_path / f"s_{ttype}", "cell_key")
        meta = InMemoryMetadataManager()
        base.write(spark.createDataFrame(
            [(1, "alpha beta beta"), (2, "beta gamma"), (3, "alpha")],
            ["k", "text"]), WriteOp.INSERT)
        maintain_term_sketch(base, sketch, meta, text_col="text",
                             depth=2, width=64)
        base.write(spark.createDataFrame([(2,)], ["k"]), WriteOp.DELETE)
        maintain_term_sketch(base, sketch, meta, text_col="text",
                             depth=2, width=64)
        toks = (base.read().select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))),
                              r"\s+")).alias("t"))
            .filter(F.col("t") != ""))
        want = sorted(
            (r["row"], r["cell"], r["cnt"]) for r in
            cms_build(toks, "t", depth=2, width=64).collect()
            if r["cnt"] != 0)
        got = sorted((r["row"], r["cell"], r["cnt"])
                     for r in sketch.read().collect() if r["cnt"] != 0)
        assert got == want, ttype


def test_dedup_index_tracks_base_deletes(spark, tmp_path):
    """maintain_projection consumers drop deleted keys: a document
    deleted from the corpus leaves the maintained dedup index (the
    forget flow), via a key-scoped DELETE commit on the index."""
    from marmaray_spark.metadata.manager import InMemoryMetadataManager
    from marmaray_spark.operators.incdedup import (
        exact_dups_against_index, maintain_dedup_index)

    base = TableSink(spark, tmp_path / "b", "doc_id")
    index = TableSink(spark, tmp_path / "i", "doc_id")
    meta = InMemoryMetadataManager()
    base.write(spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "wholly different text")],
        ["doc_id", "text"]), WriteOp.INSERT)
    maintain_dedup_index(base, index, meta)
    assert sorted(r["doc_id"] for r in index.read().collect()) == [1, 2]

    base.write(spark.createDataFrame([(1,)], ["doc_id"]), WriteOp.DELETE)
    maintain_dedup_index(base, index, meta)
    assert sorted(r["doc_id"] for r in index.read().collect()) == [2]
    assert any(c.op == "delete" for c in index.log.commits())
    # a re-submission of the forgotten content is NOT a dup anymore
    probe = spark.createDataFrame([(9, "the quick brown fox")],
                                  ["doc_id", "text"])
    assert exact_dups_against_index(probe, index.read()).count() == 0


# -- multi-writer guard (unique staging dirs + per-table lock) --------------


def test_concurrent_writers_serialize_under_table_lock(spark, tmp_path):
    """Three concurrent writer threads (each its own TableSink handle +
    lock-manager identity, like three driver processes) upsert disjoint
    key ranges under the per-table lock: every commit publishes, ids
    stay contiguous-monotone, and the final content is exactly each
    writer's last batch — no lost updates, no publish races."""
    import threading

    from marmaray_spark.plans.locking import FileLockManager

    errs = []

    def writer(wid: int):
        try:
            locks = FileLockManager(tmp_path / "locks")
            t = TableSink(spark, tmp_path / "t", "k",
                          lock_manager=locks, lock_timeout_s=120)
            for b in range(3):
                rows = [(wid * 100 + i, f"w{wid}b{b}") for i in range(5)]
                t.write(spark.createDataFrame(rows, ["k", "v"]),
                        WriteOp.UPSERT)
        except Exception as e:   # noqa: BLE001 — surfaced via assert
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert errs == []
    t = TableSink(spark, tmp_path / "t", "k")
    ids = [c.commit_id for c in t.log.commits()]
    assert len(ids) == 9 and ids == sorted(ids)
    assert ids == [f"{i:012d}" for i in range(9)]   # no gaps, no dups
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert len(got) == 15
    for wid in range(3):
        for i in range(5):
            assert got[wid * 100 + i] == f"w{wid}b2"


def test_publish_race_without_lock_aborts_cleanly(spark, tmp_path):
    """Two unlocked writers staging against the same next-commit-id:
    the loser's publish fails with FileExistsError, the winner's data
    is untouched (staging dirs are per-writer unique — before this, the
    second stager silently OVERWROTE the first's files under
    data/<cid>), and the loser's staging dir is a sweepable orphan."""
    t1 = TableSink(spark, tmp_path / "t", "k")
    t2 = TableSink(spark, tmp_path / "t", "k")
    t1.write(spark.createDataFrame([(1, "base")], ["k", "v"]),
             WriteOp.INSERT)
    s1 = t1.stage(spark.createDataFrame([(2, "A")], ["k", "v"]),
                  WriteOp.UPSERT)
    s2 = t2.stage(spark.createDataFrame([(3, "B")], ["k", "v"]),
                  WriteOp.UPSERT)
    assert s1.commit.commit_id == s2.commit.commit_id   # the race
    t1.commit_staged(s1)
    with pytest.raises(FileExistsError):
        t2.commit_staged(s2)
    got = {r["k"]: r["v"] for r in t1.read().collect()}
    assert got == {1: "base", 2: "A"}                   # winner intact
    removed = t1.clean_orphans()                        # loser swept
    assert len(removed) == 1
    assert {r["k"]: r["v"] for r in t1.read().collect()} == got


def test_stale_table_lock_is_broken(spark, tmp_path):
    """A writer that died holding the table lock (staged, never
    committed) must not wedge the table: the next writer breaks the
    stale lock after the manager's staleness window and proceeds; the
    dead writer's staged publish then loses cleanly."""
    import time

    from marmaray_spark.plans.locking import FileLockManager

    crashed = TableSink(
        spark, tmp_path / "t", "k",
        lock_manager=FileLockManager(tmp_path / "locks",
                                     stale_after_s=0.5))
    s = crashed.stage(spark.createDataFrame([(1, "dead")], ["k", "v"]),
                      WriteOp.INSERT)       # lock held; process "dies"
    time.sleep(0.8)
    alive = TableSink(
        spark, tmp_path / "t", "k",
        lock_manager=FileLockManager(tmp_path / "locks",
                                     stale_after_s=0.5),
        lock_timeout_s=30)
    alive.write(spark.createDataFrame([(2, "alive")], ["k", "v"]),
                WriteOp.INSERT)             # breaks the stale lock
    with pytest.raises(FileExistsError):
        crashed.commit_staged(s)            # zombie publish loses
    assert {r["k"]: r["v"] for r in alive.read().collect()} == \
        {2: "alive"}


def test_cluster_zorder_prunes_on_every_dimension(spark, tmp_path):
    """cluster(zorder_by=[x, y]): after the Morton rewrite a narrow
    predicate on EITHER column admits ~sqrt-bound slices (a 1-D key
    sort would admit ALL slices for the non-sort column), contents and
    stamps are byte-identical, and scan() stays semantically equal to
    read().filter() on both columns."""
    import random

    t = TableSink(spark, tmp_path / "t", "k", bloom_min_bytes=0)
    random.seed(7)
    rows = [(i, random.randint(0, 9999), random.randint(0, 9999))
            for i in range(8000)]
    for c in range(4):              # interleaved commits span both dims
        t.write(spark.createDataFrame(rows[c::4], ["k", "x", "y"]),
                WriteOp.INSERT)
    before = sorted(map(tuple, t.read(with_meta=True).collect()))

    c = t.cluster(n_buckets=16, zorder_by=["x", "y"], zorder_bits=8)
    assert c.op == "cluster" and len(c.adds) == 16
    # contents AND stamps unchanged (storage reorganization only)
    assert sorted(map(tuple, t.read(with_meta=True).collect())) == before
    # simultaneous pruning: a ~1%-wide window on EITHER dim admits a
    # strict subset of slices (Morton bound ~ sqrt(n_buckets)); before
    # clustering every slice spanned both dims fully
    for col in ("x", "y"):
        admitted = len(t.slices_for_col_range(col, 100, 200))
        assert admitted <= 8, (col, admitted)
    # scan() == read().filter() on both dims
    for col, lo, hi in (("x", 100, 200), ("y", 9000, 9100)):
        a = sorted(r["k"] for r in t.scan(col, lo, hi).collect())
        b = sorted(r["k"] for r in t.read()
                   .filter((F.col(col) >= lo) & (F.col(col) <= hi))
                   .collect())
        assert a == b and a        # non-vacuous
    # bad args fail loudly
    with pytest.raises(ValueError, match="zorder_by columns"):
        t.cluster(zorder_by=["nope"])
    with pytest.raises(ValueError, match="<= 62"):
        t.cluster(zorder_by=["x", "y"], zorder_bits=32)


def test_savepoint_pins_snapshot_against_vacuum(spark, tmp_path):
    """Hudi savepoint: a pinned commit's snapshot survives ANY vacuum
    policy — time travel and restore keep working for it; dropping the
    savepoint lets the next vacuum reclaim it."""
    t = TableSink(spark, tmp_path / "t", "k")
    c0 = t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
                 WriteOp.INSERT)
    assert t.savepoint() == c0.commit_id          # default: latest
    for i in range(8):                             # churn the key space
        t.write(spark.createDataFrame([(1, f"u{i}"), (2, f"u{i}")],
                                      ["k", "v"]), WriteOp.UPSERT)
    t.vacuum(retain_last_n_commits=1)
    # the pinned snapshot is fully readable and restorable
    assert {r["v"] for r in t.read(as_of=c0.commit_id).collect()} == \
        {"a", "b"}
    t.restore(c0.commit_id)
    assert {r["v"] for r in t.read().collect()} == {"a", "b"}
    t.restore(t.log.commits()[-2].commit_id)       # back to newest data

    # unpin -> the snapshot becomes reclaimable
    assert t.delete_savepoint(c0.commit_id) is True
    assert t.delete_savepoint(c0.commit_id) is False
    t.write(spark.createDataFrame([(1, "z"), (2, "z")], ["k", "v"]),
            WriteOp.UPSERT)
    removed = t.vacuum(retain_last_n_commits=1)
    assert any(s in c0.adds for s in removed)
    from pyspark.errors import AnalysisException
    with pytest.raises((AnalysisException, FileNotFoundError)):
        t.read(as_of=c0.commit_id).collect()
    # unknown commit refused
    with pytest.raises(KeyError):
        t.savepoint(as_of="999999999999")


def test_read_slices_schema_shortcut_matches_mergeschema(spark, users,
                                                         tmp_path):
    """r12 optimization pin: _read_slices unifies slice schemas from one
    parquet footer per slice on the driver (no distributed mergeSchema
    job). On a schema-EVOLVED table (second batch adds a column) the
    shortcut must return exactly what the mergeSchema reader returns:
    same unified schema, same rows, old rows null-filled."""
    sink = TableSink(spark, tmp_path / "t", "uid")
    sink.write(users, WriteOp.INSERT)
    evolved = users.withColumn("uid", F.col("uid") + 100) \
                   .withColumn("tier", F.lit("gold"))
    sink.write(evolved, WriteOp.UPSERT)
    slices = sink.log.active_slices()
    fast = sink._read_slices(slices)
    slow = (spark.read.option("mergeSchema", "true")
            .parquet(*[str(sink.table_path / s) for s in slices]))
    assert dict(fast.dtypes) == dict(slow.dtypes)
    key = [c for c in fast.columns if c != "_commit_id"]
    a = sorted(fast.select(*key).collect())
    b = sorted(slow.select(*key).collect())
    assert a == b and len(a) == 8
    # old-batch rows read the evolved column as null either way
    assert fast.filter(F.col("uid") <= 4).filter(
        F.col("tier").isNull()).count() == 4


def test_read_slices_schema_shortcut_exotic_types(spark, tmp_path):
    """ADVICE r12: the driver-side pyarrow schema union must agree with
    Spark's mergeSchema reader beyond the add-a-string-column case —
    timestamp, decimal, array and struct columns, plus an evolved batch
    that both adds an array column and reorders fields."""
    from decimal import Decimal

    sink = TableSink(spark, tmp_path / "x", "k")
    b1 = spark.createDataFrame(
        [(1, Decimal("1.25"), ["a", "b"], (7, "s"))],
        "k long, d decimal(12,2), arr array<string>, "
        "st struct<a:int, b:string>").withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000)))
    sink.write(b1, WriteOp.INSERT)
    b2 = spark.createDataFrame(
        [(2, Decimal("2.50"), [[1, 2], [3]], (8, "t"))],
        "k long, d decimal(12,2), nested array<array<int>>, "
        "st struct<a:int, b:string>").withColumn(
        "ts", F.timestamp_seconds(F.lit(1_800_000_000)))
    sink.write(b2, WriteOp.UPSERT)
    slices = sink.log.active_slices()
    fast = sink._read_slices(slices)
    slow = (spark.read.option("mergeSchema", "true")
            .parquet(*[str(sink.table_path / s) for s in slices]))
    assert dict(fast.dtypes) == dict(slow.dtypes)
    cols = sorted(c for c in fast.columns if c != "_commit_id")
    a = sorted(map(str, fast.select(*cols).collect()))
    b = sorted(map(str, slow.select(*cols).collect()))
    assert a == b and len(a) == 2
