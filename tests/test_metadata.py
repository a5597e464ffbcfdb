"""Metadata manager + partition manager tests — modeled on
T/common/metadata/TestHDFSMetadataManager.java,
TestHDFSPartitionManager.java and TestHDFSDatePartitionManager.java."""

from marmaray_spark.metadata import (
    DatePartitionManager,
    FileSystemMetadataManager,
    InMemoryMetadataManager,
    PartitionManager,
)


def test_save_and_reload(tmp_path):
    m = FileSystemMetadataManager(tmp_path / "meta")
    m.set("offset", "100")
    # not yet persisted — a new manager sees nothing
    assert FileSystemMetadataManager(tmp_path / "meta").get("offset") is None
    m.save_changes()
    assert FileSystemMetadataManager(tmp_path / "meta").get("offset") == "100"


def test_retention_pruning(tmp_path):
    m = FileSystemMetadataManager(tmp_path / "meta", num_retained=3)
    for i in range(7):
        m.set("run", str(i))
        m.save_changes()
    snaps = sorted((tmp_path / "meta").glob("*.json"))
    assert len(snaps) == 3
    # latest snapshot wins on reload
    assert FileSystemMetadataManager(tmp_path / "meta").get("run") == "6"


def _mk_partitions(base, names):
    for n in names:
        d = base / n
        d.mkdir(parents=True)
        (d / "part-00000.parquet").write_bytes(b"")


def test_next_partition_after_checkpoint(tmp_path):
    _mk_partitions(tmp_path / "t", ["dt=2024-01-01", "dt=2024-01-02", "dt=2024-01-03"])
    meta = InMemoryMetadataManager()
    pm = PartitionManager(tmp_path / "t", meta)
    assert pm.next_partition() == "dt=2024-01-01"
    pm.commit_partition("dt=2024-01-01")
    assert pm.next_partition() == "dt=2024-01-02"
    pm.commit_partition("dt=2024-01-03")
    assert pm.next_partition() is None
    # watermark is monotonic
    pm.commit_partition("dt=2024-01-02")
    assert meta.get("last_processed_partition") == "dt=2024-01-03"


def test_single_partition_table(tmp_path):
    d = tmp_path / "flat"
    d.mkdir()
    (d / "part-00000.parquet").write_bytes(b"")
    pm = PartitionManager(d, InMemoryMetadataManager())
    assert pm.is_single_partition()
    assert pm.next_partition() is None


def test_date_partition_start_date(tmp_path):
    _mk_partitions(tmp_path / "t",
                   ["datestr=2023-12-31", "datestr=2024-01-01", "datestr=2024-02-01",
                    "notadate=xx"])
    pm = DatePartitionManager(tmp_path / "t", InMemoryMetadataManager(),
                              start_date="2024-01-01")
    assert pm.list_partitions() == ["datestr=2024-01-01", "datestr=2024-02-01"]
    assert pm.next_partition() == "datestr=2024-01-01"


def test_table_backed_manager_roundtrip_and_retention(spark, tmp_path):
    """TestCassandraBasedMetadataManager parity: latest checkpoint loads
    on startup; each save appends a retained row; oldest rows beyond
    max_checkpoints are pruned before insert."""
    from marmaray_spark.metadata import TableBackedMetadataManager

    t = tmp_path / "meta_table"
    m = TableBackedMetadataManager(spark, t, job="feed1", max_checkpoints=3)
    assert m.all() == {}

    for i in range(5):
        m.set("offset", str(100 + i))
        m.save_changes()

    # a fresh manager over the same table resumes from the LATEST save
    m2 = TableBackedMetadataManager(spark, t, job="feed1", max_checkpoints=3)
    assert m2.get("offset") == "104"
    # retention: only the newest 3 checkpoints survive
    hist = m2.checkpoint_history()
    assert [h["offset"] for h in hist] == ["102", "103", "104"]


def test_table_backed_manager_isolates_jobs(spark, tmp_path):
    from marmaray_spark.metadata import TableBackedMetadataManager

    t = tmp_path / "meta_table"
    a = TableBackedMetadataManager(spark, t, job="a")
    b = TableBackedMetadataManager(spark, t, job="b")
    a.set("k", "va"); a.save_changes()
    b.set("k", "vb"); b.save_changes()
    assert TableBackedMetadataManager(spark, t, job="a").get("k") == "va"
    assert TableBackedMetadataManager(spark, t, job="b").get("k") == "vb"


def test_multi_metadata_manager_fanout_and_merge(tmp_path):
    """TestMultiMetadataManager parity: writes fan out to every child,
    startup load merges children with larger-string-wins on mismatch,
    saveChanges persists every child."""
    from marmaray_spark.metadata import (
        FileSystemMetadataManager,
        InMemoryMetadataManager,
        MultiMetadataManager,
    )

    fs1 = FileSystemMetadataManager(tmp_path / "m1")
    fs2 = FileSystemMetadataManager(tmp_path / "m2")
    multi = MultiMetadataManager([fs1, fs2])
    multi.set("cp", "000000000005")
    multi.save_changes()

    # both children persisted the same value
    assert FileSystemMetadataManager(tmp_path / "m1").get("cp") == "000000000005"
    assert FileSystemMetadataManager(tmp_path / "m2").get("cp") == "000000000005"

    # children disagree (one missed a run): larger string value wins
    lag = InMemoryMetadataManager(); lag.set("cp", "000000000003")
    ahead = InMemoryMetadataManager(); ahead.set("cp", "000000000007")
    ahead.set("only_ahead", "x")
    merged = MultiMetadataManager([lag, ahead])
    assert merged.get("cp") == "000000000007"
    assert merged.get("only_ahead") == "x"

    # remove fans out too
    merged.remove("cp")
    assert lag.get("cp") is None and ahead.get("cp") is None


def test_metadata_cli_print_and_prune(tmp_path, capsys):
    """marmaray-tools parity: HDFSMetadataPrinter (file or dir->latest)
    and HDFSMetadataPruner (retain-N, fake-delete mode)."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from metadata_cli import main as cli

    from marmaray_spark.metadata import FileSystemMetadataManager

    m = FileSystemMetadataManager(tmp_path, num_retained=100)
    for i in range(6):
        m.set("offset", str(i))
        m.save_changes()
    assert len(list(tmp_path.glob("*.json"))) == 6

    # print: explicit file and dir-means-latest
    assert cli(["print", "-m", str(tmp_path / "000000000002.json")]) == 0
    assert "Value: 2" in capsys.readouterr().out
    assert cli(["print", "-m", str(tmp_path)]) == 0
    assert "Value: 5" in capsys.readouterr().out

    # fake prune deletes nothing
    assert cli(["prune", "-p", str(tmp_path), "-n", "2", "-f"]) == 0
    assert "would be removed" in capsys.readouterr().out
    assert len(list(tmp_path.glob("*.json"))) == 6

    # real prune retains newest 2, and the manager still loads the latest
    assert cli(["prune", "-p", str(tmp_path), "-n", "2"]) == 0
    left = sorted(p.name for p in tmp_path.glob("*.json"))
    assert left == ["000000000004.json", "000000000005.json"]
    assert FileSystemMetadataManager(tmp_path).get("offset") == "5"


def test_jobmanager_metadata_tracker(tmp_path):
    """TestHDFSJobLevelMetadataTracker parity: N dag maps -> ONE file on
    disk; a fresh tracker over the same path reads the previous run's
    state back; rewrite stays a single file."""
    from marmaray_spark.metadata.manager import JobManagerMetadataTracker

    t = JobManagerMetadataTracker(tmp_path / "jm")
    t.set("topic1", {"metaKey1": "metaValue1", "metaKey2": "metaValue2"})
    t.set("topic2", {"metaKey1": "metaValue1"})
    t.write()
    files = [p for p in (tmp_path / "jm").iterdir() if p.is_file()]
    assert len(files) == 1                               # one aggregated file

    back = JobManagerMetadataTracker(tmp_path / "jm")    # restart
    assert back.get("topic1") == {"metaKey1": "metaValue1",
                                  "metaKey2": "metaValue2"}
    assert back.contains("topic2") and not back.contains("nope")
    assert back.get("nope") is None

    back.set("topic2", {"metaKey1": "updated"})
    back.write()
    assert len([p for p in (tmp_path / "jm").iterdir() if p.is_file()]) == 1
    assert JobManagerMetadataTracker(tmp_path / "jm").get("topic2") == \
        {"metaKey1": "updated"}
