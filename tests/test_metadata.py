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
