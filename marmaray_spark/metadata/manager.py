"""Checkpoint metadata managers.

Reference parity: M/common/metadata/HDFSMetadataManager.java:62-104 — a
string->string metadata map held in memory during the run and persisted
atomically by ``saveChanges()`` ONLY after the job succeeds
(IWorkUnitCalculator contract, M/common/sources/IWorkUnitCalculator.java:36-90);
on startup the latest of N retained snapshot files is loaded; older
snapshots are pruned (DEFAULT_NUM_METADATA_FILES_TO_RETAIN = 5, :68).

The file layout is one JSON file per successful run, named by a
monotonically increasing sequence number: ``<dir>/%012d.json``. Writes go
through a temp file + atomic rename so a crashed run never corrupts the
latest-visible checkpoint.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

DEFAULT_NUM_RETAINED = 5  # HDFSMetadataManager.java:68


class MetadataManager:
    """In-memory map + deferred persistence contract."""

    def __init__(self) -> None:
        self._meta: dict[str, str] = {}
        self._dirty = False

    def get(self, key: str, default: str | None = None) -> str | None:
        return self._meta.get(key, default)

    def set(self, key: str, value: str) -> None:
        self._meta[key] = str(value)
        self._dirty = True

    def remove(self, key: str) -> str | None:
        v = self._meta.pop(key, None)
        if v is not None:
            self._dirty = True
        return v

    def all(self) -> dict[str, str]:
        return dict(self._meta)

    def save_changes(self) -> None:
        """Persist the current map. Call ONLY after the run has succeeded."""
        self._dirty = False


class InMemoryMetadataManager(MetadataManager):
    """For tests / single-process pipelines. Counts save_changes() calls so
    tests can assert the persist-only-on-success contract."""

    def __init__(self) -> None:
        super().__init__()
        self.saved_count = 0

    def save_changes(self) -> None:
        self.saved_count += 1
        super().save_changes()


class TableBackedMetadataManager(MetadataManager):
    """Second durable checkpoint backend: the metadata map rides a managed
    TableSink table as (job, seq, checkpoint-JSON) rows, partitioned by
    job — any engine that reads the table reads the checkpoints.

    Reference parity: CassandraBasedMetadataManager
    (M/common/metadata/CassandraBasedMetadataManager.java:65-290) — one
    serialized checkpoint row per save keyed by job, up to
    ``max_checkpoints`` retained with the oldest deleted before each
    insert (:188-222), latest row loaded at startup (generateMetaDataMap).
    ``seq`` replaces wall-clock time_stamp for deterministic ordering.
    """

    def __init__(self, spark, table_path, job: str,
                 max_checkpoints: int = 5) -> None:
        super().__init__()
        from marmaray_spark.sinks.table import TableSink

        self.spark = spark
        self.job = job
        self.max_checkpoints = max_checkpoints
        self.table = TableSink(spark, table_path, record_key_field="seq",
                               partition_field="job")
        self._meta = self._load()

    def _rows(self):
        if self.table.is_empty():
            return []
        df = self.table.read().filter(f"job = '{self.job}'")
        return sorted(df.collect(), key=lambda r: r["seq"])

    def _load(self) -> dict[str, str]:
        rows = self._rows()
        if not rows:
            return {}
        return {str(k): str(v)
                for k, v in json.loads(rows[-1]["checkpoint"]).items()}

    def save_changes(self) -> None:
        """Append the serialized map as the next (job, seq) row, pruning
        to the newest ``max_checkpoints`` via a partition-scoped
        INSERT_OVERWRITE (the delete-oldest-then-insert protocol)."""
        from marmaray_spark.sinks.table import WriteOp

        rows = self._rows()
        next_seq = (rows[-1]["seq"] + 1) if rows else 0
        keep = [(self.job, r["seq"], r["checkpoint"]) for r in rows]
        keep.append((self.job, next_seq, json.dumps(self._meta, sort_keys=True)))
        keep = keep[-self.max_checkpoints:]
        df = self.spark.createDataFrame(keep, "job string, seq long, checkpoint string")
        self.table.write(df, WriteOp.INSERT_OVERWRITE)
        super().save_changes()

    def checkpoint_history(self) -> list[dict[str, str]]:
        """Oldest-first retained checkpoint maps (ops introspection)."""
        return [json.loads(r["checkpoint"]) for r in self._rows()]


class MultiMetadataManager(MetadataManager):
    """Fan-out writes / merged reads across child managers.

    Reference parity: MultiMetadataManager
    (M/common/metadata/MultiMetadataManager.java:47-189): set/remove apply
    to every child AND the merged map; the startup load merges all
    children per key, larger string value winning on mismatch
    (loadMetadata :160-189 compareTo>0 rule — checkpoints are
    monotonically encoded strings, so max = newest); saveChanges pushes
    the merged map into every child, then saves each.
    """

    def __init__(self, managers: list[MetadataManager]) -> None:
        super().__init__()
        if not managers:
            raise ValueError("need at least one child manager")
        self.managers = list(managers)
        merged: dict[str, str] = {}
        for m in self.managers:
            for k, v in m.all().items():
                if k not in merged or v > merged[k]:
                    merged[k] = v
        self._meta = merged

    def set(self, key: str, value: str) -> None:
        super().set(key, value)
        for m in self.managers:
            m.set(key, value)

    def remove(self, key: str) -> str | None:
        for m in self.managers:
            m.remove(key)
        return super().remove(key)

    def save_changes(self) -> None:
        for m in self.managers:
            for k, v in self._meta.items():
                m.set(k, v)
            m.save_changes()
        super().save_changes()


class FileSystemMetadataManager(MetadataManager):
    """JSON-snapshot-per-run checkpoint store with retain-N pruning."""

    def __init__(self, directory: str | Path, num_retained: int = DEFAULT_NUM_RETAINED) -> None:
        super().__init__()
        self.directory = Path(directory)
        self.num_retained = num_retained
        self.directory.mkdir(parents=True, exist_ok=True)
        latest = self._snapshots()[-1] if self._snapshots() else None
        if latest is not None:
            with open(latest) as f:
                self._meta = {str(k): str(v) for k, v in json.load(f).items()}

    def _snapshots(self) -> list[Path]:
        return sorted(self.directory.glob("[0-9]" * 12 + ".json"))

    def save_changes(self) -> None:
        snaps = self._snapshots()
        next_seq = (int(snaps[-1].stem) + 1) if snaps else 0
        target = self.directory / f"{next_seq:012d}.json"
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(self._meta, f, indent=2, sort_keys=True)
            os.replace(tmp, target)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        for old in self._snapshots()[: -self.num_retained]:
            old.unlink()
        super().save_changes()


class JobManagerMetadataTracker:
    """Manager-level metadata: every dag's (string) map aggregated into
    ONE atomic JSON file per write (JobManagerMetadataTracker.java /
    TestHDFSJobLevelMetadataTracker semantics: N dags, one file on disk,
    read back on restart). Per-dag checkpoints stay in their own
    MetadataManagers; this tracker carries manager-scope bookkeeping
    (per-feed run stats, chargeback inputs)."""

    FILENAME = "jobmanager_metadata.json"

    def __init__(self, directory: str | Path) -> None:
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self._maps: dict[str, dict[str, str]] = {}
        target = self.directory / self.FILENAME
        if target.exists():
            loaded = json.loads(target.read_text())
            self._maps = {str(d): {str(k): str(v) for k, v in m.items()}
                          for d, m in loaded.items()}

    def set(self, dag_name: str, metadata: dict[str, str]) -> None:
        self._maps[dag_name] = {str(k): str(v) for k, v in metadata.items()}

    def get(self, dag_name: str) -> dict[str, str] | None:
        m = self._maps.get(dag_name)
        return dict(m) if m is not None else None

    def contains(self, dag_name: str) -> bool:
        return dag_name in self._maps

    def write(self) -> None:
        """Persist every dag's map as one file, atomically (tmp+replace —
        readers never see a partial manager state)."""
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(self._maps, f, indent=2, sort_keys=True)
            os.replace(tmp, self.directory / self.FILENAME)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
