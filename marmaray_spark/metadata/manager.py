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
