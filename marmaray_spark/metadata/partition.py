"""Partition high-watermark planners for incremental table ingestion.

Reference parity:
- HDFSPartitionManager (M/common/metadata/HDFSPartitionManager.java:41-130):
  lists first-level partition directories of a table path, sorted
  lexicographically; the next work unit is the smallest partition strictly
  greater than the checkpointed one; a single-partition (unpartitioned)
  table is re-processed every run.
- HDFSDatePartitionManager (:41-135): date-partitioned variant
  (``datestr=YYYY-MM-DD``), with an optional configured start date
  (default 1970-01-01) below which partitions are ignored.

The checkpoint key is stored through a MetadataManager so the
high-watermark only advances when the run commits.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from marmaray_spark.metadata.manager import MetadataManager

CHECKPOINT_KEY = "last_processed_partition"


class PartitionManager:
    """Lexicographic high-watermark over first-level partition dirs."""

    def __init__(self, table_path: str | Path, metadata: MetadataManager,
                 checkpoint_key: str = CHECKPOINT_KEY) -> None:
        self.table_path = Path(table_path)
        self.metadata = metadata
        self.checkpoint_key = checkpoint_key

    def list_partitions(self) -> list[str]:
        """First-level ``key=value`` (or bare) dirs, lexicographically sorted."""
        if not self.table_path.is_dir():
            return []
        return sorted(p.name for p in self.table_path.iterdir()
                      if p.is_dir() and not p.name.startswith("_"))

    def is_single_partition(self) -> bool:
        """Unpartitioned table: data files directly under the table path
        (HDFSPartitionManager re-processes these every run, :76-90)."""
        return len(self.list_partitions()) == 0

    def get_checkpoint(self) -> str | None:
        return self.metadata.get(self.checkpoint_key)

    def next_partition(self) -> str | None:
        """Smallest partition strictly greater than the checkpoint."""
        if self.is_single_partition():
            return None  # caller should process the whole path
        checkpoint = self.get_checkpoint()
        for part in self.list_partitions():
            if checkpoint is None or part > checkpoint:
                return part
        return None

    def commit_partition(self, partition: str) -> None:
        """Advance the watermark in memory; MetadataManager.save_changes()
        persists it only after the run succeeds (monotonic: never moves
        backwards unless explicitly backfilling)."""
        checkpoint = self.get_checkpoint()
        if checkpoint is None or partition > checkpoint:
            self.metadata.set(self.checkpoint_key, partition)


class DatePartitionManager(PartitionManager):
    """Date-partitioned variant: ``<col>=YYYY-MM-DD`` with a start date."""

    def __init__(self, table_path: str | Path, metadata: MetadataManager,
                 partition_col: str = "datestr",
                 start_date: str = "1970-01-01",
                 checkpoint_key: str = CHECKPOINT_KEY) -> None:
        super().__init__(table_path, metadata, checkpoint_key)
        self.partition_col = partition_col
        self.start_date = dt.date.fromisoformat(start_date)

    def _date_of(self, partition: str) -> dt.date | None:
        prefix = f"{self.partition_col}="
        if not partition.startswith(prefix):
            return None
        try:
            return dt.date.fromisoformat(partition[len(prefix):])
        except ValueError:
            return None

    def list_partitions(self) -> list[str]:
        parts = super().list_partitions()
        return [p for p in parts
                if (d := self._date_of(p)) is not None and d >= self.start_date]
