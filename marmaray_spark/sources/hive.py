"""Parquet/Hive-partition source with incremental work units.

Reference parity: HiveSource reads exactly one Hive partition's parquet
directory per run (M/common/sources/hive/HiveSource.java:46-126), the
partition chosen by ParquetWorkUnitCalculator
(M/common/sources/hive/ParquetWorkUnitCalculator.java:46-189): next
partition = smallest > checkpoint (HDFSPartitionManager.java:76-90),
explicit single-partition backfill supported, unpartitioned tables
re-processed whole.

Spark-first: ``spark.read.parquet`` on the table root with a partition-
column filter — Catalyst partition-prunes to the one directory, so the
scan itself is identical I/O to the reference's direct dir read, while
schema stays consistent across partitions. Schema comes from the parquet
footer (free; reference hand-rolls this in SchemaUtil.java:70-152).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marmaray_spark.metadata.partition import PartitionManager


@dataclass
class ParquetWorkUnit:
    """One run's scan plan: a single partition, or the whole table."""

    table_path: str
    partition: str | None          # "col=value" or None for whole-table

    @property
    def partition_col(self) -> str | None:
        return self.partition.split("=", 1)[0] if self.partition else None

    @property
    def partition_value(self) -> str | None:
        return self.partition.split("=", 1)[1] if self.partition else None


class ParquetWorkUnitCalculator:
    """Plans the next partition to ingest; commits the watermark on success."""

    def __init__(self, partition_manager: PartitionManager,
                 backfill_partition: str | None = None) -> None:
        self.pm = partition_manager
        self.backfill_partition = backfill_partition

    def compute_work_units(self) -> list[ParquetWorkUnit]:
        table = str(self.pm.table_path)
        if self.backfill_partition is not None:
            return [ParquetWorkUnit(table, self.backfill_partition)]
        if self.pm.is_single_partition():
            return [ParquetWorkUnit(table, None)]
        nxt = self.pm.next_partition()
        return [ParquetWorkUnit(table, nxt)] if nxt is not None else []

    def save_next_run_state(self, work_units: list[ParquetWorkUnit]) -> None:
        for wu in work_units:
            if wu.partition is not None:
                self.pm.commit_partition(wu.partition)


class ParquetSource:
    """Reads one work unit as a DataFrame (partition-pruned scan)."""

    def __init__(self, spark: SparkSession, coalesce_to: int | None = None) -> None:
        self.spark = spark
        self.coalesce_to = coalesce_to

    def get_data(self, work_unit: ParquetWorkUnit) -> DataFrame:
        df = self.spark.read.parquet(work_unit.table_path)
        if work_unit.partition is not None:
            # Catalyst prunes to the single matching directory.
            df = df.filter(F.col(work_unit.partition_col) == work_unit.partition_value)
        if self.coalesce_to is not None:
            df = df.coalesce(self.coalesce_to)
        return df
