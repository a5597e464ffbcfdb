"""Structured Streaming (and incremental batch) tail of a managed table.

Hudi exposes its commit timeline as a Spark streaming source (streaming
read / incremental query); the reference's consumers poll HoodieSink
tables the batch way (M/common/sources/hive/HiveSource.java one
partition per run). This module is the Spark-4-NATIVE version of that
seam: a Python DataSource (``pyspark.sql.datasource``) whose offsets
are TableSink commit ids, so ``spark.readStream.format("table_changes")``
tails the commit log with exactly-once checkpointed progress and
``spark.read`` pulls an arbitrary (start, end] commit window.

Semantics — after-images, the ``read_changes`` contract
(sinks/table.py): each microbatch carries exactly the records a commit
INTRODUCED, selected by the per-record commit stamp (``_commit_id``,
the Hudi _hoodie_commit_time analogue). The stamp filter is what makes
every storage-maintenance commit invisible for free: an upsert's
rewritten slices carry displaced survivors under their ORIGINAL stamps,
compaction preserves stamps wholesale, and a restore re-adds old
slices — none of those rows carry the maintenance commit's id; the
planner skips those commits outright (reading them would re-scan the
whole table to emit nothing). DELETE commits are skipped too in the
default after-image mode; ``option("change_feed", "true")`` adds a
``_change_op`` column ('upsert' | 'delete') and emits one key-only row
per deleted record from the commit's tombstone manifest — the Hudi
CDC-query analogue; full before-images stay behind
``TableSink.delete_preimages`` (payload-scale, pull on demand).

Scale: offsets are commit-id strings (O(1) driver state); each
microbatch plans one InputPartition PER PARQUET FILE of the window's
adds manifests (executor-parallel, commit-scale I/O — never a snapshot
scan), and rows move as Arrow RecordBatches, not pickled tuples.
Historical files are projected onto the stream's declared schema
(missing columns null — the same answer mergeSchema gives).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)

COMMIT_COL = "_commit_id"   # sinks/table.py COMMIT_COL (duplicated so the
# executor-side read path needs no marmaray_spark import)
TOMBSTONE_COL = "_deleted"  # sinks/table.py TOMBSTONE_COL (same reason)
OP_COL = "_change_commit"   # metadata column carried on emitted rows


CHANGE_OP_COL = "_change_op"   # change-feed mode: 'upsert' | 'delete'

# commits whose adds NEVER carry rows stamped with their own id — their
# files would be read only to filter every row out (a compact in the
# window = a full-table re-read emitting nothing), so the planner skips
# them outright. 'delete' is also here for the PLAIN after-image mode: a
# MOR delete's adds are tombstone marker rows stamped WITH the commit,
# which the stamp filter alone would have emitted as phantom records.
_SKIP_OPS = {"compact", "cluster", "restore", "delete"}


@dataclass
class _FilePartition(InputPartition):
    file: str
    commit_id: str
    schema_bytes: bytes    # pickled pyarrow.Schema (data columns only)
    # 'upsert' = after-image file (stamp-filtered); 'delete' = a
    # tombstone-manifest file of deleted KEYS (change-feed mode only)
    op: str = "upsert"
    change_feed: bool = False


def _commit_files(table_path: str) -> list[Path]:
    d = Path(table_path) / "_commits"
    return sorted(p for p in d.glob("*.json")
                  if p.stem.isdigit() and len(p.stem) == 12)


def _commits_between(table_path: str, start: str, end: str) -> list[dict]:
    out = []
    for p in _commit_files(table_path):
        if start < p.stem <= end:
            with open(p) as f:
                out.append(json.load(f))
    return out


def _data_schema(table_path: str):
    """Arrow schema of the table's data columns (stamp dropped), from
    the NEWEST commit's first add file — newest wins so a stream
    started after a schema evolution sees the evolved shape."""
    import pyarrow.parquet as pq

    for p in reversed(_commit_files(table_path)):
        with open(p) as f:
            c = json.load(f)
        if c.get("op") == "delete":
            # a MOR delete's adds are tombstone MARKER rows (key +
            # stamp + _deleted) — not a data schema
            continue
        for s in c.get("adds") or []:
            files = sorted(Path(table_path, s).rglob("*.parquet"))
            if files:
                schema = pq.ParquetFile(files[0]).schema_arrow
                keep = [f for f in schema
                        if f.name not in (COMMIT_COL, TOMBSTONE_COL)]
                import pyarrow as pa
                return pa.schema(keep)
    raise FileNotFoundError(
        f"table {table_path} has no data files to derive a schema from")


def _partitions(table_path: str, start: str, end: str,
                schema_bytes: bytes,
                change_feed: bool = False) -> list[_FilePartition]:
    parts = []
    for c in _commits_between(table_path, start, end):
        op = c.get("op")
        if op in _SKIP_OPS:
            if change_feed and op == "delete" and c.get("tombstones"):
                base = Path(table_path) / c["tombstones"]
                if not base.exists():
                    raise FileNotFoundError(
                        f"commit {c['commit_id']} tombstone manifest "
                        f"missing ({c['tombstones']}); the change feed "
                        "needs it")
                for f in sorted(base.rglob("*.parquet")):
                    parts.append(_FilePartition(
                        file=str(f), commit_id=c["commit_id"],
                        schema_bytes=schema_bytes, op="delete",
                        change_feed=True))
            continue
        for s in c.get("adds") or []:
            base = Path(table_path) / s
            if not base.exists():
                raise FileNotFoundError(
                    f"commit {c['commit_id']} adds vacuumed ({s}); the "
                    "tail needs their slices — raise vacuum "
                    "retain_last_n_commits")
            for f in sorted(base.rglob("*.parquet")):
                parts.append(_FilePartition(file=str(f),
                                            commit_id=c["commit_id"],
                                            schema_bytes=schema_bytes,
                                            change_feed=change_feed))
    if not parts:
        # a window of only skipped commits (maintenance / plain-mode
        # deletes) still needs ONE partition — pyspark's DataSource
        # machinery can't plan an empty list; the sentinel emits nothing
        parts.append(_FilePartition(file="", commit_id="",
                                    schema_bytes=schema_bytes,
                                    change_feed=change_feed))
    return parts


def _read_partition(partition: _FilePartition) -> Iterator:
    """Executor side: one parquet file -> the rows STAMPED with the
    partition's commit, projected onto the declared schema (missing
    columns null, stray columns dropped, types cast), the commit id
    appended. Pure pyarrow — no JVM round-trip, batches stay Arrow."""
    import pickle

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if not partition.file:       # empty-window sentinel
        return
    target: pa.Schema = pickle.loads(partition.schema_bytes)
    t = pq.read_table(partition.file)
    if partition.op == "upsert" and COMMIT_COL in t.column_names:
        t = t.filter(pc.equal(t[COMMIT_COL], partition.commit_id))
    n = t.num_rows
    if n == 0:
        return
    cols = []
    for field in target:
        if field.name in t.column_names:
            col = t[field.name]
            if col.type != field.type:
                col = pc.cast(col, field.type)
            cols.append(col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col)
        else:
            # a delete manifest carries ONLY the record key; every
            # other column of the before-image is null in the feed (the
            # full before-image lives behind TableSink.delete_preimages)
            cols.append(pa.nulls(n, field.type))
    cols.append(pa.array([partition.commit_id] * n, pa.string()))
    schema = target.append(pa.field(OP_COL, pa.string()))
    if partition.change_feed:
        cols.append(pa.array([partition.op] * n, pa.string()))
        schema = schema.append(pa.field(CHANGE_OP_COL, pa.string()))
    out = pa.table(cols, schema=schema)
    yield from out.to_batches()


class _Tail:
    """Shared planner for the batch and stream readers."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("table_changes needs option('path', <table>)")
        self.path = os.path.abspath(self.path)
        self.change_feed = str(options.get("change_feed")
                               or "").lower() == "true"


    def latest_commit(self) -> str:
        files = _commit_files(self.path)
        return files[-1].stem if files else ""


class TableChangesBatchReader(DataSourceReader):
    def __init__(self, options, schema_bytes: bytes):
        self.tail = _Tail(options)
        self.start = options.get("start_commit") or ""
        self.end = options.get("end_commit") or self.tail.latest_commit()
        self.schema_bytes = schema_bytes

    def partitions(self) -> Sequence[InputPartition]:
        return _partitions(self.tail.path, self.start, self.end,
                           self.schema_bytes,
                           change_feed=self.tail.change_feed)

    def read(self, partition) -> Iterator:
        return _read_partition(partition)


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema_bytes: bytes):
        self.tail = _Tail(options)
        self.schema_bytes = schema_bytes
        # start_commit: begin the tail AFTER this commit (default '' =
        # from the table's beginning) — only consulted for a brand-new
        # query; a restarted one resumes from its checkpointed offset
        self.start = options.get("start_commit") or ""

    def initialOffset(self) -> dict:
        return {"commit": self.start}

    def latestOffset(self) -> dict:
        return {"commit": self.tail.latest_commit()}

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[InputPartition]:
        return _partitions(self.tail.path, start["commit"], end["commit"],
                           self.schema_bytes,
                           change_feed=self.tail.change_feed)

    def read(self, partition) -> Iterator:
        return _read_partition(partition)

    def commit(self, end: dict) -> None:
        pass   # progress lives in the query checkpoint, not the source


class TableChangesDataSource(DataSource):
    """``format("table_changes")``: tail a TableSink's commit log.

    Register once per session::

        spark.dataSource.register(TableChangesDataSource)

    Stream (exactly-once across restarts via the query checkpoint)::

        spark.readStream.format("table_changes")
             .option("path", table_dir).load()

    Batch window (both bounds optional)::

        spark.read.format("table_changes").option("path", table_dir)
             .option("start_commit", "000000000001").load()

    Columns: the table's data columns plus ``_change_commit`` (the
    commit that introduced each row); with ``option("change_feed",
    "true")`` also ``_change_op`` ('upsert' | 'delete' — delete rows
    carry the record key, other columns null).
    """

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self):
        import pickle

        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StringType, StructField

        tail = _Tail(self.options)
        arrow = _data_schema(tail.path)
        self._schema_bytes = pickle.dumps(arrow)
        st = from_arrow_schema(arrow)
        st = st.add(StructField(OP_COL, StringType(), True))
        if tail.change_feed:
            st = st.add(StructField(CHANGE_OP_COL, StringType(), True))
        return st

    def _bytes(self) -> bytes:
        if not hasattr(self, "_schema_bytes"):
            self.schema()
        return self._schema_bytes

    def reader(self, schema) -> DataSourceReader:
        return TableChangesBatchReader(self.options, self._bytes())

    def streamReader(self, schema) -> DataSourceStreamReader:
        return TableChangesStreamReader(self.options, self._bytes())
