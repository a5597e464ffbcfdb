"""Complete example: the right-to-be-forgotten flow over a maintained
corpus — WriteOp.DELETE end to end, from the ingest loop to PHYSICAL
byte erasure.

A training corpus is never just one table: dedup state, term statistics
and per-source rollups are all derived from it, and a deletion request
("forget these documents") is only honored when every derived structure
forgets too — then, for the bytes themselves, when storage stops holding
the pre-delete slices. The flow:

  ingest ticks            DEDUP_INSERT batches; maintained dedup index,
                          term sketch (CMS) and per-source rollup all
                          advance off the corpus commit log, exactly-once
  forget(doc_ids)         ONE key-scoped DELETE commit (slice-pruned on
                          copy-on-write; tombstone delta on
                          merge-on-read), then the SAME maintenance
                          calls: the index drops the docs (a
                          re-submission of forgotten content is no
                          longer a "duplicate"), the sketch subtracts
                          their term cells (stays == rebuild), the
                          rollup re-aggregates their groups
  erase_physically()      churn past retention + vacuum: the rewritten
                          pre-delete slices leave the DISK, so the
                          forgotten text is no longer recoverable from
                          any parquet file — verified by scanning every
                          byte under the table. Savepoints would pin old
                          snapshots; an erasure flow must drop any that
                          cover the pre-delete history first.

What is deliberately NOT instant: between the DELETE commit and the
vacuum, the pre-images remain on disk — that window is exactly what
change capture (``delete_preimages``) and the maintainers need to
subtract correctly; GDPR-grade erasure = delete + maintenance drain +
retention expiry, in that order. The ``_tombstones`` manifest keeps the
deleted KEYS (never payloads) for the CDC window.

Run:  python examples/forget_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.metadata.manager import FileSystemMetadataManager  # noqa: E402
from marmaray_spark.operators.cms import maintain_term_sketch  # noqa: E402
from marmaray_spark.operators.incdedup import (  # noqa: E402
    exact_dups_against_index, maintain_dedup_index)
from marmaray_spark.operators.rollup import maintain_rollup  # noqa: E402
from marmaray_spark.sinks.table import TableSink, WriteOp  # noqa: E402

ROLLUP_AGGS = {"n_docs": ("count", "*")}


def _tables(spark: SparkSession, workdir: str):
    base = TableSink(spark, os.path.join(workdir, "corpus"), "doc_id")
    index = TableSink(spark, os.path.join(workdir, "dedup_index"), "doc_id")
    sketch = TableSink(spark, os.path.join(workdir, "term_sketch"),
                       "cell_key")
    rollup = TableSink(spark, os.path.join(workdir, "source_rollup"),
                       "source")
    md = FileSystemMetadataManager(os.path.join(workdir, "md"))
    return base, index, sketch, rollup, md


def _maintain_all(base, index, sketch, rollup, md) -> dict:
    return {
        "indexed": maintain_dedup_index(base, index, md),
        "sketch_cells": maintain_term_sketch(base, sketch, md,
                                             depth=4, width=256),
        "rollup_groups": maintain_rollup(base, rollup, md, "source",
                                         ROLLUP_AGGS),
    }


def ingest_tick(spark: SparkSession, workdir: str, rows) -> dict:
    """One corpus tick: dedup-insert the batch, advance every derived
    structure off the table's own change stream."""
    base, index, sketch, rollup, md = _tables(spark, workdir)
    batch = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    base.write(batch, WriteOp.DEDUP_INSERT)
    return _maintain_all(base, index, sketch, rollup, md)


def forget(spark: SparkSession, workdir: str, doc_ids: list) -> dict:
    """Honor a deletion request: one DELETE commit, then the standard
    maintenance drain — no special-cased rebuilds anywhere."""
    base, index, sketch, rollup, md = _tables(spark, workdir)
    keys = spark.createDataFrame([(i,) for i in doc_ids], ["doc_id"])
    commit = base.write(keys, WriteOp.DELETE)
    out = _maintain_all(base, index, sketch, rollup, md)
    out["deleted"] = commit.counts["deleted"]
    return out


def erase_physically(spark: SparkSession, workdir: str,
                     churn_rows, retain: int = 1) -> list[str]:
    """Make the forget IRRECOVERABLE from storage: once later commits
    push the delete's rewritten pre-images past the retention horizon,
    vacuum removes them from disk. ``churn_rows`` stands in for the
    table's normal ongoing writes."""
    base, index, sketch, rollup, md = _tables(spark, workdir)
    for rows in churn_rows:
        base.write(spark.createDataFrame(rows,
                                         ["doc_id", "source", "text"]),
                   WriteOp.DEDUP_INSERT)
        _maintain_all(base, index, sketch, rollup, md)
    return base.vacuum(retain_last_n_commits=retain)


def payload_on_disk(workdir: str, needle: bytes) -> bool:
    """Is ``needle`` recoverable from ANY file under the corpus table?"""
    root = os.path.join(workdir, "corpus")
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            with open(os.path.join(dirpath, f), "rb") as fh:
                if needle in fh.read():
                    return True
    return False


def main() -> None:
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="forget_pipeline_")

    print(ingest_tick(spark, workdir, [
        (1, "web", "the quick brown fox jumps over the lazy dog"),
        (2, "web", "SECRET-PAYLOAD-TO-FORGET alpha beta gamma"),
        (3, "books", "call me ishmael some years ago never mind how")]))
    print(ingest_tick(spark, workdir, [
        (4, "web", "wholly unrelated content about sailing ships"),
        (5, "books", "it was the best of times it was the worst")]))

    print(forget(spark, workdir, [2]))
    base, index, *_ = _tables(spark, workdir)
    probe = spark.createDataFrame(
        [(9, "SECRET-PAYLOAD-TO-FORGET alpha beta gamma")],
        ["doc_id", "text"])
    print("still matches index:",
          exact_dups_against_index(probe, index.read()).count())
    print("payload still on disk:",
          payload_on_disk(workdir, b"SECRET-PAYLOAD-TO-FORGET"))

    removed = erase_physically(spark, workdir, [
        [(10 + i, "web", f"churn document number {i}")] for i in range(6)])
    print("vacuumed", len(removed), "slices; payload on disk:",
          payload_on_disk(workdir, b"SECRET-PAYLOAD-TO-FORGET"))
    spark.stop()


if __name__ == "__main__":
    main()
