"""Complete example: continuous MEDIA ingest with incremental image dedup.

The image counterpart of incremental_ingest_dedup.py — a media table
(images as opaque binary payloads + typed metadata) growing tick by
tick, with near-duplicate screening against everything already stored.
Again the point is what does NOT happen: stored payloads are never
re-decoded or re-hashed; every tick's decode + hash cost follows the
batch, and the only corpus-side work is a bucket-pruned scan of the
maintained hash index.

  new media (micro-batch)
    -> in-batch exact dedup   (payload md5 keep-min — one expression
                               shuffle over the batch only)
    -> near-dup probe         (batch images decode+dHash in one Arrow
                               pass; the MAINTAINED image-hash index is
                               semi-pruned by the batch's pigeonhole
                               buckets before any join; hot buckets
                               collapse to their min-id anchor)
    -> survivors DEDUP_INSERT (commit-logged managed table; replay-safe)
    -> maintain image index   ((id, dhash) state advances off the
                               table's own change stream, exactly-once;
                               hash params stamped so a drifted probe
                               refuses instead of silently missing)

Undecodable payloads are NOT dropped: they fork out of the near-dup
probe (a corrupt image cannot be cleared as "no duplicate") and land in
the table flagged, mirroring the error-table philosophy.

Run:  python examples/multimodal_ingest_dedup.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.metadata.manager import FileSystemMetadataManager  # noqa: E402
from marmaray_spark.operators.multimodal import (  # noqa: E402
    image_dhash,
    image_near_dups_against_index,
    maintain_image_hash_index,
)
from marmaray_spark.sinks.table import TableSink, WriteOp  # noqa: E402


def media_ingest_tick(spark: SparkSession, workdir: str, batch: DataFrame,
                      max_hamming: int = 3,
                      max_bucket_width: int = 64) -> dict:
    """One media ingest tick; returns the tick report. ``batch`` needs
    (media_id, payload).

    Idempotent across crash-replay: survivors land via DEDUP_INSERT and
    the index checkpoint only advances after the index commit lands —
    a replayed tick re-probes, re-drops the same rows, and re-UPSERTs
    identical index entries."""
    base = TableSink(spark, os.path.join(workdir, "media"), "media_id")
    index = TableSink(spark, os.path.join(workdir, "image_index"),
                      "media_id")
    md = FileSystemMetadataManager(os.path.join(workdir, "md"))

    n_in = batch.count()

    # in-batch exact dedup: byte-identical payloads collapse to the
    # min-id keeper before any decode happens
    digests = batch.select("media_id", F.md5(F.col("payload")).alias("__d"))
    keepers = digests.groupBy("__d").agg(F.min("media_id").alias("media_id"))
    batch = batch.join(keepers.select("media_id"), "media_id", "left_semi")
    n_batch_dups = n_in - batch.count()

    # hash ONCE per tick: the probe and the decode-health flags share
    # this frame (prehashed=True), so each payload decodes exactly once
    # however many consumers follow
    hashed = image_dhash(batch).persist()

    n_near = 0
    if not index.is_empty():
        near = image_near_dups_against_index(
            hashed, index, max_hamming=max_hamming,
            max_bucket_width=max_bucket_width, prehashed=True)
        drop = near.select(F.col("a").alias("media_id")).distinct()
        n_near = drop.count()
        batch = batch.join(drop, "media_id", "left_anti")

    # decode health for the report (survivors keep their payloads either
    # way — a corrupt image is flagged, not silently discarded)
    survivors = batch.join(hashed.select("media_id", "ok"), "media_id") \
        .select("media_id", "payload", F.col("ok").alias("decode_ok"))
    n_kept = survivors.count()
    n_bad = survivors.filter(~F.col("decode_ok")).count()
    if n_kept:
        base.write(survivors, WriteOp.DEDUP_INSERT)
    n_indexed = maintain_image_hash_index(base, index, md)
    hashed.unpersist()
    return {"in": n_in, "batch_dups": n_batch_dups, "near_dups": n_near,
            "kept": n_kept, "decode_failed": n_bad, "indexed": n_indexed}


def main() -> None:
    import numpy as np

    from marmaray_spark.functions.media_codec import encode_bmp
    from marmaray_spark.session import get_spark

    spark = get_spark("multimodal_ingest_example")
    workdir = tempfile.mkdtemp(prefix="media_ingest_")

    def img(seed: int) -> bytes:
        rng = np.random.default_rng(seed)
        grid = rng.integers(0, 8, size=(8, 9)) * 30 + 8
        px = np.repeat(np.repeat(grid, 6, axis=0), 7, axis=1)[:48, :63]
        return encode_bmp(np.repeat(px[:, :, None], 3, axis=2)
                          .astype("uint8"))

    def frame(rows):
        return spark.createDataFrame(rows, "media_id long, payload binary")

    t1 = media_ingest_tick(spark, workdir,
                           frame([(1, img(1)), (2, img(2)), (3, img(1))]))
    print("tick 1:", t1)   # 3 in, 1 batch dup, 2 kept+indexed

    from marmaray_spark.functions.media_codec import decode_bmp
    px = decode_bmp(img(1)).astype(np.int64)
    shifted = encode_bmp(np.clip(px + 4, 0, 255).astype("uint8"))
    t2 = media_ingest_tick(spark, workdir,
                           frame([(10, shifted), (11, img(9)),
                                  (12, b"BM\x00bad")]))
    print("tick 2:", t2)   # 10 drops as near-dup; 12 keeps, flagged

    print("media table:", TableSink(spark, os.path.join(workdir, "media"),
                                    "media_id").read().count(), "rows")


if __name__ == "__main__":
    main()
