"""Sequence packing: assign documents to fixed-token-budget training
sequences by deterministic concat-and-chunk.

The pretraining staple after cleaning/dedup: the token stream is
concatenated and cut every ``seq_len`` tokens; a document belongs to the
bin where it starts. New surface (not in the reference — BASELINE.md
north star).

100 TB posture: packing is inherently sequential along the stream, so the
stream is SALTED into ``n_buckets`` independent streams (bucket = id mod
n_buckets) packed in parallel — the standard trick (each bucket is one
window partition; parallelism = n_buckets, so size it ~4x the cluster's
cores). Within a bucket it is one running-sum window over the bucket's
sort — no driver state, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, *, id_col: str, tokens_col: str,
                   seq_len: int, n_buckets: int = 32) -> DataFrame:
    """Adds (bucket, bin_id): the training sequence each document lands
    in. Deterministic: bucket = id mod n_buckets; docs concatenate in id
    order; bin_id = tokens-before-this-doc div seq_len."""
    if seq_len <= 0 or n_buckets <= 0:
        raise ValueError("seq_len and n_buckets must be positive")
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df
            .withColumn("bucket", (F.col(id_col) % n_buckets).cast("int"))
            .withColumn("__cum", F.sum(tokens_col).over(w))
            .withColumn("bin_id",
                        F.expr(f"CAST((__cum - {tokens_col}) div {seq_len} "
                               f"AS BIGINT)"))
            .drop("__cum"))


def packing_stats(df: DataFrame, *, id_col: str, tokens_col: str,
                  seq_len: int, n_buckets: int = 32) -> DataFrame:
    """Per-bin packing report: documents, tokens, and the fill level of
    each training sequence (tokens div seq_len overflow goes to the next
    bin's docs — fill can exceed 10000 bps only via a doc longer than
    seq_len, worth monitoring)."""
    packed = pack_sequences(df, id_col=id_col, tokens_col=tokens_col,
                            seq_len=seq_len, n_buckets=n_buckets)
    return (packed.groupBy("bucket", "bin_id")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(tokens_col).cast("long").alias("sum_tokens"))
            .withColumn("fill_bps",
                        F.expr(f"CAST(sum_tokens * 10000 div {seq_len} AS INT)")))
