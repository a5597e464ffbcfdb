"""Deterministic global shuffle + token-budget sharding — the training-
output writer of an LLM data pipeline. After cleaning/dedup/mixing, the
corpus must be (a) globally shuffled so every training shard is an i.i.d.
slice (public recipe in GPT-NeoX/Megatron/T5 data tooling: shuffle once at
preparation time, stream shards sequentially at training time), and
(b) cut into shards of a fixed TOKEN budget so data-parallel ranks get
even work. The reference (uber/marmaray) has no such surface; this
belongs to the beyond-reference LLM-data-pipeline tier.

Scale design (the 100 TB story):

- The shuffle key is ``md5(salt:id)`` — deterministic across engines,
  retries and partitionings (the same rationale as
  operators/text.deterministic_sample; ``rand()`` is none of those).
- A GLOBAL ordered prefix-sum would be a single-partition window — the
  classic scale-killer. Instead: the hex prefix of the key buckets rows
  into ``16**hex_chars`` uniform ranges (md5 is uniform), the running
  token count is a per-BUCKET window (parallel, spillable), and bucket
  offsets come from one tiny per-bucket total + an ordered window over
  ≤4096 rows — the textbook two-pass distributed prefix sum. One corpus
  shuffle total (the bucket exchange); everything else is map-side or
  driver-scale.
- Shard id = ``floor(global_token_start / budget)``: every shard holds
  ≈``budget`` tokens (boundary documents spill into the next shard —
  documents are never split; sequence_packing handles intra-shard
  packing). Within a shard, rows stay in key order, so a shard's file is
  byte-deterministic no matter how the job was partitioned.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def shard_assignments(df: DataFrame, id_col: str, tokens_col: str,
                      budget_tokens: int, salt: str = "s0",
                      hex_chars: int = 2) -> DataFrame:
    """Attach the deterministic shuffle key and token-budget shard id.

    Returns the input columns plus ``sort_key`` (md5 hex), ``bucket``
    (its ``hex_chars``-char prefix), ``start_tokens`` (global tokens
    before this document in shuffle order) and ``shard`` (bigint).
    Exactly one corpus shuffle (the per-bucket window exchange)."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    keyed = df.withColumn("sort_key", key) \
              .withColumn("bucket", F.substring("sort_key", 1, hex_chars))
    wb = (W.partitionBy("bucket").orderBy("sort_key", id_col)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = keyed.withColumn(
        "_cum", F.sum(F.col(tokens_col).cast("long")).over(wb))
    totals = (keyed.groupBy("bucket")
              .agg(F.sum(F.col(tokens_col).cast("long")).alias("_tot")))
    wo = (W.orderBy("bucket")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    offsets = (totals
               .withColumn("_off", F.sum("_tot").over(wo) - F.col("_tot"))
               .select("bucket", "_off"))
    return (cum.join(F.broadcast(offsets), "bucket")
            .withColumn("start_tokens",
                        F.col("_off") + F.col("_cum")
                        - F.col(tokens_col).cast("long"))
            .withColumn("shard",
                        F.expr(f"start_tokens div {int(budget_tokens)}"))
            .drop("_cum", "_off"))


def write_training_shards(df: DataFrame, path: str, id_col: str,
                          tokens_col: str, budget_tokens: int,
                          salt: str = "s0", hex_chars: int = 2,
                          fmt: str = "parquet") -> dict:
    """Shuffle-shard the corpus to ``path`` and write a manifest.

    Layout: ``path/data/shard=N/`` one file per shard (each shard lands
    wholly in one task via ``repartition(n, shard)``; rows inside are in
    ``sort_key`` order, so output bytes are reproducible), plus
    ``path/manifest.json`` with per-shard document and token counts.
    The manifest aggregate is shard-count-scale — the only driver
    materialization."""
    # persist: the stats action and the write both consume `assigned`,
    # and everything upstream of it (often the whole prep funnel) would
    # otherwise execute twice — at corpus scale that doubles the most
    # expensive stages
    assigned = shard_assignments(df, id_col, tokens_col, budget_tokens,
                                 salt=salt, hex_chars=hex_chars).persist()
    try:
        stats = (assigned.groupBy("shard")
                 .agg(F.count(F.lit(1)).alias("docs"),
                      F.sum(F.col(tokens_col).cast("long")).alias("tokens"))
                 .orderBy("shard").collect())
        n_shards = max((r["shard"] for r in stats), default=-1) + 1
        (assigned.drop("bucket")
         .repartition(max(int(n_shards), 1), "shard")
         .sortWithinPartitions("sort_key", id_col)
         .write.mode("overwrite").partitionBy("shard")
         .format(fmt).save(os.path.join(path, "data")))
    finally:
        assigned.unpersist()
    manifest = {
        "salt": salt,
        "budget_tokens": int(budget_tokens),
        "n_shards": int(n_shards),
        "total_docs": int(sum(r["docs"] for r in stats)),
        "total_tokens": int(sum(r["tokens"] for r in stats)),
        "shards": [{"shard": int(r["shard"]), "docs": int(r["docs"]),
                    "tokens": int(r["tokens"])} for r in stats],
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest
