"""Complete example: prepare an LLM training corpus end to end.

The public-pipeline recipe (C4 / Gopher / CCNet / LLaMA data papers),
assembled from this engine's operators into the order a real run uses:

  documents parquet
    -> QUALITY GATES     doc-level Gopher repetition + duplicate-line
                         signals, C4 line cleaning (expression-only)
    -> EXACT DEDUP       content-digest keep-min
    -> QUALITY CLASSIFIER train a fastText-style hashed linear model on
                         a labeled sample (here: heuristic labels), then
                         score every surviving doc in one Arrow pass
    -> TEMPERATURE MIX   rebalance languages toward sqrt-share at a
                         fixed keep rate (XLM rule)
    -> SHUFFLE-SHARD     deterministic md5 global shuffle + token-budget
                         shards, one file per shard + manifest

Every stage is a DataFrame transform — one driver program, no collect
of corpus-scale data; only the classifier's per-iteration gradient
(dim floats per Arrow batch) and the shard manifest (shard-count rows)
ever reach the driver.

Run:  python examples/training_data_prep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.operators.classifier import (  # noqa: E402
    hashed_features,
    score_quality,
    train_quality_classifier,
)
from marmaray_spark.operators.dedup import exact_dedup  # noqa: E402
from marmaray_spark.operators.shard import write_training_shards  # noqa: E402
from marmaray_spark.operators.text import (  # noqa: E402
    gopher_repetition_pass,
    quality_score,
    temperature_mix,
    token_count,
    words,
)
from marmaray_spark.session import SparkFactory  # noqa: E402


def prepare(spark, sf_dir: str, out_dir: str,
            classifier_dim: int = 1 << 14,
            classifier_iters: int = 12) -> dict:
    """Run the full prep flow; returns the shard manifest plus stage
    counts. Kept importable so tests drive the same code as the CLI."""
    par = spark.sparkContext.defaultParallelism
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "lang", "text")
            .repartition(par)                 # small files arrive 1-partition
            .withColumn("w", words("text")))

    # 1. rule gates: Gopher repetition + a composite quality floor
    gated = docs.filter(gopher_repetition_pass("w")
                        & (quality_score("text", words_col="w") >= 40))

    # 2. exact dedup on content digest (keep-min doc_id representative),
    #    then semi-join the keeper set back to the full rows. The result
    #    feeds three consumers (classifier train sample, scoring pass,
    #    stage counts) — persist so the gate+dedup funnel runs once.
    keepers = exact_dedup(gated, id_col="doc_id", text_col="text") \
        .select(F.col("keeper_id").alias("doc_id"))
    deduped = gated.join(keepers, "doc_id", "left_semi").persist()

    # 3. trainable classifier: pseudo-labels on a deterministic 25%
    #    sample (stand-in for human labels — here a STRICTER quality rule
    #    than the gate above, so the model distills the rule into a
    #    content signal and generalizes it to unlabeled docs), then one
    #    scoring pass over everything
    feats = deduped.withColumn("f", hashed_features("w", dim=classifier_dim))
    labeled = (feats
               .filter(F.expr("substring(md5(concat('lbl:', "
                              "cast(doc_id as string))), 1, 1) < '4'")
                       )
               .withColumn("y", (quality_score("text", words_col="w") >= 80)
                           .cast("int"))
               .persist())
    weights, history = train_quality_classifier(
        labeled, "f", "y", dim=classifier_dim, iters=classifier_iters)
    labeled.unpersist()
    scored = score_quality(feats, "f", weights)
    kept = scored.filter(F.col("quality_logit_milli") > 0)

    # 4. temperature mixing across languages (~60% overall keep)
    mixed = temperature_mix(kept, "doc_id", "lang", keep_bps=6000)

    # 5. deterministic shuffle + token-budget shards + manifest
    final = mixed.select("doc_id", "lang", "text",
                         token_count("text").alias("n_tok"))
    manifest = write_training_shards(final, out_dir, "doc_id", "n_tok",
                                     budget_tokens=4000)
    report = {
        "input_docs": docs.count(),
        "after_dedup": deduped.count(),
        "after_classifier": kept.count(),
        "after_mix": manifest["total_docs"],
        "final_loss": history[-1],
        "manifest": manifest,
    }
    deduped.unpersist()
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = tempfile.mkdtemp(prefix="training_shards_")
    spark = SparkFactory(app_name="training_data_prep").get_or_create()
    try:
        report = prepare(spark, sf_dir, out)
        m = report.pop("manifest")
        for k, v in report.items():
            print(f"{k}: {v}")
        print(f"shards: {m['n_shards']}  total_tokens: {m['total_tokens']}"
              f"  -> {out}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
