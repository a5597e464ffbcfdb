"""Complete example: LLM pretraining-corpus preparation at scale.

The funnel a 100 TB corpus build runs, assembled from this engine's
operators with their scale-safe settings ON:

  documents parquet
    -> per-doc NLP profile (tokens, fingerprint, language — one pass)
    -> quality + Gopher repetition gates (shuffle-free integer bps)
    -> exact dedup (digest groupBy)
    -> fuzzy dedup: MinHash-LSH candidates with the HOT-BUCKET STAR CAP
       (max_bucket_width bounds boilerplate-duplicated corpora that make
       the uncapped join quadratic) -> exact Jaccard verify -> connected
       components -> keep min-id representative
    -> benchmark decontamination (broadcast eval n-grams)
    -> BM25 topical scoring against a query (pruned postings)

Run:  python examples/corpus_dedup_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.operators.decontam import decontaminate  # noqa: E402
from marmaray_spark.operators.dedup import (  # noqa: E402
    connected_components,
    exact_dedup,
    jaccard_counts,
    lsh_band_buckets,
    lsh_candidate_pairs,
    minhash_digests,
    minhash_signature,
)
from marmaray_spark.operators.retrieval import bm25_scores  # noqa: E402
from marmaray_spark.operators.text import (  # noqa: E402
    gopher_repetition_pass,
    quality_score,
    word_shingles,
    words,
)
from marmaray_spark.queries import spread  # noqa: E402
from marmaray_spark.session import SparkFactory  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkFactory(app_name="corpus_dedup_pipeline").get_or_create()

    # spread(): fan a small single-row-group scan out to all cores before
    # the expression-heavy hashing (a no-op on real multi-split tables)
    docs = (spread(spark.read.parquet(f"{sf_dir}/documents.parquet"), spark)
            .withColumn("w", words("text")))
    n0 = docs.count()

    # 1. quality + repetition gates — pure expressions, no shuffle
    gated = docs.filter((quality_score("text", words_col="w") >= 60)
                        & gopher_repetition_pass("w"))
    # one persist barrier: every later stage (dedup digests, shingles,
    # decontamination, BM25) re-reads this frame — the fork-persist rule
    gated = gated.persist()
    n1 = gated.count()

    # 2. exact dedup on the content digest
    keep_exact = exact_dedup(gated, "doc_id", "text") \
        .select(F.col("keeper_id").alias("doc_id"))
    exact_kept = gated.join(keep_exact, "doc_id", "left_semi")
    n2 = exact_kept.count()

    # 3. fuzzy dedup with the hot-bucket cap ON (the 100 TB setting)
    banded = (exact_kept
              .withColumn("sh", word_shingles("w", 3))
              .withColumn("hh", minhash_digests("sh"))
              .withColumn("sig", minhash_signature("hh", 16))
              .withColumn("bk", lsh_band_buckets("sig", 8, 2)))
    # shingle sets feed BOTH sides of the verification join: persist so
    # the minhash tree is never re-evaluated interpreted per branch
    banded = banded.select("doc_id", "text", "w", "sh", "bk").persist()
    cand = lsh_candidate_pairs(banded, "doc_id", "bk", max_bucket_width=64)
    sh = banded.select("doc_id", F.array_distinct("sh").alias("shd"))
    pairs = (cand
             .join(sh.select(F.col("doc_id").alias("a"),
                             F.col("shd").alias("sa")), "a")
             .join(sh.select(F.col("doc_id").alias("b"),
                             F.col("shd").alias("sb")), "b"))
    inter, union = jaccard_counts(F.col("sa"), F.col("sb"))
    verified = pairs.filter(inter * 2 >= union).select("a", "b")
    drops = (connected_components(verified)
             .filter(F.col("node") != F.col("component"))
             .select(F.col("node").alias("doc_id")))
    fuzzy_kept = exact_kept.join(drops, "doc_id", "left_anti").persist()
    n3 = fuzzy_kept.count()

    # 4. decontamination vs a (stand-in) eval set
    eval_set = (spark.createDataFrame(
        [(r["doc_id"], r["text"][:120]) for r in
         docs.orderBy("doc_id").limit(20).collect()],
        ["eval_id", "text"])
        .withColumn("w", words("text")))
    contaminated = (decontaminate(fuzzy_kept, eval_set)
                    .filter(F.col("contaminated")).select("doc_id"))
    clean = fuzzy_kept.join(contaminated, "doc_id", "left_anti")
    n4 = clean.count()

    # 5. topical relevance of the survivors
    top = bm25_scores(clean, ["data", "model", "system"], top_k=5).collect()

    print(f"corpus funnel: {n0} -> quality {n1} -> exact-dedup {n2} "
          f"-> fuzzy-dedup {n3} -> decontaminated {n4}")
    print("top docs for ['data','model','system']:",
          [(r["doc_id"], r["score_milli"]) for r in top])
    spark.stop()


if __name__ == "__main__":
    main()
