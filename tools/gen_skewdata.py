"""Generate a DELIBERATELY SKEWED ~sf1 variant of the test tables.

The driver's synthetic tables are benign; this builds the adversarial
shape a 100 TB corpus actually has — mass boilerplate duplication, one
dominant language, one hot user — so the bucketed dedup/ANN joins can be
MEASURED under hot-key pressure instead of argued about
(VERDICT round 2, "Next round" item 3).

Output (under .skewdata/, git-ignored, derived entirely from the
driver's sf0.1 parquet — never touches /root/testdata):

- documents.parquet  ~60k docs: 30% verbatim copies of ONE boilerplate
  doc (the hot LSH/SimHash bucket), 20% near-copies of it (small edits),
  50% the sf0.1 corpus replicated with fresh ids; 70% tagged lang='en'.
- events.parquet     ~6M rows: one user_id owns 30% of all events.
- embeddings.parquet ~60k vectors: 30% one repeated vector (hot SRP
  bucket), rest the sf0.1 vectors replicated.

Usage: python tools/gen_skewdata.py [out_dir] [sf0.1_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.session import SparkFactory  # noqa: E402

BOILER = ("this website uses cookies to improve your experience by "
          "continuing to browse the site you agree to our use of cookies "
          "and our terms of service all rights reserved contact us for "
          "more information about privacy policy and legal disclaimers ")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".skewdata"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = SparkFactory(app_name="gen_skewdata").get_or_create()

    # documents: target ~60k rows from the ~5k source corpus
    docs = spark.read.parquet(f"{src}/documents.parquet")
    n_src = docs.count()
    reps = spark.range(6).select(F.col("id").alias("rep"))
    base = (docs.crossJoin(reps)
            .select((F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
                    "text", "lang", "source", "n_chars"))
    n_base = n_src * 6
    n_hot = int(n_base * 0.6)          # 30% exact + 20% near of the total
    hot = spark.range(n_hot).select(
        (F.col("id") + 50_000_000).alias("doc_id"),
        F.when(F.col("id") % 5 < 3, F.lit(BOILER * 3))   # 3/5 verbatim
         .otherwise(F.concat(F.lit(BOILER * 3),          # 2/5 near-copies
                             F.lit("edition "),
                             (F.col("id") % 97).cast("string")))
        .alias("text"),
        F.lit("en").alias("lang"),
        F.lit("boilerplate").alias("source"))
    hot = hot.withColumn("n_chars", F.length("text"))
    skew_docs = base.unionByName(hot)
    skew_docs.repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/documents.parquet")

    # events: ~6M rows, one user owns 30%
    ev = spark.read.parquet(f"{src}/events.parquet")
    n_ev = ev.count()                   # ~600k at sf0.1
    ev_reps = spark.range(60).select(F.col("id").alias("rep"))
    big = (ev.crossJoin(ev_reps)
           .select((F.col("event_id") + F.col("rep") * 10_000_000)
                   .alias("event_id"),
                   "ts",
                   F.when(F.xxhash64("event_id", "rep") % 10 < 3, F.lit(1))
                    .otherwise(F.col("user_id")).alias("user_id"),
                   "event_type", "value", "props"))
    big.repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/events.parquet")

    # embeddings: ~60k vectors, 30% one repeated vector
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    first_vec = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    emb_reps = spark.range(20).select(F.col("id").alias("rep"))
    base_e = (emb.crossJoin(emb_reps)
              .select((F.col("vec_id") + F.col("rep") * 1_000_000)
                      .alias("vec_id"), "embedding", "label"))
    n_e = emb.count() * 20
    hot_e = spark.range(int(n_e * 0.4)).select(
        (F.col("id") + 50_000_000).alias("vec_id"),
        F.lit(first_vec).cast("array<float>").alias("embedding"),
        F.lit(999).alias("label"))
    base_e.unionByName(hot_e).repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/embeddings.parquet")

    print({"documents": skew_docs.count(),
           "events": big.count(),
           "embeddings": base_e.count() + hot_e.count()})
    spark.stop()


if __name__ == "__main__":
    main()
