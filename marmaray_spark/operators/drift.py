"""Corpus drift detection: per-term KL-divergence contributions between
two corpus snapshots (the distribution-shift monitor a training-data
pipeline runs between crawl batches — a mix shift shows up as mass on a
few terms long before aggregate stats move). The reference
(uber/marmaray) has no text surface; beyond-reference tier.

Determinism across engines: the probabilities and ``ln`` are evaluated
once PER TERM and quantized to integer micro-nats immediately, so no
cross-engine float summation ever happens — the total divergence is a
sum of already-quantized integers (the operators/lm.py discipline).

Scale: one term-count aggregate per snapshot (map-side combined), one
full-outer equi-join on term (co-partitioned with the aggregates), and
three 1-row scalars (totals + union vocab size) broadcast. The corpus
is scanned once per snapshot; nothing is driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_drift(a: DataFrame, b: DataFrame, words_col: str) -> DataFrame:
    """(term, cnt_a, cnt_b, contrib_micro): add-one-smoothed KL(P_a‖P_b)
    contribution of every union-vocabulary term, in integer micro-nats.
    Positive = over-represented in snapshot ``a``."""
    def counts(df: DataFrame) -> DataFrame:
        return (df.select(F.explode(F.col(words_col)).alias("term"))
                .filter(F.col("term") != "")
                .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))

    ca = counts(a)
    cb = counts(b)
    joined = (ca.withColumnRenamed("cnt", "cnt_a")
              .join(cb.withColumnRenamed("cnt", "cnt_b"), "term", "full")
              .select("term",
                      F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                      F.coalesce("cnt_b", F.lit(0)).alias("cnt_b")))
    # totals + vocab as whole-frame window sums: ONE pass over the
    # vocab-bounded joined frame (a groupBy().agg + crossJoin would
    # recompute the counts+join subtree per consumer and plan a BNLJ)
    from pyspark.sql import Window as W
    w = W.partitionBy()
    pa = "(cnt_a + 1.0) / (tot_a + vocab)"
    pb = "(cnt_b + 1.0) / (tot_b + vocab)"
    return (joined
            .withColumn("tot_a", F.sum("cnt_a").over(w))
            .withColumn("tot_b", F.sum("cnt_b").over(w))
            .withColumn("vocab", F.count(F.lit(1)).over(w))
            .select("term", "cnt_a", "cnt_b",
                    F.expr(f"CAST(round({pa} * ln(({pa}) / ({pb})) * 1e6) "
                           f"AS BIGINT)").alias("contrib_micro")))
