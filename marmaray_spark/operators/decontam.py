"""Benchmark decontamination: flag training documents that overlap an
evaluation/test set by shared word n-grams.

The standard pretraining-hygiene step (GPT-3 appendix C / PaLM / Llama
training reports): an eval example "contaminates" a training document when
they share enough n-grams. New surface (not in the reference -- BASELINE.md
north star): the reference moves records; a training-data pipeline must also
police them.

100 TB posture: the test/eval side is small (benchmarks are MBs), so its
distinct n-gram set is BROADCAST; the corpus side is one explode + one
broadcast hash join + one groupBy(doc_id) shuffle whose key is the uniform
document id. No all-pairs comparison anywhere; cost is linear in corpus
n-gram count. The explode fan-out (~tokens per doc) is the same shape Spark
handles in every inverted-index build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from marmaray_spark.operators.text import word_shingles


def distinct_ngrams(words_col: str, n: int) -> Column:
    """Distinct word n-grams of a tokenized document (order dropped --
    containment is a set question)."""
    return F.array_distinct(word_shingles(words_col, n))


def decontaminate(corpus: DataFrame, test_set: DataFrame, *,
                  id_col: str = "doc_id", words_col: str = "w",
                  n: int = 5, contaminated_bps: int = 2000) -> DataFrame:
    """Per corpus document that shares at least one n-gram with the test
    set: (id, n_grams, n_overlap, overlap_bps, contaminated).

    ``overlap_bps`` = 10000 * |doc's distinct n-grams also in test set|
    div |doc's distinct n-grams| (integer basis points => engine-exact);
    ``contaminated`` flags docs at or above ``contaminated_bps``. Docs with
    zero overlap are omitted (at scale almost all of them -- emitting them
    would be a full-corpus output for a hygiene report).
    """
    grams = distinct_ngrams(words_col, n)
    corpus_grams = corpus.select(F.col(id_col), F.explode(grams).alias("g"))
    test_grams = test_set.select(F.explode(grams).alias("g")).distinct()
    totals = corpus.select(F.col(id_col), F.size(grams).alias("n_grams"))
    hits = (corpus_grams.join(F.broadcast(test_grams), "g")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_overlap")))
    return (hits.join(totals, id_col)
            .withColumn("overlap_bps",
                        F.expr("CAST(n_overlap * 10000 div greatest(n_grams, 1) AS INT)"))
            .withColumn("contaminated", F.col("overlap_bps") >= contaminated_bps)
            .select(id_col, "n_grams", "n_overlap", "overlap_bps", "contaminated"))


def decontaminate_many(corpus: DataFrame,
                       eval_sets: dict[str, DataFrame], *,
                       id_col: str = "doc_id", words_col: str = "w",
                       n: int = 5, contaminated_bps: int = 2000) -> DataFrame:
    """Decontaminate against SEVERAL benchmarks in ONE corpus pass — the
    real pretraining shape (a release decontaminates against its whole
    eval suite, not one set): every eval set's distinct n-grams are
    tagged with the set name, the tagged union (still benchmark-sized)
    broadcasts once, and the report gains an ``eval_set`` column — one
    row per (document, overlapping set). The corpus side stays exactly
    one explode + one broadcast join + one groupBy, now keyed
    (id, eval_set); cost is unchanged in the corpus term, linear in the
    summed benchmark sizes."""
    grams = distinct_ngrams(words_col, n)
    tagged = None
    for name, test_set in sorted(eval_sets.items()):
        t = (test_set.select(F.explode(grams).alias("g")).distinct()
             .withColumn("eval_set", F.lit(name)))
        tagged = t if tagged is None else tagged.unionByName(t)
    if tagged is None:
        raise ValueError("eval_sets must not be empty")
    corpus_grams = corpus.select(F.col(id_col), F.explode(grams).alias("g"))
    totals = corpus.select(F.col(id_col), F.size(grams).alias("n_grams"))
    hits = (corpus_grams.join(F.broadcast(tagged), "g")
            .groupBy(id_col, "eval_set")
            .agg(F.count("*").cast("long").alias("n_overlap")))
    return (hits.join(totals, id_col)
            .withColumn("overlap_bps",
                        F.expr("CAST(n_overlap * 10000 "
                               "div greatest(n_grams, 1) AS INT)"))
            .withColumn("contaminated",
                        F.col("overlap_bps") >= contaminated_bps)
            .select(id_col, "eval_set", "n_grams", "n_overlap",
                    "overlap_bps", "contaminated"))
