"""Ranked keyword retrieval over a document corpus: TF-IDF and BM25.

New surface for LLM data pipelines (quality-weighted corpus sampling,
eval-set mining, keyword-targeted subcorpus extraction all rank docs
against a query at corpus scale).

100 TB design:

- the inverted-index frame (term, doc_id, tf) comes from ONE
  explode+groupBy pass — map-side combined, uniform term keys;
- document frequencies are a groupBy over the index, and the per-term
  idf joins back by term equi-join (AQE broadcasts it when the query
  vocabulary is small — the common case: a query has tens of terms, so
  scoring touches only the index slice for those terms via a pushed
  semi-join, never the whole corpus);
- scores are pure arithmetic; top-k compiles to TakeOrderedAndProject
  (distributed partial top-k per partition, merged on the driver — no
  global sort, no single-task rank window).

Integer-scaled milli-scores (round-half-up) keep results engine-exact
for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marmaray_spark.operators.text import words


def term_frequencies(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) + per-doc length (dl): the inverted-index frame.
    One explode + one groupBy; no joins."""
    terms = (docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(words(text_col)).alias("term"))
             .filter(F.col("term") != ""))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return tf.join(dl, "doc_id")


def document_frequencies(index: DataFrame) -> DataFrame:
    """(term, df) from the inverted-index frame."""
    return index.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))


def bm25_scores(docs: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1_milli: int = 1200, b_milli: int = 750,
                top_k: int | None = 10) -> DataFrame:
    """BM25 ranking of ``docs`` against a bag of query terms
    (Robertson/Sparck Jones; the Okapi formula with the standard
    ``log((N - df + 0.5) / (df + 0.5) + 1)`` idf).

    Returns (doc_id, score_milli, rank) — milli-scaled bigint scores,
    deterministic ties broken by doc_id. The scan prunes to query terms
    FIRST (an isin filter on the exploded index — Catalyst pushes it
    below the groupBy), so cost is O(postings of the query terms), not
    O(corpus vocabulary)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    uniq = sorted(set(query_terms))

    n_docs_dl = (docs.select(F.col(id_col).alias("doc_id"),
                             F.size(words(text_col)).alias("dl")))
    stats = n_docs_dl.agg(F.count(F.lit(1)).alias("n_docs"),
                          F.sum("dl").alias("total_dl"))

    # tf only (term filter pushes below the aggregate); per-doc length
    # comes from the size() expression above instead of term_frequencies'
    # full-vocabulary dl groupBy — one less full-corpus shuffle. (dl ==
    # filtered token count for every doc that can appear in the index:
    # '' tokens only occur for empty text, which matches no query term.)
    terms = (docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(words(text_col)).alias("term"))
             .filter(F.col("term").isin(uniq) & (F.col("term") != "")))
    index = (terms.groupBy("doc_id", "term")
             .agg(F.count(F.lit(1)).alias("tf"))
             .join(n_docs_dl, "doc_id"))
    dfreq = document_frequencies(index)

    from marmaray_spark.operators import attach_scalar

    scored = attach_scalar(index.join(dfreq, "term"), stats)
    # all-double math, rounded once at the end — matches the SQL oracle
    idf = F.log((F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    k1 = F.lit(k1_milli / 1000.0)
    b = F.lit(b_milli / 1000.0)
    avgdl = F.col("total_dl") / F.col("n_docs")
    tf_part = (F.col("tf") * (k1 + 1)) / \
        (F.col("tf") + k1 * (F.lit(1.0) - b + b * (F.col("dl") / avgdl)))
    per_term = scored.withColumn("s", idf * tf_part)
    agg = (per_term.groupBy("doc_id")
           .agg(F.round(F.sum("s") * 1000).cast("bigint").alias("score_milli")))
    return _ranked_topk(agg, top_k)


def tfidf_scores(docs: DataFrame, query_terms: list[str],
                 id_col: str = "doc_id", text_col: str = "text",
                 top_k: int | None = 10) -> DataFrame:
    """Classic tf-idf ranking: sum over query terms of
    tf * ln(N / df). Same pruned-postings plan shape as bm25_scores."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    uniq = sorted(set(query_terms))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    index = term_frequencies(docs, id_col, text_col) \
        .filter(F.col("term").isin(uniq))
    dfreq = document_frequencies(index)
    from marmaray_spark.operators import attach_scalar

    scored = (attach_scalar(index.join(dfreq, "term"), n_docs)
              .withColumn("s", F.col("tf")
                          * F.log(F.col("n_docs") / F.col("df"))))
    agg = (scored.groupBy("doc_id")
           .agg(F.round(F.sum("s") * 1000).cast("bigint").alias("score_milli")))
    return _ranked_topk(agg, top_k)


def _ranked_topk(agg: DataFrame, top_k: int | None) -> DataFrame:
    """Attach a dense global rank WITHOUT a single-task global window:
    with a top_k, orderBy+limit compiles to TakeOrderedAndProject
    (distributed partial top-k, no full shuffle) and the rank window runs
    over <= top_k rows; with top_k None the caller gets scores unranked
    ordered output and ranks downstream (a full global rank of every
    scored doc is exactly the plan we refuse to ship)."""
    if top_k is None:
        return agg
    from pyspark.sql import Window
    top = agg.orderBy(F.col("score_milli").desc(), F.col("doc_id")) \
        .limit(top_k)
    w = Window.orderBy(F.col("score_milli").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
