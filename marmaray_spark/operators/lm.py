"""Unigram language-model quality scoring (the CCNet pattern: score every
document by an LM trained on a trusted corpus and bucket by perplexity —
Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data"). The reference (uber/marmaray) has no text surface;
this belongs to the beyond-reference LLM-data-pipeline tier.

Scale design (the 100 TB story):

- TRAIN is one explode + one map-side-combined groupBy(term) — the only
  shuffle — followed by a driver-side top-``vocab_size`` trim. The model
  itself is a (term, logp_milli) table of at most ``vocab_size`` rows:
  broadcastable by construction, no matter how big the corpus was.
- SCORE is a broadcast hash join from each document's term-frequency map
  to the model plus one per-doc aggregation — the scoring pass never
  shuffles the corpus (the per-doc agg rides the explode output, which
  Catalyst partial-aggregates map-side before the doc_id exchange).
- DETERMINISM across engines: ln() is evaluated once per VOCAB ENTRY and
  quantized to integer milli-nats immediately; every per-document number
  after that is integer arithmetic (sum of int64, integer div), so
  summation order — the classic cross-engine float trap — can't change a
  single bit. A libm ulp difference could only matter if ln() landed
  within ~1e-13 of a rounding boundary, and it is applied to at most
  ``vocab_size`` distinct ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_unigram_lm(docs: DataFrame, words_col: str,
                     vocab_size: int | None = None) -> DataFrame:
    """Count corpus unigrams and attach quantized log-probabilities.

    Returns (term, cnt, logp_milli) where
    ``logp_milli = round(ln(cnt / total) * 1000)`` (milli-nats, BIGINT).
    With ``vocab_size`` set, keeps only the most frequent terms (ties by
    term) — the broadcastable-model guarantee; ``total`` still counts the
    whole corpus so trimmed models stay proper sub-distributions."""
    terms = (docs.select(F.explode(F.col(words_col)).alias("term"))
             .filter(F.col("term") != ""))
    cnts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    if vocab_size is not None:
        cnts = (cnts.orderBy(F.col("cnt").desc(), "term")
                .limit(vocab_size))          # TakeOrdered, not a global sort
    from marmaray_spark.operators import attach_scalar

    total = terms.groupBy().agg(F.count(F.lit(1)).alias("total"))
    return (attach_scalar(cnts, total)
            .select("term", "cnt",
                    F.round(F.log(F.col("cnt") / F.col("total")) * 1000)
                    .cast("long").alias("logp_milli")))


def surprisal_buckets(scored: DataFrame, group_col: str,
                      score_col: str = "lm_logp_milli",
                      out_col: str = "ppl_bucket") -> DataFrame:
    """Tag every row head/middle/tail by LM score WITHIN its group —
    CCNet's per-language perplexity split (Wenzek et al. 2020 §4.4 keep
    the best-perplexity third). "head" = highest log-prob (lowest
    perplexity).

    Exact distributed quantile with NO per-group row window (a window
    partitioned by language is one partition per language — the classic
    skew bottleneck at corpus scale; CCNet itself uses histograms):
    scores are already quantized integers, so a (group, score) value
    histogram — one map-side-combinable aggregate — carries the full
    distribution. The strictly-greater cumulative runs on that
    histogram-scale frame, and rows get their bucket from a broadcast
    join back on (group, score). Rows sharing a score share a bucket
    (principled under quantization; a tie straddling a boundary goes to
    the better bucket), and every number in the rule is an integer —
    engine-exact."""
    hist = (scored.groupBy(group_col, score_col)
            .agg(F.count(F.lit(1)).alias("_c")))
    from pyspark.sql.window import Window as W
    wg = (W.partitionBy(group_col).orderBy(F.col(score_col).desc())
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wn = W.partitionBy(group_col)
    edges = (hist
             .withColumn("_higher", F.sum("_c").over(wg) - F.col("_c"))
             .withColumn("_n", F.sum("_c").over(wn))
             .select(F.col(group_col).alias("__g"),
                     F.col(score_col).alias("__s"),
                     F.expr(f"CASE WHEN _higher * 3 < _n THEN 'head' "
                            f"WHEN _higher * 3 < 2 * _n THEN 'middle' "
                            f"ELSE 'tail' END").alias(out_col)))
    # null-safe join-back: a NULL group (or NULL score) is a real
    # histogram row and must not vanish from the tagged output
    return (scored.join(
        F.broadcast(edges),
        F.col(group_col).eqNullSafe(F.col("__g"))
        & F.col(score_col).eqNullSafe(F.col("__s")))
        .drop("__g", "__s"))


def lm_score(docs: DataFrame, id_col: str, words_col: str,
             lm: DataFrame, oov_logp_milli: int = -20000) -> DataFrame:
    """Per-document mean token surprisal under a unigram LM.

    Returns (id, n_tokens, lm_logp_milli) where ``lm_logp_milli`` is the
    integer mean of per-token log-probs in milli-nats (higher = more
    LM-like; CCNet keeps the best-perplexity head of the corpus).
    Out-of-vocabulary tokens cost ``oov_logp_milli``. The LM side is
    broadcast; the corpus side is one explode + one doc_id agg."""
    toks = (docs.select(F.col(id_col), F.explode(F.col(words_col))
                        .alias("term"))
            .filter(F.col("term") != ""))
    joined = toks.join(F.broadcast(lm.select("term", "logp_milli")),
                       "term", "left")
    lp = F.coalesce(F.col("logp_milli"), F.lit(oov_logp_milli))
    return (joined.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"),
                 F.sum(lp).alias("_sum_lp"))
            .select(F.col(id_col),
                    "n_tokens",
                    F.expr("_sum_lp div n_tokens").cast("long")
                    .alias("lm_logp_milli")))
