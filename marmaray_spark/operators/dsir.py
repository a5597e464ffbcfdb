"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): keep the
raw-corpus documents whose hashed n-gram distribution looks like a small
trusted TARGET corpus. The LLaMA/GPT-3-style "quality by similarity to
curated data" selection pattern, complementing the trainable classifier
(operators/classifier.py) with a model that needs no labels or training
loop — two count passes ARE the model. The reference (uber/marmaray) has
no text surface; this is beyond-reference LLM-pipeline tier.

Mechanics: features are hashed unigrams+bigrams (bag of n-grams) in
``n_buckets`` buckets; fit two smoothed unigram models over buckets —
p_target from the trusted sample, p_raw from the whole corpus; a doc's
importance weight is log w(x) = sum_features [log p_t(b) - log p_r(b)];
resample by Gumbel-perturbed top-k (adding Gumbel(0,1) noise to log
weights and taking the top k is exactly sampling without replacement
proportionally to w — the paper's procedure).

Scale design (100 TB):
- Each model is ONE explode + ONE map-side-combined groupBy(bucket) and
  fits in ``n_buckets`` rows — broadcastable regardless of corpus size.
- Weighing is one explode + two broadcast joins + one per-doc agg; the
  corpus never shuffles (the doc_id agg partial-aggregates map-side).
- Selection avoids the global top-k window entirely: integer scores ride
  an exact score HISTOGRAM (the surprisal_buckets pattern) — one
  bucket-scale cumulative picks the cutoff, docs filter against the
  broadcast scalar. No single-partition sort anywhere.

Determinism across engines: bucketing is md5-based (NOT xxhash64 — the
classifier uses JVM xxhash64 for speed, but DSIR's declared oracle leg
must be reproducible in ANSI SQL); log-probs are quantized to integer
milli-nats the moment ln() is applied (at most n_buckets distinct ratios
per model — the lm.py argument), Gumbel noise is derived from a 16-bit
md5 prefix and quantized immediately, and everything after is int64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 4096


def _grams_expr(words_col: str) -> str:
    """Unigrams ++ bigrams ('a b'), O(tokens): bigrams via zip_with over
    shifted slices — indexed w[i+1] access inside a lambda re-evaluates
    the substituted child per element (the measured top_ngram_bps trap,
    NOTES round 6); the slice form does not."""
    return (f"concat({words_col}, "
            f"zip_with(slice({words_col}, 1, size({words_col}) - 1), "
            f"slice({words_col}, 2, size({words_col}) - 1), "
            f"(a, b) -> concat(a, ' ', b)))")


def hashed_feature_stream(docs: DataFrame, id_col: str, words_col: str,
                          n_buckets: int = N_BUCKETS, salt: str = "dsir0",
                          carry: tuple[str, ...] = ()) -> DataFrame:
    """(id[, carry...], bucket) — one row per n-gram INSTANCE
    (multiplicity kept: bag-of-ngrams). bucket = first 8 md5 hex digits
    of 'salt:feature' mod n_buckets — engine-portable hashing.
    ``carry`` columns ride along unchanged (e.g. the language tag the
    report wants back without a corpus join)."""
    grams = F.expr(_grams_expr(words_col))
    cols = [F.col(id_col)] + [F.col(c) for c in carry]
    return (docs.select(*cols, F.explode(grams).alias("__f"))
            .filter(F.col("__f") != "")
            .select(id_col, *carry,
                    F.expr(f"pmod(cast(conv(substring(md5(concat("
                           f"'{salt}:', __f)), 1, 8), 16, 10) as bigint), "
                           f"{n_buckets})").alias("bucket")))


def bucket_lm(stream: DataFrame, n_buckets: int = N_BUCKETS,
              cnt_col: str | None = None) -> tuple[DataFrame, DataFrame]:
    """Add-one-smoothed bucket unigram model over a feature stream.

    Returns (lm, floor): ``lm`` is (bucket, logp_milli) for OBSERVED
    buckets — logp_milli = round(ln((cnt+1)/(total+B)) * 1000); ``floor``
    is the 1-row (floor_milli) an unobserved bucket costs,
    round(ln(1/(total+B)) * 1000). Both are bounded by n_buckets —
    broadcastable by construction.

    ``cnt_col``: the stream is PRE-AGGREGATED — one row per
    (…, bucket) carrying its instance count — instead of one row per
    feature instance. Counting becomes sum(cnt): bit-identical model,
    and a caller that feeds several consumers from one explode pass
    (sampling_methods) aggregates the explode exactly once."""
    from marmaray_spark.operators import attach_scalar

    c = F.count(F.lit(1)) if cnt_col is None else F.sum(cnt_col)
    cnts = stream.groupBy("bucket").agg(c.alias("cnt"))
    total = stream.groupBy().agg(c.alias("total"))
    lm = (attach_scalar(cnts, total)
          .select("bucket",
                  F.round(F.log((F.col("cnt") + 1) /
                                (F.col("total") + n_buckets)) * 1000)
                  .cast("long").alias("logp_milli")))
    floor = total.select(
        F.round(F.log(1.0 / (F.col("total") + n_buckets)) * 1000)
        .cast("long").alias("floor_milli"))
    return lm, floor


def bucket_lm_pair(stream: DataFrame, tgt_cond,
                   n_buckets: int = N_BUCKETS
                   ) -> tuple[tuple[DataFrame, DataFrame],
                              tuple[DataFrame, DataFrame]]:
    """(target_model, raw_model) from ONE pass over the feature stream,
    where the target corpus is ``stream.filter(tgt_cond)``: the raw and
    conditional counts ride the same map-side-combined bucket
    aggregation, so the stream (a corpus-scale explode) is evaluated
    once instead of once per model. Bit-identical to
    ``bucket_lm(stream.filter(tgt_cond))`` + ``bucket_lm(stream)`` —
    a bucket unobserved in the target is absent from its lm (the floor
    applies), exactly as the filtered form produces. The shared bucket
    frame (≤ n_buckets rows — bounded at any SF) is persisted so the
    two broadcast model builds don't each re-run the stream pass."""
    agg = (stream.groupBy("bucket")
           .agg(F.count(F.lit(1)).alias("__cr"),
                F.count(F.when(tgt_cond, 1)).alias("__ct"))
           .persist())

    def model(cnt_col: str) -> tuple[DataFrame, DataFrame]:
        tot = agg.agg(F.sum(cnt_col).cast("long").alias("total"))
        from marmaray_spark.operators import attach_scalar
        lm = (attach_scalar(agg.filter(F.col(cnt_col) > 0), tot)
              .select("bucket",
                      F.round(F.log((F.col(cnt_col) + 1) /
                                    (F.col("total") + n_buckets)) * 1000)
                      .cast("long").alias("logp_milli")))
        floor = tot.select(
            F.round(F.log(1.0 / (F.col("total") + n_buckets)) * 1000)
            .cast("long").alias("floor_milli"))
        return lm, floor

    return model("__ct"), model("__cr")


def dsir_log_weights(stream: DataFrame, id_col: str,
                     target: tuple[DataFrame, DataFrame],
                     raw: tuple[DataFrame, DataFrame],
                     carry: tuple[str, ...] = (),
                     cnt_col: str | None = None) -> DataFrame:
    """(id[, carry...], n_feats, logw_milli): per-doc importance weight
    sum_features [logp_target(b) - logp_raw(b)] in milli-nats. Both
    models broadcast; one agg on the feature stream.

    ``cnt_col``: pre-aggregated stream (one row per (id, bucket) with
    its instance count) — n_feats = sum(cnt) and the weight becomes
    sum(cnt * delta), the exact integer sum of cnt identical terms
    (the pagerank weighted-edge identity)."""
    from marmaray_spark.operators import attach_scalar

    t_lm, t_floor = target
    r_lm, r_floor = raw
    j = (stream
         .join(F.broadcast(t_lm.withColumnRenamed("logp_milli", "__lt")),
               "bucket", "left")
         .join(F.broadcast(r_lm.withColumnRenamed("logp_milli", "__lr")),
               "bucket", "left"))
    j = attach_scalar(j, t_floor.withColumnRenamed("floor_milli", "__ft"))
    j = attach_scalar(j, r_floor.withColumnRenamed("floor_milli", "__fr"))
    delta = (F.coalesce(F.col("__lt"), F.col("__ft"))
             - F.coalesce(F.col("__lr"), F.col("__fr")))
    if cnt_col is None:
        n_feats, w = F.count(F.lit(1)), F.sum(delta)
    else:
        n_feats, w = F.sum(cnt_col), F.sum(F.col(cnt_col) * delta)
    return (j.groupBy(id_col, *carry)
            .agg(n_feats.cast("long").alias("n_feats"),
                 w.cast("long").alias("logw_milli")))


def gumbel_milli(id_col: str, salt: str = "dg0") -> Column:
    """Quantized Gumbel(0,1) noise derived from a 16-bit md5 prefix of
    the document id: u = (h + 0.5) / 65536, g = -ln(-ln(u)), rounded to
    milli immediately (65536 distinct values per salt — the same
    bounded-ln-inputs determinism argument as lm.py)."""
    return F.expr(
        f"cast(round(-ln(-ln((cast(conv(substring(md5(concat('{salt}:', "
        f"cast({id_col} as string))), 1, 4), 16, 10) as double) + 0.5d) "
        f"/ 65536.0d)) * 1000) as bigint)")


def dsir_select(weights: DataFrame, k: int, id_col: str,
                weight_col: str = "logw_milli",
                salt: str = "dg0") -> DataFrame:
    """Gumbel top-k resampling WITHOUT a global sort: score = logw +
    Gumbel noise (integer milli); an exact (score, count) histogram —
    one map-side-combined agg — finds the largest cutoff covering >= k
    docs, and the corpus filters against the broadcast scalar. Returns
    the kept rows of ``weights`` (>= k of them; overshoot is bounded by
    the tie width at the cutoff score — quantized-integer ties share a
    fate, the surprisal_buckets principle).

    The cumulative window has no partition key, but it runs on the
    HISTOGRAM frame, whose cardinality is bounded by the integer score
    RANGE (max doc features x milli-nat span + the 14-nat Gumbel tail),
    NOT by corpus size — the same bounded-histogram argument as
    lm.surprisal_buckets."""
    if k <= 0:
        return weights.limit(0)
    scored = (weights
              .withColumn("__key", F.col(weight_col)
                          + gumbel_milli(id_col, salt))
              .persist())
    hist = scored.groupBy("__key").agg(F.count(F.lit(1)).alias("__c"))
    from pyspark.sql.window import Window as W
    cum = hist.withColumn(
        "__cum", F.sum("__c").over(
            W.orderBy(F.col("__key").desc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
    cut = (cum.filter(F.col("__cum") >= k)
           .groupBy().agg(F.max("__key").alias("__t")))
    from marmaray_spark.operators import attach_scalar
    kept = (attach_scalar(scored, cut)
            .filter(F.col("__key") >=
                    F.coalesce(F.col("__t"), F.lit(-(1 << 62))))
            .drop("__key", "__t"))
    return kept
