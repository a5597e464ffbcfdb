"""DSIR importance resampling (operators/dsir.py): hashing parity with a
local md5 reference, smoothed model math, target-likeness ordering of
the log weights, and the histogram-cutoff Gumbel top-k selection
contract (>= k kept, tie overshoot only, degenerate k edges)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from marmaray_spark.operators.dsir import (N_BUCKETS, bucket_lm,
                                           bucket_lm_pair,
                                           dsir_log_weights, dsir_select,
                                           gumbel_milli,
                                           hashed_feature_stream)
from marmaray_spark.operators.text import words


def _docs(spark, rows):
    return (spark.createDataFrame(rows, "doc_id long, text string")
            .withColumn("w", words("text")))


def _ref_bucket(feature: str, salt: str = "dsir0",
                n_buckets: int = N_BUCKETS) -> int:
    h = hashlib.md5(f"{salt}:{feature}".encode()).hexdigest()[:8]
    return int(h, 16) % n_buckets


def test_feature_stream_matches_md5_reference(spark):
    df = _docs(spark, [(1, "alpha beta gamma")])
    got = sorted(r["bucket"] for r in
                 hashed_feature_stream(df, "doc_id", "w").collect())
    want = sorted(_ref_bucket(f) for f in
                  ["alpha", "beta", "gamma", "alpha beta", "beta gamma"])
    assert got == want


def test_feature_stream_single_token_no_bigrams(spark):
    df = _docs(spark, [(1, "solo")])
    got = [r["bucket"] for r in
           hashed_feature_stream(df, "doc_id", "w").collect()]
    assert got == [_ref_bucket("solo")]


def test_bucket_lm_smoothing_math(spark):
    df = _docs(spark, [(1, "a a b")])     # feats: a, a, b, 'a a', 'a b'
    lm, floor = bucket_lm(hashed_feature_stream(df, "doc_id", "w"))
    total = 5
    by_bucket = {r["bucket"]: r["logp_milli"] for r in lm.collect()}
    assert by_bucket[_ref_bucket("a")] == round(
        math.log((2 + 1) / (total + N_BUCKETS)) * 1000)
    assert by_bucket[_ref_bucket("b")] == round(
        math.log((1 + 1) / (total + N_BUCKETS)) * 1000)
    assert floor.first()["floor_milli"] == round(
        math.log(1 / (total + N_BUCKETS)) * 1000)


def test_log_weights_prefer_target_like_docs(spark):
    """Docs speaking the target's vocabulary must weigh higher than
    docs speaking a disjoint one."""
    corpus = _docs(spark, [
        (1, "spark query plan shuffle"), (2, "spark query join scan"),
        (3, "llama alpaca vicuna pony"), (4, "pony alpaca stable barn"),
    ])
    target = _docs(spark, [(100, "spark query plan join scan shuffle")])
    raw_s = hashed_feature_stream(corpus, "doc_id", "w")
    wts = {r["doc_id"]: r["logw_milli"] for r in dsir_log_weights(
        raw_s, "doc_id",
        bucket_lm(hashed_feature_stream(target, "doc_id", "w")),
        bucket_lm(raw_s)).collect()}
    assert min(wts[1], wts[2]) > max(wts[3], wts[4]), wts


def test_gumbel_milli_matches_python_reference(spark):
    df = spark.createDataFrame([(7,), (42,)], "doc_id long")
    got = {r["doc_id"]: r["g"] for r in
           df.select("doc_id", gumbel_milli("doc_id").alias("g")).collect()}
    for i in (7, 42):
        h = int(hashlib.md5(f"dg0:{i}".encode()).hexdigest()[:4], 16)
        u = (h + 0.5) / 65536.0
        assert got[i] == round(-math.log(-math.log(u)) * 1000)


def test_dsir_select_keeps_at_least_k_overshoot_only_on_ties(spark):
    wts = spark.createDataFrame(
        [(i, 1, (i % 5) * 100) for i in range(50)],
        "doc_id long, n_feats long, logw_milli long")
    kept = dsir_select(wts, k=10, id_col="doc_id").collect()
    assert len(kept) >= 10
    # everything kept outscores (logw + gumbel) everything dropped
    def key(doc_id, logw):
        h = int(hashlib.md5(f"dg0:{doc_id}".encode()).hexdigest()[:4], 16)
        g = round(-math.log(-math.log((h + 0.5) / 65536.0)) * 1000)
        return logw + g
    kept_ids = {r["doc_id"] for r in kept}
    all_keys = {r["doc_id"]: key(r["doc_id"], r["logw_milli"])
                for r in wts.collect()}
    cut = min(all_keys[i] for i in kept_ids)
    assert all(all_keys[i] < cut or all_keys[i] == cut
               for i in all_keys if i not in kept_ids)
    assert all(all_keys[i] >= cut for i in kept_ids)
    # overshoot beyond k is exactly the tie width at the cutoff key
    n_above = sum(1 for v in all_keys.values() if v > cut)
    assert n_above < 10 <= len(kept)


def test_dsir_select_degenerate_k(spark):
    wts = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 3)], "doc_id long, n_feats long, logw_milli long")
    assert dsir_select(wts, k=0, id_col="doc_id").count() == 0
    assert dsir_select(wts, k=99, id_col="doc_id").count() == 2


def test_dsir_end_to_end_biases_toward_target(spark, documents):
    """On the real corpus with target = the en doc_id%5 slice, the kept
    20% must have a higher mean weight than the dropped 80% (the whole
    point), and carry columns must survive the pipeline."""
    docs = documents.withColumn("w", words("text")) \
        .select("doc_id", "lang", "w")
    raw_s = hashed_feature_stream(docs, "doc_id", "w", carry=("lang",))
    tgt_s = hashed_feature_stream(
        docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 5 == 0)),
        "doc_id", "w")
    wts = dsir_log_weights(raw_s, "doc_id", bucket_lm(tgt_s),
                           bucket_lm(raw_s), carry=("lang",))
    n = documents.count()
    kept = dsir_select(wts, k=n * 2000 // 10000, id_col="doc_id")
    assert "lang" in kept.columns
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    allw = [(r["doc_id"], r["logw_milli"]) for r in wts.collect()]
    kept_mean = sum(w for d, w in allw if d in kept_ids) / max(len(kept_ids), 1)
    drop = [(d, w) for d, w in allw if d not in kept_ids]
    drop_mean = sum(w for _, w in drop) / max(len(drop), 1)
    assert kept_mean > drop_mean


def test_weighted_count_path_matches_instance_stream(spark, documents):
    """The pre-aggregated (id, bucket, cnt) form (cnt_col) must produce
    bit-identical models and per-doc weights to the one-row-per-instance
    stream — the factorization sampling_methods rides to run the
    feature explode once for all three DSIR consumers."""
    docs = documents.withColumn("w", words("text")) \
        .select("doc_id", "lang", "w")
    raw_s = hashed_feature_stream(docs, "doc_id", "w", carry=("lang",))
    tgt_s = hashed_feature_stream(
        docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 5 == 0)),
        "doc_id", "w")
    wts_ref = dsir_log_weights(raw_s, "doc_id", bucket_lm(tgt_s),
                               bucket_lm(raw_s), carry=("lang",))

    fc = (raw_s.groupBy("doc_id", "lang", "bucket")
          .agg(F.count(F.lit(1)).alias("__cnt")))
    tgt_fc = fc.filter((F.col("lang") == "en") & (F.col("doc_id") % 5 == 0))
    wts_fc = dsir_log_weights(fc, "doc_id",
                              bucket_lm(tgt_fc, cnt_col="__cnt"),
                              bucket_lm(fc, cnt_col="__cnt"),
                              carry=("lang",), cnt_col="__cnt")
    ref = {(r["doc_id"], r["lang"], r["n_feats"], r["logw_milli"])
           for r in wts_ref.collect()}
    got = {(r["doc_id"], r["lang"], r["n_feats"], r["logw_milli"])
           for r in wts_fc.collect()}
    assert got == ref


def test_bucket_lm_pair_matches_separate_models(spark, documents):
    """bucket_lm_pair (both models from one stream pass, target = a
    filter condition) must produce bit-identical lm/floor frames to
    bucket_lm over the filtered and full streams separately."""
    docs = documents.withColumn("w", words("text")) \
        .select("doc_id", "lang", "w")
    stream = hashed_feature_stream(docs, "doc_id", "w", carry=("lang",))
    cond = (F.col("lang") == "en") & (F.col("doc_id") % 5 == 0)
    (t_lm, t_fl), (r_lm, r_fl) = bucket_lm_pair(stream, cond)
    t_ref, t_ref_fl = bucket_lm(stream.filter(cond))
    r_ref, r_ref_fl = bucket_lm(stream)
    for got, ref in ((t_lm, t_ref), (r_lm, r_ref)):
        assert ({(r["bucket"], r["logp_milli"]) for r in got.collect()}
                == {(r["bucket"], r["logp_milli"]) for r in ref.collect()})
    for got, ref in ((t_fl, t_ref_fl), (r_fl, r_ref_fl)):
        assert (got.first()["floor_milli"]
                == ref.first()["floor_milli"])
