"""Trainable quality classifier (operators/classifier.py) and the
deterministic shuffle-shard training-output writer (operators/shard.py)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from marmaray_spark.operators.classifier import (hashed_features,
                                                 score_quality,
                                                 train_quality_classifier)
from marmaray_spark.operators.shard import (shard_assignments,
                                            write_training_shards)

GOOD = ("the quick brown fox jumps over the lazy dog and then it runs "
        "home to sleep because the day was long and the sun was warm").split()
BAD = ("zx9 qq7 m2k vv0 j8p w3n r5t y1u o6i a4s d0f g7h k2l c9v b5n "
       "x3z p8q e1w t6y u0i l4o").split()


def _labeled_docs(spark, n=400, seed=7):
    """Synthetic separable corpus: label-1 docs draw from a natural-word
    vocabulary, label-0 docs from junk tokens, with 10% vocabulary bleed
    so the margin is learned, not memorized."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        label = i % 2
        main, other = (GOOD, BAD) if label else (BAD, GOOD)
        k = int(rng.integers(8, 30))
        words = [str(rng.choice(other if rng.random() < 0.1 else main))
                 for _ in range(k)]
        rows.append((i, words, label))
    return spark.createDataFrame(rows, "doc_id long, w array<string>, y int")


def test_hashed_features_shape_and_range(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["solo"]), (3, []), (4, ["", "x", ""])],
        "id long, w array<string>")
    out = {r["id"]: r["f"] for r in
           df.select("id", hashed_features("w", dim=64).alias("f")).collect()}
    assert len(out[1]) == 3 + 2          # unigrams + adjacent bigrams
    assert len(out[2]) == 1              # no bigram from one token
    assert out[3] == []
    assert len(out[4]) == 1              # empties dropped before hashing
    assert all(0 <= v < 64 for vs in out.values() for v in vs)


def test_classifier_learns_separable_labels(spark):
    labeled = _labeled_docs(spark).withColumn(
        "f", hashed_features("w", dim=1 << 12))
    train = labeled.filter(F.col("doc_id") % 4 != 3).persist()
    held = labeled.filter(F.col("doc_id") % 4 == 3)
    try:
        w, hist = train_quality_classifier(
            train, "f", "y", dim=1 << 12, iters=30)
        assert hist[-1] < hist[0] * 0.5          # loss actually fell
        scored = score_quality(held, "f", w)
        rows = scored.select("y", "quality_logit_milli").collect()
        acc = (sum(1 for r in rows
                   if (r["quality_logit_milli"] > 0) == (r["y"] == 1))
               / len(rows))
        assert acc >= 0.95
    finally:
        train.unpersist()


def test_gradient_pass_emits_one_row_per_partition(spark):
    """r7 verdict fix: the training reduce must be pre-combined inside
    each partition — exactly one (grad, loss, n) row per non-empty
    partition reaches the driver, regardless of how many Arrow batches
    the partition splits into (driver traffic O(partitions × dim), not
    O(batches × dim); at dim=2^17 that is ~MBs vs ~GBs per iteration on
    a 10M-doc sample). The partition partials must also sum to the same
    totals as a per-batch reduce."""
    import numpy as np

    from marmaray_spark.operators.classifier import (
        _batch_stats, _collect_gradient_partials)

    dim = 1 << 10
    labeled = (_labeled_docs(spark, n=200)
               .withColumn("f", hashed_features("w", dim=dim)))
    data = labeled.select(F.col("f"), F.col("y").cast("double").alias("y")) \
        .repartition(4)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        w_bc = spark.sparkContext.broadcast(np.zeros(dim + 1))
        parts = _collect_gradient_partials(data, w_bc, dim)
        # 200 rows / 4 partitions at <=8-row batches = ~7 batches each;
        # the partial count must follow PARTITIONS, not batches
        assert len(parts) == 4
        assert sum(r["n"] for r in parts) == 200
        # partials sum to the full-dataset gradient (float-exact here:
        # one partition, one batch, same accumulation order)
        pdf = data.toPandas()
        _, want_g, want_l = _batch_stats(
            pdf["f"], pdf["y"].to_numpy(), np.zeros(dim + 1), dim)
        got_g = np.sum([np.asarray(r["grad"]) for r in parts], axis=0)
        got_l = sum(r["loss"] for r in parts)
        assert np.allclose(got_g, want_g, atol=1e-9)
        assert abs(got_l - want_l) < 1e-9
        w_bc.destroy()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                           old)


def test_score_quality_deterministic_and_empty_doc_at_bias(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, [])], "id long, w array<string>") \
        .withColumn("f", hashed_features("w", dim=256))
    w = np.zeros(257)
    w[256] = 1.25                         # bias only
    a = {r["id"]: r["quality_logit_milli"]
         for r in score_quality(df, "f", w).collect()}
    b = {r["id"]: r["quality_logit_milli"]
         for r in score_quality(df.repartition(5), "f", w).collect()}
    assert a == b
    assert a[2] == 1250                   # empty doc scores the bias


def test_batch_stats_empty_rows_anywhere():
    """Trailing/leading empty feature rows must not corrupt margins (the
    reduceat trap the cumsum-gather implementation avoids)."""
    import pandas as pd

    from marmaray_spark.operators.classifier import _batch_stats
    w = np.arange(11, dtype=np.float64)   # dim=10, bias w[10]=10
    feats = pd.Series([[], [1, 2], [], [3], []])
    margins, grad, loss = _batch_stats(
        feats, np.array([0.0, 1.0, 0.0, 1.0, 0.0]), w, 10)
    exp = np.array([10.0, 10 + (1 + 2) / 2, 10.0, 13.0, 10.0])
    assert np.allclose(margins, exp)
    assert np.isfinite(loss) and grad.shape == (11,)


def test_shard_assignments_deterministic_and_budgeted(spark, documents):
    docs = documents.select("doc_id", "text").withColumn(
        "n_tok", F.size(F.split("text", r"\s+")))
    a = shard_assignments(docs, "doc_id", "n_tok", budget_tokens=2000)
    b = shard_assignments(docs.repartition(13), "doc_id", "n_tok",
                          budget_tokens=2000)
    ra = sorted((r["doc_id"], r["shard"], r["start_tokens"])
                for r in a.collect())
    rb = sorted((r["doc_id"], r["shard"], r["start_tokens"])
                for r in b.collect())
    assert ra == rb                       # partitioning-proof
    # global prefix-sum is consistent: sorted by start, tokens chain
    rows = sorted(a.select("sort_key", "start_tokens", "n_tok", "shard")
                  .collect(), key=lambda r: r["sort_key"])
    pos = 0
    for r in rows:
        assert r["start_tokens"] == pos
        assert r["shard"] == pos // 2000
        pos += r["n_tok"]
    # every shard except possibly the last holds ≈budget tokens
    per = {}
    for r in rows:
        per[r["shard"]] = per.get(r["shard"], 0) + r["n_tok"]
    max_doc = max(r["n_tok"] for r in rows)
    for s, t in per.items():
        if s != max(per):
            assert t <= 2000 + max_doc


def test_write_training_shards_layout_and_manifest(spark, documents, tmp_path):
    docs = documents.select("doc_id", "text").withColumn(
        "n_tok", F.size(F.split("text", r"\s+")))
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, "doc_id", "n_tok",
                                     budget_tokens=3000)
    assert manifest["total_docs"] == docs.count()
    on_disk = json.load(open(os.path.join(out, "manifest.json")))
    assert on_disk == manifest
    back = spark.read.parquet(os.path.join(out, "data"))
    assert back.count() == manifest["total_docs"]
    per = {r["shard"]: (r["docs"], r["tokens"])
           for r in back.groupBy("shard")
           .agg(F.count(F.lit(1)).alias("docs"),
                F.sum("n_tok").alias("tokens")).collect()}
    assert per == {s["shard"]: (s["docs"], s["tokens"])
                   for s in manifest["shards"]}
    # one data file per shard (deterministic output layout), and rows
    # INSIDE each file are in sort_key order — the byte-determinism
    # claim. Guards the sortWithinPartitions prefix: without 'shard'
    # leading it, the partitionBy writer injects its own non-stable sort
    # and the pinned order silently evaporates.
    import pyarrow.parquet as pq
    for s in manifest["shards"]:
        d = os.path.join(out, "data", f"shard={s['shard']}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1
        keys = pq.read_table(os.path.join(d, files[0]),
                             columns=["sort_key"])["sort_key"].to_pylist()
        assert keys == sorted(keys)


def test_dup_line_stats_count_and_char_mass(spark):
    from marmaray_spark.operators.text import dup_line_stats
    df = spark.createDataFrame(
        [(1, ["aaaa", "b", "aaaa", "aaaa", "c"]),   # one line 3x
         (2, ["x", "y", "z"]),                      # no repeats
         (3, [])],
        "id long, lines array<string>")
    out = {r["id"]: (r["s"]["dup_line_bps"], r["s"]["dup_line_char_bps"])
           for r in df.select("id",
                              dup_line_stats("lines").alias("s")).collect()}
    # doc 1: 2 repeat occurrences of 5 lines = 4000 bps; repeated chars
    # = 2*4 of 14 total = 5714 bps
    assert out[1] == (4000, 2 * 4 * 10000 // 14)
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)


def test_temperature_mix_upsamples_rare_groups(spark):
    from marmaray_spark.operators.text import temperature_mix
    rows = [(i, "big" if i < 9000 else "rare") for i in range(10000)]
    df = spark.createDataFrame(rows, "id long, g string")
    kept = temperature_mix(df, "id", "g", keep_bps=2000).collect()
    n = {"big": 0, "rare": 0}
    for r in kept:
        n[r["g"]] += 1
    # exact expected rates: s_big=94868, s_rare=31622, S=126490, N=10000
    # rate_big = 2000*10000*94868 // (126490*9000) = 1666 bps
    # rate_rare = 2000*10000*31622 // (126490*1000) = 5000 bps
    assert 0.14 < n["big"] / 9000 < 0.19          # ~16.7%, was 20% flat
    assert 0.45 < n["rare"] / 1000 < 0.55         # ~50%: 3x upsampled
    # deterministic under repartitioning
    kept2 = temperature_mix(df.repartition(7), "id", "g",
                            keep_bps=2000).collect()
    assert sorted(r["id"] for r in kept) == sorted(r["id"] for r in kept2)


def test_training_data_prep_example_end_to_end(spark, sf_dir, tmp_path):
    """The examples/training_data_prep.py funnel: every stage removes or
    rebalances something, the shard output is complete and readable, and
    the classifier actually learned (falling loss)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from training_data_prep import prepare
    report = prepare(spark, sf_dir, str(tmp_path / "out"),
                     classifier_dim=1 << 12, classifier_iters=8)
    m = report["manifest"]
    assert report["after_dedup"] < report["input_docs"]
    assert report["after_classifier"] <= report["after_dedup"]
    assert 0 < report["after_mix"] < report["after_classifier"]
    assert m["total_docs"] == report["after_mix"]
    assert m["n_shards"] >= 1
    assert report["final_loss"] < 0.6931                # below coin-flip
    back = spark.read.parquet(str(tmp_path / "out" / "data"))
    assert back.count() == m["total_docs"]


def test_pr_report_matches_brute_force(spark):
    from marmaray_spark.operators.classifier import pr_report
    rng = np.random.default_rng(17)
    rows = [(int(l), int(s)) for l, s in zip(
        rng.integers(0, 2, 300),
        rng.integers(-5000, 5000, 300))]
    df = spark.createDataFrame(rows, "y int, quality_logit_milli long")
    rep = pr_report(df, "y").collect()
    tot_pos = sum(r[0] for r in rows)
    for r in rep:
        thr = r["threshold_milli"]
        kept = [(y, s) for y, s in rows if s >= thr]
        tp = sum(1 for y, _ in kept if y == 1)
        assert r["predicted_pos"] == len(kept)
        assert r["tp"] == tp and r["fp"] == len(kept) - tp
        assert r["fn"] == tot_pos - tp
        assert r["precision_bps"] == tp * 10000 // max(len(kept), 1)
        assert r["recall_bps"] == tp * 10000 // max(tot_pos, 1)
    # monotone: recall never increases as the threshold rises
    recalls = [r["recall_bps"] for r in rep]
    assert recalls == sorted(recalls, reverse=True)


def test_pr_report_single_class_and_empty_shards(spark, tmp_path):
    """Degenerate inputs stay defined: an all-positive eval set yields
    precision 10000 everywhere; an empty corpus shards to an empty
    manifest without crashing."""
    from marmaray_spark.operators.classifier import pr_report
    df = spark.createDataFrame([(1, 100), (1, -50), (1, 300)],
                               "y int, quality_logit_milli long")
    rep = pr_report(df, "y").collect()
    assert all(r["precision_bps"] == 10000 and r["fp"] == 0 for r in rep)
    assert max(r["recall_bps"] for r in rep) == 10000

    from marmaray_spark.operators.shard import write_training_shards
    empty = spark.createDataFrame([], "doc_id long, n_tok int")
    m = write_training_shards(empty, str(tmp_path / "es"), "doc_id",
                              "n_tok", budget_tokens=100)
    assert m["n_shards"] == 0 and m["total_docs"] == 0


def test_classifier_scoring_runs_in_streaming_unchanged(spark, tmp_path):
    """score_quality is one stateless mapInPandas with broadcast weights,
    so the SAME call scores a Structured Streaming frame with no code
    changes — train offline, score the live feed (the batch/stream
    unification contract corpus_hygiene established). Stream scores must
    equal the batch scores bit-for-bit (per-row fixed-order sums)."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("w", T.ArrayType(T.StringType()))])
    rows = [(1, ["the", "quick", "fox"]), (2, ["zz9", "qq7"]), (3, [])]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, schema).write.parquet(str(src / "b0"))

    rng = np.random.default_rng(3)
    w = rng.normal(size=257)
    feats = hashed_features("w", dim=256)

    batch = score_quality(
        spark.read.schema(schema).parquet(str(src) + "/*")
        .withColumn("f", feats), "f", w)
    expected = {r["doc_id"]: r["quality_logit_milli"]
                for r in batch.collect()}

    stream = score_quality(
        spark.readStream.schema(schema).parquet(str(src) + "/*")
        .withColumn("f", feats), "f", w)
    out = tmp_path / "out"
    q = (stream.writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r["quality_logit_milli"]
           for r in spark.read.parquet(str(out)).collect()}
    assert got == expected and len(got) == 3


def test_batch_stats_property_matches_naive_loop():
    """Hypothesis: the vectorized margins/gradient/loss equal a per-row
    reference implementation for arbitrary sparse batches (incl. empty
    rows, repeated feature ids, all-empty batches). Pure numpy — no
    Spark."""
    import math

    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from marmaray_spark.operators.classifier import _batch_stats

    dim = 16
    row = st.lists(st.integers(0, dim - 1), min_size=0, max_size=6)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(row, st.integers(0, 1)), min_size=1,
                    max_size=8),
           st.integers(0, 2**31 - 1))
    def check(rows, seed):
        rng = np.random.default_rng(seed)
        w = rng.normal(size=dim + 1)
        feats = pd.Series([r[0] for r in rows])
        ys = np.array([float(r[1]) for r in rows])
        margins, grad, loss = _batch_stats(feats, ys, w, dim)
        exp_grad = np.zeros(dim + 1)
        exp_loss = 0.0
        for (f, y), m in zip(rows, margins):
            exp_m = w[dim] + (sum(w[i] for i in f) / len(f) if f else 0.0)
            assert abs(m - exp_m) < 1e-9
            p = 1.0 / (1.0 + math.exp(-exp_m))
            g = p - y
            for i in f:
                exp_grad[i] += g / len(f)
            exp_grad[dim] += g
            exp_loss += -(y * math.log(p) + (1 - y) * math.log(1 - p))
        assert np.allclose(grad, exp_grad, atol=1e-9)
        assert abs(loss - exp_loss) < 1e-6

    check()


def test_temperature_mix_keeps_null_group_rows(spark):
    """A NULL group (unidentified language) is a real group: its rows
    must be SAMPLED at the computed rate, not silently deleted by a
    null-dropping equi-join."""
    from marmaray_spark.operators.text import temperature_mix
    rows = [(i, "en" if i < 800 else None) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, g string")
    kept = temperature_mix(df, "id", "g", keep_bps=5000).collect()
    n_null = sum(1 for r in kept if r["g"] is None)
    # null group: 200 rows, sqrt-share upsampled -> rate well above 0
    assert n_null > 50
    assert any(r["g"] == "en" for r in kept)


def test_surprisal_buckets_keeps_null_group(spark):
    from marmaray_spark.operators.lm import surprisal_buckets
    df = spark.createDataFrame(
        [(None, 1, -100), (None, 2, -200), (None, 3, -300),
         ("en", 4, -50)],
        "lang string, doc_id long, lm_logp_milli long")
    out = {r["doc_id"]: r["ppl_bucket"]
           for r in surprisal_buckets(df, "lang").collect()}
    assert len(out) == 4                       # nothing vanished
    assert out[1] == "head" and out[3] == "tail" and out[4] == "head"


def test_shard_assignments_rejects_bad_budget(spark, documents):
    docs = documents.select("doc_id").withColumn("n", F.lit(1))
    with pytest.raises(ValueError):
        shard_assignments(docs, "doc_id", "n", budget_tokens=0)


def test_maintained_quality_scores_twin(spark, tmp_path):
    """Classifier scoring as a maintained twin: after every tick the
    scored table equals a from-scratch scoring of the whole base, an
    update re-scores exactly one row, and advancing with DIFFERENT
    weights is refused (a mixed-weights score column is poisoned)."""
    import numpy as np
    import pytest as _pytest

    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.classifier import (hashed_features,
                                                     maintain_quality_scores,
                                                     score_quality,
                                                     weights_digest)
    from marmaray_spark.sinks.table import TableSink, WriteOp

    dim = 64
    rng = np.random.default_rng(7)
    w = rng.normal(size=dim + 1)

    base = TableSink(spark, tmp_path / "docs", record_key_field="doc_id")
    scored = TableSink(spark, tmp_path / "scores",
                       record_key_field="doc_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    def frame(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def full_scores():
        feats = base.read().select(
            "doc_id", hashed_features("split(text, '\\\\s+')",
                                      dim=dim).alias("__f"))
        return {r["doc_id"]: r["quality_logit_milli"]
                for r in score_quality(feats, "__f", w).collect()}

    base.write(frame([(1, "a fine document with words"),
                      (2, "spam spam spam spam"),
                      (3, "another ordinary text")]), WriteOp.INSERT)
    assert maintain_quality_scores(base, scored, md, w, dim=dim) == 3
    got = {r["doc_id"]: r["quality_logit_milli"]
           for r in scored.read().collect()}
    assert got == full_scores() and len(got) == 3
    assert scored.log.latest_metadata()["weights_md5"] == weights_digest(w)

    # update one doc -> exactly one row re-scored, equality holds
    base.write(frame([(2, "now a perfectly reasonable sentence")]),
               WriteOp.UPSERT)
    assert maintain_quality_scores(base, scored, md, w, dim=dim) == 1
    got2 = {r["doc_id"]: r["quality_logit_milli"]
            for r in scored.read().collect()}
    assert got2 == full_scores() and got2[2] != got[2]

    # drifted weights refuse instead of silently mixing models
    base.write(frame([(4, "one more")]), WriteOp.UPSERT)
    with _pytest.raises(ValueError, match="different model"):
        maintain_quality_scores(base, scored, md, w + 1.0, dim=dim)
