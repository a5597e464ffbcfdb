"""Trained language ID (operators/langid.py): char-n-gram featurizer
contract, multiclass margin math vs brute force, and the headline claim
— the trained model beats the stopword vote on exactly the corpus shape
the vote structurally fails (short content-word-only docs)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from marmaray_spark.operators.langid import (_margins, _softmax,
                                             score_language_id,
                                             train_language_id,
                                             with_char_ngram_features)

# Content-word vocabularies with distinct orthography and NO function
# words — the stopword vote scores 0 on every list for docs drawn purely
# from these and falls to 'und'; char trigrams still carry the signal.
VOCAB = {
    "en": ["running", "jumping", "quickly", "house", "water", "bright",
           "garden", "window", "computer", "thinking", "yellow", "street",
           "mountain", "children", "morning", "weather", "playing"],
    "es": ["corriendo", "saltando", "rapidamente", "casa", "agua",
           "brillante", "jardin", "ventana", "computadora", "pensando",
           "amarillo", "calle", "montana", "ninos", "manana", "tiempo",
           "jugando"],
    "de": ["laufend", "springend", "schnell", "haus", "wasser", "hell",
           "garten", "fenster", "rechner", "denkend", "gelb", "strasse",
           "berg", "kinder", "morgen", "wetter", "spielend"],
    "fr": ["courant", "sautant", "rapidement", "maison", "eau", "brillant",
           "jardin", "fenetre", "ordinateur", "pensant", "jaune", "rue",
           "montagne", "enfants", "matin", "temps", "jouant"],
}
STOPW = {
    "en": ["the", "and", "of"], "es": ["el", "la", "que"],
    "de": ["der", "die", "und"], "fr": ["le", "les", "et"],
}


def _fixture(spark, n_per_lang=120, seed=11, with_stopwords_frac=0.3):
    """Deterministic multilingual corpus: most docs are content-word-only
    (the vote's blind spot); a fraction carries function words so the
    vote is not vacuously zero."""
    rng = np.random.default_rng(seed)
    rows = []
    i = 0
    for lang, vocab in VOCAB.items():
        for _ in range(n_per_lang):
            k = int(rng.integers(5, 12))
            toks = [vocab[int(rng.integers(len(vocab)))] for _ in range(k)]
            if rng.random() < with_stopwords_frac:
                toks = toks[:2] + STOPW[lang] + toks[2:]
            rows.append((i, lang, " ".join(toks)))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_char_ngram_features_contract(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, ""), (3, None), (4, "ab")],
        "id long, text string")
    out = {r["id"]: r["f"] for r in
           with_char_ngram_features(df, "text", dim=64).collect()}
    # ' hello world ' padded => len 13 => 11 trigrams
    assert len(out[1]) == 11
    assert all(0 <= v < 64 for v in out[1])
    # empty/null pad to '  ' (len 2 < 3) => empty, NOT a descending
    # sequence artifact
    assert out[2] == [] and out[3] == []
    assert len(out[4]) == 2          # ' ab ' => 2 trigrams


def test_margins_match_bruteforce():
    rng = np.random.default_rng(3)
    L, dim = 3, 32
    W = rng.normal(size=(L, dim + 1))
    feats = [list(rng.integers(0, dim, size=rng.integers(0, 6)))
             for _ in range(40)]
    import pandas as pd
    margins, _, _, _ = _margins(pd.Series(feats), W)
    for j, f in enumerate(feats):
        for cls in range(L):
            want = W[cls, dim] + (np.mean([W[cls, i] for i in f]) if f else 0)
            assert abs(margins[cls, j] - want) < 1e-9
    p = _softmax(margins)
    assert np.allclose(p.sum(axis=0), 1.0)


def test_trained_langid_beats_stopword_vote(spark):
    """The r7-verdict upgrade claim, pinned: on a corpus where most docs
    carry no function words, the trained char-trigram softmax model
    clearly beats the stopword vote on held-out docs."""
    from marmaray_spark.operators.text import lang_id, words

    dim = 1 << 12
    docs = with_char_ngram_features(_fixture(spark), "text", dim=dim)
    train = docs.filter(F.col("doc_id") % 4 != 3).persist()
    held = docs.filter(F.col("doc_id") % 4 == 3).persist()
    try:
        langs, W, hist = train_language_id(train, "f", "lang", dim=dim,
                                           iters=30)
        assert langs == sorted(VOCAB)
        assert hist[-1] < hist[0] * 0.5          # CE actually fell

        scored = score_language_id(held, "f", langs, W)
        rows = (scored.withColumn("w", words("text"))
                .withColumn("vote", lang_id("w"))
                .select("lang", "lang_pred", "vote").collect())
        n = len(rows)
        trained_acc = sum(r["lang_pred"] == r["lang"] for r in rows) / n
        vote_acc = sum(r["vote"] == r["lang"] for r in rows) / n
        # the vote only scores docs that happen to carry its function
        # words (~30% of the fixture); the trained model reads orthography
        assert vote_acc < 0.6
        assert trained_acc >= 0.9
        assert trained_acc > vote_acc + 0.25
    finally:
        train.unpersist()
        held.unpersist()


def test_score_language_id_deterministic_and_und_fallback(spark):
    dim = 1 << 10
    docs = with_char_ngram_features(_fixture(spark, n_per_lang=40),
                                    "text", dim=dim)
    langs, W, _ = train_language_id(docs, "f", "lang", dim=dim, iters=15)

    probe = with_char_ngram_features(
        spark.createDataFrame([(1, "zzqx9 qk7vv 0mxx"), (2, "")],
                              "doc_id long, text string"), "text", dim=dim)
    a = {r["doc_id"]: (r["lang_pred"], r["lang_margin_milli"]) for r in
         score_language_id(probe, "f", langs, W).collect()}
    b = {r["doc_id"]: (r["lang_pred"], r["lang_margin_milli"]) for r in
         score_language_id(probe.repartition(5), "f", langs, W).collect()}
    assert a == b                                 # partitioning-proof
    # a very high floor forces the undetermined fallback everywhere
    und = score_language_id(probe, "f", langs, W,
                            min_margin_milli=10_000_000)
    assert {r["lang_pred"] for r in und.collect()} == {"und"}


def test_multiclass_gradient_pass_emits_one_row_per_partition(spark):
    """Same contract as classifier._collect_gradient_partials (the r7
    'weak' fix): ONE (grad, loss, n) row per non-empty partition reaches
    the driver regardless of Arrow batch count, and the partition
    partials sum to the single-partition pass's totals."""
    from marmaray_spark.operators.langid import _collect_multiclass_partials

    dim = 1 << 8
    docs = _fixture(spark, n_per_lang=30)          # 120 rows, 4 langs
    feat = (with_char_ngram_features(docs, "text", dim=dim)
            .select(F.col("f"), F.col("lang").alias("y")))
    langs = sorted(VOCAB)
    idx = {g: i for i, g in enumerate(langs)}
    L = len(langs)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        idx_bc = spark.sparkContext.broadcast(idx)
        w_bc = spark.sparkContext.broadcast(np.zeros((L, dim + 1)))
        parts = _collect_multiclass_partials(feat.repartition(4), w_bc,
                                             idx_bc, L, dim)
        # 120 rows / 4 partitions at <=8-row batches = ~4 batches each;
        # the partial count must follow PARTITIONS, not batches
        assert len(parts) == 4
        assert sum(r["n"] for r in parts) == 120
        ref = _collect_multiclass_partials(feat.repartition(1), w_bc,
                                           idx_bc, L, dim)
        assert len(ref) == 1
        got = np.sum([np.asarray(r["grad"]) for r in parts], axis=0)
        want = np.asarray(ref[0]["grad"])
        assert np.allclose(got, want, atol=1e-9)
        assert abs(sum(r["loss"] for r in parts) - ref[0]["loss"]) < 1e-6
        w_bc.destroy()
        idx_bc.destroy()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                           old)
