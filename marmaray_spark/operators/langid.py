"""Trained language identification — the fastText-shaped upgrade over
the stopword vote (Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification"; the same architecture behind the public fastText
langid models CCNet uses).

``operators/text.py lang_id`` (stopword vote) stays as the ZERO-TRAINING
fallback; its structural weakness is real multilingual corpora: short
documents, content-word-only text (titles, code comments, product
names), and any language whose function words are not in the four
hand-curated lists score 0 everywhere and fall to 'und'. Character
n-grams carry the orthographic signal those docs still have — this
module trains a multiclass (softmax) linear model over hashed char
trigrams and scores in one Arrow pass.

Scale design (same contract as operators/classifier.py, which pins the
binary machinery this generalizes):

- FEATURES are expression-only hashed char n-grams (xxhash64 % dim,
  JVM-side): no vocabulary shuffle, train/score bucket agreement by
  construction. The normalized string materializes as its own column
  BEFORE the transform — substring()-inside-a-lambda re-evaluates the
  child per element in interpreted HOF evaluation, so an inline
  regexp_replace would go O(len^2) per row (the measured top_ngram_bps
  trap).
- TRAINING is full-batch softmax regression: one mapInPandas pass per
  iteration emitting ONE partial-gradient row per PARTITION (batches
  pre-reduced in the kernel — the classifier.py r7 fix), each row
  L x (dim+1) doubles. Train on a labeled SAMPLE; languages are fixed at
  train time.
- SCORING is one Arrow kernel pass with the (L, dim+1) weight matrix
  broadcast; integer milli-margins; optional 'und' fallback below a
  margin threshold.

Reference: uber/marmaray has no text surface; beyond-reference
LLM-pipeline tier per the build brief.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

DEFAULT_DIM = 1 << 15


def with_char_ngram_features(df: DataFrame, text_col: str,
                             out_col: str = "f", n: int = 3,
                             dim: int = DEFAULT_DIM) -> DataFrame:
    """Attach ``array<int>`` hashed character-n-gram ids: lowercase,
    whitespace-collapsed, space-padded text sliced into every n-char
    window, each ``pmod(xxhash64(gram), dim)``. Pure expressions.

    The normalized string and its char array are materialized as their
    own projections first: referencing an inline regexp_replace from
    inside a lambda re-evaluates it PER ELEMENT under interpreted HOF
    evaluation (higher-order functions never reach codegen) — the
    measured O(len^2) trap documented at text.top_ngram_bps."""
    norm = (f"concat(' ', regexp_replace(lower(coalesce({text_col}, '')), "
            f"'\\\\s+', ' '), ' ')")
    d = (df.withColumn("__ln", F.expr(norm))
           .withColumn("__ca", F.expr("split(__ln, '')")))
    # n-gram windows as zip_with over n shifted slices of the char array
    # (the word-shingle cure from text.py): substring(__ln, i, n) inside
    # the transform walks the UTF8String from byte 0 for every position
    # i — O(len^2) per document, seconds per 100KB doc — while the
    # sliced zip_with is one linear pass. concat of n single-char slices
    # equals substring's n-char window, so hashed ids are unchanged.
    m = f"(size(__ca) - {n - 1})"
    win = f"slice(__ca, {n}, {m})"
    for j in range(n - 1, 0, -1):
        win = f"zip_with(slice(__ca, {j}, {m}), {win}, (x, y) -> concat(x, y))"
    grams = (f"IF(size(__ca) < {n}, array(), "
             f"transform({win}, g -> int(pmod(xxhash64(g), {dim}))))")
    return d.withColumn(out_col, F.expr(grams)).drop("__ln", "__ca")


def _margins(feats, W: np.ndarray):
    """(L, rows) margin matrix for one Arrow batch of sparse feature-id
    rows; feature value 1/n_feats, bias in the last column of W."""
    L, width = W.shape
    dim = width - 1
    lens = np.fromiter((len(f) for f in feats), dtype=np.int64,
                       count=len(feats))
    nz = lens > 0
    flat = (np.concatenate([np.asarray(f, dtype=np.int64) for f in feats])
            if lens.sum() else np.empty(0, dtype=np.int64))
    inv = np.zeros(len(feats))
    inv[nz] = 1.0 / lens[nz]
    margins = np.repeat(W[:, dim][:, None], len(feats), axis=1)
    if flat.size:
        # segment sums per class via reduceat over the NONZERO rows'
        # offsets (strictly increasing, so no reduceat equal-index or
        # past-the-end artifacts). Peak temp is ONE (nnz,) gather per
        # class — the old (L, nnz) gather + cumsum + concat form held
        # three such matrices at once, ~10 GB per task at L=20 and a
        # 10k-row batch of 2KB docs.
        nz_lens = lens[nz]
        offsets = np.zeros(len(nz_lens), dtype=np.int64)
        np.cumsum(nz_lens[:-1], out=offsets[1:])
        sums = np.zeros((L, len(feats)))
        for cls in range(L):
            sums[cls, nz] = np.add.reduceat(W[cls, flat], offsets)
        margins = margins + sums * inv[None, :]
    return margins, flat, lens, inv


def _softmax(m: np.ndarray) -> np.ndarray:
    z = m - m.max(axis=0, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=0, keepdims=True)


def _collect_multiclass_partials(data: DataFrame, w_bc, idx_bc,
                                 L: int, dim: int) -> list:
    """One multiclass gradient pass: sum per-Arrow-batch partials INSIDE
    each partition and emit a single (grad, loss, n) row per non-empty
    partition — the same map-side-combine contract as
    ``classifier._collect_gradient_partials`` (the r7 'weak' fix), kept
    as a named function so the one-row-per-partition contract is
    test-pinned here too. Driver traffic per iteration is
    O(partitions x L x dim), independent of batch count."""
    out_schema = StructType([
        StructField("grad", ArrayType(DoubleType()), False),
        StructField("loss", DoubleType(), False),
        StructField("n", LongType(), False)])

    def kernel(batches, _bc=w_bc, _idx=idx_bc, _L=L, _dim=dim):
        import pandas as pd
        grad, loss, n = None, 0.0, 0
        for b in batches:
            if not len(b):
                continue
            Wv = _bc.value
            margins, flat, lens, inv = _margins(b["f"], Wv)
            y = np.fromiter((_idx.value[v] for v in b["y"]),
                            dtype=np.int64, count=len(b))
            P = _softmax(margins)
            G = P.copy()
            G[y, np.arange(len(b))] -= 1.0     # dCE/dmargin, (L, rows)
            g = np.zeros((_L, _dim + 1))
            if flat.size:
                scaled = G * inv[None, :]       # (L, rows)
                for cls in range(_L):
                    # one (nnz,) temp per class, not (L, nnz) at once
                    np.add.at(g[cls], flat,
                              np.repeat(scaled[cls], lens))
            g[:, _dim] = G.sum(axis=1)
            grad = g if grad is None else grad + g
            # stable CE: logsumexp - margin_y
            z = margins - margins.max(axis=0, keepdims=True)
            lse = (np.log(np.exp(z).sum(axis=0))
                   + margins.max(axis=0))
            loss += float((lse - margins[y, np.arange(len(b))]).sum())
            n += len(b)
        if n:
            yield pd.DataFrame({"grad": [grad.ravel().tolist()],
                                "loss": [loss], "n": [n]})

    return data.mapInPandas(kernel, out_schema).collect()


def train_language_id(labeled: DataFrame, feats_col: str, lang_col: str,
                      dim: int = DEFAULT_DIM, iters: int = 40,
                      lr: float = 0.5, l2: float = 1e-6):
    """Full-batch multiclass softmax regression over hashed char-n-gram
    features. ``labeled`` needs ``feats_col`` (``array<int>`` from
    :func:`with_char_ngram_features`) and ``lang_col`` (string label).
    Returns ``(langs, W, history)``: ``langs`` the sorted label list,
    ``W`` a float64 ``(len(langs), dim+1)`` matrix (bias last column),
    ``history`` mean cross-entropy per iteration. Per-coordinate ADAGRAD
    for the same reason as the binary trainer (mean-normalized feature
    gradients vs O(1) bias gradients share no scalar rate). One partial
    row per partition per iteration (L x (dim+1) doubles)."""
    from marmaray_spark.operators.classifier import adagrad_step

    spark = labeled.sparkSession
    langs = sorted(r[0] for r in
                   labeled.select(lang_col).distinct().collect())
    idx = {g: i for i, g in enumerate(langs)}
    L = len(langs)
    data = labeled.select(F.col(feats_col).alias("f"),
                          F.col(lang_col).alias("y"))

    W = np.zeros((L, dim + 1))
    gsq = np.zeros((L, dim + 1))
    history: list[float] = []
    idx_bc = spark.sparkContext.broadcast(idx)
    for _ in range(iters):
        w_bc = spark.sparkContext.broadcast(W)
        parts = _collect_multiclass_partials(data, w_bc, idx_bc, L, dim)
        n = sum(r["n"] for r in parts) or 1
        grad = np.zeros((L, dim + 1))
        loss = 0.0
        for r in parts:
            grad += np.asarray(r["grad"]).reshape(L, dim + 1)
            loss += r["loss"]
        W = adagrad_step(W, gsq, grad, n, lr, l2)
        history.append(loss / n)
        w_bc.destroy()
    idx_bc.destroy()
    return langs, W, history


def score_language_id(df: DataFrame, feats_col: str, langs: list[str],
                      W, out_col: str = "lang_pred",
                      margin_col: str = "lang_margin_milli",
                      min_margin_milli: int | None = None) -> DataFrame:
    """Attach the argmax language and its integer milli-margin (the
    winning class's raw margin x1000 — compare margins, not
    probabilities, so thresholds are float-order-proof). One Arrow pass,
    weights broadcast. ``min_margin_milli``: below it the prediction
    falls back to ``'und'`` — the same undetermined contract as the
    stopword vote, for callers that prefer silence to a weak guess."""
    spark = df.sparkSession
    Wm = np.asarray(W, dtype=np.float64)
    w_bc = spark.sparkContext.broadcast(Wm)
    langs_bc = spark.sparkContext.broadcast(list(langs))
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, StringType(), False),
           StructField(margin_col, LongType(), False)])
    cols = [f.name for f in df.schema.fields]

    def kernel(batches, _bc=w_bc, _lb=langs_bc):
        for b in batches:
            if not len(b):
                continue
            margins, _, _, _ = _margins(b[feats_col], _bc.value)
            best = margins.argmax(axis=0)
            milli = np.rint(margins.max(axis=0) * 1000.0).astype(np.int64)
            names = np.asarray(_lb.value, dtype=object)[best]
            if min_margin_milli is not None:
                names = np.where(milli >= min_margin_milli, names, "und")
            b = b[cols].copy()
            b[out_col] = names
            b[margin_col] = milli
            yield b

    return df.mapInPandas(kernel, out_schema)
