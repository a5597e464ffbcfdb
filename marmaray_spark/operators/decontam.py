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
    # the doc's total distinct-gram count RIDES the exploded rows (one
    # extra int per row into a broadcast join that never shuffles), so
    # the per-doc totals need NO second shingle pass over the corpus
    # and NO hits-to-totals join — any_value folds it out of the same
    # aggregation (guide §2.4; the oracle SQL always spelled it this
    # way). A doc with zero overlap never reaches the report in either
    # form, so the result is identical.
    corpus_grams = corpus.select(F.col(id_col),
                                 F.size(grams).alias("__ng"),
                                 F.explode(grams).alias("g"))
    test_grams = test_set.select(F.explode(grams).alias("g")).distinct()
    return (corpus_grams.join(F.broadcast(test_grams), "g")
            .groupBy(id_col)
            .agg(F.any_value("__ng").alias("n_grams"),
                 F.count("*").cast("long").alias("n_overlap"))
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
    # same carried-total shape as decontaminate() above: no second
    # shingle pass, no totals join — any_value(n_grams) folds into the
    # one (id, eval_set) aggregation
    corpus_grams = corpus.select(F.col(id_col),
                                 F.size(grams).alias("__ng"),
                                 F.explode(grams).alias("g"))
    return (corpus_grams.join(F.broadcast(tagged), "g")
            .groupBy(id_col, "eval_set")
            .agg(F.any_value("__ng").alias("n_grams"),
                 F.count("*").cast("long").alias("n_overlap"))
            .withColumn("overlap_bps",
                        F.expr("CAST(n_overlap * 10000 "
                               "div greatest(n_grams, 1) AS INT)"))
            .withColumn("contaminated",
                        F.col("overlap_bps") >= contaminated_bps)
            .select(id_col, "eval_set", "n_grams", "n_overlap",
                    "overlap_bps", "contaminated"))


def maintain_decontamination_report(base, report, metadata,
                                    eval_sets: dict[str, "DataFrame"], *,
                                    id_col: str = "doc_id",
                                    words_col: str = "w",
                                    n: int = 5,
                                    contaminated_bps: int = 2000,
                                    checkpoint_key: str =
                                    "decontam.last_commit",
                                    max_commits: int | None = None) -> int:
    """Keep a contamination report table in sync with an ingesting
    corpus table — the maintained-structure pattern (operators/rollup.py
    aggregates, operators/annindex.py similarity) applied to hygiene:
    each maintenance run decontaminates ONLY the commits since the last
    checkpoint, so continuous ingest never rescans the corpus.

    ``base``: the corpus TableSink (rows must carry ``words_col``);
    ``report``: a TableSink keyed by a single ``report_key`` column —
    this function derives it as ``id:eval_set`` (the report is
    per-(doc, set) and TableSink keys are single-column). Returns the
    number of report rows (re)written.

    Correctness across updates: a changed document whose overlap
    DISAPPEARED must leave the report (zero-overlap rows are omitted by
    design), and documents dropped by an INSERT_OVERWRITE take their
    rows with them — affected ids are the union of after-image ids and
    the pre-image ids from each commit's ``removes`` manifest; stale
    rows are rewritten out exactly like annindex's stale keys. Replay
    after a crash re-derives the same rows (idempotent). The
    drain/stale/checkpoint mechanics live in
    ``maintained.maintain_sparse_report`` (one copy, shared with the
    semantic maintainer below)."""
    from marmaray_spark.operators.maintained import maintain_sparse_report

    def report_fn(live):
        return (decontaminate_many(live, eval_sets, id_col=id_col,
                                   words_col=words_col, n=n,
                                   contaminated_bps=contaminated_bps)
                .withColumn("report_key",
                            F.concat_ws(":", F.col(id_col).cast("string"),
                                        "eval_set")))

    return maintain_sparse_report(base, report, metadata,
                                  [id_col, words_col], id_col, report_fn,
                                  checkpoint_key, max_commits)


def semantic_decontamination(corpus_emb: DataFrame, eval_emb: DataFrame,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold_dot_q: int = 400_000) -> DataFrame:
    """EMBEDDING-space decontamination: flag corpus items whose maximum
    cosine against ANY eval item reaches ``threshold_dot_q`` (integer
    milli-quantized dot over L2-normalized vectors, QUANT_SCALE^2 units
    — 400_000 ~ cosine 0.4). The semantic complement of the n-gram
    sweep above: a paraphrased or translated benchmark answer shares few
    exact n-grams but embeds next to the original (the reported gap in
    several public contamination studies; same embedding-similarity
    framing as SemDeDup, Abbas et al. 2023, pointed at eval sets
    instead of the corpus itself).

    Output: (id, n_hits, max_dot_q, contaminated) — only corpus items
    with at least one eval dot >= threshold appear (the n-gram report's
    only-overlapping-rows contract); ``n_hits`` counts eval items over
    threshold, ``max_dot_q`` the strongest match, ``contaminated``
    always true in this shape (kept for schema symmetry with the n-gram
    report and for callers that lower the cut after the fact).

    100 TB posture: eval sets are benchmark-sized (<< corpus), so the
    eval side collects ONCE and broadcasts as a numpy int64 matrix; the
    corpus NEVER SHUFFLES — one scan, one Arrow kernel computing the
    (batch x eval) integer matmul, no groupBy (the per-row max/count
    folds inside the kernel). The kernel is the ONLY path, for both
    scale and correctness reasons: numpy int64 matmul is exact (so the
    DuckDB oracle mirrors it bit-for-bit), it is the fast shape at any
    eval size, and the tempting pure-expression alternative — a 1-row
    attach_scalar of collect_list'ed eval vectors consumed by a nested
    transform/zip_with — trips a Spark 4.1 planner bug where the inner
    lambda's stream-side reference (__cv) is bound against the
    broadcast side ([INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND], reproduced on
    LocalRelation inputs), besides paying interpreted-HOF cost linear
    in eval count per row.
    """
    from marmaray_spark.operators.similarity import quantize

    import numpy as np
    ev = eval_emb.select(quantize(vec_col).alias("__ev"))
    c = corpus_emb.select(F.col(id_col), quantize(vec_col).alias("__cv"))
    rows = [r for r in ev.collect() if r["__ev"] is not None]
    # drop ragged eval vectors too — a single wrong-dim row would turn
    # the (E, dim) matrix into a dtype=object array and poison the matmul
    if rows:
        dim_e = len(rows[0]["__ev"])
        rows = [r for r in rows if len(r["__ev"]) == dim_e]
    if not rows:
        return (c.select(id_col).limit(0)
                .withColumn("n_hits", F.lit(0))
                .withColumn("max_dot_q", F.lit(0).cast("long"))
                .withColumn("contaminated", F.lit(True)))
    E = np.asarray([r["__ev"] for r in rows], dtype=np.int64)  # (E, dim)
    # NULL / wrong-dim corpus embeddings are SKIPPED, matching the n-gram
    # report's semantics (explode drops null word arrays) — without the
    # filter one bad row raises inside the kernel and fails the whole
    # job instead of one document's decontamination
    c = c.filter(F.col("__cv").isNotNull()
                 & (F.size("__cv") == E.shape[1]))
    spark = corpus_emb.sparkSession
    e_bc = spark.sparkContext.broadcast(E)
    id_type = corpus_emb.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_type}, n_hits int, max_dot_q long, "
                  f"contaminated boolean")

    def kernel(batches, _bc=e_bc, _thr=threshold_dot_q):
        import pandas as pd
        Em = _bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.asarray([np.asarray(v, dtype=np.int64)
                            for v in pdf["__cv"]])          # (B, dim)
            D = C @ Em.T                                     # (B, E) int64
            hits = (D >= _thr)
            n_hits = hits.sum(axis=1).astype(np.int32)
            keep = n_hits > 0
            if not keep.any():
                continue
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[keep],
                "n_hits": n_hits[keep],
                "max_dot_q": D.max(axis=1)[keep],
                "contaminated": True})

    return c.mapInPandas(kernel, out_schema)


def maintain_semantic_decontamination(base, report, metadata,
                                      eval_emb: DataFrame, *,
                                      id_col: str = "vec_id",
                                      vec_col: str = "embedding",
                                      threshold_dot_q: int = 400_000,
                                      checkpoint_key: str =
                                      "semdecontam.last_commit",
                                      max_commits: int | None = None) -> int:
    """Semantic complement of :func:`maintain_decontamination_report`:
    keep an embedding-space contamination report in sync with an
    ingesting corpus-embedding table. Each maintenance run probes ONLY
    the vectors changed since the last checkpoint against the broadcast
    eval matrix — at 100 TB the corpus embedding table never rescans;
    cost follows ingest volume, exactly the incdedup/annindex story
    applied to :func:`semantic_decontamination`.

    ``base``: a TableSink whose rows carry ``id_col`` + ``vec_col``;
    ``report``: a TableSink keyed by ``report_key`` (derived as the
    string id — the semantic report is one row per contaminated
    vector). An update that moves a vector away from every eval item
    takes its row OUT of the report (sparse-report stale handling);
    docs dropped by INSERT_OVERWRITE leave with their rows; crash
    replay is idempotent. Returns report rows (re)written."""
    from marmaray_spark.operators.maintained import maintain_sparse_report

    def report_fn(live):
        return (semantic_decontamination(live, eval_emb, id_col=id_col,
                                         vec_col=vec_col,
                                         threshold_dot_q=threshold_dot_q)
                .withColumn("report_key", F.col(id_col).cast("string")))

    return maintain_sparse_report(base, report, metadata,
                                  [id_col, vec_col], id_col, report_fn,
                                  checkpoint_key, max_commits)
