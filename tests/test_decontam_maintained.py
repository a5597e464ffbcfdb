"""Incrementally-maintained decontamination report
(operators/decontam.py maintain_decontamination_report)."""

from __future__ import annotations

from pyspark.sql import functions as F

from marmaray_spark.metadata.manager import FileSystemMetadataManager
from marmaray_spark.operators.decontam import (decontaminate_many,
                                               maintain_decontamination_report)
from marmaray_spark.sinks.table import TableSink, WriteOp

EVAL_A = "alpha beta gamma delta epsilon zeta"
EVAL_B = "one two three four five six"


def _docs(spark, rows):
    return (spark.createDataFrame(rows, ["doc_id", "text"])
            .withColumn("w", F.split(F.trim(F.lower("text")), r"\s+")))


def _eval_sets(spark):
    return {"A": _docs(spark, [(100, EVAL_A)]),
            "B": _docs(spark, [(200, EVAL_B)])}


def _report_rows(report):
    return sorted((r["doc_id"], r["eval_set"], r["contaminated"])
                  for r in report.read().collect())


def test_maintained_report_tracks_ingest_update_and_overwrite(spark, tmp_path):
    base = TableSink(spark, tmp_path / "base", "doc_id")
    report = TableSink(spark, tmp_path / "rep", "report_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    ev = _eval_sets(spark)

    # batch 1: one doc overlapping A, one clean
    base.write(_docs(spark, [
        (1, EVAL_A + " eta theta"),
        (2, "quiet words overlapping nothing at all here ok")]),
        WriteOp.INSERT)
    n = maintain_decontamination_report(base, report, md, ev,
                                        n=5, contaminated_bps=2000)
    assert n == 1 and _report_rows(report) == [(1, "A", True)]

    # batch 2: doc 1 UPDATED to overlap B instead of A; doc 3 joins with A
    base.write(_docs(spark, [(1, EVAL_B + " seven eight")]), WriteOp.UPSERT)
    base.write(_docs(spark, [(3, EVAL_A + " iota kappa")]), WriteOp.INSERT)
    maintain_decontamination_report(base, report, md, ev,
                                    n=5, contaminated_bps=2000)
    assert _report_rows(report) == [(1, "B", True), (3, "A", True)]

    # matches a from-scratch batch run over the current base
    want = sorted((r["doc_id"], r["eval_set"], r["contaminated"])
                  for r in decontaminate_many(base.read(), ev, n=5,
                                              contaminated_bps=2000)
                  .collect())
    assert _report_rows(report) == want

    # batch 3: overwrite drops doc 3 entirely -> its row leaves
    base.write(_docs(spark, [
        (1, EVAL_B + " seven eight"),
        (2, "quiet words overlapping nothing at all here ok")]),
        WriteOp.INSERT_OVERWRITE)
    maintain_decontamination_report(base, report, md, ev,
                                    n=5, contaminated_bps=2000)
    assert _report_rows(report) == [(1, "B", True)]

    # idle run: no-op
    assert maintain_decontamination_report(base, report, md, ev,
                                           n=5, contaminated_bps=2000) == 0


def test_update_keeping_overlap_stays_change_scale_upsert(spark, tmp_path):
    """An update that KEEPS a doc's overlap must ride the change-scale
    UPSERT path — the full-table rewrite fires only when rows actually
    have to disappear (the cost-follows-change-volume contract)."""
    base = TableSink(spark, tmp_path / "base", "doc_id")
    report = TableSink(spark, tmp_path / "rep", "report_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    ev = _eval_sets(spark)

    base.write(_docs(spark, [(1, EVAL_A + " pad")]), WriteOp.INSERT)
    maintain_decontamination_report(base, report, md, ev,
                                    n=5, contaminated_bps=2000)
    base.write(_docs(spark, [(1, EVAL_A + " other tail words")]),
               WriteOp.UPSERT)
    maintain_decontamination_report(base, report, md, ev,
                                    n=5, contaminated_bps=2000)
    assert _report_rows(report) == [(1, "A", True)]
    assert report.log.commits()[-1].op == "upsert"     # not a rewrite


def test_maintained_report_replay_is_idempotent(spark, tmp_path):
    """Crash between the report commit and the checkpoint save: the
    consumed_through fence (r10) ABSORBS the replay — the next run
    fast-forwards the checkpoint and does zero work, instead of
    re-deriving identical rows — and the report content is unchanged;
    new work still flows after the fence."""
    base = TableSink(spark, tmp_path / "base", "doc_id")
    report = TableSink(spark, tmp_path / "rep", "report_key")
    ev = _eval_sets(spark)
    base.write(_docs(spark, [(1, EVAL_A + " pad pad2")]), WriteOp.INSERT)

    md1 = FileSystemMetadataManager(str(tmp_path / "md"))
    md1.save_changes = lambda: None          # simulated crash pre-checkpoint
    assert maintain_decontamination_report(base, report, md1, ev,
                                           n=5, contaminated_bps=2000) == 1
    before = _report_rows(report)

    md2 = FileSystemMetadataManager(str(tmp_path / "md"))
    assert maintain_decontamination_report(base, report, md2, ev,
                                           n=5, contaminated_bps=2000) == 0
    assert _report_rows(report) == before
    base.write(_docs(spark, [(2, EVAL_B + " nine ten")]), WriteOp.INSERT)
    assert maintain_decontamination_report(base, report, md2, ev,
                                           n=5, contaminated_bps=2000) == 1
    assert len(_report_rows(report)) == 2


def test_semantic_decontamination_paths_agree_and_match_bruteforce(spark):
    """semantic_decontamination (Arrow int64 matmul kernel) must match a
    per-pair numpy brute force exactly — including the
    only-hitting-rows contract and integer quantization — and be
    partitioning-proof."""
    import numpy as np

    from marmaray_spark.operators.decontam import semantic_decontamination

    rng = np.random.default_rng(23)
    dim = 16

    def unit(v):
        return (v / np.linalg.norm(v)).tolist()

    evals = [unit(rng.normal(size=dim)) for _ in range(3)]
    rows = []
    for i in range(40):
        if i % 5 == 0:      # near-copy of an eval vector => strong hit
            v = np.asarray(evals[i % 3]) + rng.normal(scale=0.05, size=dim)
            rows.append((i, unit(v)))
        else:
            rows.append((i, unit(rng.normal(size=dim))))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ev = spark.createDataFrame(list(enumerate(evals)),
                               "vec_id long, embedding array<float>")
    thr = 400_000

    got_e = {r["vec_id"]: (r["n_hits"], r["max_dot_q"], r["contaminated"])
             for r in semantic_decontamination(
                 corpus, ev, threshold_dot_q=thr).collect()}
    got_a = {r["vec_id"]: (r["n_hits"], r["max_dot_q"], r["contaminated"])
             for r in semantic_decontamination(
                 corpus.repartition(7), ev, threshold_dot_q=thr).collect()}
    assert got_e == got_a

    # brute force over the SAME quantization (round to milli, int dot)
    def q(v):
        return np.asarray([round(float(x) * 1000) for x in v], dtype=np.int64)
    want = {}
    for i, v in rows:
        dots = [int(q(v) @ q(e)) for e in evals]
        hits = [d for d in dots if d >= thr]
        if hits:
            want[i] = (len(hits), max(hits), True)
    assert got_e == want
    # every planted near-copy is caught (random 16-dim vectors can also
    # clear cosine 0.4 by chance, so subset, not equality)
    assert {i for i in range(40) if i % 5 == 0} <= set(want)


def test_semantic_decontamination_empty_eval_and_no_hits(spark):
    import numpy as np

    from marmaray_spark.operators.decontam import semantic_decontamination

    rng = np.random.default_rng(5)
    corpus = spark.createDataFrame(
        [(i, (rng.normal(size=8) / 10).tolist()) for i in range(10)],
        "vec_id long, embedding array<float>")
    far = spark.createDataFrame([(0, [1.0] * 8)],
                                "vec_id long, embedding array<float>")
    # tiny vectors vs a far eval: nothing reaches the threshold
    assert semantic_decontamination(corpus, far,
                                    threshold_dot_q=10**9).count() == 0
    # empty eval set: empty result with the right schema, no crash
    empty = semantic_decontamination(corpus, far.limit(0))
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == \
        ["vec_id", "n_hits", "max_dot_q", "contaminated"]


def test_semantic_decontamination_skips_null_and_ragged_vectors(spark):
    """A NULL or wrong-dimension embedding on either side must cost that
    ROW, not the job — matching the n-gram report's semantics where
    explode silently drops null word arrays. Before the r8 guard a
    single null corpus vector raised inside the Arrow kernel and failed
    the whole query."""
    from marmaray_spark.operators.decontam import semantic_decontamination

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),       # exact hit on the eval vector
         (2, None),                        # null embedding
         (3, [1.0, 0.0]),                  # wrong dimension
         (4, [0.0, 1.0, 0.0, 0.0])],       # orthogonal, no hit
        "vec_id long, embedding array<float>")
    ev = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]),
         (11, None),                       # null eval vector
         (12, [0.5, 0.5])],                # ragged eval vector
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["max_dot_q"] for r in semantic_decontamination(
        corpus, ev, threshold_dot_q=500_000).collect()}
    assert got == {1: 1_000_000}


# ------------------------------------------------ semantic maintainer

def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


HIT = [1.0, 0.0, 0.0, 0.0]          # matches eval exactly (dot 1_000_000)
MISS = [0.0, 1.0, 0.0, 0.0]         # orthogonal to eval


def _sem_eval(spark):
    return _vecs(spark, [(900, HIT)])


def _sem_rows(report):
    return sorted((r["vec_id"], r["n_hits"], r["contaminated"])
                  for r in report.read().collect())


def test_maintained_semantic_report_tracks_ingest_update_overwrite(
        spark, tmp_path):
    from marmaray_spark.operators.decontam import (
        maintain_semantic_decontamination, semantic_decontamination)

    base = TableSink(spark, tmp_path / "base", "vec_id")
    report = TableSink(spark, tmp_path / "rep", "report_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    ev = _sem_eval(spark)

    # batch 1: vec 1 hits, vec 2 clean
    base.write(_vecs(spark, [(1, HIT), (2, MISS)]), WriteOp.INSERT)
    n = maintain_semantic_decontamination(base, report, md, ev,
                                          threshold_dot_q=500_000)
    assert n == 1 and _sem_rows(report) == [(1, 1, True)]

    # batch 2: vec 1 UPDATED away from the eval -> its row must LEAVE;
    # vec 3 joins as a hit
    base.write(_vecs(spark, [(1, MISS)]), WriteOp.UPSERT)
    base.write(_vecs(spark, [(3, HIT)]), WriteOp.INSERT)
    maintain_semantic_decontamination(base, report, md, ev,
                                      threshold_dot_q=500_000)
    assert _sem_rows(report) == [(3, 1, True)]

    # report == from-scratch over the current base (change-scoped
    # maintenance must not drift)
    want = sorted((r["vec_id"], r["n_hits"], r["contaminated"])
                  for r in semantic_decontamination(
                      base.read(), ev, threshold_dot_q=500_000).collect())
    assert _sem_rows(report) == want

    # batch 3: overwrite drops vec 3 -> report empties
    base.write(_vecs(spark, [(1, MISS), (2, MISS)]),
               WriteOp.INSERT_OVERWRITE)
    maintain_semantic_decontamination(base, report, md, ev,
                                      threshold_dot_q=500_000)
    assert _sem_rows(report) == []

    # idle run: no-op
    assert maintain_semantic_decontamination(base, report, md, ev,
                                             threshold_dot_q=500_000) == 0


def test_maintained_semantic_replay_is_idempotent(spark, tmp_path):
    """Crash between the report commit and the checkpoint save: the
    replayed batch must re-derive identical rows (same shape as the
    n-gram maintainer's replay pin)."""
    from marmaray_spark.operators.decontam import (
        maintain_semantic_decontamination)

    base = TableSink(spark, tmp_path / "base", "vec_id")
    report = TableSink(spark, tmp_path / "rep", "report_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    ev = _sem_eval(spark)

    base.write(_vecs(spark, [(1, HIT), (2, MISS)]), WriteOp.INSERT)
    maintain_semantic_decontamination(base, report, md, ev,
                                      threshold_dot_q=500_000)
    first = _sem_rows(report)

    # simulate the crash: wipe the consumer checkpoint so the same
    # commit drains again
    md2 = FileSystemMetadataManager(str(tmp_path / "md2"))
    maintain_semantic_decontamination(base, report, md2, ev,
                                      threshold_dot_q=500_000)
    assert _sem_rows(report) == first


def test_upsert_of_other_doc_leaves_survivor_report_rows(spark, tmp_path):
    """Regression (r10): an unpartitioned UPSERT rewrites the whole
    slice, so its removes manifest lists every SURVIVOR key; the sparse
    stale-row logic must not treat those displaced-but-unchanged keys as
    affected — doc 1's contamination row has to survive an update that
    touched only doc 2."""
    base = TableSink(spark, tmp_path / "base", "doc_id")
    report = TableSink(spark, tmp_path / "rep", "report_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    ev = _eval_sets(spark)

    base.write(_docs(spark, [
        (1, EVAL_A + " eta theta"),
        (2, "quiet words overlapping nothing at all here ok")]),
        WriteOp.INSERT)
    maintain_decontamination_report(base, report, md, ev,
                                    n=5, contaminated_bps=2000)
    assert _report_rows(report) == [(1, "A", True)]

    # update ONLY doc 2 (still clean): doc 1 is displaced into the new
    # slice as a survivor, its stamp and content unchanged
    base.write(_docs(spark, [(2, "still perfectly clean words here")]),
               WriteOp.UPSERT)
    maintain_decontamination_report(base, report, md, ev,
                                    n=5, contaminated_bps=2000)
    assert _report_rows(report) == [(1, "A", True)]
