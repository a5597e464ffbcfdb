"""Incrementally-maintained dedup index (operators/incdedup.py):
change-stream maintenance == full rebuild, exact/near probes against
the index match the batch operators restricted to (new x existing),
overwrite-drop handling, replay self-match exclusion."""

from __future__ import annotations

from pyspark.sql import functions as F

from marmaray_spark.metadata.manager import FileSystemMetadataManager
from marmaray_spark.operators.incdedup import (dedup_projection,
                                               exact_dups_against_index,
                                               maintain_dedup_index,
                                               near_dups_against_index)
from marmaray_spark.sinks.table import TableSink, WriteOp


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "how vexingly quick daft zebras jump today"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
]


def test_maintained_index_equals_rebuild_and_sheds_dropped_keys(
        spark, tmp_path):
    base = TableSink(spark, tmp_path / "base", "doc_id")
    index = TableSink(spark, tmp_path / "idx", "doc_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    base.write(_docs(spark, CORPUS), WriteOp.INSERT)
    assert maintain_dedup_index(base, index, md) == 4

    # update one doc's text + add one new doc
    base.write(_docs(spark, [(2, "completely new text for doc two"),
                             (5, "sphinx of black quartz judge my vow")]),
               WriteOp.UPSERT)
    assert maintain_dedup_index(base, index, md) == 2

    got = {(r["doc_id"], r["digest"], tuple(r["buckets"]))
           for r in index.read().collect()}
    want = {(r["doc_id"], r["digest"], tuple(r["buckets"]))
            for r in dedup_projection(base.read()).collect()}
    assert got == want and len(got) == 5

    # nothing new -> no-op
    assert maintain_dedup_index(base, index, md) == 0

    # overwrite shrinks the key set; the index must shed dropped keys
    base.write(_docs(spark, CORPUS[:2]), WriteOp.INSERT_OVERWRITE)
    maintain_dedup_index(base, index, md)
    assert {r["doc_id"] for r in index.read().collect()} == {1, 2}


def _built_index(spark, tmp_path):
    base = TableSink(spark, tmp_path / "base", "doc_id")
    index = TableSink(spark, tmp_path / "idx", "doc_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    base.write(_docs(spark, CORPUS), WriteOp.INSERT)
    maintain_dedup_index(base, index, md)
    return base, index


def test_exact_probe_flags_only_cross_duplicates(spark, tmp_path):
    base, index = _built_index(spark, tmp_path)
    batch = _docs(spark, [
        (10, "the quick brown fox jumps over the lazy dog"),  # dups 1 & 4
        (11, "a wholly original document unlike the corpus"),
        # replay of an already-ingested row: same id, same text — a
        # re-delivered UPSERT must not flag itself as its own duplicate
        (3, "how vexingly quick daft zebras jump today"),
    ])
    got = {(r["new_id"], r["keeper_id"])
           for r in exact_dups_against_index(batch, index.read()).collect()}
    assert got == {(10, 1)}          # min existing id wins; 11 clean


def test_near_probe_matches_batch_operator_on_cross_pairs(spark, tmp_path):
    """LSH probe against the maintained index == the batch LSH+verify
    pipeline run over (corpus + batch), restricted to (new x existing)
    pairs — the index path may not invent or lose candidates."""
    from marmaray_spark.operators.dedup import (jaccard_counts,
                                                lsh_candidate_pairs)

    base, index = _built_index(spark, tmp_path)
    batch = _docs(spark, [
        (20, "the quick brown fox jumps over the lazy dogs"),  # near-dup 1/4
        (21, "pack my box with five dozen liquor jugs"),       # exact dup 2
        (22, "nothing here resembles anything in the corpus"),
    ])
    thr = 5000

    got = {(r["new_id"], r["old_id"], r["jaccard_bps"]) for r in
           near_dups_against_index(batch, index.read(), base.read(),
                                   threshold_bps=thr).collect()}

    # reference: batch pipeline over the union, cross pairs only
    union = base.read().unionByName(batch)
    proj = dedup_projection(union)
    cand = lsh_candidate_pairs(proj, "doc_id", "buckets")
    cross = cand.filter(((F.col("a") < 20) & (F.col("b") >= 20))
                        | ((F.col("a") >= 20) & (F.col("b") < 20)))
    from marmaray_spark.operators.text import word_shingles, words
    sh = union.withColumn("__w", words("text")) \
        .select("doc_id", word_shingles("__w", 3).alias("sh"))
    inter, un = jaccard_counts(F.col("l.sh"), F.col("r.sh"))
    verified = (cross
                .join(sh.alias("l"), F.col("a") == F.col("l.doc_id"))
                .join(sh.alias("r"), F.col("b") == F.col("r.doc_id"))
                .withColumn("inter", inter).withColumn("un", un)
                .withColumn("bps", F.expr("CAST(inter * 10000 div un AS INT)"))
                .filter(F.col("bps") >= thr))
    want = set()
    for r in verified.collect():
        new, old = (r["a"], r["b"]) if r["a"] >= 20 else (r["b"], r["a"])
        want.add((new, old, r["bps"]))

    assert got == want
    assert any(n == 21 for n, _, _ in got)       # the exact dup is caught
    assert all(n != 22 for n, _, _ in got)       # the clean doc is clean


def test_partial_copy_probe_finds_lifted_paragraph(spark, tmp_path):
    """A paragraph lifted from a corpus doc into an otherwise-new doc:
    whole-document near-dup misses it (low Jaccard), the fingerprint
    probe catches it; the ubiquitous-fingerprint cap drops boilerplate
    shared by every corpus doc."""
    from marmaray_spark.operators.incdedup import (
        partial_copies_against_index, near_dups_against_index)

    para = "the stolen paragraph about riverbank erosion patterns"
    base = TableSink(spark, tmp_path / "base", "doc_id")
    index = TableSink(spark, tmp_path / "idx", "doc_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    base.write(_docs(spark, [
        (1, f"corpus document one begins here. {para}. and then ends"),
        (2, "a second corpus document with its own content entirely"),
    ]), WriteOp.INSERT)
    maintain_dedup_index(base, index, md, fingerprint_k=5)
    assert "fingerprints" in index.read().columns

    batch = _docs(spark, [
        (50, f"fresh reporting with novel words throughout. {para}. plus "
             f"original analysis nothing else shares with anything")])
    near = near_dups_against_index(batch, index.read(), base.read(),
                                   threshold_bps=5000).collect()
    assert near == []                        # low whole-doc Jaccard
    hits = {(r["new_id"], r["old_id"]) for r in
            partial_copies_against_index(batch, index.read(),
                                         min_shared=2).collect()}
    assert hits == {(50, 1)}

    # a fingerprint present in EVERY index doc is boilerplate: with the
    # frequency cap at 1 it pairs nothing by itself
    boiler = "shared boilerplate footer"
    base2 = TableSink(spark, tmp_path / "b2", "doc_id")
    index2 = TableSink(spark, tmp_path / "i2", "doc_id")
    md2 = FileSystemMetadataManager(str(tmp_path / "md2"))
    base2.write(_docs(spark, [
        (1, f"first corpus doc text. {boiler}"),
        (2, f"second unrelated body here. {boiler}"),
    ]), WriteOp.INSERT)
    maintain_dedup_index(base2, index2, md2, fingerprint_k=5)
    b = _docs(spark, [(60, f"entirely new words. {boiler}")])
    uncapped = partial_copies_against_index(b, index2.read(), min_shared=1)
    capped = partial_copies_against_index(b, index2.read(), min_shared=1,
                                          max_fingerprint_freq=1)
    assert uncapped.count() == 2             # pairs with both via footer
    assert capped.count() == 0               # footer fingerprints dropped


def test_near_probe_reports_asymmetric_containment(spark, tmp_path):
    """A new doc that is a strict prefix of a corpus doc: every one of
    its shingles is contained (containment_bps == 10000) while Jaccard
    is only |new|/|old| — the partial-copy signal Jaccard alone hides."""
    base = TableSink(spark, tmp_path / "base", "doc_id")
    index = TableSink(spark, tmp_path / "idx", "doc_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    old = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    base.write(_docs(spark, [(1, old)]), WriteOp.INSERT)
    maintain_dedup_index(base, index, md)

    new = "w1 w2 w3 w4 w5 w6 w7 w8 w9"          # prefix: 7 of 8 shingles
    got = near_dups_against_index(
        _docs(spark, [(50, new)]), index.read(), base.read(),
        threshold_bps=8000).collect()
    assert len(got) == 1
    r = got[0]
    assert r["inter"] == 7 and r["union_sz"] == 8
    assert r["jaccard_bps"] == 8750
    assert r["containment_bps"] == 10000


def test_ingest_loop_filters_dupes_across_ticks(spark, tmp_path):
    """The production loop the index exists for: per ingest tick, probe
    the new batch against the maintained index, drop cross-duplicates,
    write only survivors, maintain. Cost per tick follows the batch; the
    corpus is never re-deduplicated."""
    base = TableSink(spark, tmp_path / "base", "doc_id")
    index = TableSink(spark, tmp_path / "idx", "doc_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    def ingest(rows):
        batch = _docs(spark, rows)
        if not index.is_empty():
            dups = exact_dups_against_index(batch, index.read())
            batch = batch.join(dups.select(F.col("new_id").alias("doc_id")),
                               "doc_id", "left_anti")
        n = batch.count()
        if n:
            base.write(batch, WriteOp.INSERT)
        maintain_dedup_index(base, index, md)
        return n

    assert ingest([(1, "alpha"), (2, "beta"), (3, "gamma")]) == 3
    # tick 2: one dup of doc 1, one genuinely new
    assert ingest([(4, "alpha"), (5, "delta")]) == 1
    # tick 3: dups of docs 1 and 5 -> nothing survives
    assert ingest([(6, "delta"), (7, "alpha")]) == 0

    kept = base.read()
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3, 5}
    assert kept.select("text").distinct().count() == 4     # no dup content
    # index stayed in lockstep with the base
    assert {r["doc_id"] for r in index.read().collect()} == {1, 2, 3, 5}


def test_near_probe_candidate_cap_bounds_but_still_detects(spark, tmp_path):
    """max_candidates_per_doc: a batch doc matching a boilerplate-heavy
    index verifies at most cap candidates (lowest old_id first), and the
    duplicate is still detected through the surviving candidates."""
    boiler = "identical boilerplate text repeated across the corpus"
    base = TableSink(spark, tmp_path / "base", "doc_id")
    index = TableSink(spark, tmp_path / "idx", "doc_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    rows = [(i, boiler) for i in range(30)] + [
        (100, "one unrelated corpus document sits here")]
    base.write(_docs(spark, rows), WriteOp.INSERT)
    maintain_dedup_index(base, index, md)

    batch = _docs(spark, [(1000, boiler)])
    capped = near_dups_against_index(batch, index.read(), base.read(),
                                     threshold_bps=9000,
                                     max_candidates_per_doc=5).collect()
    assert len(capped) == 5                      # bounded, not 30
    assert {r["old_id"] for r in capped} == {0, 1, 2, 3, 4}   # min ids
    assert all(r["jaccard_bps"] == 10000 for r in capped)     # detected


def test_near_probe_index_bucket_star_anchors_hot_buckets(spark, tmp_path):
    """max_index_bucket_width: hot index buckets contribute only their
    anchor to the candidate join — the duplicate is still detected
    (via the anchor), normal-width buckets are untouched, and the
    precomputed-stats path equals the inline path."""
    from marmaray_spark.operators.incdedup import index_bucket_stats

    boiler = "identical boilerplate text repeated across the corpus"
    base = TableSink(spark, tmp_path / "base", "doc_id")
    index = TableSink(spark, tmp_path / "idx", "doc_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    rows = [(i, boiler) for i in range(30)] + [
        (100, "a small unique corpus document about estuaries")]
    base.write(_docs(spark, rows), WriteOp.INSERT)
    maintain_dedup_index(base, index, md)

    batch = _docs(spark, [
        (1000, boiler),                                    # hits hot bucket
        (1001, "a small unique corpus document about estuaries"),  # normal
    ])
    kw = dict(threshold_bps=9000, max_index_bucket_width=8)
    inline = near_dups_against_index(batch, index.read(), base.read(),
                                     **kw).collect()
    got = {(r["new_id"], r["old_id"]) for r in inline}
    # hot bucket -> anchor (min id 0) only; normal bucket -> its one doc
    assert got == {(1000, 0), (1001, 100)}

    stats = index_bucket_stats(index.read())
    pre = near_dups_against_index(batch, index.read(), base.read(),
                                  bucket_stats=stats, **kw).collect()
    assert {(r["new_id"], r["old_id"]) for r in pre} == got


def test_near_probe_stale_stats_keep_freshly_indexed_buckets(spark, tmp_path):
    """Regression (r7 advice): bucket_stats persisted at the LAST
    maintenance cycle lack the buckets of docs indexed since; the stats
    join must be a LEFT join treating missing width as 1 (kept), not an
    inner join that silently makes fresh corpus docs undetectable."""
    from marmaray_spark.operators.incdedup import index_bucket_stats

    base = TableSink(spark, tmp_path / "base", "doc_id")
    index = TableSink(spark, tmp_path / "idx", "doc_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    base.write(_docs(spark, CORPUS), WriteOp.INSERT)
    maintain_dedup_index(base, index, md)

    # stats snapshot BEFORE the next maintenance cycle (plan pins the
    # current index files — the documented persisted-stats usage)
    stale = index_bucket_stats(index.read())
    stale = spark.createDataFrame(stale.collect(), stale.schema)

    base.write(_docs(spark, [
        (6, "sphinx of black quartz judge my vow tonight")]), WriteOp.UPSERT)
    maintain_dedup_index(base, index, md)

    batch = _docs(spark, [
        (30, "sphinx of black quartz judge my vow today")])  # near-dup of 6
    got = near_dups_against_index(
        batch, index.read(), base.read(), threshold_bps=5000,
        max_index_bucket_width=8, bucket_stats=stale).collect()
    assert {(r["new_id"], r["old_id"]) for r in got} == {(30, 6)}


def test_probe_params_recorded_validated_and_defaulted(spark, tmp_path):
    """r7 advice: maintain_dedup_index stamps the projection params into
    the index's commit metadata; probes default from them, explicit
    mismatches raise instead of silently returning zero candidates, and
    re-maintaining under different params is refused."""
    import pytest

    from marmaray_spark.operators.incdedup import (
        index_projection_params, partial_copies_against_index)

    base = TableSink(spark, tmp_path / "base", "doc_id")
    index = TableSink(spark, tmp_path / "idx", "doc_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    base.write(_docs(spark, CORPUS), WriteOp.INSERT)
    maintain_dedup_index(base, index, md, bands=4, rows_per_band=4)

    params = index_projection_params(index)
    assert params["bands"] == 4 and params["rows_per_band"] == 4
    assert params["sig_k"] == 16 and params["fingerprint_k"] is None

    batch = _docs(spark, [(20, "the quick brown fox jumps over the lazy dogs")])
    # recommended call: index_params only, hashing knobs defaulted FROM it
    got = near_dups_against_index(batch, index.read(), base.read(),
                                  index_params=params).collect()
    assert {(r["new_id"], r["old_id"]) for r in got} == {(20, 1), (20, 4)}

    # explicit knob contradicting the record -> loud failure
    with pytest.raises(ValueError, match="maintained with bands=4"):
        near_dups_against_index(batch, index.read(), base.read(),
                                bands=8, index_params=params)

    # partial-copy probe against a fingerprint-less index -> loud failure
    with pytest.raises(ValueError, match="without fingerprints"):
        partial_copies_against_index(batch, index.read(),
                                     index_params=params)

    # re-maintenance with different params would mix hash families
    base.write(_docs(spark, [(7, "another new corpus document arrives")]),
               WriteOp.UPSERT)
    with pytest.raises(ValueError, match="different projection params"):
        maintain_dedup_index(base, index, md)   # defaults != bands=4
    assert maintain_dedup_index(base, index, md, bands=4,
                                rows_per_band=4) == 1
