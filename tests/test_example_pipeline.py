"""The examples/ pipeline end-to-end: incremental partition ingest with
checkpointing, upsert table, error table, locks, metrics."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

from parquet_to_table_pipeline import build_dag  # noqa: E402

from marmaray_spark.sinks.table import TableSink, WriteOp  # noqa: E402


def test_example_ingests_one_partition_per_run(spark, tmp_path):
    wd = str(tmp_path / "wd")

    dag1 = build_dag(spark, wd)
    assert dag1.execute(spark) is True
    t = TableSink(spark, os.path.join(wd, "table"), record_key_field="o_orderkey")
    rows_after_1 = t.read().count()
    assert rows_after_1 > 0

    # second run picks the NEXT partition; table grows
    dag2 = build_dag(spark, wd)
    assert dag2.execute(spark) is True
    rows_after_2 = t.read().count()
    assert rows_after_2 > rows_after_1

    # error table captures invalid rows when the processed partitions had
    # any (small partitions may be all-valid — then no error dir exists)
    err_dir = os.path.join(wd, "errors")
    if os.path.exists(err_dir):
        errs = spark.read.parquet(err_dir)
        assert "hadoop_error_exception" in errs.columns

    # metrics recorded work
    names = [m.name for m in dag2.metrics.metrics]
    assert "work_unit_count" in names and "success" in names


def test_incremental_ingest_dedup_example(spark, tmp_path):
    """examples/incremental_ingest_dedup.py: across three ticks the
    corpus stays content-deduplicated, each tick's report adds up, and
    a replayed tick (crash-recovery shape) changes nothing."""
    from incremental_ingest_dedup import ingest_tick

    wd = str(tmp_path / "wd")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    r1 = ingest_tick(spark, wd, docs(
        [(1, "a truly original first document"),
         (2, "the second document differs entirely"),
         (3, "third content here")]))
    assert r1 == {"in": 3, "batch_dups": 0, "exact_dups": 0,
                  "near_dups": 0, "kept": 3, "indexed": 3}

    # tick 2: an IN-BATCH duplicate pair (min id keeps), one exact
    # replay under a new id, one case/spacing variant (exact digest
    # differs, token shingles identical -> near dup), one new
    r2 = ingest_tick(spark, wd, docs(
        [(9, "both arrived in one tick"),
         (13, "both arrived in one tick"),
         (10, "a truly original first document"),
         (11, "the second document differs  ENTIRELY"),
         (12, "completely fresh fourth text")]))
    assert r2 == {"in": 5, "batch_dups": 1, "exact_dups": 1,
                  "near_dups": 1, "kept": 2, "indexed": 2}

    t = TableSink(spark, os.path.join(wd, "corpus"), "doc_id")
    kept = t.read()
    assert kept.count() == 5
    assert kept.count() == kept.select("text").distinct().count()
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3, 9, 12}

    # replaying the rejected doc (crash-recovery / re-delivery shape):
    # still an exact dup, corpus and index unchanged
    r3 = ingest_tick(spark, wd, docs(
        [(10, "a truly original first document")]))
    assert r3 == {"in": 1, "batch_dups": 0, "exact_dups": 1,
                  "near_dups": 0, "kept": 0, "indexed": 0}
    assert t.read().count() == 5

    # crash BETWEEN the corpus write and index maintenance: the corpus
    # commit landed, the index is stale. Replaying the tick must not
    # duplicate rows — the probes miss (stale index) but DEDUP_INSERT
    # key-filters the survivors (this is why the write is not INSERT)
    from marmaray_spark.operators.pii import corpus_hygiene
    crashed = corpus_hygiene(
        docs([(20, "written then crashed before maintenance")]),
        "text").select("doc_id", "text")
    TableSink(spark, os.path.join(wd, "corpus"), "doc_id").write(
        crashed, WriteOp.DEDUP_INSERT)
    r4 = ingest_tick(spark, wd, docs(
        [(20, "written then crashed before maintenance")]))
    assert r4["exact_dups"] == 0            # stale index missed it
    assert t.read().count() == 6            # but no duplicate row
    assert t.read().filter("doc_id = 20").count() == 1
    assert r4["indexed"] >= 1               # maintenance caught up


def test_streaming_ingest_dedup_loop(spark, tmp_path):
    """The same ingest loop under Structured Streaming: each micro-batch
    runs the hygiene -> probe -> insert -> maintain tick inside
    foreachBatch; the stream checkpoint makes file pickup exactly-once
    across restarts, the table commit log and index checkpoint make the
    tick idempotent inside each epoch."""
    from incremental_ingest_dedup import ingest_tick

    from marmaray_spark.streaming.incremental import read_parquet_stream

    src, wd = tmp_path / "src", str(tmp_path / "wd")
    ck = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "first streaming document"), (2, "second text entirely")],
        "doc_id long, text string").write.parquet(str(src / "b0"))
    schema = spark.read.parquet(str(src / "b0")).schema
    reports = []

    def run():
        q = (read_parquet_stream(spark, f"{src}/b*", schema)
             .writeStream
             .foreachBatch(lambda bdf, eid:
                           reports.append(ingest_tick(spark, wd, bdf)))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run()
    assert reports and sum(r["kept"] for r in reports) == 2

    # a later drop: one exact replay of doc 1, one genuinely new
    spark.createDataFrame(
        [(10, "first streaming document"), (11, "a third fresh text")],
        "doc_id long, text string").write.parquet(str(src / "b1"))
    n_before = len(reports)
    run()
    new = reports[n_before:]
    assert sum(r["in"] for r in new) == 2        # old file NOT reprocessed
    assert sum(r["exact_dups"] for r in new) == 1
    assert sum(r["kept"] for r in new) == 1

    t = TableSink(spark, os.path.join(wd, "corpus"), "doc_id")
    kept = t.read()
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 11}
    assert kept.select("text").distinct().count() == 3


def test_ingest_tick_maintains_decontam_report(spark, tmp_path):
    """The ingest loop's hygiene leg: with eval_sets passed, each tick
    advances the maintained contamination report off the same commit
    stream — only the tick's survivors are probed, and the report
    accumulates across ticks."""
    from pyspark.sql import functions as F

    from incremental_ingest_dedup import ingest_tick

    wd = str(tmp_path / "wd")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    ev_doc = "alpha beta gamma delta epsilon"
    ev = {"held": docs([(500, ev_doc)])
          .withColumn("w", F.split(F.trim(F.lower("text")), r"\s+"))}

    r1 = ingest_tick(spark, wd, docs(
        [(1, ev_doc + " zeta"), (2, "nothing shared here at all")]),
        eval_sets=ev)
    assert r1["kept"] == 2 and r1["decontam_flagged"] == 1
    rep = TableSink(spark, os.path.join(wd, "decontam_report"),
                    "report_key")
    assert {(r["doc_id"], r["contaminated"]) for r in rep.read().collect()} \
        == {(1, True)}

    # tick 2: one clean doc, one contaminated — the report accumulates;
    # tick 1's rows were NOT recomputed (change-scoped maintenance)
    r2 = ingest_tick(spark, wd, docs(
        [(3, "beta gamma delta words ride along"),
         (4, "still nothing in common")]), eval_sets=ev)
    assert r2["decontam_flagged"] == 1
    assert {r["doc_id"] for r in rep.read().collect()} == {1, 3}


def test_multimodal_ingest_dedup_example(spark, tmp_path):
    """examples/multimodal_ingest_dedup.py: across ticks the media table
    stays perceptually deduplicated against everything stored, corrupt
    payloads land flagged instead of dropped, and a replayed tick
    (crash-recovery shape) changes nothing."""
    import numpy as np
    from multimodal_ingest_dedup import media_ingest_tick

    from marmaray_spark.functions.media_codec import decode_bmp, encode_bmp

    def img(seed):
        rng = np.random.default_rng(seed)
        grid = rng.integers(0, 8, size=(8, 9)) * 30 + 8
        px = np.repeat(np.repeat(grid, 6, axis=0), 7, axis=1)[:48, :63]
        return encode_bmp(np.repeat(px[:, :, None], 3, axis=2)
                          .astype("uint8"))

    def frame(rows):
        return spark.createDataFrame(rows, "media_id long, payload binary")

    wd = str(tmp_path / "wd")
    r1 = media_ingest_tick(spark, wd, frame(
        [(1, img(1)), (2, img(2)), (3, img(1))]))
    assert r1 == {"in": 3, "batch_dups": 1, "near_dups": 0, "kept": 2,
                  "decode_failed": 0, "indexed": 2}

    # tick 2: a brightness-shifted copy of image 1 (near-dup, dropped),
    # a fresh image, and a corrupt payload (kept, flagged)
    px = decode_bmp(img(1)).astype(np.int64)
    shifted = encode_bmp(np.clip(px + 4, 0, 255).astype("uint8"))
    batch2 = frame([(10, shifted), (11, img(9)), (12, b"BM\x00bad")])
    r2 = media_ingest_tick(spark, wd, batch2)
    assert r2 == {"in": 3, "batch_dups": 0, "near_dups": 1, "kept": 2,
                  "decode_failed": 1, "indexed": 2}

    from marmaray_spark.sinks.table import TableSink
    t = TableSink(spark, os.path.join(wd, "media"), "media_id")
    assert {r["media_id"] for r in t.read().collect()} == {1, 2, 11, 12}
    flags = {r["media_id"]: r["decode_ok"] for r in t.read().collect()}
    assert flags[12] is False and flags[11] is True

    # replay tick 2 verbatim: 10 re-drops as a near-dup; 11 probes its
    # own index row but identical ids are excluded, so it survives to
    # DEDUP_INSERT, which anti-joins it away; nothing changes
    r2b = media_ingest_tick(spark, wd, batch2)
    assert r2b == {"in": 3, "batch_dups": 0, "near_dups": 1, "kept": 2,
                   "decode_failed": 1, "indexed": 0}
    assert {r["media_id"] for r in t.read().collect()} == {1, 2, 11, 12}
    idx = TableSink(spark, os.path.join(wd, "image_index"), "media_id")
    assert {r["media_id"] for r in idx.read().collect()} == {1, 2, 11, 12}


def test_streaming_media_ingest_loop(spark, tmp_path):
    """The media ingest loop under Structured Streaming: each arriving
    file of images runs the dedup tick inside foreachBatch; file pickup
    is exactly-once across stream restarts and a perceptual copy landing
    in a LATER file still dedups against the stored corpus."""
    import numpy as np
    from multimodal_ingest_dedup import media_ingest_tick

    from marmaray_spark.functions.media_codec import decode_bmp, encode_bmp
    from marmaray_spark.streaming.incremental import read_parquet_stream

    def img(seed):
        rng = np.random.default_rng(seed)
        grid = rng.integers(0, 8, size=(8, 9)) * 30 + 8
        px = np.repeat(np.repeat(grid, 6, axis=0), 7, axis=1)[:48, :63]
        return encode_bmp(np.repeat(px[:, :, None], 3, axis=2)
                          .astype("uint8"))

    src, wd = tmp_path / "src", str(tmp_path / "wd")
    ck = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, img(1)), (2, img(2))],
                          "media_id long, payload binary") \
        .write.parquet(str(src / "b0"))
    schema = spark.read.parquet(str(src / "b0")).schema
    reports = []

    def run():
        q = (read_parquet_stream(spark, f"{src}/b*", schema)
             .writeStream
             .foreachBatch(lambda bdf, eid:
                           reports.append(media_ingest_tick(spark, wd, bdf)))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run()
    assert sum(r["kept"] for r in reports) == 2

    px = decode_bmp(img(2)).astype(np.int64)
    near = encode_bmp(np.clip(px + 3, 0, 255).astype("uint8"))
    spark.createDataFrame([(10, near), (11, img(7))],
                          "media_id long, payload binary") \
        .write.parquet(str(src / "b1"))
    n_before = len(reports)
    run()
    new = reports[n_before:]
    assert sum(r["in"] for r in new) == 2       # b0 NOT reprocessed
    assert sum(r["near_dups"] for r in new) == 1
    assert sum(r["kept"] for r in new) == 1

    from marmaray_spark.sinks.table import TableSink
    t = TableSink(spark, os.path.join(wd, "media"), "media_id")
    assert {r["media_id"] for r in t.read().collect()} == {1, 2, 11}


def test_crawl_ingest_pipeline_example(spark, tmp_path):
    """examples/crawl_ingest_pipeline.py: the checkpointed crawl tick —
    tick 1 ingests both archives (gate drops the spam page), tick 2 with
    nothing new reads nothing, a freshly arrived archive ticks in alone."""
    import os

    from crawl_ingest_pipeline import _synth_crawl, crawl_tick

    wd = str(tmp_path / "wd")
    archive_dir = str(tmp_path / "crawl")
    os.makedirs(archive_dir)
    os.makedirs(wd)
    _synth_crawl(archive_dir)

    r1 = crawl_tick(spark, wd, archive_dir)
    assert r1["archives"] == 2 and r1["records"] == 3
    assert r1["kept"] == 2                    # spam page gated out
    from marmaray_spark.sinks.table import TableSink
    pages = TableSink(spark, os.path.join(wd, "pages"),
                      record_key_field="target_uri")
    assert {r["target_uri"] for r in pages.read().collect()} \
        == {"http://ex.com/a", "http://ex.org/b"}

    r2 = crawl_tick(spark, wd, archive_dir)
    assert r2["archives"] == 0 and r2["records"] == 0

    from marmaray_spark.sources.warc import write_warc_gz
    body = (b"<body><p>a brand new page full of distinct and varied "
            b"words arriving later in the crawl</p></body>")
    payload = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
               f"Content-Length: {len(body)}\r\n\r\n").encode() + body
    with open(os.path.join(archive_dir, "seg-00002.warc.gz"), "wb") as fh:
        fh.write(write_warc_gz([({"WARC-Type": "response",
                                  "WARC-Record-ID": "<n>",
                                  "WARC-Target-URI": "http://new.net/c"},
                                 payload)]))
    r3 = crawl_tick(spark, wd, archive_dir)
    assert r3["archives"] == 1 and r3["kept"] == 1   # THIS tick only
    assert pages.read().count() == 3

    # the host graph accrued from REAL extracted hrefs across ticks:
    # ex.com/a -> {hub.example.com, ex.org}, ex.org/b -> hub.example.com
    # (spam page gated out before it can vote; tick-3 page is linkless);
    # the frontier ranks the twice-linked hub first
    from crawl_ingest_pipeline import frontier_report
    assert r1["edges"] == 3 and r2["edges"] == 0 and r3["edges"] == 0
    frontier = frontier_report(spark, wd).collect()
    assert frontier[0]["node"] == "hub.example.com"
    ranks = {r["node"]: r["rank"] for r in frontier}
    assert ranks["hub.example.com"] > ranks["ex.org"] > ranks["ex.com"]

    # the discovery side: a robots Sitemap: directive seeds the loop,
    # the fetch list excludes the already-crawled page and leads with
    # the publisher-prioritized fresh URL; a replayed tick is a no-op
    from crawl_ingest_pipeline import discovery_tick
    robots_df = spark.createDataFrame(
        [("ex.com", "User-agent: *\nDisallow: /spam\n"
          "Sitemap: http://ex.com/sitemap.xml\n")],
        "host string, robots_txt string")
    bodies = spark.createDataFrame(
        [("http://ex.com/sitemap.xml",
          '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
          "<url><loc>http://ex.com/a</loc></url>"
          "<url><loc>http://ex.com/fresh</loc>"
          "<priority>0.9</priority></url>"
          "<url><loc>http://ex.com/also-new</loc></url>"
          "</urlset>")],
        "sitemap_url string, xml string")
    d1 = discovery_tick(spark, wd, robots_df, bodies)
    assert d1["seed_urls"] == 3 and d1["frontier"] == [
        "http://ex.com/fresh", "http://ex.com/also-new"]
    d2 = discovery_tick(spark, wd, robots_df, bodies)
    assert d2["seed_urls"] == 0 and d2["parsed"] == 0
    assert d2["frontier"] == d1["frontier"]


def test_forget_pipeline_example(spark, tmp_path):
    """examples/forget_pipeline.py: a deletion request propagates
    through the corpus table AND every maintained structure (dedup
    index, term sketch, per-source rollup), each staying equal to a
    from-scratch rebuild; after retention churn + vacuum the forgotten
    payload is physically absent from every byte under the table."""
    import forget_pipeline as fp
    from pyspark.sql import functions as F

    from marmaray_spark.operators.cms import cms_build
    from marmaray_spark.operators.incdedup import exact_dups_against_index

    wd = str(tmp_path)
    fp.ingest_tick(spark, wd, [
        (1, "web", "the quick brown fox jumps over the lazy dog"),
        (2, "web", "SECRET-PAYLOAD-TO-FORGET alpha beta gamma"),
        (3, "books", "call me ishmael some years ago never mind how")])
    fp.ingest_tick(spark, wd, [
        (4, "web", "wholly unrelated content about sailing ships"),
        (5, "books", "it was the best of times it was the worst")])

    out = fp.forget(spark, wd, [2])
    assert out["deleted"] == 1
    base, index, sketch, rollup, _md = fp._tables(spark, wd)
    # corpus: doc 2 gone
    assert sorted(r["doc_id"] for r in base.read().collect()) == \
        [1, 3, 4, 5]
    # dedup index: a re-submission of the forgotten content is NOT a dup
    probe = spark.createDataFrame(
        [(9, "SECRET-PAYLOAD-TO-FORGET alpha beta gamma")],
        ["doc_id", "text"])
    assert exact_dups_against_index(probe, index.read()).count() == 0
    # sketch == rebuild over the post-forget corpus
    toks = (base.read().select(F.explode(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t"))
        .filter(F.col("t") != ""))
    want = {(r["row"], r["cell"]): r["cnt"]
            for r in cms_build(toks, "t", depth=4, width=256).collect()
            if r["cnt"]}
    got = {(r["row"], r["cell"]): r["cnt"]
           for r in sketch.read().collect() if r["cnt"]}
    assert got == want
    # rollup re-aggregated the group the deleted doc left
    assert {r["source"]: r["n_docs"] for r in rollup.read().collect()} \
        == {"web": 2, "books": 2}

    # the pre-images are still on disk (the CDC window), then vacuum
    # makes the forget physically irrecoverable
    assert fp.payload_on_disk(wd, b"SECRET-PAYLOAD-TO-FORGET")
    fp.erase_physically(spark, wd, [
        [(10 + i, "web", f"churn document number {i}")] for i in range(6)])
    assert not fp.payload_on_disk(wd, b"SECRET-PAYLOAD-TO-FORGET")
    # and the table still reads fine afterwards
    assert base.read().count() == 10
