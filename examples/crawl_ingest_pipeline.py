"""Complete example: the crawl first mile as a CHECKPOINTED TICK.

Common Crawl-style archives land in a directory; every tick ingests
exactly the archives that arrived since the last committed watermark —
never re-reading the crawl — and runs them through the standing
first-mile funnel:

  new .warc.gz archives        (WarcWorkUnitCalculator: list > watermark,
                                capped per run, late arrivals loud)
    -> WARC records            (WarcSource: response records; corrupt
                                members/records -> error table rows)
    -> HTML -> text            (extract_text_from_html: stdlib tokenizer,
                                chrome dropped by word floor + link density)
    -> quality gate            (Gopher repetition battery over the
                                extracted text)
    -> survivors DEDUP_INSERT  (commit-logged managed table; replay-safe)
    -> host-graph edges        (link_host_edges over the survivors'
                                extracted link_hosts; deduped by
                                src->dst key, replay-safe)
    -> watermark commit        (metadata.save_changes() only AFTER the
                                sink commit — the work-unit contract, so a
                                crash replays the tick and the dedup-insert
                                absorbs it)

Between ticks, ``frontier_report`` ranks the accumulated host graph
with the integer PageRank (operators/web.py pagerank_integer) — the
"what should the crawler fetch next" view, fed by real extracted
``<a href>`` hosts rather than a synthetic edge list.

Run:  python examples/crawl_ingest_pipeline.py
(builds a synthetic two-archive crawl in a temp dir and ticks it twice).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.metadata.manager import FileSystemMetadataManager  # noqa: E402
from marmaray_spark.operators.text import gopher_repetition_pass  # noqa: E402
from marmaray_spark.operators.web import (extract_text_from_html,  # noqa: E402
                                          link_host_edges,
                                          pagerank_integer)
from marmaray_spark.sinks.table import TableSink, WriteOp  # noqa: E402
from marmaray_spark.sources.warc import (WarcSource,  # noqa: E402
                                         WarcWorkUnitCalculator)


def crawl_tick(spark: SparkSession, workdir: str, archive_dir: str,
               max_archives: int = 16) -> dict:
    """One crawl-ingest tick; returns the tick report.

    Exactly-once: the watermark is staged by the calculator but persists
    only after the pages table committed — a crash in between replays
    the same archives into a DEDUP_INSERT keyed by target_uri."""
    md = FileSystemMetadataManager(os.path.join(workdir, "checkpoints"))
    pages = TableSink(spark, os.path.join(workdir, "pages"),
                      record_key_field="target_uri")
    edges = TableSink(spark, os.path.join(workdir, "host_edges"),
                      record_key_field="edge_key")
    errors = TableSink(spark, os.path.join(workdir, "crawl_errors"),
                       record_key_field="hadoop_row_key")

    calc = WarcWorkUnitCalculator(archive_dir, md,
                                  max_archives=max_archives)
    units = calc.compute_work_units()
    report = {"archives": 0, "records": 0, "errors": 0, "kept": 0,
              "edges": 0}
    source = WarcSource(spark)
    for wu in units:
        report["archives"] += len(wu.paths)
        res = source.get_data(wu)
        report["records"] += res.valid_count
        report["errors"] += res.error_count
        if res.error_count:
            errors.write(res.errors, WriteOp.INSERT)
        html = (res.valid.filter(F.col("http_status") == 200)
                .select("target_uri",
                        # lenient lossy conversion, not decode(): a
                        # latin-1 page or binary 200 response must not
                        # kill the tick (replacement chars per row)
                        F.expr("make_valid_utf8(cast(payload as string))")
                        .alias("html")))
        text = extract_text_from_html(html, "target_uri")
        kept = (text.filter("ok")
                .withColumn("w", F.split("text", r"\s+"))
                .filter(gopher_repetition_pass("w"))
                .select("target_uri", "title", "text", "link_hosts"))
        # persist: the per-tick count, the table write and the edge
        # extraction all consume the extraction plan
        kept = kept.persist()
        try:
            report["kept"] += kept.count()      # THIS tick's survivors
            pages.write(kept.drop("link_hosts"), WriteOp.DEDUP_INSERT)
            # host graph from the SURVIVORS' out-links: gated pages
            # (spam) don't get to vote on the frontier; the src->dst
            # key makes a crash replay land on the same edge rows, and
            # the in-batch dropDuplicates is required — DEDUP_INSERT
            # only dedups against PRIOR commits, not within the batch
            tick_edges = (link_host_edges(kept, "target_uri")
                          .dropDuplicates(["src", "dst"])
                          .withColumn("edge_key",
                                      F.concat_ws("->", "src", "dst")))
            tick_edges = tick_edges.persist()
            try:
                n_edges = tick_edges.count()
                report["edges"] += n_edges
                if n_edges:
                    edges.write(tick_edges, WriteOp.DEDUP_INSERT)
            finally:
                tick_edges.unpersist()
        finally:
            kept.unpersist()
    calc.save_next_run_state(units)
    md.save_changes()                       # AFTER the table commits
    return report


def frontier_report(spark: SparkSession, workdir: str,
                    top_n: int = 10):
    """Rank the accumulated host graph: the "what should the crawler
    fetch next" view. Reads the deduped src->dst edge table the ticks
    maintain and runs the 5-step integer power iteration — host rank
    in 1e-12 units, highest first."""
    try:
        edges = TableSink(spark, os.path.join(workdir, "host_edges"),
                          record_key_field="edge_key").read()
    except FileNotFoundError:
        # linkless crawls never commit an edge table: an empty ranking,
        # not a crash
        return spark.createDataFrame([], "node string, rank long")
    pr = pagerank_integer(edges.select("src", "dst"), "src", "dst",
                          iters=5)
    return pr.orderBy(F.col("rank").desc(), "node").limit(top_n)


def _synth_crawl(archive_dir: str) -> None:
    from marmaray_spark.sources.warc import write_warc_gz

    def page(u, body):
        payload = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        return ({"WARC-Type": "response", "WARC-Record-ID": f"<{u}>",
                 "WARC-Target-URI": u}, payload)

    def good(links: bytes = b"") -> bytes:
        # the nav is pure link chrome (gated out of the text by link
        # density) but its absolute hrefs still feed the host graph
        return (b"<html><body><nav>" + links + b"</nav>"
                b"<p>the quick brown fox jumps over the lazy dog while "
                b"seven wizards brew strong coffee at dawn</p></body></html>")

    hub = b'<a href="http://hub.example.com/x">hub</a> '
    peer = b'<a href="http://ex.org/b">peer</a>'
    spam = b"<body><p>" + b"buy " * 60 + b"</p></body>"
    with open(os.path.join(archive_dir, "seg-00000.warc.gz"), "wb") as fh:
        fh.write(write_warc_gz([page("http://ex.com/a", good(hub + peer)),
                                page("http://ex.com/spam", spam)]))
    with open(os.path.join(archive_dir, "seg-00001.warc.gz"), "wb") as fh:
        fh.write(write_warc_gz([page("http://ex.org/b", good(hub))]))


def main() -> None:
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .appName("crawl_ingest_pipeline").getOrCreate())
    with tempfile.TemporaryDirectory() as workdir:
        archive_dir = os.path.join(workdir, "crawl")
        os.makedirs(archive_dir)
        _synth_crawl(archive_dir)
        print("tick 1:", crawl_tick(spark, workdir, archive_dir))
        print("tick 2 (nothing new):",
              crawl_tick(spark, workdir, archive_dir))
        print("frontier:", [(r["node"], r["rank"]) for r in
                            frontier_report(spark, workdir).collect()])
    spark.stop()


if __name__ == "__main__":
    main()
