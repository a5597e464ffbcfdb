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
    -> canonical dedup         (pages declaring the same rel=canonical
                                target collapse first-occurrence-wins —
                                the publisher hint, ahead of digest dedup)
    -> survivors DEDUP_INSERT  (commit-logged managed table; replay-safe)
    -> host-graph edges        (maintain_link_edges: the edge table is
                                MAINTAINED from the pages table's commit
                                log on the shared sparse-report skeleton —
                                page-owned (page, dst) rows, so an updated
                                page that drops a link drops its edge)
    -> watermark commit        (metadata.save_changes() only AFTER the
                                sink commit — the work-unit contract, so a
                                crash replays the tick and the dedup-insert
                                absorbs it)

Between ticks, ``frontier_report`` ranks the accumulated host graph
with the integer PageRank (operators/web.py pagerank_integer) — the
"what should the crawler fetch next" view, fed by real extracted
``<a href>`` hosts rather than a synthetic edge list.

The DISCOVERY side closes the loop: robots.txt ``Sitemap:``
directives seed ``sitemap_discovery_tick`` (one index level per
tick, replay-safe DEDUP_INSERT state), and ``fetch_frontier`` joins
the discovered seed URLs against the crawled pages (anti),
the robots rules (gate) and the host ranks (priority) into the
actual ordered fetch list a crawler would drain next.

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
from marmaray_spark.operators.web import (canonical_dedup,  # noqa: E402
                                          extract_text_from_html,
                                          fetch_frontier,
                                          maintain_link_edges,
                                          pagerank_integer,
                                          parse_robots,
                                          refresh_host_ranks,
                                          robots_sitemaps,
                                          sitemap_discovery_tick)
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
                      record_key_field="report_key")
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
                .select("target_uri", "title", "text", "rel_canonical",
                        "link_hosts"))
        # publisher-hint dedup ahead of the key-level dedup insert: a
        # print/AMP twin declaring the same canonical target collapses
        # here even though its target_uri (the table key) differs
        kept = canonical_dedup(kept, "target_uri", "target_uri") \
            .drop("rel_canonical")
        # persist: the per-tick count and the table write both consume
        # the extraction plan. link_hosts STAYS in the pages table —
        # the edge maintainer derives the host graph from the table's
        # own commit log, not from this tick's in-flight frame
        kept = kept.persist()
        try:
            report["kept"] += kept.count()      # THIS tick's survivors
            pages.write(kept, WriteOp.DEDUP_INSERT)
        finally:
            kept.unpersist()
    # host graph on the SHARED maintainer skeleton: drain the pages
    # commit log once per tick; page-owned (page, dst host) edge rows,
    # stale edges of updated/dropped pages rewritten out, checkpoint
    # persisted only after the edge commit — replay-idempotent
    report["edges"] += maintain_link_edges(pages, edges, md, "target_uri")
    # ranks ride a POLICY CADENCE, not the tick: recompute only when
    # new edge commits landed (measured: the 5-iteration pagerank is
    # 2-10x a tick's cost, while the ranking barely moves per tick);
    # fetch_frontier reads the stored table instead of recomputing
    ranks = TableSink(spark, os.path.join(workdir, "host_ranks"),
                      record_key_field="node")
    report["ranked_hosts"] = refresh_host_ranks(edges, ranks, md)
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
                          record_key_field="report_key").read()
    except FileNotFoundError:
        # linkless crawls never commit an edge table: an empty ranking,
        # not a crash
        return spark.createDataFrame([], "node string, rank long")
    # page-owned rows form a multigraph: a host linked by many pages
    # carries more rank mass, which is the weighting a frontier wants
    pr = pagerank_integer(edges.select("src", "dst"), "src", "dst",
                          iters=5)
    return pr.orderBy(F.col("rank").desc(), "node").limit(top_n)


def discovery_tick(spark: SparkSession, workdir: str,
                   robots_df, sitemap_bodies) -> dict:
    """One sitemap-discovery tick + the resulting fetch list.

    ``robots_df``: (host, robots_txt) rows the fetch layer collected;
    ``sitemap_bodies``: (sitemap_url, xml) rows it fetched. Seed URLs
    accrue replay-safe; the returned report carries the ordered
    frontier = seeds - crawled pages, robots-gated, ranked by the host
    graph's PageRank (publisher priority breaks ties within a host)."""
    discovered = TableSink(spark, os.path.join(workdir, "sitemaps_seen"),
                           record_key_field="sitemap_url")
    parsed = TableSink(spark, os.path.join(workdir, "sitemaps_parsed"),
                       record_key_field="sitemap_url")
    seeds = TableSink(spark, os.path.join(workdir, "seed_urls"),
                      record_key_field="url")
    report = sitemap_discovery_tick(
        discovered, parsed, seeds, sitemap_bodies,
        new_sitemaps=robots_sitemaps(robots_df))
    if seeds.is_empty():
        report["frontier"] = []
        return report
    try:
        crawled = TableSink(spark, os.path.join(workdir, "pages"),
                            record_key_field="target_uri").read()
    except FileNotFoundError:
        crawled = None
    # the stored cadence-refreshed ranks table (crawl_tick maintains
    # it); fall back to the ad-hoc recompute only when no tick has
    # ranked yet
    ranks_sink = TableSink(spark, os.path.join(workdir, "host_ranks"),
                           record_key_field="node")
    ranks = (frontier_report(spark, workdir, top_n=1000)
             if ranks_sink.is_empty() else ranks_sink.read())
    frontier = fetch_frontier(seeds.read(), crawled, ranks,
                              rules=parse_robots(robots_df),
                              crawled_url_col="target_uri")
    report["frontier"] = [r["url"] for r in frontier.limit(10).collect()]
    return report


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
        # the discovery side: robots Sitemap: directive -> sitemap XML
        # (as the fetch layer would deliver it) -> seed URLs -> the
        # ordered fetch list for the NEXT tick
        robots_df = spark.createDataFrame(
            [("ex.com", "User-agent: *\nDisallow: /spam\n"
              "Sitemap: http://ex.com/sitemap.xml\n")],
            "host string, robots_txt string")
        bodies = spark.createDataFrame(
            [("http://ex.com/sitemap.xml",
              '<urlset xmlns="http://www.sitemaps.org/schemas/'
              'sitemap/0.9">'
              "<url><loc>http://ex.com/a</loc></url>"           # crawled
              "<url><loc>http://ex.com/fresh</loc>"
              "<priority>0.9</priority></url>"
              "<url><loc>http://ex.com/also-new</loc></url>"
              "</urlset>")],
            "sitemap_url string, xml string")
        print("discovery:", discovery_tick(spark, workdir,
                                           robots_df, bodies))
    spark.stop()


if __name__ == "__main__":
    main()
