"""Web-corpus curation (operators/web.py): canonicalization against a
table of hostile URLs, registrable-domain extraction, the per-domain
provenance rollup, and the blocklist fork."""

import pytest
from pyspark.sql import functions as F

from marmaray_spark.operators.web import (blocklist_gate, canonical_url,
                                          domain_report,
                                          registrable_domain, url_host)

CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&q=1&fbclid=zz#frag",
     "https://example.com/a/b?q=1"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:443/x", "http://example.com:443/x"),  # not http's port
    ("https://sub.Example.com/p?b=2&a=1", "https://sub.example.com/p?b=2&a=1"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/x///", "https://example.com/x"),
    ("https://example.com/?utm_campaign=s", "https://example.com/"),
    ("https://example.com/?gclid=1&msclkid=2&utm_a=3", "https://example.com/"),
    ("not a url at all", "not a url at all"),               # passthrough
]


def test_canonical_url_table(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url("url").alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_param_order_preserved_not_sorted(spark):
    df = spark.createDataFrame([(1, "https://e.com/p?z=1&a=2")],
                               "i int, url string")
    assert df.select(canonical_url("url").alias("c")).first()["c"] \
        == "https://e.com/p?z=1&a=2"


def test_url_host_and_registrable_domain(spark):
    df = spark.createDataFrame(
        [(1, "https://A.B.Example.COM:8443/x"), (2, "http://localhost/y")],
        "i int, url string")
    host_expr = ("regexp_replace(lower(regexp_extract(url, "
                 "'://([^/?#]+)', 1)), ':[0-9]+$', '')")
    got = {r["i"]: (r["h"], r["d"]) for r in df.select(
        "i", url_host("url").alias("h"),
        registrable_domain(host_expr).alias("d")).collect()}
    assert got[1] == ("a.b.example.com", "example.com")
    assert got[2] == ("localhost", "localhost")


def test_domain_report_counts_and_shares(spark):
    rows = [
        (1, "https://a.com/x", 10),
        (2, "https://WWW.a.com/x#f", 20),       # canonical dup of 1
        (3, "https://a.com/y", 30),
        (4, "https://b.org/z", 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_tok long")
    got = {r["domain"]: r.asDict() for r in
           domain_report(df, "url", "n_tok").collect()}
    assert got["a.com"]["n_docs"] == 3
    assert got["a.com"]["n_urls"] == 2
    assert got["a.com"]["dup_docs"] == 1
    assert got["a.com"]["token_bps"] == 60 * 10000 // 100
    assert got["b.org"]["n_docs"] == 1
    assert got["b.org"]["dup_docs"] == 0
    assert got["b.org"]["token_bps"] == 40 * 10000 // 100


def test_domain_report_zero_tokens_no_div_by_zero(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")],
                               "doc_id long, url string")
    assert domain_report(df, "url").first()["token_bps"] == 0


def test_blocklist_gate_forks_by_domain(spark):
    docs = spark.createDataFrame(
        [(1, "https://spam.biz/a", "k1"), (2, "https://WWW.Spam.BIZ/b", "k2"),
         (3, "https://fine.org/c", "k3")],
        "doc_id long, url string, payload string")
    bl = spark.createDataFrame([("spam.biz",)], "domain string")
    kept, blocked = blocklist_gate(docs, "url", bl)
    assert {r["doc_id"] for r in kept.collect()} == {3}
    assert {r["doc_id"] for r in blocked.collect()} == {1, 2}
    assert kept.columns == docs.columns           # payload survives the fork


def test_extract_text_from_html(spark):
    """The HTML -> text stage: a real tolerant parse (not regex) drops
    script/style, strips nav chrome by link density, keeps content
    paragraphs, decodes entities, survives malformed markup per-row."""
    from marmaray_spark.operators.web import extract_text_from_html

    page = """<!DOCTYPE html><html><head>
      <title>A &amp; B — the article</title>
      <style>p { color: red; } NOSTYLETEXT</style>
      <script>var leaked = "NOSCRIPTTEXT";</script></head>
      <body>
        <nav><ul>
          <li><a href="/">Home</a></li><li><a href="/a">About</a></li>
          <li><a href="/b">Contact</a></li><li><a href="/c">Shop</a></li>
        </ul></nav>
        <article>
          <p>This paragraph carries the actual content a corpus wants,
             with an entity like &quot;caf&eacute;&quot; decoded.</p>
          <p>Another substantive paragraph follows with enough words to
             clear the block floor easily — see <a href="/ref">one
             reference</a> inline, which is fine.</p>
        </article>
        <footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>
      </body></html>"""
    rows = [
        (1, page),
        (2, "<p>short</p>"),                          # below word floor
        (3, "<p>unclosed <b>tags & raw text with plenty of words here"),
        (4, None),                                    # null html
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in
           extract_text_from_html(df, "doc_id").collect()}

    r1 = got[1]
    assert r1["ok"] and r1["title"] == "A & B — the article"
    assert "actual content" in r1["text"] and '"café"' in r1["text"]
    assert "one reference" in r1["text"]              # inline link kept
    assert "NOSCRIPTTEXT" not in r1["text"]
    assert "NOSTYLETEXT" not in r1["text"]
    assert "Home" not in r1["text"] and "Terms" not in r1["text"]
    assert r1["n_kept"] < r1["n_blocks"] and r1["link_bps"] > 0

    assert got[2]["ok"] and got[2]["text"] == "" and got[2]["n_blocks"] == 1
    assert got[3]["ok"] and "plenty of words" in got[3]["text"]
    assert got[4]["ok"] and got[4]["text"] == "" and got[4]["n_blocks"] == 0


def _http(body: bytes, status=200, ctype="text/html"):
    return (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def test_read_warc_records_and_forks(spark, tmp_path):
    """WARC source: response records surface with URI/status/body split
    out, non-requested types filter, a corrupt gzip member forks its
    row, and the whole thing composes with HTML extraction — the full
    crawl first mile."""
    from marmaray_spark.operators.web import extract_text_from_html
    from marmaray_spark.sources.warc import read_warc, write_warc_gz

    html1 = (b"<html><head><title>One</title></head><body>"
             b"<p>the quick brown fox jumps over the lazy dog while "
             b"seven wizards brew strong coffee at dawn</p></body></html>")
    html2 = b"<body><p>another page with plenty of words inside it</p></body>"
    recs = [
        ({"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:0>"},
         b"software: test\r\n"),
        ({"WARC-Type": "request", "WARC-Record-ID": "<urn:uuid:1>",
          "WARC-Target-URI": "http://example.com/a"},
         b"GET /a HTTP/1.1\r\n\r\n"),
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:2>",
          "WARC-Target-URI": "http://example.com/a",
          "WARC-Date": "2026-08-15T00:00:00Z",
          "Content-Type": "application/http; msgtype=response"},
         _http(html1)),
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:3>",
          "WARC-Target-URI": "https://example.org/b"},
         _http(html2, status=404)),
    ]
    blob = write_warc_gz(recs)
    blob += b"\x1f\x8b\x08\x00garbage-member-not-gzip"   # corrupt member
    d = tmp_path / "warc"
    d.mkdir()
    (d / "seg-00000.warc.gz").write_bytes(blob)

    df = read_warc(spark, str(d / "*.warc.gz"))
    rows = df.collect()
    good = {r["target_uri"]: r for r in rows if r["ok"]}
    assert set(good) == {"http://example.com/a", "https://example.org/b"}
    a = good["http://example.com/a"]
    assert a["http_status"] == 200 and a["http_content_type"] == "text/html"
    assert bytes(a["payload"]) == html1
    assert a["warc_date"] == "2026-08-15T00:00:00Z"
    assert good["https://example.org/b"]["http_status"] == 404
    bad = [r for r in rows if not r["ok"]]
    assert len(bad) == 1 and bad[0]["err"]

    # the first mile composes: WARC -> HTML -> text
    pages = (df.filter("ok AND http_status = 200")
             .select("target_uri",
                     F.expr("make_valid_utf8(cast(payload as string))")
                     .alias("html")))
    text = {r["target_uri"]: r for r in extract_text_from_html(
        pages, "target_uri").collect()}
    assert "quick brown fox" in text["http://example.com/a"]["text"]
    assert text["http://example.com/a"]["title"] == "One"


def _archive(*uris, corrupt=False):
    from marmaray_spark.sources.warc import write_warc_gz
    recs = [({"WARC-Type": "response", "WARC-Record-ID": f"<urn:uuid:{u}>",
              "WARC-Target-URI": u},
             _http(f"<body><p>page for {u} with plenty of words "
                   f"inside it</p></body>".encode()))
            for u in uris]
    blob = write_warc_gz(recs)
    if corrupt:
        blob += b"\x1f\x8b\x08\x00not-actually-gzip"
    return blob


def test_warc_incremental_loop_exactly_once_across_restart(spark, tmp_path):
    """The crawl first mile TICKS: two planning rounds read each archive
    exactly once across a calculator+metadata restart from disk state; a
    crash between read and state commit replays the same archives and
    the dedup-insert sink absorbs the replay; a corrupt member lands in
    the error records without blocking the tick; a late arrival below
    the committed watermark is detected loudly, never skipped silently
    (the kafka contract, transposed to archives)."""
    import pytest as _pytest

    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.sinks.table import TableSink, WriteOp
    from marmaray_spark.sources.warc import (WarcLateArrivalError,
                                             WarcSource,
                                             WarcWorkUnitCalculator)

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-00000.warc.gz").write_bytes(_archive("u://a", "u://b"))
    (d / "seg-00001.warc.gz").write_bytes(
        _archive("u://c", corrupt=True))
    sink = TableSink(spark, tmp_path / "pages", record_key_field="target_uri")
    source = WarcSource(spark)

    def tick(crash_before_commit=False):
        md = FileSystemMetadataManager(str(tmp_path / "md"))     # restart
        calc = WarcWorkUnitCalculator(d, md, max_archives=2)
        units = calc.compute_work_units()
        n_err = 0
        for wu in units:
            res = source.get_data(wu)
            sink.write(res.valid.select("target_uri", "payload"),
                       WriteOp.DEDUP_INSERT)
            n_err += res.error_count
        calc.save_next_run_state(units)
        if not crash_before_commit:
            md.save_changes()                                    # after sink
        return [wu.paths for wu in units], n_err

    paths1, err1 = tick()
    assert [len(p) for p in paths1] == [2] and err1 == 1
    got = {r["target_uri"] for r in sink.read().collect()}
    assert got == {"u://a", "u://b", "u://c"}

    # nothing new -> empty plan (no re-read)
    paths2, _ = tick()
    assert paths2 == []

    # new archive arrives; crash AFTER sink write, BEFORE state commit
    (d / "seg-00002.warc.gz").write_bytes(_archive("u://d"))
    paths3, _ = tick(crash_before_commit=True)
    assert [p[0].rsplit("/", 1)[-1] for p in paths3] == ["seg-00002.warc.gz"]
    # replay: the restarted tick re-plans the SAME archive; the
    # dedup-insert sink keeps the table exactly-once
    paths4, _ = tick()
    assert paths3 == paths4
    assert sink.read().filter("target_uri = 'u://d'").count() == 1
    assert tick() == ([], 0)

    # a late arrival below the watermark is loud, not silently skipped
    (d / "seg-00001a.warc.gz").write_bytes(_archive("u://late"))
    with _pytest.raises(WarcLateArrivalError):
        tick()


def test_warc_backlog_drains_across_capped_ticks(spark, tmp_path):
    """max_archives bounds each run; a backlog drains across ticks in
    name order (the Kafka max-messages cap transposed)."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.sources.warc import WarcWorkUnitCalculator

    d = tmp_path / "crawl"
    d.mkdir()
    for i in range(5):
        (d / f"seg-{i:05d}.warc.gz").write_bytes(_archive(f"u://{i}"))
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    seen = []
    for _ in range(4):
        calc = WarcWorkUnitCalculator(d, md, max_archives=2)
        units = calc.compute_work_units()
        seen.append([p.rsplit("/", 1)[-1] for wu in units for p in wu.paths])
        calc.save_next_run_state(units)
        md.save_changes()
    assert seen == [["seg-00000.warc.gz", "seg-00001.warc.gz"],
                    ["seg-00002.warc.gz", "seg-00003.warc.gz"],
                    ["seg-00004.warc.gz"], []]


def test_warc_streaming_ingest_exactly_once(spark, tmp_path):
    """read_warc_stream parses each arriving archive exactly once across
    restarts (file-source checkpoint), through the SAME Arrow kernel as
    the batch reader — corrupt members fork their row in the stream
    too."""
    from marmaray_spark.sources.warc import read_warc_stream
    from marmaray_spark.streaming.incremental import run_available_now

    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    src.mkdir()
    (src / "seg-00000.warc.gz").write_bytes(
        _archive("u://a", "u://b", corrupt=True))

    def drain():
        stream = read_warc_stream(spark, str(src))
        run_available_now(stream.writeStream.format("parquet")
                          .option("path", str(out))
                          .option("checkpointLocation", str(ckpt)))

    drain()
    rows = spark.read.parquet(str(out)).collect()
    assert {r["target_uri"] for r in rows if r["ok"]} == {"u://a", "u://b"}
    assert sum(1 for r in rows if not r["ok"]) == 1

    (src / "seg-00001.warc.gz").write_bytes(_archive("u://c"))
    drain()  # restart: only the NEW archive is parsed
    rows2 = spark.read.parquet(str(out)).collect()
    assert {r["target_uri"] for r in rows2 if r["ok"]} \
        == {"u://a", "u://b", "u://c"}
    assert len(rows2) == len(rows) + 1


# ---------------------------------------------------------------------------
# pagerank_integer: crawl-frontier ranking by integer power iteration
# ---------------------------------------------------------------------------

def _pagerank_mirror(edges, iters=5, scale=10 ** 12, damping_pct=85):
    """Serial dict mirror of operators/web.py pagerank_integer — the
    same floor arithmetic, no Spark."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    teleport = (scale * (100 - damping_pct) // 100) // n
    rank = {v: scale // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += rank[a] // outdeg[a]
        rank = {v: teleport + (damping_pct * s[v]) // 100 for v in nodes}
    return rank


@pytest.mark.parametrize("driver_max_nodes", [1024, 0])
def test_pagerank_integer_matches_serial_mirror(spark, driver_max_nodes):
    # both execution paths (bounded-graph driver iteration and the
    # distributed loop) must match the mirror bit-for-bit
    from marmaray_spark.operators.web import pagerank_integer

    # affine-mixed residue graph, same family as the declared query's
    import random
    rng = random.Random(7)
    edges = [(f"n{rng.randrange(37)}", f"n{(i * 13 + 5) % 37}")
             for i in range(400)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank_integer(
               df, iters=5, driver_max_nodes=driver_max_nodes).collect()}
    assert got == _pagerank_mirror(edges, iters=5)


@pytest.mark.parametrize("driver_max_nodes", [1024, 0])
def test_pagerank_integer_multigraph_weights_match_mirror(
        spark, driver_max_nodes):
    from marmaray_spark.operators.web import pagerank_integer

    # repeated u->v edges must contribute once per instance (the
    # operator pre-aggregates them to weighted edges; w * (rank div
    # outdeg) must equal the per-instance sum bit-for-bit)
    edges = [("a", "b"), ("a", "b"), ("a", "b"), ("a", "c"),
             ("b", "c"), ("c", "a"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank_integer(
               df, iters=4, driver_max_nodes=driver_max_nodes).collect()}
    assert got == _pagerank_mirror(edges, iters=4)


def test_pagerank_integer_driver_path_matches_distributed(spark):
    """The bounded-graph driver iteration must return exactly the
    distributed loop's ranks AND schema — node dtype preserved, long
    ranks — including on a graph with dangling nodes and a
    dst-only node."""
    from marmaray_spark.operators.web import pagerank_integer

    edges = [(i % 23, (i * 7 + 3) % 29) for i in range(300)]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = pagerank_integer(df, iters=5)
    slow = pagerank_integer(df, iters=5, driver_max_nodes=0)
    assert fast.schema == slow.schema
    assert ({(r["node"], r["rank"]) for r in fast.collect()}
            == {(r["node"], r["rank"]) for r in slow.collect()})


def test_pagerank_integer_star_graph_ranks_hub_first(spark):
    from marmaray_spark.operators.web import pagerank_integer

    # every leaf links to the hub: the hub must out-rank every leaf,
    # and all leaves (teleport-only) must tie exactly
    edges = [(f"leaf{i}", "hub") for i in range(20)]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = {r["node"]: r["rank"]
             for r in pagerank_integer(df, iters=5).collect()}
    leaf_ranks = {v for k, v in ranks.items() if k != "hub"}
    assert len(leaf_ranks) == 1
    assert ranks["hub"] > leaf_ranks.pop()


def test_pagerank_integer_mass_is_bounded_and_nearly_conserved(spark):
    from marmaray_spark.operators.web import pagerank_integer

    # a strongly connected ring conserves mass up to floor-division
    # leak: each step floors at most once per node (teleport), once per
    # node (div 100) and once per edge (div outdeg) = 48 units here,
    # and prior-step losses decay by 0.85 -> total leak < 48/0.15 = 320
    scale = 10 ** 12
    edges = [(f"r{i}", f"r{(i + 1) % 16}") for i in range(16)]
    df = spark.createDataFrame(edges, "src string, dst string")
    total = sum(r["rank"]
                for r in pagerank_integer(df, iters=5, scale=scale)
                .collect())
    assert total <= scale
    assert total >= scale - 320


def test_pagerank_plan_depth_constant_in_iters(spark):
    """The returned frame must be checkpoint-backed: lineage (and plan
    size) CONSTANT in iters — frontier_report runs pagerank every crawl
    tick, and an iteration-deep lineage re-plans and re-executes the
    whole join chain on every downstream action (r9 verdict item 2)."""
    from marmaray_spark.operators.web import pagerank_integer

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string")
    p2 = pagerank_integer(edges, iters=2, driver_max_nodes=0)
    p9 = pagerank_integer(edges, iters=9, driver_max_nodes=0)
    d2 = p2._jdf.queryExecution().optimizedPlan().toString()
    d9 = p9._jdf.queryExecution().optimizedPlan().toString()
    assert len(d9.splitlines()) == len(d2.splitlines())
    assert p9.count() == 3


def test_pagerank_integer_empty_edges(spark):
    from marmaray_spark.operators.web import pagerank_integer

    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank_integer(df).count() == 0


def test_extract_link_hosts_absolute_only(spark):
    """link_hosts: absolute and protocol-relative hrefs yield their
    lowercased port-free hosts (distinct, sorted); relative, fragment,
    javascript: and mailto: targets — no cross-host signal — don't."""
    from marmaray_spark.operators.web import extract_text_from_html

    page = """<body>
      <a href="http://Ex.COM:80/a">x</a>
      <a href="https://user:pw@Peer.ORG/path?q=1#f">y</a>
      <a href="//proto.net/rel">z</a>
      <a href="/relative">no</a> <a href="#frag">no</a>
      <a href="javascript:void(0)">no</a> <a href="mailto:a@b.c">no</a>
      <a href="http://ex.com/b">dup host</a>
      <a name="anchor-without-href">no</a>
      <p>enough words that this block clears the content floor fine</p>
    </body>"""
    df = spark.createDataFrame([(1, page), (2, "<p>no links here at all"
                                               " but plenty of words</p>")],
                               "doc_id long, html string")
    got = {r["doc_id"]: r for r in
           extract_text_from_html(df, "doc_id").collect()}
    assert got[1]["link_hosts"] == ["ex.com", "peer.org", "proto.net"]
    assert got[2]["link_hosts"] == []


def test_link_host_edges_drops_self_links(spark):
    from marmaray_spark.operators.web import link_host_edges

    df = spark.createDataFrame(
        [("http://a.com/p", ["a.com", "b.org", "c.net"]),
         ("https://b.org/q", ["b.org"])],
        "url string, link_hosts array<string>")
    got = {(r["src"], r["dst"])
           for r in link_host_edges(df, "url").collect()}
    assert got == {("a.com", "b.org"), ("a.com", "c.net")}
    assert link_host_edges(df, "url", drop_self=False).count() == 4


def test_url_host_strips_userinfo_matching_href_host(spark):
    """One physical host must be ONE frontier node: url_host (page side)
    and the extractor's href_host (link side) both drop userinfo and
    ports, so self-links filter correctly."""
    df = spark.createDataFrame(
        [(1, "http://alice@Ex.COM:8080/p"), (2, "https://ex.com/q")],
        "i int, url string")
    got = {r["i"]: r["h"]
           for r in df.select("i", url_host("url").alias("h")).collect()}
    assert got[1] == got[2] == "ex.com"


def test_url_host_multi_at_uses_last_at(spark):
    """RFC 3986: userinfo ends at the LAST '@' of the authority. A
    crafted 'http://a@b@evil.com/' must resolve to 'evil.com' on BOTH
    the page side (url_host, greedy '^.*@') and the link side
    (href_host's rsplit('@', 1)) — a first-@ strip yields 'b@evil.com'
    on one side only, splitting one physical host into two frontier
    nodes and defeating self-link filtering (ADVICE r9)."""
    from marmaray_spark.operators.web import extract_text_from_html

    df = spark.createDataFrame([(1, "http://a@b@evil.com/x")],
                               "i int, url string")
    [r] = df.select(url_host("url").alias("h")).collect()
    assert r["h"] == "evil.com"
    page = spark.createDataFrame(
        [(1, '<p>word one two three <a href="http://a@b@evil.com/y">'
             "link</a></p>")], "i int, html string")
    [ex] = extract_text_from_html(page, "i").collect()
    assert ex["link_hosts"] == ["evil.com"]


def test_link_host_edges_no_phantom_empty_source(spark):
    from marmaray_spark.operators.web import link_host_edges

    df = spark.createDataFrame(
        [("not-a-url", ["b.org"]), ("http://a.com/x", ["b.org"])],
        "url string, link_hosts array<string>")
    got = {(r["src"], r["dst"])
           for r in link_host_edges(df, "url").collect()}
    assert got == {("a.com", "b.org")}      # no ('', 'b.org') node


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309): parse_robots + robots_gate
# ---------------------------------------------------------------------------

ROBOTS_BODY = """
# global group
User-agent: *
Disallow: /private/
Allow: /private/public.html
Disallow: /tmp*
Disallow: /exact-dir/$

User-agent: SpecialBot
Disallow: /special-only/

User-agent: rude
Disallow: /
"""


def _robots_df(spark, bodies):
    return spark.createDataFrame(bodies, "host string, robots_txt string")


def test_parse_robots_group_selection_and_rules(spark):
    from marmaray_spark.operators.web import parse_robots

    df = _robots_df(spark, [("ex.com", ROBOTS_BODY)])
    star = {(r["pattern"], r["allow"])
            for r in parse_robots(df, user_agent="SomeCrawler").collect()}
    assert star == {("/private/", False), ("/private/public.html", True),
                    ("/tmp*", False), ("/exact-dir/$", False)}
    # the longest matching UA token's group wins over '*'
    spec = {(r["pattern"], r["allow"])
            for r in parse_robots(df, user_agent="SpecialBot/1.2")
            .collect()}
    assert spec == {("/special-only/", False)}


def test_robots_gate_rfc_precedence(spark):
    from marmaray_spark.operators.web import parse_robots, robots_gate

    rules = parse_robots(_robots_df(spark, [("ex.com", ROBOTS_BODY)]),
                         user_agent="SomeCrawler")
    urls = spark.createDataFrame(
        [(1, "http://ex.com/ok.html"),            # no rule -> allow
         (2, "http://ex.com/private/a.html"),     # disallow
         (3, "http://ex.com/private/public.html"),  # longer ALLOW wins
         (4, "http://ex.com/tmp/x"),              # wildcard disallow
         (5, "http://ex.com/tmpfile"),            # /tmp* matches too
         (6, "http://ex.com/exact-dir/"),         # $-anchored: exact
         (7, "http://ex.com/exact-dir/sub"),      # past anchor -> allow
         (8, "http://other.org/private/a")],      # host with no rules
        "i long, url string")
    allowed, blocked = robots_gate(urls, "url", rules)
    assert {r["i"] for r in blocked.collect()} == {2, 4, 5, 6}
    assert {r["i"] for r in allowed.collect()} == {1, 3, 7, 8}
    assert allowed.columns == urls.columns        # fork keeps the schema


def test_robots_gate_tie_goes_to_allow_and_empty_disallow(spark):
    from marmaray_spark.operators.web import parse_robots, robots_gate

    body = ("User-agent: *\nAllow: /page\nDisallow: /page\n"
            "Disallow:\n")                        # empty = no rule
    rules = parse_robots(_robots_df(spark, [("t.com", body)]))
    urls = spark.createDataFrame([(1, "http://t.com/page"),
                                  (2, "http://t.com/elsewhere")],
                                 "i long, url string")
    allowed, blocked = robots_gate(urls, "url", rules)
    assert {r["i"] for r in allowed.collect()} == {1, 2}
    assert blocked.count() == 0


def test_parse_robots_spec_is_octet_length_and_flips_precedence(spark):
    """RFC 9309 §2.2.2 ranks matching rules by OCTET length, not
    characters: 'Disallow: /aaa' (4 chars = 4 octets) vs 'Allow: *éé'
    (3 chars but 5 octets in UTF-8). Character counting picks the
    disallow; octet counting picks the allow (ADVICE r9)."""
    from marmaray_spark.operators.web import parse_robots, robots_gate

    body = "User-agent: *\nDisallow: /aaa\nAllow: *éé\n"
    rules = parse_robots(_robots_df(spark, [("o.com", body)]))
    specs = {r["pattern"]: r["spec"] for r in rules.collect()}
    assert specs == {"/aaa": 4, "*éé": 5}
    urls = spark.createDataFrame(
        [(1, "http://o.com/aaaéé")], "i long, url string")
    allowed, blocked = robots_gate(urls, "url", rules)
    assert allowed.count() == 1 and blocked.count() == 0


def test_parse_robots_unparseable_body_means_allowed(spark):
    from marmaray_spark.operators.web import parse_robots, robots_gate

    rules = parse_robots(_robots_df(
        spark, [("bad.com", None), ("half.com", "Disallow: /x\n")]))
    # rules before any User-agent line are dropped; None body -> none
    assert rules.count() == 0
    urls = spark.createDataFrame([(1, "http://bad.com/anything")],
                                 "i long, url string")
    allowed, blocked = robots_gate(urls, "url", rules)
    assert allowed.count() == 1 and blocked.count() == 0


def test_extract_rel_canonical_first_wins(spark):
    from marmaray_spark.operators.web import extract_text_from_html

    page = """<html><head>
      <link rel="stylesheet" href="/style.css">
      <link rel="canonical" href="https://ex.com/the-one">
      <link rel="canonical" href="https://ex.com/ignored-second">
      </head><body><p>plenty of words fill this block right up</p>
      </body></html>"""
    df = spark.createDataFrame(
        [(1, page), (2, "<p>no canonical link here but words</p>")],
        "doc_id long, html string")
    got = {r["doc_id"]: r["rel_canonical"] for r in
           extract_text_from_html(df, "doc_id").collect()}
    assert got[1] == "https://ex.com/the-one"
    assert got[2] is None


def test_robots_sitemaps_expression_scan(spark):
    from marmaray_spark.operators.web import robots_sitemaps

    body = ("User-agent: *\nDisallow: /x\n"
            "Sitemap: https://ex.com/sitemap.xml\n"
            "sitemap:https://ex.com/sitemap2.xml \n"
            "# Sitemap: https://ex.com/commented-out.xml is a comment?\n")
    # NB the commented line still matches the lenient scan? No: the
    # regex anchors at optional whitespace then 'sitemap' — a '#'
    # prefix fails the match
    df = spark.createDataFrame([("ex.com", body), ("b.org", None)],
                               "host string, robots_txt string")
    got = {(r["host"], r["sitemap_url"])
           for r in robots_sitemaps(df).collect()}
    assert got == {("ex.com", "https://ex.com/sitemap.xml"),
                   ("ex.com", "https://ex.com/sitemap2.xml")}


def test_parse_sitemap_urlset_index_and_corrupt(spark):
    from marmaray_spark.operators.web import parse_sitemap

    urlset = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>https://ex.com/a</loc>
           <lastmod>2026-01-05</lastmod><priority>0.8</priority></url>
      <url><loc>https://ex.com/b</loc></url>
      <url><lastmod>2026-01-06</lastmod></url>  <!-- no loc: dropped -->
    </urlset>"""
    index = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sitemap><loc>https://ex.com/sitemap-news.xml</loc></sitemap>
    </sitemapindex>"""
    df = spark.createDataFrame(
        [("https://ex.com/sitemap.xml", urlset),
         ("https://ex.com/sitemap_index.xml", index),
         ("https://bad.com/sitemap.xml", "<html>not a sitemap</html>"),
         ("https://worse.com/sitemap.xml", "txt <<< not even xml")],
        "src string, xml string")
    rows = parse_sitemap(df).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    urls = {(r["loc"], r["lastmod"], r["priority_milli"])
            for r in by_kind["url"]}
    assert urls == {("https://ex.com/a", "2026-01-05", 800),
                    ("https://ex.com/b", None, None)}
    assert [r["loc"] for r in by_kind["sitemap"]] == [
        "https://ex.com/sitemap-news.xml"]
    errs = {r["src"]: r["err"] for r in by_kind["error"]}
    assert set(errs) == {"https://bad.com/sitemap.xml",
                         "https://worse.com/sitemap.xml"}
    assert all(not r["ok"] for r in by_kind["error"])


def test_parse_robots_combines_repeated_star_groups(spark):
    """RFC 9309 §2.2.1: multiple groups for the same agent MUST merge —
    real robots.txt files routinely repeat 'User-agent: *'."""
    from marmaray_spark.operators.web import parse_robots, robots_gate

    body = ("User-agent: *\nDisallow: /a\n\n"
            "Sitemap: https://ex.com/s.xml\n\n"
            "User-agent: *\nDisallow: /b\n")
    rules = parse_robots(_robots_df(spark, [("ex.com", body)]))
    assert {r["pattern"] for r in rules.collect()} == {"/a", "/b"}
    urls = spark.createDataFrame(
        [(1, "http://ex.com/a"), (2, "http://ex.com/b"),
         (3, "http://ex.com/c")], "i long, url string")
    _, blocked = robots_gate(urls, "url", rules)
    assert {r["i"] for r in blocked.collect()} == {1, 2}


def test_robots_gate_survives_colliding_column_names(spark):
    """A corpus frame may already carry columns named allow/spec/
    like_pattern/host — the gate packs the caller's row into a struct
    before joining, so nothing collides."""
    from marmaray_spark.operators.web import parse_robots, robots_gate

    rules = parse_robots(_robots_df(
        spark, [("ex.com", "User-agent: *\nDisallow: /private/\n")]))
    urls = spark.createDataFrame(
        [(1, "http://ex.com/private/x", True, 9, "zz", "h"),
         (2, "http://ex.com/open", False, 3, "yy", "g")],
        "i long, url string, allow boolean, spec int, "
        "like_pattern string, host string")
    allowed, blocked = robots_gate(urls, "url", rules)
    assert [r["i"] for r in blocked.collect()] == [1]
    row = {r["i"]: r for r in allowed.collect()}[2]
    # caller columns come back VERBATIM
    assert (row["allow"], row["spec"], row["like_pattern"], row["host"]) \
        == (False, 3, "yy", "g")


# ---------------------------------------------------------------------------
# round 10: PSL rollup, canonical-hint dedup, sitemap discovery loop,
# maintained link edges — the discovery surface CONSUMED (r9 verdict 3-6)
# ---------------------------------------------------------------------------


def test_registrable_domain_psl_cctld_wildcard_exception(spark):
    """The PSL option the two-label docstring promises: co.uk/com.au
    hosts roll up to eTLD+1, wildcard and exception rules follow the
    publicsuffix.org algorithm, and rule-less TLDs degrade to exactly
    the two-label answer."""
    from marmaray_spark.operators.web import registrable_domain_psl

    psl = {"com", "uk", "co.uk", "au", "com.au", "ck", "*.ck", "!www.ck"}
    df = spark.createDataFrame(
        [(1, "news.bbc.co.uk"), (2, "a.example.com"), (3, "foo.com.au"),
         (4, "single"), (5, "co.uk"), (6, "a.b.ck"), (7, "www.ck"),
         (8, "x.unknown-tld"), (9, None)],
        "i int, h string")
    got = {r["i"]: r["d"] for r in df.select(
        "i", registrable_domain_psl("h", psl).alias("d")).collect()}
    assert got[1] == "bbc.co.uk"      # two-label form would say 'co.uk'
    assert got[2] == "example.com"
    assert got[3] == "foo.com.au"     # two-label form would say 'com.au'
    assert got[4] == "single"
    assert got[5] == "co.uk"          # host IS a suffix: pass-through
    assert got[6] == "a.b.ck"         # wildcard *.ck => b.ck is a suffix
    assert got[7] == "www.ck"         # exception rule !www.ck
    assert got[8] == "x.unknown-tld"  # no rule -> implicit-* (two-label)
    assert got[9] is None


def test_blocklist_gate_psl_separates_cctld_domains(spark):
    """With the two-label form every *.co.uk host shares one bucket, so
    blocking one UK site blocks the whole ccTLD; the PSL option keeps
    them apart."""
    from marmaray_spark.operators.web import blocklist_gate

    docs = spark.createDataFrame(
        [(1, "http://news.bbc.co.uk/x"), (2, "http://evil.co.uk/y"),
         (3, "http://ok.com/z")], "i int, url string")
    bl = spark.createDataFrame([("evil.co.uk",)], "domain string")
    kept, blocked = blocklist_gate(
        docs, "url", bl, psl_suffixes={"com", "uk", "co.uk"})
    assert {r["i"] for r in blocked.collect()} == {2}
    assert {r["i"] for r in kept.collect()} == {1, 3}
    # the two-label default can't express this blocklist: both UK hosts
    # roll up to 'co.uk' and the bbc page would be collateral damage
    kept2, blocked2 = blocklist_gate(
        docs, "url", spark.createDataFrame([("co.uk",)], "domain string"))
    assert {r["i"] for r in blocked2.collect()} == {1, 2}


def test_canonical_dedup_collapses_declared_duplicates(spark):
    """The rel_canonical CONSUMER (r9 verdict item 4): pages declaring
    the same canonical target collapse first-occurrence-wins — including
    a print-view twin whose URL differs (URL dedup alone misses it) and
    a path-absolute hint resolved against the page's own host; junk or
    missing hints fall back to the page's own canonical URL and never
    merge unrelated pages."""
    from marmaray_spark.operators.web import canonical_dedup

    docs = spark.createDataFrame(
        [(1, "http://ex.com/article", None),
         # URL-canonical twin of 1 (tracking params): collapses via the
         # own-URL fallback even with no hint
         (2, "http://ex.com/article?utm_source=x", None),
         # DIFFERENT URL, declares 1's URL canonical: only the hint
         # can collapse this one
         (3, "http://ex.com/article/print", "http://ex.com/article"),
         # path-absolute hint resolves against the page's scheme+host
         (4, "http://ex.com/amp/article", "/article"),
         # junk hint -> own URL -> kept
         (5, "http://ex.com/other", "not a url")],
        "i int, url string, rel_canonical string")
    kept = canonical_dedup(docs, "i", "url")
    assert {r["i"] for r in kept.collect()} == {1, 5}
    assert kept.columns == docs.columns


def test_sitemap_discovery_two_ticks_and_replay(spark, tmp_path):
    """The sitemap CONSUMER (r9 verdict item 3), e2e in the
    warc-incremental-loop style: robots Sitemap: directives seed the
    discovered set, a <sitemapindex> drains one level per tick (the WARC
    backlog-drain shape), <urlset> entries accrue as deduped seed rows,
    a malformed child is consumed (error counted, never retried), and a
    replayed tick lands on identical rows."""
    from marmaray_spark.operators.web import (robots_sitemaps,
                                              sitemap_discovery_tick)
    from marmaray_spark.sinks.table import TableSink

    discovered = TableSink(spark, tmp_path / "disc", "sitemap_url")
    parsed = TableSink(spark, tmp_path / "parsed", "sitemap_url")
    seeds = TableSink(spark, tmp_path / "seeds", "url")

    robots = spark.createDataFrame(
        [("ex.com", "User-agent: *\nDisallow: /x\n"
          "Sitemap: http://ex.com/index.xml\n")],
        "host string, robots_txt string")
    index_xml = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>http://ex.com/s1.xml</loc></sitemap>"
        "<sitemap><loc>http://ex.com/s2.xml</loc></sitemap>"
        "<sitemap><loc>http://ex.com/s3.xml</loc></sitemap>"
        "</sitemapindex>")
    s1_xml = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://ex.com/a</loc><lastmod>2026-01-02</lastmod>"
        "<priority>0.8</priority></url>"
        "<url><loc>http://ex.com/b</loc></url>"
        "</urlset>")
    bodies = spark.createDataFrame(
        [("http://ex.com/index.xml", index_xml),
         ("http://ex.com/s1.xml", s1_xml),
         ("http://ex.com/s2.xml", "<notasitemap/>"),
         # VALID but empty urlset: zero seed rows, yet it must still be
         # marked parsed — deriving the consumed set from output rows
         # left it pending (and refetched) forever (review find, r10)
         ("http://ex.com/s3.xml",
          '<urlset xmlns="http://www.sitemaps.org/schemas/'
          'sitemap/0.9"></urlset>')],
        "sitemap_url string, xml string")

    # tick 1: only the robots-discovered index parses (its children are
    # unknown until it parses — one level per tick)
    r1 = sitemap_discovery_tick(discovered, parsed, seeds, bodies,
                                new_sitemaps=robots_sitemaps(robots))
    assert r1["new_sitemaps"] == 1 and r1["parsed"] == 1
    assert r1["child_sitemaps"] == 3 and r1["seed_urls"] == 0

    # tick 2: all three children drain — s1 seeds two URLs, malformed
    # s2 is consumed as an error row (not retried forever), EMPTY s3 is
    # consumed ok
    r2 = sitemap_discovery_tick(discovered, parsed, seeds, bodies)
    assert r2["parsed"] == 3 and r2["seed_urls"] == 2
    assert r2["errors"] == 1 and r2["child_sitemaps"] == 0
    got = {r["url"]: (r["lastmod"], r["priority_milli"])
           for r in seeds.read().collect()}
    assert got == {"http://ex.com/a": ("2026-01-02", 800),
                   "http://ex.com/b": (None, None)}

    # tick 3 = replay / nothing new: every sink unchanged
    before = (discovered.read().count(), parsed.read().count(),
              seeds.read().count())
    r3 = sitemap_discovery_tick(discovered, parsed, seeds, bodies,
                                new_sitemaps=robots_sitemaps(robots))
    assert (r3["new_sitemaps"], r3["parsed"], r3["seed_urls"]) == (0, 0, 0)
    assert before == (discovered.read().count(), parsed.read().count(),
                      seeds.read().count())


def test_maintain_link_edges_updates_and_drops(spark, tmp_path):
    """The frontier edge accrual on the SHARED maintainer skeleton (r9
    verdict item 6): page-owned (page, dst) edge rows follow the pages
    table's commit log — an update that drops a link removes its edge,
    an overwrite-dropped page takes its edges along, and a no-change
    drain is a no-op."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.web import maintain_link_edges
    from marmaray_spark.sinks.table import TableSink, WriteOp

    pages = TableSink(spark, tmp_path / "pages", "target_uri")
    edges = TableSink(spark, tmp_path / "edges", "report_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    pages.write(spark.createDataFrame(
        [("http://a.com/1", ["b.org", "c.net"]),
         ("http://b.org/x", ["c.net", "b.org"])],   # self-link filtered
        "target_uri string, link_hosts array<string>"), WriteOp.INSERT)
    assert maintain_link_edges(pages, edges, md, "target_uri") == 3
    got = {(r["src"], r["dst"]) for r in edges.read().collect()}
    assert got == {("a.com", "b.org"), ("a.com", "c.net"),
                   ("b.org", "c.net")}

    # update page a: the c.net link disappears -> so must its edge
    pages.write(spark.createDataFrame(
        [("http://a.com/1", ["b.org"])],
        "target_uri string, link_hosts array<string>"), WriteOp.UPSERT)
    maintain_link_edges(pages, edges, md, "target_uri")
    got = {(r["src"], r["dst"]) for r in edges.read().collect()}
    assert got == {("a.com", "b.org"), ("b.org", "c.net")}

    # overwrite drops page b entirely: its edge leaves too
    keep = pages.read().filter("target_uri = 'http://a.com/1'")
    pages.write(keep, WriteOp.INSERT_OVERWRITE)
    maintain_link_edges(pages, edges, md, "target_uri")
    got = {(r["src"], r["dst"]) for r in edges.read().collect()}
    assert got == {("a.com", "b.org")}
    # drained dry: no-op
    assert maintain_link_edges(pages, edges, md, "target_uri") == 0


def test_fetch_frontier_ranks_and_gates(spark):
    """The discovery capstone: sitemap seeds minus crawled pages, robots
    gated, ordered by host PageRank then publisher priority; unknown
    hosts and missing priorities sort last in their tier."""
    from marmaray_spark.operators.web import fetch_frontier, parse_robots

    seeds = spark.createDataFrame(
        [("http://big.com/new1", 800, "2026-01-01"),
         ("http://big.com/new2", None, None),
         ("http://big.com/old", 900, None),         # already crawled
         ("http://big.com/private/x", 1000, None),  # robots-blocked
         ("http://small.org/a", 500, None),
         ("http://unknown.net/z", 1000, None)],     # host not in graph
        "url string, priority_milli int, lastmod string")
    crawled = spark.createDataFrame([("http://big.com/old",)],
                                    "target_uri string")
    ranks = spark.createDataFrame(
        [("big.com", 900_000_000_000), ("small.org", 100_000_000_000)],
        "node string, rank long")
    rules = parse_robots(spark.createDataFrame(
        [("big.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string"))
    got = fetch_frontier(seeds, crawled, ranks, rules=rules,
                         crawled_url_col="target_uri").collect()
    assert [r["url"] for r in got] == [
        "http://big.com/new1",      # top host, priority 800
        "http://big.com/new2",      # top host, no priority -> after
        "http://small.org/a",       # lower-ranked host
        "http://unknown.net/z"]     # no rank -> explored last
    assert got[0]["rank"] == 900_000_000_000
    assert got[0]["lastmod"] == "2026-01-01"


def test_fetch_frontier_minimal_inputs(spark):
    """Seeds alone (no crawl history, no ranks, no robots) still yield
    a deterministic list — the cold-start crawl."""
    from marmaray_spark.operators.web import fetch_frontier

    seeds = spark.createDataFrame([("http://a.com/1",), ("http://b.org/2",)],
                                  "url string")
    got = fetch_frontier(seeds, None, None).collect()
    assert [r["url"] for r in got] == ["http://a.com/1", "http://b.org/2"]
    assert all(r["rank"] is None for r in got)


def test_blocklist_gate_userinfo_cannot_bypass(spark):
    """'http://x@evil.com/p' must roll up to evil.com's bucket — a
    userinfo prefix walked straight past the blocklist before the
    host-identity strip (review find, r10); same on the PSL path."""
    from marmaray_spark.operators.web import blocklist_gate

    docs = spark.createDataFrame(
        [(1, "http://x@evil.com/p"), (2, "http://evil.com/q"),
         (3, "http://fine.org/r"), (4, "http://a@b@evil.co.uk/s")],
        "i int, url string")
    bl = spark.createDataFrame([("evil.com",), ("evil.co.uk",)],
                               "domain string")
    _, blocked = blocklist_gate(docs, "url", bl)
    assert {r["i"] for r in blocked.collect()} == {1, 2}
    _, blocked_psl = blocklist_gate(docs, "url", bl,
                                    psl_suffixes={"com", "uk", "co.uk"})
    assert {r["i"] for r in blocked_psl.collect()} == {1, 2, 4}


def test_canonical_dedup_rejects_cross_site_hijack_and_null_urls(spark):
    """An absolute hint is honored only same-registrable-domain — a
    hostile page claiming another site's article as canonical must not
    evict it — and null-URL rows bypass the dedup instead of collapsing
    into one NULL group (review finds, r10)."""
    from marmaray_spark.operators.web import canonical_dedup

    docs = spark.createDataFrame(
        [(1, "http://ex.com/article", None),
         # hijack attempt: spam page claims the article as canonical
         (0, "http://aaa-spam.com/x", "http://ex.com/article"),
         # legit same-site hint (www + port variance) still collapses
         (2, "http://www.ex.com:80/article/print",
          "http://ex.com/article"),
         (7, None, None),
         (8, None, "http://ex.com/article")],
        "i int, url string, rel_canonical string")
    kept = {r["i"] for r in canonical_dedup(docs, "i", "url").collect()}
    # 0 kept (its hint ignored -> own URL), 1 kept, 2 collapsed into 1,
    # both null-URL rows kept
    assert kept == {0, 1, 7, 8}


def test_canonical_dedup_psl_trust_boundary(spark):
    """Two-label trust treats every *.github.io sibling as same-site, so
    evil.github.io can declare canonical at victim.github.io and (with
    the smaller id) evict the real page — the advisor's r10 hijack.
    With ``psl_suffixes`` the boundary is the PSL registrable domain:
    the hijack is refused while legit same-registrable hints on a
    multi-label suffix (www.bbc.co.uk -> bbc.co.uk) still collapse."""
    from marmaray_spark.operators.web import canonical_dedup

    psl = {"com", "io", "uk", "co.uk", "github.io"}
    docs = spark.createDataFrame(
        [(5, "http://victim.github.io/post", None),
         (1, "http://evil.github.io/spam", "http://victim.github.io/post"),
         (7, "http://www.bbc.co.uk/news/print", "http://bbc.co.uk/news"),
         (9, "http://bbc.co.uk/news", None)],
        "i int, url string, rel_canonical string")
    # the two-label form is the documented weakness: the hijack lands
    # (both hosts roll up to 'github.io') and the victim is evicted
    two = {r["i"] for r in canonical_dedup(docs, "i", "url").collect()}
    assert two == {1, 7}
    # PSL: distinct registrable domains -> hint refused, victim kept;
    # bbc print twin still collapses (min id wins)
    kept = {r["i"] for r in
            canonical_dedup(docs, "i", "url", psl_suffixes=psl).collect()}
    assert kept == {1, 5, 7}


def test_maintain_link_edges_rolls_checkpoint_back_on_raise(spark, tmp_path):
    """The shared maintainer skeleton restores the pre-drain checkpoint
    when the drain raises (vacuumed pre-image) — the cms rollback
    contract applied to maintain_projection/maintain_sparse_report
    (review find, r10): without it a later caller save_changes()
    persists a checkpoint for commits whose projections never landed."""
    import shutil

    import pytest

    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.web import maintain_link_edges
    from marmaray_spark.sinks.table import TableSink, WriteOp

    pages = TableSink(spark, tmp_path / "pages", "target_uri")
    edges = TableSink(spark, tmp_path / "edges", "report_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    pages.write(spark.createDataFrame(
        [("http://a.com/1", ["b.org"])],
        "target_uri string, link_hosts array<string>"), WriteOp.INSERT)
    maintain_link_edges(pages, edges, md, "target_uri")
    good = md.get("link_edges.last_commit")

    pages.write(spark.createDataFrame(
        [("http://a.com/1", ["c.net"])],
        "target_uri string, link_hosts array<string>"), WriteOp.UPSERT)
    for s in pages.log.commits()[-1].removes:
        p = pages.table_path / s
        shutil.rmtree(p) if p.is_dir() else p.unlink()
    # the vacuumed slice surfaces either as the loud FileNotFoundError
    # from the removes check or as the as_of read's AnalysisException
    # (with_op change capture time-travels to the previous commit) —
    # the rollback must cover both, hence except BaseException
    with pytest.raises(Exception):
        maintain_link_edges(pages, edges, md, "target_uri")
    assert md.get("link_edges.last_commit") == good
    md.save_changes()
    assert FileSystemMetadataManager(str(tmp_path / "md")).get(
        "link_edges.last_commit") == good


def test_maintain_link_edges_dedup_insert_fast_path_exact(spark, tmp_path):
    """dedup-insert drains ride the maintainers' append-only fast path
    (new keys guaranteed -> no stale probe, no merge); the edge table
    must still be EXACTLY the full re-derive after fast ticks, after a
    mixed fast-then-slow sequence, and across both paths' writes."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.web import (link_host_edges,
                                              maintain_link_edges)
    from marmaray_spark.sinks.table import TableSink, WriteOp

    pages = TableSink(spark, tmp_path / "pages", "target_uri")
    edges = TableSink(spark, tmp_path / "edges", "report_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    def full():
        return {(r["src"], r["dst"]) for r in link_host_edges(
            pages.read(), "target_uri").collect()}

    def maintained():
        return {(r["src"], r["dst"]) for r in edges.read().collect()}

    pages.write(spark.createDataFrame(
        [("http://a.com/1", ["b.org"]), ("http://b.org/x", ["a.com"])],
        "target_uri string, link_hosts array<string>"),
        WriteOp.DEDUP_INSERT)
    assert maintain_link_edges(pages, edges, md, "target_uri") == 2
    assert maintained() == full()

    # second fast tick, including a key-dup row the dedup filters out
    pages.write(spark.createDataFrame(
        [("http://a.com/1", ["SHOULD-NOT-LAND"]),
         ("http://c.net/y", ["a.com", "b.org"])],
        "target_uri string, link_hosts array<string>"),
        WriteOp.DEDUP_INSERT)
    maintain_link_edges(pages, edges, md, "target_uri")
    assert maintained() == full()
    assert ("a.com", "should-not-land") not in maintained()

    # slow path after fast path: an update drops one of c's links
    pages.write(spark.createDataFrame(
        [("http://c.net/y", ["a.com"])],
        "target_uri string, link_hosts array<string>"), WriteOp.UPSERT)
    maintain_link_edges(pages, edges, md, "target_uri")
    assert maintained() == full()
    assert maintain_link_edges(pages, edges, md, "target_uri") == 0


def test_maintain_link_edges_fast_path_crash_replay_no_duplicates(
        spark, tmp_path):
    """The append fast path writes DEDUP_INSERT, not INSERT: a crash
    between the edge commit and the checkpoint save replays the drain,
    and the replayed append must land on ZERO new rows — plain INSERT
    would silently duplicate every edge (review find, r10)."""
    import pytest

    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.web import maintain_link_edges
    from marmaray_spark.sinks.table import TableSink, WriteOp

    pages = TableSink(spark, tmp_path / "pages", "target_uri")
    edges = TableSink(spark, tmp_path / "edges", "report_key")
    md_dir = str(tmp_path / "md")

    class CrashyMd(FileSystemMetadataManager):
        def save_changes(self):
            raise RuntimeError("simulated crash before checkpoint")

    pages.write(spark.createDataFrame(
        [("http://a.com/1", ["b.org", "c.net"])],
        "target_uri string, link_hosts array<string>"),
        WriteOp.DEDUP_INSERT)
    with pytest.raises(RuntimeError, match="simulated crash"):
        maintain_link_edges(pages, edges, CrashyMd(md_dir), "target_uri")
    assert edges.read().count() == 2      # the commit itself landed
    # recovery drain replays the same commits: zero duplicates
    maintain_link_edges(pages, edges,
                        FileSystemMetadataManager(md_dir), "target_uri")
    assert edges.read().count() == 2
    rows = edges.read().groupBy("report_key").count().collect()
    assert all(r["count"] == 1 for r in rows)


def test_maintainers_refuse_restored_base(spark, tmp_path):
    """A restore rolls keys back to older values with NO change records
    — every maintained twin would silently keep rows derived from
    versions the base no longer holds, so consume_latest refuses loudly
    (the cms posture, generalized; review find r10: the append fast
    path would even have resurrected restore-dropped keys)."""
    import pytest

    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.web import maintain_link_edges
    from marmaray_spark.sinks.table import TableSink, WriteOp

    pages = TableSink(spark, tmp_path / "pages", "target_uri")
    edges = TableSink(spark, tmp_path / "edges", "report_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    c0 = pages.write(spark.createDataFrame(
        [("http://a.com/1", ["b.org"])],
        "target_uri string, link_hosts array<string>"),
        WriteOp.DEDUP_INSERT)
    maintain_link_edges(pages, edges, md, "target_uri")
    pages.write(spark.createDataFrame(
        [("http://b.org/x", ["c.net"])],
        "target_uri string, link_hosts array<string>"),
        WriteOp.DEDUP_INSERT)
    pages.restore(c0.commit_id)           # rolls the second page back
    with pytest.raises(ValueError, match="restored"):
        maintain_link_edges(pages, edges, md, "target_uri")
    # nothing resurrected: the edge table still holds only page a's edge
    assert {(r["src"], r["dst"]) for r in edges.read().collect()} == \
        {("a.com", "b.org")}


def test_maintain_link_edges_mor_compaction_bounded(spark, tmp_path):
    """A merge-on-read edge table's latest-wins read tax is bounded BY
    POLICY: every successful drain asks maybe_compact, so update ticks
    can never accrue more than max_delta_slices active deltas (r10
    shipped the policy with no consumer — this pins the wiring)."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.web import maintain_link_edges
    from marmaray_spark.sinks.table import TableSink, WriteOp

    pages = TableSink(spark, tmp_path / "pages", "target_uri")
    edges = TableSink(spark, tmp_path / "edges", "report_key",
                      table_type="mor")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    schema = "target_uri string, link_hosts array<string>, v int"

    pages.write(spark.createDataFrame(
        [("http://a.com/1", ["b.org"], 0)], schema), WriteOp.INSERT)
    maintain_link_edges(pages, edges, md, "target_uri",
                        max_delta_slices=2)
    for i in range(1, 6):
        # same edges, changed payload: each drain re-asserts the row as
        # a change-scale UPSERT = one more MOR delta slice
        pages.write(spark.createDataFrame(
            [("http://a.com/1", ["b.org"], i)], schema), WriteOp.UPSERT)
        maintain_link_edges(pages, edges, md, "target_uri",
                            max_delta_slices=2)
        assert len(edges.log.active_state()[1]) < 2
        assert [(r["src"], r["dst"]) for r in edges.read().collect()] \
            == [("a.com", "b.org")]
    assert any(c.op == "compact" for c in edges.log.commits())


def test_refresh_host_ranks_cadence_and_replay(spark, tmp_path):
    """The frontier ranks table rides a policy CADENCE (r10 verdict
    item 6, measured: per-tick pagerank recompute is 2-10x a tick):
    refresh fires only when >= min_new_commits edge commits landed,
    the stored table equals the direct recompute, a no-news call is a
    0-cost skip, and a crash between the ranks commit and the
    checkpoint save replays onto the same idempotent overwrite."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.web import (pagerank_integer,
                                              refresh_host_ranks)
    from marmaray_spark.sinks.table import TableSink, WriteOp

    edges = TableSink(spark, tmp_path / "edges", "report_key")
    ranks = TableSink(spark, tmp_path / "ranks", "node")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    def edge_rows(pairs):
        return spark.createDataFrame(
            [(f"{s}->{d}", s, d) for s, d in pairs],
            "report_key string, src string, dst string")

    edges.write(edge_rows([("a", "b"), ("b", "c"), ("c", "a")]),
                WriteOp.INSERT)
    assert refresh_host_ranks(edges, ranks, md, min_new_commits=2) == 0
    assert ranks.is_empty()                      # cadence said wait
    edges.write(edge_rows([("c", "b")]), WriteOp.DEDUP_INSERT)
    n = refresh_host_ranks(edges, ranks, md, min_new_commits=2)
    assert n == 3
    direct = {(r["node"], r["rank"]) for r in pagerank_integer(
        edges.read().select("src", "dst"), "src", "dst", iters=5)
        .collect()}
    assert {(r["node"], r["rank"])
            for r in ranks.read().collect()} == direct
    # no new commits: skip, table untouched
    assert refresh_host_ranks(edges, ranks, md, min_new_commits=1) == 0

    # crash replay: the ranks overwrite landed but the checkpoint save
    # did not -> the next refresh recomputes the SAME table
    edges.write(edge_rows([("a", "c")]), WriteOp.DEDUP_INSERT)
    md2 = FileSystemMetadataManager(str(tmp_path / "md"))
    md2.save_changes = lambda: None
    assert refresh_host_ranks(edges, ranks, md2) == 3
    after = sorted(map(tuple, ranks.read().collect()))
    md3 = FileSystemMetadataManager(str(tmp_path / "md"))
    assert refresh_host_ranks(edges, ranks, md3) == 3   # replays
    assert sorted(map(tuple, ranks.read().collect())) == after
    assert refresh_host_ranks(edges, ranks, md3) == 0   # now durable


def test_refresh_host_ranks_save_changes_optout(spark, tmp_path):
    """save_changes=False (the DAG commit-phase form): the ranks
    checkpoint advances IN MEMORY only. The frontier commit runs at
    priority 90 over the SAME metadata manager that already carries
    the un-persisted source checkpoint; persisting inside the refresh
    would durably skip the source window if the priority-100 table
    commit then failed (the r11-advice data-loss ordering). The
    caller's single save_changes() stays the only persistence point."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.web import refresh_host_ranks
    from marmaray_spark.sinks.table import TableSink, WriteOp

    edges = TableSink(spark, tmp_path / "edges", "report_key")
    ranks = TableSink(spark, tmp_path / "ranks", "node")
    edges.write(spark.createDataFrame(
        [("a->b", "a", "b"), ("b->a", "b", "a")],
        "report_key string, src string, dst string"), WriteOp.INSERT)

    md = FileSystemMetadataManager(str(tmp_path / "md"))
    md.set("source.ckpt", "window-1")        # un-persisted, like mid-DAG
    assert refresh_host_ranks(edges, ranks, md, save_changes=False) == 2
    # in-memory cadence satisfied: the same run skips a re-refresh
    assert refresh_host_ranks(edges, ranks, md, save_changes=False) == 0
    # but NOTHING was persisted — neither the ranks checkpoint nor the
    # source checkpoint it rides with
    md_crash = FileSystemMetadataManager(str(tmp_path / "md"))
    assert not md_crash.get("host_ranks.last_commit")
    assert not md_crash.get("source.ckpt")
    # crash replay onto the idempotent overwrite converges
    assert refresh_host_ranks(edges, ranks, md_crash,
                              save_changes=False) == 2

    # the happy path: the caller's save_changes() makes both durable
    md.save_changes()
    md_re = FileSystemMetadataManager(str(tmp_path / "md"))
    assert md_re.get("source.ckpt") == "window-1"
    assert refresh_host_ranks(edges, ranks, md_re) == 0   # durable skip
