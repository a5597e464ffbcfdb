"""Config-driven assembly: YAML -> JobDag -> run -> verify outputs."""

import pytest
import yaml
from pyspark.sql import functions as F

from marmaray_spark.config import Configuration
from marmaray_spark.plans.assembly import build_job_dag
from marmaray_spark.sinks.table import TableSink, WriteOp


@pytest.fixture()
def source_table(spark, orders, tmp_path):
    src = tmp_path / "src"
    (orders.withColumn("o_custkey",
                       F.when(F.col("o_orderkey") % 13 == 0, None)
                       .otherwise(F.col("o_custkey")))
     .withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
     .write.partitionBy("month").parquet(str(src)))
    return src


def _config(tmp_path, src, sink_over=None):
    tree = {
        "job": {"name": "cfg_job"},
        "source": {"type": "parquet", "path": str(src)},
        "converter": {"required_keys": "o_orderkey,o_custkey"},
        "sink": {"type": "table", "path": str(tmp_path / "out_table"),
                 "record_key": "o_orderkey", "op": "upsert"},
        "error_table": {"path": str(tmp_path / "errs")},
        "checkpoints": {"path": str(tmp_path / "ckpt")},
    }
    if sink_over:
        tree["sink"] = sink_over
    return Configuration.from_tree(tree)


def test_yaml_assembled_pipeline_runs_incrementally(spark, source_table, tmp_path):
    cfg = _config(tmp_path, source_table)
    dag = build_job_dag(spark, cfg)
    assert dag.execute(spark) is True

    t = TableSink(spark, tmp_path / "out_table", record_key_field="o_orderkey")
    n1 = t.read().count()
    assert n1 > 0
    assert t.read().filter(F.col("o_custkey").isNull()).count() == 0

    # a fresh dag from the SAME config continues from the checkpoint
    dag2 = build_job_dag(spark, _config(tmp_path, source_table))
    assert dag2.execute(spark) is True
    assert t.read().count() > n1


def test_yaml_roundtrip_file_sink(spark, source_table, tmp_path):
    cfg_yaml = yaml.safe_dump({
        "job": {"name": "csv_job"},
        "source": {"type": "parquet", "path": str(source_table)},
        "sink": {"type": "csv", "path": str(tmp_path / "csv_out")},
        "checkpoints": {"path": str(tmp_path / "ck2")},
    })
    p = tmp_path / "job.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True
    assert spark.read.option("header", True).csv(str(tmp_path / "csv_out")).count() > 0


def test_unknown_types_fail_at_assembly(spark, tmp_path):
    bad = Configuration.from_tree({
        "job": {"name": "x"}, "source": {"type": "mongo", "path": "/x"},
        "sink": {"type": "table", "path": "/y", "record_key": "k"},
        "checkpoints": {"path": str(tmp_path / "c")},
    })
    with pytest.raises(ValueError, match="source.type"):
        build_job_dag(spark, bad)


def test_table_commit_deferred_until_sibling_sinks_succeed(spark, source_table,
                                                           tmp_path):
    """Two-phase contract: if a sibling sink fails after the table node's
    write phase, the table commit must NOT be published and the checkpoint
    must not advance — the rerun reprocesses the same work unit exactly
    once (no duplicate rows)."""
    from marmaray_spark.plans.dag import SinkNode

    cfg = _config(tmp_path, source_table)
    dag = build_job_dag(spark, cfg)

    def boom(df):
        raise RuntimeError("sibling sink failed")

    dag.sub_dag.nodes.append(SinkNode("boom", boom, priority=50))
    with pytest.raises(RuntimeError, match="sibling sink failed"):
        dag.execute(spark)

    # nothing published: the table has no commits at all
    t = TableSink(spark, tmp_path / "out_table", record_key_field="o_orderkey")
    assert t.is_empty()

    # a clean rerun from the same config processes the work exactly once
    dag2 = build_job_dag(spark, _config(tmp_path, source_table))
    assert dag2.execute(spark) is True
    assert t.read().count() > 0
    assert len(t.log.commits()) == 1


def test_yaml_corpus_pipeline_stages(spark, documents, tmp_path):
    """The corpus.* block wires the LLM-pipeline stages from YAML alone:
    quality/Gopher gates -> exact dedup -> temperature mix, then the
    table sink. Stage semantics must match calling the operators
    directly."""
    src = tmp_path / "docs_src"
    documents.select("doc_id", "lang", "text").write.parquet(str(src))
    cfg_yaml = yaml.safe_dump({
        "job": {"name": "corpus_job"},
        "source": {"type": "parquet", "path": str(src)},
        "corpus": {"text_col": "text", "id_col": "doc_id",
                   "quality_min": 40, "gopher_gate": True,
                   "exact_dedup": True,
                   "mix_group_col": "lang", "mix_keep_bps": 6000},
        "sink": {"type": "table", "path": str(tmp_path / "corpus_table"),
                 "record_key": "doc_id", "op": "insert"},
        "checkpoints": {"path": str(tmp_path / "ck3")},
    })
    p = tmp_path / "corpus.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True

    from marmaray_spark.operators.dedup import exact_dedup
    from marmaray_spark.operators.text import (gopher_repetition_pass,
                                               quality_score,
                                               temperature_mix, words)

    docs = spark.read.parquet(str(src)).withColumn("w", words("text"))
    gated = docs.filter((quality_score("text", words_col="w") >= 40)
                        & gopher_repetition_pass("w")).drop("w")
    keepers = exact_dedup(gated, id_col="doc_id", text_col="text") \
        .select(F.col("keeper_id").alias("doc_id"))
    deduped = gated.join(keepers, "doc_id", "left_semi")
    expected = temperature_mix(deduped, "doc_id", "lang", keep_bps=6000)

    t = TableSink(spark, tmp_path / "corpus_table",
                  record_key_field="doc_id")
    got = sorted(r["doc_id"] for r in t.read().select("doc_id").collect())
    want = sorted(r["doc_id"] for r in expected.select("doc_id").collect())
    assert got == want and 0 < len(got) < documents.count()


def test_yaml_corpus_unimax_and_massivetext_stages(spark, documents,
                                                   tmp_path):
    """corpus.massivetext_gate (the full table-A1 repetition battery) and
    the corpus.unimax_* mixer wire from YAML alone and match direct
    operator calls — materialized rows repeat per allocated epoch with
    the `epoch` column the writer orders by."""
    src = tmp_path / "um_src"
    documents.select("doc_id", "lang", "text").write.parquet(str(src))

    from marmaray_spark.operators.text import (massivetext_repetition_pass,
                                               unimax_allocation,
                                               unimax_materialize, words)

    docs = spark.read.parquet(str(src)).withColumn("__w", words("text"))
    gated = docs.filter(massivetext_repetition_pass("__w")).drop("__w")
    toks = gated.withColumn("__nt", F.size(words("text")))
    total = toks.agg(F.sum("__nt")).first()[0]
    budget = int(total * 12 // 10)

    cfg_yaml = yaml.safe_dump({
        "job": {"name": "unimax_job"},
        "source": {"type": "parquet", "path": str(src)},
        "corpus": {"text_col": "text", "id_col": "doc_id",
                   "massivetext_gate": True,
                   "unimax_group_col": "lang",
                   "unimax_budget_tokens": budget,
                   "unimax_epoch_cap": 2},
        "sink": {"type": "csv",
                 "path": str(tmp_path / "um_out")},
        "checkpoints": {"path": str(tmp_path / "cku")},
    })
    p = tmp_path / "unimax.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True

    alloc = unimax_allocation(toks, "lang", "__nt",
                              budget_tokens=budget, epoch_cap=2)
    expected = unimax_materialize(toks, "doc_id", "lang", alloc,
                                  epoch_col="epoch").drop("__nt")
    want = sorted((r["doc_id"], r["epoch"])
                  for r in expected.select("doc_id", "epoch").collect())
    got_df = (spark.read.option("header", "true")
              .csv(str(tmp_path / "um_out")))
    got = sorted((int(r["doc_id"]), int(r["epoch"]))
                 for r in got_df.select("doc_id", "epoch").collect())
    assert got == want and len(got) > documents.count() // 2
    # at least one group earned a repeat epoch under a 1.2x budget
    assert any(e >= 2 for _, e in got)


def test_yaml_corpus_unimax_config_validation(spark, tmp_path):
    """Both mixers configured, or a unimax group without a budget, fail
    AT ASSEMBLY — not lazily inside a stage mid-run."""
    import pytest as _pytest
    base = {
        "job": {"name": "bad"},
        "source": {"type": "parquet", "path": str(tmp_path / "nope")},
        "sink": {"type": "csv", "path": str(tmp_path / "out")},
        "checkpoints": {"path": str(tmp_path / "ck")},
    }
    both = dict(base, corpus={"text_col": "text", "id_col": "doc_id",
                              "mix_group_col": "lang",
                              "unimax_group_col": "lang",
                              "unimax_budget_tokens": 100})
    p1 = tmp_path / "both.yaml"
    p1.write_text(yaml.safe_dump(both))
    with _pytest.raises(ValueError, match="alternative mixers"):
        build_job_dag(spark, Configuration.from_yaml(p1))
    nobudget = dict(base, corpus={"text_col": "text", "id_col": "doc_id",
                                  "unimax_group_col": "lang"})
    p2 = tmp_path / "nobudget.yaml"
    p2.write_text(yaml.safe_dump(nobudget))
    with _pytest.raises(ValueError, match="go together"):
        build_job_dag(spark, Configuration.from_yaml(p2))


def test_yaml_corpus_normalize_and_compression_stages(spark, tmp_path):
    """corpus.normalize runs FIRST (so the digest dedup merges
    NFKC/case variants) and corpus.compression_{min,max}_bps gates by
    zlib ratio — both from YAML alone, matching direct operator calls."""
    src = tmp_path / "nsrc"
    rows = [
        (1, "Café Mixture of Words here"),      # composed
        (2, "café mixture of words HERE"),     # decomposed + case
        (3, "spam ham " * 300),                      # hyper-compressible
        (4, "an ordinary single document body"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(str(src))
    cfg_yaml = yaml.safe_dump({
        "job": {"name": "norm_job"},
        "source": {"type": "parquet", "path": str(src)},
        "corpus": {"text_col": "text", "id_col": "doc_id",
                   "normalize": True, "compression_min_bps": 1500,
                   "exact_dedup": True},
        "sink": {"type": "table", "path": str(tmp_path / "norm_table"),
                 "record_key": "doc_id", "op": "insert"},
        "checkpoints": {"path": str(tmp_path / "ckn")},
    })
    p = tmp_path / "norm.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True

    t = TableSink(spark, tmp_path / "norm_table", record_key_field="doc_id")
    kept = {r["doc_id"]: r["text"] for r in t.read().collect()}
    # 1 and 2 normalize to the same text -> digest dedup keeps min id;
    # 3 fails the compression floor; 4 passes untouched (lowercased)
    assert set(kept) == {1, 4}
    assert kept[1] == "café mixture of words here"
    assert kept[4] == "an ordinary single document body"


def test_yaml_media_gates_and_near_dup_stages(spark, tmp_path):
    """The media.* block wires the image tier from YAML alone: quality
    gates (resolution/aspect/byte-density over one decode pass) then
    perceptual near-dup keep-min — matching direct operator calls."""
    import numpy as np

    from marmaray_spark.functions.media_codec import encode_bmp

    def img(seed, w=96, h=64, shift=0):
        rng = np.random.default_rng(seed)
        grid = rng.integers(0, 8, size=(8, 9)) * 30 + 8 + shift
        px = np.repeat(np.repeat(grid, (h + 7) // 8, axis=0),
                       (w + 8) // 9, axis=1)[:h, :w]
        return encode_bmp(np.repeat(px[:, :, None], 3, axis=2)
                          .astype("uint8"))

    rows = [
        (1, img(1)),                    # fine
        (2, img(1, shift=4)),           # near-dup of 1 (dropped, 1 kept)
        (3, img(3)),                    # fine, distinct
        (4, img(4, w=16, h=16)),        # fails resolution
        (5, img(5, w=640, h=64)),       # fails aspect
        (6, b"BM\x00broken"),           # decode failure fails the gate
    ]
    src = tmp_path / "media_src"
    spark.createDataFrame(rows, "media_id long, payload binary") \
        .write.parquet(str(src))
    cfg_yaml = yaml.safe_dump({
        "job": {"name": "media_job"},
        "source": {"type": "parquet", "path": str(src)},
        "media": {"payload_col": "payload", "id_col": "media_id",
                  "quality_gate": True, "near_dup": True},
        "sink": {"type": "table", "path": str(tmp_path / "media_table"),
                 "record_key": "media_id", "op": "insert"},
        "checkpoints": {"path": str(tmp_path / "ckm")},
    })
    p = tmp_path / "media.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True

    t = TableSink(spark, tmp_path / "media_table",
                  record_key_field="media_id")
    kept = {r["media_id"] for r in t.read().collect()}
    assert kept == {1, 3}


def test_yaml_corpus_html_extraction_stage(spark, tmp_path):
    """corpus.html_col stages HTML -> text extraction FIRST: a crawl
    table wires straight from YAML — chrome dropped, entities decoded,
    and the downstream gates see the extracted text column."""
    pages = [
        (1, "en", """<html><head><title>Doc one</title></head><body>
            <nav><a href='/'>Home</a> <a href='/x'>About</a>
                 <a href='/y'>More</a> <a href='/z'>Links</a></nav>
            <p>the quick brown fox jumps over the lazy dog while seven
               wizards brew strong coffee at dawn for everyone</p>
            </body></html>"""),
        (2, "en", "<body><p>" + "spam " * 40 + "</p></body>"),
    ]
    src = tmp_path / "crawl_src"
    spark.createDataFrame(pages, "doc_id long, lang string, html string") \
        .write.parquet(str(src))
    cfg_yaml = yaml.safe_dump({
        "job": {"name": "crawl_job"},
        "source": {"type": "parquet", "path": str(src)},
        "corpus": {"text_col": "text", "id_col": "doc_id",
                   "html_col": "html", "gopher_gate": True},
        "sink": {"type": "table", "path": str(tmp_path / "crawl_table"),
                 "record_key": "doc_id", "op": "insert"},
        "checkpoints": {"path": str(tmp_path / "ckh")},
    })
    p = tmp_path / "crawl.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True

    t = TableSink(spark, tmp_path / "crawl_table",
                  record_key_field="doc_id")
    kept = {r["doc_id"]: r["text"] for r in t.read().collect()}
    # doc 2's repeated-word body fails the gopher gate POST-extraction;
    # doc 1's extracted text carries the paragraph, not the nav chrome
    assert set(kept) == {1}
    assert "quick brown fox" in kept[1] and "Home" not in kept[1]
    # the lang column rode through the extraction's passthrough
    assert {r["lang"] for r in t.read().collect()} == {"en"}


def test_yaml_corpus_html_extraction_warc_shaped_source(spark, tmp_path):
    """A source that already carries the extractor's reserved output
    names (read_warc emits ok/err — the advertised producer for the
    html_col stage) must not die on a duplicate-name schema: the stage
    renames the source copies to src_<name> so fetch provenance rides
    through next to the extractor's own verdict."""
    pages = [
        (1, "<body><p>the quick brown fox jumps over the lazy dog while "
            "seven wizards brew strong coffee at dawn for everyone"
            "</p></body>", True, None),
        (2, "<body><p>" + "spam " * 40 + "</p></body>", True, None),
    ]
    src = tmp_path / "warc_src"
    spark.createDataFrame(
        pages, "doc_id long, html string, ok boolean, err string") \
        .write.parquet(str(src))
    cfg_yaml = yaml.safe_dump({
        "job": {"name": "warc_crawl_job"},
        "source": {"type": "parquet", "path": str(src)},
        "corpus": {"text_col": "text", "id_col": "doc_id",
                   "html_col": "html", "gopher_gate": True},
        "sink": {"type": "table", "path": str(tmp_path / "warc_table"),
                 "record_key": "doc_id", "op": "insert"},
        "checkpoints": {"path": str(tmp_path / "ckw")},
    })
    p = tmp_path / "warc.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True
    t = TableSink(spark, tmp_path / "warc_table",
                  record_key_field="doc_id")
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert set(rows) == {1}
    # the fetch-level ok survived under the src_ prefix; the extractor's
    # own ok is the row-level extraction verdict
    assert rows[1]["src_ok"] is True and rows[1]["ok"] is True


def test_yaml_warc_crawl_job_ticks_incrementally(spark, tmp_path):
    """The WHOLE crawl first mile from YAML alone, TICKING: a warc
    source with checkpointed archive pickup feeds the html extraction +
    gopher gate chain into a dedup-insert table; run 2 with nothing new
    is a no-work run; a new archive ticks in alone; corrupt members land
    in the error table. The watermark persists only after the table
    commit (the work-unit contract through JobDag)."""
    from marmaray_spark.sources.warc import write_warc_gz

    def page(u, body):
        payload = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        return ({"WARC-Type": "response", "WARC-Record-ID": f"<{u}>",
                 "WARC-Target-URI": u}, payload)

    good = (b"<html><body>"
            b'<nav><a href="http://hub.example.com/x">hub</a></nav>'
            b"<p>the quick brown fox jumps over the lazy dog "
            b"while seven wizards brew strong coffee at dawn for everyone"
            b"</p></body></html>")
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    blob = write_warc_gz([page("http://ex.com/a", good)])
    blob += b"\x1f\x8b\x08\x00corrupt-member"
    (crawl / "seg-00000.warc.gz").write_bytes(blob)

    cfg_yaml = yaml.safe_dump({
        "job": {"name": "warc_tick_job"},
        "source": {"type": "warc", "path": str(crawl),
                   "decode_payload_col": "html", "http_ok_only": True},
        "corpus": {"text_col": "text", "id_col": "target_uri",
                   "html_col": "html", "gopher_gate": True},
        "frontier": {"edges_path": str(tmp_path / "edges"),
                     "ranks_path": str(tmp_path / "ranks")},
        "sink": {"type": "table", "path": str(tmp_path / "pages"),
                 "record_key": "target_uri", "op": "dedup_insert"},
        "error_table": {"path": str(tmp_path / "errs")},
        "checkpoints": {"path": str(tmp_path / "ck")},
    })
    p = tmp_path / "crawl.yaml"
    p.write_text(cfg_yaml)

    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True
    t = TableSink(spark, tmp_path / "pages", record_key_field="target_uri")
    rows = {r["target_uri"]: r["text"] for r in t.read().collect()}
    assert set(rows) == {"http://ex.com/a"}
    assert "quick brown fox" in rows["http://ex.com/a"]
    from marmaray_spark.operators.errors import read_error_table
    errs = read_error_table(spark, str(tmp_path / "errs"))
    assert errs.count() == 1                       # the corrupt member

    # tick 2: nothing new -> no work, watermark held
    dag2 = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag2.execute(spark) is False

    # a new archive arrives and ticks in alone
    (crawl / "seg-00001.warc.gz").write_bytes(
        write_warc_gz([page("http://ex.org/b", good)]))
    dag3 = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag3.execute(spark) is True
    assert t.read().count() == 2

    # the frontier block accrued the REAL extracted host edges across
    # both ticks, deduped by src->dst key, and pagerank ranks the
    # twice-linked hub first — the full crawl loop from YAML alone
    from marmaray_spark.operators.web import pagerank_integer
    edges = TableSink(spark, tmp_path / "edges",
                      record_key_field="edge_key")
    assert {(r["src"], r["dst"]) for r in edges.read().collect()} == {
        ("ex.com", "hub.example.com"), ("ex.org", "hub.example.com")}
    ranks = {r["node"]: r["rank"] for r in pagerank_integer(
        edges.read().select("src", "dst")).collect()}
    assert ranks["hub.example.com"] > max(ranks["ex.com"],
                                          ranks["ex.org"])
    # frontier.ranks_path: the commit phase refreshed the RANKS TABLE on
    # the policy cadence — consumers read it instead of recomputing, and
    # it matches the direct recompute above exactly
    ranks_t = TableSink(spark, tmp_path / "ranks", record_key_field="node")
    assert {r["node"]: r["rank"]
            for r in ranks_t.read().collect()} == ranks


def test_yaml_warc_non_utf8_payload_survives_the_tick(spark, tmp_path):
    """A latin-1 (or binary) 200 response must not kill the tick: the
    decode_payload_col bridge uses the lenient binary->string cast, so
    the malformed bytes degrade to replacement characters in THEIR row
    while every other page ingests normally."""
    from marmaray_spark.sources.warc import write_warc_gz

    body_ok = (b"<body><p>the quick brown fox jumps over the lazy dog "
               b"while seven wizards brew strong coffee at dawn for "
               b"everyone</p></body>")
    body_latin1 = ("<body><p>caf\xe9 ole the quick brown fox jumps over "
                   "the lazy dog while seven wizards brew strong coffee "
                   "at dawn</p></body>").encode("latin-1")

    def page(u, body):
        payload = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        return ({"WARC-Type": "response", "WARC-Record-ID": f"<{u}>",
                 "WARC-Target-URI": u}, payload)

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "seg-00000.warc.gz").write_bytes(
        write_warc_gz([page("http://ex.com/ok", body_ok),
                       page("http://ex.com/latin1", body_latin1)]))
    cfg_yaml = yaml.safe_dump({
        "job": {"name": "warc_latin1_job"},
        "source": {"type": "warc", "path": str(crawl),
                   "decode_payload_col": "html", "http_ok_only": True},
        "corpus": {"text_col": "text", "id_col": "target_uri",
                   "html_col": "html", "gopher_gate": True},
        "sink": {"type": "table", "path": str(tmp_path / "pages"),
                 "record_key": "target_uri", "op": "dedup_insert"},
        "checkpoints": {"path": str(tmp_path / "ck")},
    })
    p = tmp_path / "l1.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True          # the tick SURVIVES
    t = TableSink(spark, tmp_path / "pages", record_key_field="target_uri")
    rows = {r["target_uri"]: r["text"] for r in t.read().collect()}
    assert "http://ex.com/ok" in rows
    assert "quick brown fox" in rows["http://ex.com/ok"]


def test_yaml_robots_gate_drops_disallowed_pages(spark, tmp_path):
    """corpus.robots_table: retroactive RFC 9309 compliance from config
    alone — a page disallowed for our user agent is dropped BEFORE HTML
    extraction; everything else flows through unchanged."""
    from marmaray_spark.sources.warc import write_warc_gz

    def page(u, body):
        payload = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        return ({"WARC-Type": "response", "WARC-Record-ID": f"<{u}>",
                 "WARC-Target-URI": u}, payload)

    good = (b"<html><body><p>the quick brown fox jumps over the lazy dog"
            b" while seven wizards brew strong coffee at dawn today"
            b"</p></body></html>")
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "seg-00000.warc.gz").write_bytes(write_warc_gz([
        page("http://ex.com/keep/a", good),
        page("http://ex.com/private/b", good),
        page("http://open.org/anything", good)]))

    spark.createDataFrame(
        [("ex.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string") \
        .write.mode("overwrite").parquet(str(tmp_path / "robots"))

    cfg_yaml = yaml.safe_dump({
        "job": {"name": "robots_job"},
        "source": {"type": "warc", "path": str(crawl),
                   "decode_payload_col": "html", "http_ok_only": True},
        "corpus": {"text_col": "text", "id_col": "target_uri",
                   "html_col": "html",
                   "robots_table": str(tmp_path / "robots")},
        "sink": {"type": "table", "path": str(tmp_path / "pages"),
                 "record_key": "target_uri", "op": "dedup_insert"},
        "checkpoints": {"path": str(tmp_path / "ck")},
    })
    p = tmp_path / "robots.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True
    t = TableSink(spark, tmp_path / "pages", record_key_field="target_uri")
    assert {r["target_uri"] for r in t.read().collect()} == {
        "http://ex.com/keep/a", "http://open.org/anything"}


def test_yaml_blocklist_gate_with_psl(spark, tmp_path):
    """corpus.blocklist_table (+ corpus.psl_table): provenance gate zero
    from config alone — a page whose PSL registrable domain is blocked
    drops before any text stage; with the PSL in play the co.uk sibling
    survives (the two-label rollup would have merged them)."""
    docs = spark.createDataFrame(
        [(1, "http://evil.co.uk/a", "plain words one"),
         (2, "http://news.bbc.co.uk/b", "plain words two"),
         (3, "http://ok.com/c", "plain words three")],
        "doc_id long, url string, text string")
    src = tmp_path / "src"
    docs.write.parquet(str(src))
    spark.createDataFrame([("evil.co.uk",)], "domain string") \
        .write.parquet(str(tmp_path / "bl"))
    spark.createDataFrame([("com",), ("uk",), ("co.uk",)],
                          "suffix string") \
        .write.parquet(str(tmp_path / "psl"))

    cfg_yaml = yaml.safe_dump({
        "job": {"name": "blocklist_job"},
        "source": {"type": "parquet", "path": str(src)},
        "corpus": {"text_col": "text", "id_col": "doc_id",
                   "url_col": "url",
                   "blocklist_table": str(tmp_path / "bl"),
                   "psl_table": str(tmp_path / "psl")},
        "sink": {"type": "table", "path": str(tmp_path / "out"),
                 "record_key": "doc_id", "op": "insert"},
        "checkpoints": {"path": str(tmp_path / "ck")},
    })
    p = tmp_path / "bl.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True
    t = TableSink(spark, tmp_path / "out", record_key_field="doc_id")
    assert {r["doc_id"] for r in t.read().collect()} == {2, 3}


def test_yaml_canonical_dedup_stage(spark, tmp_path):
    """corpus.canonical_dedup: the rel=canonical consumer wired from
    config — a crawl-shaped job whose print-view twin declares the main
    article canonical collapses to one page, where the key-level dedup
    insert alone would keep both (different target_uri)."""
    from marmaray_spark.sources.warc import write_warc_gz

    def page(u, body):
        payload = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        return ({"WARC-Type": "response", "WARC-Record-ID": f"<{u}>",
                 "WARC-Target-URI": u}, payload)

    def good(extra=b""):
        return (b"<html><head>" + extra + b"</head><body>"
                b"<p>the quick brown fox jumps over the lazy dog while "
                b"seven wizards brew strong coffee at dawn</p>"
                b"</body></html>")

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "seg-00000.warc.gz").write_bytes(write_warc_gz([
        page("http://ex.com/article", good()),
        page("http://ex.com/article/print",
             good(b'<link rel="canonical" href="http://ex.com/article">')),
        page("http://ex.com/other", good())]))

    cfg_yaml = yaml.safe_dump({
        "job": {"name": "canon_job"},
        "source": {"type": "warc", "path": str(crawl),
                   "decode_payload_col": "html", "http_ok_only": True},
        "corpus": {"text_col": "text", "id_col": "target_uri",
                   "html_col": "html", "canonical_dedup": True},
        "sink": {"type": "table", "path": str(tmp_path / "pages"),
                 "record_key": "target_uri", "op": "dedup_insert"},
        "checkpoints": {"path": str(tmp_path / "ck")},
    })
    p = tmp_path / "canon.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True
    t = TableSink(spark, tmp_path / "pages", record_key_field="target_uri")
    assert {r["target_uri"] for r in t.read().collect()} == {
        "http://ex.com/article", "http://ex.com/other"}


def test_yaml_canonical_dedup_uses_psl_boundary(spark, tmp_path):
    """corpus.canonical_dedup + corpus.psl_table: the canonical stage's
    trust boundary upgrades to the PSL registrable domain from config —
    the github.io sibling hijack that the two-label form admits is
    refused end-to-end (advisor find, r10)."""
    docs = spark.createDataFrame(
        [(5, "http://victim.github.io/post", None, "victim words"),
         (1, "http://evil.github.io/spam",
          "http://victim.github.io/post", "spam words")],
        "doc_id long, url string, rel_canonical string, text string")
    src = tmp_path / "src"
    docs.write.parquet(str(src))
    spark.createDataFrame([("com",), ("io",), ("github.io",)],
                          "suffix string").write.parquet(
        str(tmp_path / "psl"))

    cfg_yaml = yaml.safe_dump({
        "job": {"name": "canon_psl_job"},
        "source": {"type": "parquet", "path": str(src)},
        "corpus": {"text_col": "text", "id_col": "doc_id",
                   "url_col": "url", "canonical_dedup": True,
                   "psl_table": str(tmp_path / "psl")},
        "sink": {"type": "table", "path": str(tmp_path / "out"),
                 "record_key": "doc_id", "op": "insert"},
        "checkpoints": {"path": str(tmp_path / "ck")},
    })
    p = tmp_path / "cp.yaml"
    p.write_text(cfg_yaml)
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True
    t = TableSink(spark, tmp_path / "out", record_key_field="doc_id")
    # both pages survive: evil's cross-registrable hint fell back to
    # its own URL instead of evicting the victim
    assert {r["doc_id"] for r in t.read().collect()} == {1, 5}


def test_yaml_mor_table_sink(spark, tmp_path):
    """sink.table_type: mor — a config-wired upsert job lands delta
    commits (nothing rewritten) and readers see latest-wins."""
    docs = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    src1 = tmp_path / "src1"
    docs.write.parquet(str(src1))

    def cfg(src):
        return Configuration.from_tree({
            "job": {"name": "mor_job"},
            "source": {"type": "parquet", "path": str(src)},
            "sink": {"type": "table", "path": str(tmp_path / "out"),
                     "record_key": "k", "op": "upsert",
                     "table_type": "mor"},
            "checkpoints": {"path": str(tmp_path / "ck")},
        })

    assert build_job_dag(spark, cfg(src1)).execute(spark) is True
    src2 = tmp_path / "src2"
    spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string") \
        .write.parquet(str(src2))
    assert build_job_dag(spark, cfg(src2)).execute(spark) is True

    t = TableSink(spark, tmp_path / "out", record_key_field="k",
                  table_type="mor")
    assert {(r["k"], r["v"]) for r in t.read().collect()} == \
        {(1, "a"), (2, "B"), (3, "c")}
    last = t.log.commits()[-1]
    assert last.delta is True and last.removes == []


def test_yaml_mor_compaction_policy_bounds_delta_slices(spark, tmp_path):
    """sink.max_delta_slices: the commit phase asks the compaction
    policy after every published commit, so a ticking MOR job's
    latest-wins read tax is bounded by config, not operator memory
    (r10 shipped maybe_compact with no consumer)."""
    def cfg(src):
        return Configuration.from_tree({
            "job": {"name": "mor_tick"},
            "source": {"type": "parquet", "path": str(src)},
            "sink": {"type": "table", "path": str(tmp_path / "out"),
                     "record_key": "k", "op": "upsert",
                     "table_type": "mor", "max_delta_slices": 2},
            "checkpoints": {"path": str(tmp_path / "ck")},
        })

    expected = {}
    for tick in range(5):
        rows = [(tick, f"t{tick}"), (tick + 1, f"t{tick}")]
        expected.update(dict(rows))
        src = tmp_path / f"src{tick}"
        spark.createDataFrame(rows, "k long, v string")             .write.parquet(str(src))
        assert build_job_dag(spark, cfg(src)).execute(spark) is True
        t = TableSink(spark, tmp_path / "out", record_key_field="k")
        # the policy folds as soon as the threshold is reached: never
        # 2+ active deltas AFTER a commit phase completes
        assert len(t.log.active_state()[1]) < 2
        assert {(r["k"], r["v"]) for r in t.read().collect()} == \
            set(expected.items())
    # at least one compact commit actually fired
    assert any(c.op == "compact" for c in t.log.commits())


def test_yaml_chained_table_source(spark, tmp_path):
    """source.type: table — job B consumes job A's managed table
    commit-by-commit behind the work-unit checkpoint: a re-run with
    nothing new is a no-op, and only A's NEW commits flow on the next
    run (the reference's chained-pipeline pattern at commit
    granularity)."""
    a = TableSink(spark, tmp_path / "a", "k")
    a.write(spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"]),
            WriteOp.INSERT)

    cfg = Configuration.from_tree({
        "job": {"name": "chain_b"},
        "source": {"type": "table", "path": str(tmp_path / "a")},
        "sink": {"type": "table", "path": str(tmp_path / "b"),
                 "record_key": "k", "op": "upsert"},
        "checkpoints": {"path": str(tmp_path / "ck")},
    })
    assert build_job_dag(spark, cfg).execute(spark) is True
    b = TableSink(spark, tmp_path / "b", "k")
    assert {(r["k"], r["v"]) for r in b.read().collect()} == \
        {(1, "x"), (2, "y")}
    # nothing new on A: execute reports no work, B untouched
    assert build_job_dag(spark, cfg).execute(spark) is False
    assert len(b.log.commits()) == 1
    # two more commits on A (incl. an update) flow through exactly once;
    # a cluster() maintenance commit on A must NOT re-emit anything
    a.write(spark.createDataFrame([(2, "Y2")], ["k", "v"]),
            WriteOp.UPSERT)
    a.cluster(n_buckets=2)
    a.write(spark.createDataFrame([(3, "z")], ["k", "v"]),
            WriteOp.DEDUP_INSERT)
    assert build_job_dag(spark, cfg).execute(spark) is True
    assert {(r["k"], r["v"]) for r in b.read().collect()} == \
        {(1, "x"), (2, "Y2"), (3, "z")}


def test_sink_commit_failure_after_frontier_keeps_source_window(
        spark, tmp_path, monkeypatch):
    """Persist-only-after-all-sinks-commit survives the frontier ranks
    refresh (r11 advice, high): the priority-90 frontier commit
    refreshes the RANKS table through the SHARED metadata manager that
    already carries the in-memory source checkpoint. If that refresh
    persisted the manager, a priority-100 pages-commit failure would
    durably skip the source window (data loss). Inject exactly that
    failure and verify the window REPLAYS."""
    from marmaray_spark.sources.warc import write_warc_gz
    import marmaray_spark.sinks.table as tbl

    body = (b"<html><body>"
            b'<nav><a href="http://hub.example.com/x">hub</a></nav>'
            b"<p>the quick brown fox jumps over the lazy dog while "
            b"seven wizards brew strong coffee at dawn for everyone"
            b"</p></body></html>")

    def page(u):
        payload = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        return ({"WARC-Type": "response", "WARC-Record-ID": f"<{u}>",
                 "WARC-Target-URI": u}, payload)

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "seg-00000.warc.gz").write_bytes(
        write_warc_gz([page("http://ex.com/a")]))
    cfg_yaml = yaml.safe_dump({
        "job": {"name": "ordering_job"},
        "source": {"type": "warc", "path": str(crawl),
                   "decode_payload_col": "html", "http_ok_only": True},
        "corpus": {"text_col": "text", "id_col": "target_uri",
                   "html_col": "html"},
        "frontier": {"edges_path": str(tmp_path / "edges"),
                     "ranks_path": str(tmp_path / "ranks")},
        "sink": {"type": "table", "path": str(tmp_path / "pages"),
                 "record_key": "target_uri", "op": "dedup_insert"},
        "error_table": {"path": str(tmp_path / "errs")},
        "checkpoints": {"path": str(tmp_path / "ck")},
    })
    p = tmp_path / "crawl.yaml"
    p.write_text(cfg_yaml)

    assert build_job_dag(spark, Configuration.from_yaml(p)) \
        .execute(spark) is True                      # tick 1 clean

    (crawl / "seg-00001.warc.gz").write_bytes(
        write_warc_gz([page("http://ex.org/b")]))

    orig = tbl.TableSink.commit_staged

    def boom(self, staged):
        if self.table_path.name == "pages":
            raise RuntimeError("injected pages-commit failure")
        return orig(self, staged)

    monkeypatch.setattr(tbl.TableSink, "commit_staged", boom)
    with pytest.raises(RuntimeError, match="injected"):
        build_job_dag(spark, Configuration.from_yaml(p)).execute(spark)
    monkeypatch.setattr(tbl.TableSink, "commit_staged", orig)

    # the frontier committed (priority 90) before the injected failure,
    # but the SOURCE window must not be durably consumed: the rerun
    # replays seg-00001 and the page lands
    dag = build_job_dag(spark, Configuration.from_yaml(p))
    assert dag.execute(spark) is True
    t = TableSink(spark, tmp_path / "pages", record_key_field="target_uri")
    assert {r["target_uri"] for r in t.read().collect()} == {
        "http://ex.com/a", "http://ex.org/b"}
    # and the replayed frontier DEDUP_INSERT kept edges unique
    edges = TableSink(spark, tmp_path / "edges", record_key_field="edge_key")
    assert edges.read().count() == edges.read().select("edge_key") \
        .distinct().count()
