"""Config-driven pipeline assembly: YAML/properties -> runnable JobDag.

Reference parity: every reference job is wired from a YAML config
(ParquetToCassandraJob.java:330-371 CLI ``-c file``/``-j json``); this
module is the equivalent factory for this engine's parts. Keys:

    job.name                  pipeline / lock / metrics name
    source.type               parquet | json | warc | table
    source.path               table or directory path
    source.schema_json        (json source) StructType JSON string
    source.max_commits        (table) per-run commit-drain cap
    source.record_key         (table) upstream table's record key
                              (informational; the pull reads stamps)
    source.max_archives       (warc) per-run archive cap (backlog drains
                              across ticks); default unlimited
    source.record_types       (warc) comma-separated WARC record types
                              (default: response)
    source.decode_payload_col (warc) decode the binary payload to utf-8
                              under this column name (feeds
                              corpus.html_col), dropping the raw bytes
    source.http_ok_only       (warc) keep only http_status == 200 rows
                              (pushed into the scan, before any decode)
    converter.required_keys   comma-separated non-null key columns
    converter.fields          optional comma-separated projection
    sink.type                 table | csv | json
    sink.path                 output path
    sink.record_key           (table) record key field
    sink.partition_field      (table) optional partition column
    sink.op                   (table) insert|bulk_insert|dedup_insert|
                              upsert|insert_overwrite|delete (delete:
                              the transformed frame's key column names
                              the records to remove — the GDPR path)
    sink.table_type           (table) cow | mor — merge-on-read
                              upserts append delta slices (batch-cost
                              writes, latest-wins reads until compact)
                              instead of rewriting slices; omitted =
                              adopt the type the table was created
                              with (cow for a new table), a mismatch
                              with the persisted type raises
    sink.max_delta_slices     (table, mor) compact when this many
                              delta slices are active (default 10) —
                              fires after each published commit, so
                              the read tax is bounded by policy
    sink.bloom_min_bytes      (table) per-slice bloom key index build
                              threshold (default 8 MiB; 0 = always)
    sink.stats_cols           (table) comma-separated non-key columns
                              to index with per-slice [min,max] footer
                              stats — TableSink.scan data skipping
    sink.precombine_field     (table) Hudi preCombineField: upsert /
                              dedup-insert batches keep one row per key
                              (greatest value wins) before merging
    sink.cluster_by_key       (table) sorted disjoint-range slices
    sink.target_file_size_mb  (table) parallelism auto-tune target
    sink.lock_dir             (table) directory for the per-table
                              write lock (FileLockManager): concurrent
                              PIPELINES writing one table serialize
                              their stage→commit spans instead of
                              racing the commit log; omit for the
                              single-writer-per-table default
    sink.lock_timeout_s       (table) lock wait budget (default 600)
    sink.compression          (csv/json) lz4|gzip|snappy|zstd
    error_table.path          optional error-table parquet dir
    checkpoints.path          metadata manager directory

Corpus-stage block (beyond-reference: the LLM-pipeline tier joins the
same config contract — a corpus-cleaning ingestion job wires from YAML
alone, no code):

    corpus.text_col           text column (enables the block)
    corpus.id_col             document id column (required with block)
    corpus.html_col           raw-markup column: an HTML -> text
                              extraction stage (block split, chrome
                              dropped by word floor + link density)
                              runs FIRST and produces text_col
    corpus.html_min_block_words / corpus.html_max_link_density_bps
                              extraction thresholds (defaults 4 / 4000)
    corpus.quality_min        composite quality-score floor (int)
    corpus.gopher_gate        true -> Gopher repetition gate
    corpus.exact_dedup        true -> keep-min-id per content digest
    corpus.sample_pct         deterministic md5 sample percentage
    corpus.mix_group_col      temperature-mix group column (alpha=0.5)
    corpus.mix_keep_bps       overall keep rate for the mix (default 2000)
    corpus.massivetext_gate   true -> FULL Rae et al. table-A1 repetition
                              gate (top 2/3/4-gram + dup 5..10-gram char
                              mass), superset of gopher_gate
    corpus.unimax_group_col   UniMax group column — alternative mixer to
                              mix_group_col (configure one, not both);
                              output rows carry an `epoch` column and
                              repeat per allocated epoch
    corpus.unimax_budget_tokens  total token budget for the allocation
    corpus.unimax_epoch_cap   per-group epoch cap (default 4)
    corpus.robots_table       parquet dir of (host, robots_txt) rows:
                              an RFC 9309 robots gate runs FIRST (even
                              before HTML extraction) and drops
                              disallowed pages — retroactive crawl
                              compliance
    corpus.robots_user_agent  crawler identity for group selection
                              (default '*')
    corpus.robots_url_col     URL column to gate on (default:
                              corpus.url_col, then corpus.id_col)
    corpus.url_col            page-URL column shared by the provenance
                              stages below (default: corpus.id_col)
    corpus.blocklist_table    parquet dir of (domain) rows: a
                              registrable-domain blocklist gate runs
                              BEFORE everything (RefinedWeb §3.1 URL
                              filtering — drop by provenance before
                              any byte of text is parsed)
    corpus.psl_table          parquet dir of (suffix) rows in
                              publicsuffix.org format: the blocklist
                              gate AND the canonical-dedup trust
                              boundary roll hosts up with the Public
                              Suffix List instead of the two-label
                              approximation (bbc.co.uk stays
                              bbc.co.uk, not co.uk; evil.github.io
                              cannot claim canonical at
                              victim.github.io)
    corpus.canonical_dedup    true -> collapse pages declaring the same
                              <link rel=canonical> target (publisher
                              hint, first-occurrence-wins) — runs after
                              HTML extraction produced rel_canonical,
                              before the digest dedup
    corpus.canonical_url_col  page-URL column the canonical hints
                              resolve against (default: corpus.url_col,
                              then corpus.id_col)

Stages apply in that order (gates -> dedup -> sample -> mix), after the
converter's valid stream and before every sink — dropped-by-gate rows are
filtered, not errors (quality rejection is corpus policy, not data
corruption; the reference's error table keeps its malformed-data
meaning).

Media-stage block (the image tier's counterpart — an image-table
cleaning job wires from YAML alone):

    media.payload_col         binary image column (enables the block)
    media.id_col              media id column (required with block)
    media.quality_gate        true -> resolution/aspect/byte-density
                              gates over one decode pass
    media.min_width/.min_height/.aspect_milli_min/.aspect_milli_max/
    media.min_bytes_per_kpx   gate thresholds (defaults 64/64/333/3000/30)
    media.near_dup            true -> perceptual dHash near-dup keep-min
                              (connected components over banded pairs)
    media.max_hamming         near-dup Hamming bound (default 3)

Frontier block (crawl jobs: accrue the host link graph alongside the
page table, so `pagerank_integer` can rank what to fetch next — the
edges ride the SAME commit-by-priority two-phase protocol as the main
table, and the src->dst dedup key makes crash replay land on identical
rows):

    frontier.edges_path       host-edge TableSink directory (enables
                              the block)
    frontier.url_col          page URL column (default: corpus.id_col)
    frontier.hosts_col        extracted link-host array column
                              (default link_hosts, the HTML extractor's
                              output)
    frontier.ranks_path       host-rank TableSink directory: after each
                              edge commit, PageRank refreshes into it
                              on the measured policy cadence
                              (refresh_host_ranks) — consumers read
                              the table instead of recomputing
    frontier.ranks_min_new_commits  refresh only after this many new
                              edge commits (default 1)

Unknown sink/source types raise — fail at assembly, not mid-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from marmaray_spark.config import Configuration
from marmaray_spark.converters import SchemaProjectionConverter
from marmaray_spark.metadata import FileSystemMetadataManager, PartitionManager
from marmaray_spark.operators.errors import write_error_table
from marmaray_spark.plans.dag import JobDag, JobSubDag, SinkNode
from marmaray_spark.sinks.file import FileSink
from marmaray_spark.sinks.table import (TableChangesWorkUnitCalculator,
                                        TableSink, WriteOp)
from marmaray_spark.sources.hive import ParquetSource, ParquetWorkUnitCalculator


def _mk_lock(lock_dir: str):
    from marmaray_spark.plans.locking import FileLockManager
    return FileLockManager(lock_dir)


def _corpus_stages(config: Configuration):
    """Compile the ``corpus.*`` block into ``(stages, pinned)``: an
    ordered list of DataFrame transforms (empty when the block is
    absent) plus a runtime-filled list of frames the stages persist —
    the caller unpersists them in a final commit hook so cached corpus
    partitions don't outlive the job. Stage order is fixed (gates ->
    dedup -> sample -> mix) because later stages assume earlier
    invariants."""
    pinned: list = []
    text_col = config.get("corpus.text_col")
    if not text_col:
        return [], pinned
    id_col = config.get_required("corpus.id_col")
    from pyspark.sql import functions as F

    from marmaray_spark.operators.dedup import exact_dedup
    from marmaray_spark.operators.text import (deterministic_sample,
                                               gopher_repetition_pass,
                                               quality_score,
                                               temperature_mix, words)

    # typed parsing up front (get_int/get_float map present-but-empty
    # YAML keys to the default) — a bad value fails AT ASSEMBLY, not
    # lazily inside a stage lambda mid-run
    qmin = (config.get_int("corpus.quality_min", -1)
            if (config.get("corpus.quality_min") or "") != "" else None)
    gopher = config.get_bool("corpus.gopher_gate", False)
    do_norm = config.get_bool("corpus.normalize", False)
    comp_lo = (config.get_int("corpus.compression_min_bps", 0)
               if (config.get("corpus.compression_min_bps") or "") != ""
               else None)
    comp_hi = (config.get_int("corpus.compression_max_bps", 10000)
               if (config.get("corpus.compression_max_bps") or "") != ""
               else None)
    do_dedup = config.get_bool("corpus.exact_dedup", False)
    pct = (config.get_float("corpus.sample_pct", 100.0)
           if (config.get("corpus.sample_pct") or "") != "" else None)
    mix_group = config.get("corpus.mix_group_col")
    keep = config.get_int("corpus.mix_keep_bps", 2000)
    mt_gate = config.get_bool("corpus.massivetext_gate", False)
    um_group = config.get("corpus.unimax_group_col")
    um_budget = (config.get_int("corpus.unimax_budget_tokens", 0)
                 if (config.get("corpus.unimax_budget_tokens") or "") != ""
                 else None)
    um_cap = config.get_int("corpus.unimax_epoch_cap", 4)
    if um_group and mix_group:
        raise ValueError("corpus.unimax_group_col and corpus.mix_group_col "
                         "are alternative mixers — configure one")
    if bool(um_group) != (um_budget is not None):
        raise ValueError("corpus.unimax_group_col and "
                         "corpus.unimax_budget_tokens go together")

    html_col = config.get("corpus.html_col")
    html_min_words = config.get_int("corpus.html_min_block_words", 4)
    html_max_link = config.get_int("corpus.html_max_link_density_bps", 4000)
    url_col = config.get("corpus.url_col") or id_col
    robots_table = config.get("corpus.robots_table")
    robots_ua = config.get("corpus.robots_user_agent", "*")
    robots_url = config.get("corpus.robots_url_col") or url_col
    blocklist_table = config.get("corpus.blocklist_table")
    psl_table = config.get("corpus.psl_table")
    canon_dedup = config.get_bool("corpus.canonical_dedup", False)
    canon_url = config.get("corpus.canonical_url_col") or url_col

    stages = []

    # the PSL suffix set is immutable config data (index-sized), but two
    # stages consume it and the transform chain re-runs per batch/tick —
    # memoize the collect() in a shared cell so streaming pipelines pay
    # the driver round-trip once, not once per stage per tick
    _psl_cell: list = []

    def _psl_suffixes(df):
        if not psl_table:
            return None
        if not _psl_cell:
            _psl_cell.append({r[0] for r in
                              df.sparkSession.read.parquet(psl_table)
                              .collect()})
        return _psl_cell[0]

    if blocklist_table:
        # provenance gate zero — RefinedWeb-style URL filtering drops
        # whole documents by registrable domain before robots, HTML
        # parse, or any text stage reads a byte. Both side tables are
        # index-sized: the blocklist broadcasts into an anti-join, the
        # optional PSL rides each task's closure.
        def blocklist_stage(df, _p=blocklist_table, _u=url_col):
            from marmaray_spark.operators.web import blocklist_gate
            blocked = df.sparkSession.read.parquet(_p)
            kept, _dropped = blocklist_gate(df, _u, blocked,
                                            psl_suffixes=_psl_suffixes(df))
            return kept
        stages.append(blocklist_stage)
    if robots_table:
        # BEFORE everything, even the HTML extraction: a disallowed page
        # must not be parsed at all — retroactive RFC 9309 compliance
        # (robots changed after the crawl, or the fetcher ignored it).
        # Dropped rows are policy, not errors, like every corpus gate.
        def robots_stage(df, _p=robots_table, _ua=robots_ua,
                         _u=robots_url):
            from marmaray_spark.operators.web import (parse_robots,
                                                      robots_gate)
            robots = df.sparkSession.read.parquet(_p)
            allowed, _blocked = robots_gate(
                df, _u, parse_robots(robots, user_agent=_ua))
            return allowed
        stages.append(robots_stage)
    if html_col:
        # step 0, before everything: a crawl table carries MARKUP, and
        # every downstream stage (normalize, gates, dedup, mix) wants
        # the extracted text_col — chrome-stripped, entity-decoded
        def html_extract(df, _h=html_col, _mw=html_min_words,
                         _ml=html_max_link):
            from marmaray_spark.operators.web import extract_text_from_html
            # the extractor OWNS these output names; a passthrough column
            # with the same name (read_warc's ok/err, the advertised
            # producer for this stage) would yield a duplicate-name
            # schema that dies mid-run — rename the source's copy to
            # src_<name> so fetch provenance survives next to the
            # extractor's own verdict
            reserved = {"title", "text", "n_blocks", "n_kept",
                        "link_bps", "link_hosts", "rel_canonical",
                        "ok", "err"}
            renames = {c: f"src_{c}" for c in df.columns
                       if c in reserved and c not in (id_col, _h, text_col)}
            clash = [v for v in renames.values() if v in df.columns]
            if clash:
                raise ValueError(
                    f"corpus.html_col: cannot carry {sorted(renames)} past "
                    f"the HTML extractor — the src_-prefixed fallback "
                    f"{clash} already exists in the source frame; rename "
                    f"the source columns before this stage")
            for old, new in renames.items():
                df = df.withColumnRenamed(old, new)
            carry = tuple(c for c in df.columns
                          if c not in (id_col, _h, text_col))
            out = extract_text_from_html(
                df, id_col, _h, min_block_words=_mw,
                max_link_density_bps=_ml, passthrough=carry)
            return out.withColumnRenamed("text", text_col) \
                if text_col != "text" else out
        stages.append(html_extract)
    if canon_dedup:
        # right after extraction produced rel_canonical, before the
        # digest dedup: the publisher's own hint collapses mirrors URL
        # canonicalization can't see (print/AMP twins with different
        # URLs), and doing it first shrinks what the digest pass hashes
        def canonical_stage(df, _i=id_col, _u=canon_url):
            from marmaray_spark.operators.web import canonical_dedup
            return canonical_dedup(df, _i, _u,
                                   psl_suffixes=_psl_suffixes(df))
        stages.append(canonical_stage)
    if do_norm:
        # FIRST among the text stages: render-identical crawl variants
        # (NFKC / case) must be canonical before the digest dedup below
        # can merge them
        def norm_stage(df):
            from marmaray_spark.operators.text import normalize_text
            return normalize_text(df, text_col)
        stages.append(norm_stage)
    if comp_lo is not None or comp_hi is not None:
        def comp_gate(df, _lo=comp_lo, _hi=comp_hi):
            from marmaray_spark.operators.text import compression_signals
            # the signal pass and the semi-join both consume df
            df = df.persist()
            pinned.append(df)
            sig = compression_signals(df, id_col, text_col)
            cond = F.lit(True)
            if _lo is not None:
                cond = cond & (F.col("ratio_bps") >= _lo)
            if _hi is not None:
                cond = cond & (F.col("ratio_bps") <= _hi)
            keep_ids = sig.filter(cond).select(id_col)
            return df.join(keep_ids, id_col, "left_semi")
        stages.append(comp_gate)
    if qmin is not None or gopher or mt_gate:
        def gate(df, _q=qmin, _g=gopher, _mt=mt_gate):
            # NOTE: PushDownPredicate will substitute words() into the
            # filter condition regardless of this projection — safe only
            # because the gate expressions are the single-pass rewrites
            # (see top_ngram_bps); a count-per-distinct gate here would
            # go quadratic
            out = df.withColumn("__w", words(text_col))
            cond = F.lit(True)
            if _q is not None:
                cond = cond & (quality_score(text_col, words_col="__w")
                               >= _q)
            if _g:
                cond = cond & gopher_repetition_pass("__w")
            if _mt:
                from marmaray_spark.operators.text import (
                    massivetext_repetition_pass)
                cond = cond & massivetext_repetition_pass("__w")
            return out.filter(cond).drop("__w")
        stages.append(gate)
    if do_dedup:
        def dedup(df):
            # persist: the digest groupBy AND the semi-join probe both
            # consume df, and the mix stage after re-consumes the join
            # output twice more — without a barrier the gate expressions
            # above re-execute per consumer (Spark never dedupes common
            # unpersisted plan subtrees)
            df = df.persist()
            pinned.append(df)
            keepers = exact_dedup(df, id_col=id_col, text_col=text_col) \
                .select(F.col("keeper_id").alias(id_col))
            return df.join(keepers, id_col, "left_semi")
        stages.append(dedup)
    if pct is not None:
        stages.append(lambda df: deterministic_sample(df, id_col, pct))
    if mix_group:
        def mix(df):
            # rates aggregate + corpus filter = two consumers
            df = df.persist()
            pinned.append(df)
            return temperature_mix(df, id_col, mix_group, keep_bps=keep)
        stages.append(mix)
    if um_group:
        def unimax(df, _g=um_group, _b=um_budget, _e=um_cap):
            from marmaray_spark.operators.text import (unimax_allocation,
                                                       unimax_materialize)
            # allocation aggregate + two materialize legs consume df
            df = df.withColumn("__nt", F.size(words(text_col))).persist()
            pinned.append(df)
            alloc = unimax_allocation(df, _g, "__nt",
                                      budget_tokens=_b, epoch_cap=_e)
            return unimax_materialize(df, id_col, _g, alloc,
                                      epoch_col="epoch").drop("__nt")
        stages.append(unimax)
    return stages, pinned


def _media_stages(config: Configuration):
    """Compile the ``media.*`` block into ``(stages, pinned)`` — the
    image tier's counterpart of the corpus block: quality gates ->
    perceptual near-dup keep-min, both from config alone. Gates run on
    ONE feature pass (extract_image_features + image_quality_gates);
    dedup hashes once and keeps each connected component's min id.
    Order is fixed (gate -> dedup) so junk never pays decode twice."""
    pinned: list = []
    payload_col = config.get("media.payload_col")
    if not payload_col:
        return [], pinned
    id_col = config.get_required("media.id_col")
    from pyspark.sql import functions as F

    do_gate = config.get_bool("media.quality_gate", False)
    min_w = config.get_int("media.min_width", 64)
    min_h = config.get_int("media.min_height", 64)
    asp_lo = config.get_int("media.aspect_milli_min", 333)
    asp_hi = config.get_int("media.aspect_milli_max", 3000)
    min_density = config.get_int("media.min_bytes_per_kpx", 30)
    do_dedup = config.get_bool("media.near_dup", False)
    max_hamming = config.get_int("media.max_hamming", 3)

    def as_media(df):
        return df.select(F.col(id_col).alias("media_id"),
                         F.lit("image").alias("media_type"),
                         F.col(payload_col).alias("payload"))

    stages = []
    if do_gate:
        def gate(df):
            from marmaray_spark.operators.multimodal import (
                extract_image_features, image_quality_gates)
            df = df.persist()
            pinned.append(df)
            keep = image_quality_gates(
                extract_image_features(as_media(df)),
                min_width=min_w, min_height=min_h,
                aspect_milli_bounds=(asp_lo, asp_hi),
                min_bytes_per_kpx=min_density) \
                .filter("gate_pass") \
                .select(F.col("media_id").alias(id_col))
            return df.join(keep, id_col, "left_semi")
        stages.append(gate)
    if do_dedup:
        def dedup(df):
            from marmaray_spark.operators.dedup import connected_components
            from marmaray_spark.operators.multimodal import (
                dhash_near_dup_pairs, image_dhash)
            df = df.persist()
            pinned.append(df)
            pairs = dhash_near_dup_pairs(image_dhash(as_media(df)),
                                         "media_id",
                                         max_hamming=max_hamming)
            # component label = min reachable id: drop every non-label
            # member; rows absent from the pair graph are singletons
            drop = (connected_components(pairs)
                    .filter(F.col("node") != F.col("component"))
                    .select(F.col("node").alias(id_col)))
            return df.join(drop, id_col, "left_anti")
        stages.append(dedup)
    return stages, pinned


def build_job_dag(spark: SparkSession, config: Configuration) -> JobDag:
    name = config.get_required("job.name")
    meta = FileSystemMetadataManager(config.get_required("checkpoints.path"))

    state: dict = {}
    src_type = config.get("source.type", "parquet")
    if src_type == "parquet":
        calc = ParquetWorkUnitCalculator(
            PartitionManager(config.get_required("source.path"), meta))
        source = ParquetSource(spark)
        get_data = source.get_data
    elif src_type == "json":
        from pyspark.sql import types as T

        from marmaray_spark.sources.file import (
            FileWorkUnitCalculator,
            JsonFileSource,
        )
        calc = FileWorkUnitCalculator(config.get_required("source.path"))
        schema = T.StructType.fromJson(
            __import__("json").loads(config.get_required("source.schema_json")))
        jsrc = JsonFileSource(spark, schema)
        get_data = lambda wu: jsrc.get_data(wu).valid  # noqa: E731
    elif src_type == "table":
        # chained pipelines: this job's source is ANOTHER job's managed
        # table, consumed as the incremental pull of the commit window
        # since the checkpoint — run job A, run job B, only A's new
        # commits flow, collapsed to latest-version-per-key
        src_table = TableSink(spark, config.get_required("source.path"),
                              record_key_field=config.get(
                                  "source.record_key", "_row_key"))
        calc = TableChangesWorkUnitCalculator(
            src_table, meta,
            checkpoint_key=f"{name}.table_source.last_commit",
            max_commits=(config.get_int("source.max_commits", 0) or None))
        get_data = calc.get_data
    elif src_type == "warc":
        # the crawl first mile from YAML alone, TICKING: incremental
        # checkpointed archive pickup (watermark staged by the
        # calculator, persisted by JobDag only after every sink
        # committed — the standard work-unit contract), corrupt members
        # quarantined to the error table
        from pyspark.sql import functions as F

        from marmaray_spark.sources.warc import (WarcSource,
                                                 WarcWorkUnitCalculator)
        calc = WarcWorkUnitCalculator(
            config.get_required("source.path"), meta, source_name=name,
            max_archives=(config.get_int("source.max_archives", 0) or None))
        rtypes = tuple(t.strip() for t in
                       (config.get("source.record_types") or "response")
                       .split(",") if t.strip())
        wsrc = WarcSource(spark, record_types=rtypes)

        decode_col = config.get("source.decode_payload_col")
        http_ok = config.get_bool("source.http_ok_only", False)

        def get_data(wu, _w=wsrc, _dc=decode_col, _ok=http_ok):
            res = _w.get_data(wu)
            state["source_errors"] = res.errors
            df = res.valid
            if _ok:
                df = df.filter(F.col("http_status") == 200)
            if _dc:
                # make_valid_utf8(cast(...)), NOT F.decode('utf-8'):
                # decode raises MALFORMED_CHARACTER_CODING on the first
                # non-UTF-8 byte (latin-1 pages, binary 200 responses —
                # routine in real crawls) and kills the whole tick, and
                # the bare cast passes the invalid bytes through where
                # the first Arrow kernel chokes on them; make_valid_utf8
                # substitutes replacement chars per row JVM-side, keeping
                # the per-row quarantine contract
                df = df.withColumn(
                    _dc, F.expr("make_valid_utf8(cast(payload as string))")
                ).drop("payload")
            return df
    else:
        raise ValueError(f"unknown source.type {src_type!r}")

    required = [k for k in (config.get("converter.required_keys") or "").split(",")
                if k]
    fields = [k for k in (config.get("converter.fields") or "").split(",") if k]
    conv = SchemaProjectionConverter(
        required_keys=required, fields_to_convert=fields or None) \
        if required or fields else None

    corpus_chain, corpus_pinned = _corpus_stages(config)
    media_chain, media_pinned = _media_stages(config)

    def transform(df: DataFrame) -> DataFrame:
        if conv is not None:
            res = conv.map(df)
            state["errors"] = res.errors
            df = res.valid
        for stage in corpus_chain:
            df = stage(df)
        for stage in media_chain:
            df = stage(df)
        return df

    nodes: list[SinkNode] = []
    err_path = config.get("error_table.path")
    if err_path and conv is not None:
        nodes.append(SinkNode(
            "errors", lambda _df: write_error_table(state["errors"], err_path),
            priority=0))
    if err_path and src_type == "warc":
        # source-level quarantine: corrupt WARC members/records (the
        # converter node above covers schema rejects — distinct channel)
        nodes.append(SinkNode(
            "source_errors",
            lambda _df: write_error_table(state["source_errors"], err_path),
            priority=0))

    fr_path = config.get("frontier.edges_path")
    if fr_path:
        from pyspark.sql import functions as F

        fr_url = config.get("frontier.url_col") \
            or config.get_required("corpus.id_col")
        fr_hosts = config.get("frontier.hosts_col", "link_hosts")
        fr_table = TableSink(spark, fr_path, record_key_field="edge_key")

        def write_frontier(df: DataFrame, _t=fr_table, _u=fr_url,
                           _h=fr_hosts):
            from marmaray_spark.operators.web import link_host_edges
            if _h not in df.columns:
                raise ValueError(
                    f"frontier.edges_path set but column {_h!r} is not "
                    f"in the transformed frame ({df.columns}); the HTML "
                    "extraction stage (corpus.html_col) produces it — "
                    "or point frontier.hosts_col at your own array")
            # in-batch dedup is OURS to do: DEDUP_INSERT only anti-joins
            # against already-committed keys, so two survivor pages on
            # one host linking the same target would otherwise land two
            # rows under one edge_key in the same commit
            edges = (link_host_edges(df, _u, _h)
                     .dropDuplicates(["src", "dst"])
                     .withColumn("edge_key",
                                 F.concat_ws("->", "src", "dst")))
            state["fr_staged"] = _t.stage(edges, WriteOp.DEDUP_INSERT)

        ranks_path = config.get("frontier.ranks_path")

        def commit_frontier(_t=fr_table, _rp=ranks_path,
                            _mc=config.get_int(
                                "frontier.ranks_min_new_commits", 1)):
            _t.commit_staged(state.pop("fr_staged", None))
            if _rp:
                # the measured policy cadence (refresh_host_ranks
                # docstring): recompute PageRank into the ranks table
                # only when enough edge commits accrued — consumers
                # (fetch_frontier) read the table, never recompute
                from marmaray_spark.operators.web import refresh_host_ranks
                ranks = TableSink(spark, _rp, record_key_field="node")
                # save_changes=False: ``meta`` also carries the source
                # checkpoint that JobDag advanced in memory; persisting
                # here (priority 90, before the priority-100 table
                # commit) would durably skip the source window if that
                # later commit fails. JobDag's single save_changes()
                # after ALL commits persists the ranks checkpoint too.
                refresh_host_ranks(_t, ranks, meta, min_new_commits=_mc,
                                   save_changes=False)

        nodes.append(SinkNode("frontier_edges", write_frontier,
                              commit=commit_frontier, priority=90))

    sink_type = config.get_required("sink.type")
    if sink_type == "table":
        table = TableSink(spark, config.get_required("sink.path"),
                          record_key_field=config.get_required("sink.record_key"),
                          partition_field=config.get("sink.partition_field"),
                          cluster_by_key=config.get_bool("sink.cluster_by_key", False),
                          target_file_size_mb=config.get_float(
                              "sink.target_file_size_mb", 128.0),
                          # None = adopt the type the table was created
                          # with (the persisted pin); an explicit YAML
                          # value that disagrees raises at stage time
                          table_type=config.get("sink.table_type"),
                          bloom_min_bytes=config.get_int(
                              "sink.bloom_min_bytes", 8 << 20),
                          stats_cols=[c.strip() for c in
                                      (config.get("sink.stats_cols")
                                       or "").split(",") if c.strip()],
                          precombine_field=config.get(
                              "sink.precombine_field"),
                          lock_manager=(_mk_lock(config.get("sink.lock_dir"))
                                        if config.get("sink.lock_dir")
                                        else None),
                          lock_timeout_s=config.get_float(
                              "sink.lock_timeout_s", 600.0))
        op = WriteOp(config.get("sink.op", "upsert"))

        # Two-phase: the write phase only STAGES slices (invisible to
        # readers); publication happens in the commit phase, which
        # JobSubDag fires in priority order after EVERY sink's write
        # succeeded (JobSubDag.java commit-by-priority). A sibling-sink
        # failure therefore never leaves a published-but-uncheckpointed
        # table commit (the duplicate-reprocess hazard).
        def write_table(df: DataFrame, _table=table, _op=op):
            state["staged"] = _table.stage(df, _op, metadata=meta.all())

        def commit_table(_table=table,
                         _mds=config.get_int("sink.max_delta_slices", 10)):
            _table.commit_staged(state.pop("staged", None))
            # merge-on-read read tax is bounded by POLICY, not operator
            # memory: every published commit asks whether enough delta
            # slices accrued to fold (no-op on COW / below threshold)
            if _table.table_type == "mor":
                _table.maybe_compact(_mds)

        nodes.append(SinkNode("table", write_table, commit=commit_table,
                              priority=100))
    elif sink_type in ("csv", "json"):
        fsink = FileSink(config.get_required("sink.path"), fmt=sink_type,
                         file_size_mb=config.get_float("sink.file_size_mb", -1),
                         compression=config.get("sink.compression"))
        nodes.append(SinkNode("file", fsink.write, priority=100))
    else:
        raise ValueError(f"unknown sink.type {sink_type!r}")

    if corpus_chain or media_chain:
        def _unpin():
            # release the corpus/media-stage persist barriers once every
            # sink committed — cached partitions must not outlive the
            # job in a long-running driver
            while corpus_pinned:
                corpus_pinned.pop().unpersist()
            while media_pinned:
                media_pinned.pop().unpersist()
        nodes.append(SinkNode("corpus_unpersist", lambda _df: None,
                              commit=_unpin, priority=999))

    return JobDag(name, calc, get_data, JobSubDag(nodes), meta,
                  transform=transform)
