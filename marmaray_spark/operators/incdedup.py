"""Incrementally-maintained dedup index: dedup NEW data against an
existing corpus without re-scanning the corpus.

The batch dedup operators (operators/dedup.py) answer "which documents
in THIS frame duplicate each other" — one digest shuffle, or an LSH
bucket join, over everything they are given. A production ingest never
wants that shape: the corpus is 100 TB and already deduplicated; the
question per tick is "which of these N NEW documents duplicate the
corpus (or each other)", and its cost must follow N, not the corpus.

This module materializes the dedup STATE as a maintained table —
(doc_id, digest, buckets) — advanced by the base corpus table's own
commit stream (operators/maintained.py maintain_projection: the same
change-consumption contract as the maintained rollup / ANN index /
decontamination report), and probes it with batch-scale joins:

- exact:  new digests equi-join the index's digests. The index side is
  semi-pruned to the batch's digest set FIRST, so the aggregate that
  picks each digest's min-id keeper runs over batch-scale rows.
- near:   new docs' LSH band-buckets equi-join the index's exploded
  buckets — candidates are (new, existing) pairs only, verified by
  exact n-gram Jaccard exactly like the batch path. O(N x bands)
  probe rows against a bucket-keyed index scan; the corpus is never
  shuffled, never re-hashed.

Reference contract: uber/marmaray has no dedup surface; the maintenance
pattern generalizes its checkpoint-driven incremental ingestion
(M/common/sources/IWorkUnitCalculator.java:36-90). Beyond-reference
surface per the build brief (LLM-training-pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marmaray_spark.operators.dedup import (content_digest,
                                            jaccard_counts,
                                            lsh_band_buckets,
                                            minhash_digests,
                                            minhash_signature)
from marmaray_spark.operators.text import word_shingles, words


def dedup_projection(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", bands: int = 8,
                     rows_per_band: int = 2, shingle_width: int = 3,
                     sig_k: int = 16,
                     fingerprint_k: int | None = None,
                     fingerprint_w: int = 4) -> DataFrame:
    """(id, digest, buckets[, fingerprints]): the dedup state derived
    from one document row — exact-content digest plus LSH band buckets
    over word-shingle minhashes, and (when ``fingerprint_k`` is set)
    the winnowing fingerprint set for PARTIAL-copy probes. Pure
    projection (no shuffle); the SAME expression stacks as the batch
    operators, so an index probe and a batch self-dedup cannot disagree
    on bucketing or fingerprints. Fingerprints cost ~2n/(w+1) bigints
    per doc of index storage — enable them only when the ingest policy
    actually gates on partial copies."""
    out = (df.withColumn("__w", words(text_col))
           .withColumn("__sh", word_shingles("__w", shingle_width))
           .withColumn("__hh", minhash_digests("__sh"))
           .withColumn("__sig", minhash_signature("__hh", sig_k)))
    cols = [F.col(id_col),
            content_digest(text_col).alias("digest"),
            lsh_band_buckets("__sig", bands, rows_per_band)
            .alias("buckets")]
    if fingerprint_k is not None:
        from marmaray_spark.operators.fingerprint import (_norm,
                                                          gram_hashes,
                                                          winnow)
        out = (out.withColumn("__fs", F.expr(_norm(text_col)))
               .withColumn("__gh", gram_hashes("__fs", fingerprint_k,
                                               normalized=True)))
        cols.append(winnow("__gh", fingerprint_w).alias("fingerprints"))
    return out.select(*cols)


# The projection parameters an index was maintained with ARE its
# identity: a probe re-deriving batch buckets/fingerprints under
# different bands/rows_per_band/sig_k/shingle_width/fingerprint_* never
# matches any index hash and silently returns ZERO candidates — the
# worst dedup failure mode (looks like "no duplicates"). Every
# maintenance commit therefore stamps the resolved params into the index
# table's commit metadata, and probes validate explicit arguments
# against (or default missing ones from) ``index_projection_params``.
_PROJ_DEFAULTS: dict = {"bands": 8, "rows_per_band": 2,
                        "shingle_width": 3, "sig_k": 16,
                        "fingerprint_k": None, "fingerprint_w": 4}
_META_PREFIX = "dedup_index."


def projection_commit_meta(**proj_kw) -> dict[str, str]:
    """The commit-metadata stamp for ``maintain_dedup_index``: the fully
    resolved projection params (explicit kwargs over defaults), string
    valued per the Commit.metadata contract."""
    unknown = set(proj_kw) - set(_PROJ_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown projection params: {sorted(unknown)}")
    p = dict(_PROJ_DEFAULTS)
    p.update(proj_kw)
    return {_META_PREFIX + k: str(v) for k, v in p.items()}


def index_projection_params(index) -> dict | None:
    """Read the projection params recorded by ``maintain_dedup_index``
    from the index TableSink's latest commit metadata; None when the
    index predates param stamping (probes then fall back to their own
    arguments, the pre-stamp behavior)."""
    meta = index.log.latest_metadata()
    out = {}
    for k in _PROJ_DEFAULTS:
        v = meta.get(_META_PREFIX + k)
        if v is not None:
            out[k] = None if v == "None" else int(v)
    return out or None


def _resolve_param(name: str, given, index_params: dict | None):
    """Explicit argument validated against the recorded value; missing
    argument defaults from the record, else the module default."""
    if index_params and name in index_params:
        rec = index_params[name]
        if given is not None and given != rec:
            raise ValueError(
                f"probe called with {name}={given} but the index was "
                f"maintained with {name}={rec}: bucket/fingerprint "
                f"hashes would never match (silent zero recall). Drop "
                f"the argument to default from the index, or re-maintain "
                f"the index with the new parameters.")
        return rec
    return _PROJ_DEFAULTS[name] if given is None else given


def maintain_dedup_index(base, index, metadata, id_col: str = "doc_id",
                         text_col: str = "text",
                         checkpoint_key: str = "dedup_index.last_commit",
                         max_commits: int | None = None, **proj_kw) -> int:
    """Advance the dedup-state table by the corpus table's new commits;
    returns rows (re)projected. ``base``/``index``: TableSinks, the
    index keyed by ``id_col``. Exactly-once, latest-version collapse,
    and overwrite-drop handling all ride maintain_projection. Each
    commit stamps the resolved projection params into the index's
    commit metadata (see ``index_projection_params``)."""
    from marmaray_spark.operators.maintained import maintain_projection

    recorded = index_projection_params(index)
    meta_kv = projection_commit_meta(**proj_kw)
    if recorded is not None:
        stamped = {_META_PREFIX + k: str(v) for k, v in recorded.items()}
        if stamped != meta_kv:
            raise ValueError(
                f"index at {index.table_path} was maintained with "
                f"{recorded}; re-maintaining it with different projection "
                f"params would mix incompatible hashes — rebuild the "
                f"index instead")
    return maintain_projection(
        base, index, metadata, [id_col, text_col], id_col,
        lambda df: dedup_projection(df, id_col, text_col, **proj_kw),
        checkpoint_key, max_commits, commit_meta=meta_kv)


def exact_dups_against_index(batch: DataFrame, index_df: DataFrame,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """(new_id, keeper_id, digest): every batch document whose exact
    content already exists in the index under some other id; keeper is
    the smallest such existing id. Self-matches are excluded so a batch
    replaying rows already ingested (UPSERT re-delivery) does not flag
    them as duplicates of themselves.

    Scale: the index scan is semi-pruned by the (batch-scale) digest
    set BEFORE the min-keeper aggregate, so every shuffle in the plan
    carries O(batch) rows; at 100 TB the index side is additionally a
    2-column column-pruned scan (digest, id) that AQE sizes to the
    semi-join's selectivity."""
    probes = batch.select(F.col(id_col).alias("new_id"),
                          content_digest(text_col).alias("digest"))
    idx = (index_df.select(F.col(id_col).alias("old_id"), "digest")
           .join(probes.select("digest").distinct(), "digest", "left_semi"))
    hits = (idx.join(probes, "digest")
            .filter(F.col("old_id") != F.col("new_id")))
    return (hits.groupBy("new_id", "digest")
            .agg(F.min("old_id").alias("keeper_id"))
            .select("new_id", "keeper_id", "digest"))


def partial_copies_against_index(batch: DataFrame, index_df: DataFrame,
                                 id_col: str = "doc_id",
                                 text_col: str = "text",
                                 min_shared: int = 2,
                                 fingerprint_k: int | None = None,
                                 fingerprint_w: int | None = None,
                                 max_fingerprint_freq: int | None = None,
                                 index_params: dict | None = None
                                 ) -> DataFrame:
    """(new_id, old_id, shared): batch documents sharing >= ``min_shared``
    winnowing fingerprints with EXISTING corpus documents — the
    partial-copy probe (a paragraph lifted into an otherwise-new doc),
    which whole-document LSH near-dup structurally misses. Requires the
    index to have been maintained with ``fingerprint_k`` set in
    dedup_projection. By the winnowing guarantee, any shared normalized
    substring of length >= fingerprint_k + fingerprint_w - 1 produces at
    least one shared fingerprint.

    ``max_fingerprint_freq`` drops fingerprints occurring in more than
    that many INDEX documents before pairing — the MOSS "ignore
    ubiquitous fingerprints" rule: a fingerprint shared by half the
    corpus is boilerplate punctuation-of-the-domain, identifies nothing,
    and is exactly the hot join key that would make the probe
    O(batch_boiler x index_boiler). One frequency aggregate at
    fingerprint cardinality; scale shape otherwise = one batch
    projection + one explode-equi-join + one pair-count agg.

    ``index_params`` (from ``index_projection_params``): validates /
    defaults ``fingerprint_k``/``fingerprint_w`` exactly like
    ``near_dups_against_index`` — and fails fast when the index was
    maintained WITHOUT fingerprints (every probe would return empty)."""
    from marmaray_spark.operators.fingerprint import winnow_fingerprints

    if index_params is not None \
            and index_params.get("fingerprint_k") is None:
        raise ValueError(
            "index was maintained without fingerprints "
            "(fingerprint_k=None) — partial-copy probes against it "
            "always return empty; re-maintain with fingerprint_k set")
    if index_params and index_params.get("fingerprint_k") is not None:
        fingerprint_k = _resolve_param("fingerprint_k", fingerprint_k,
                                       index_params)
    elif fingerprint_k is None:
        fingerprint_k = 5
    fingerprint_w = _resolve_param("fingerprint_w", fingerprint_w,
                                   index_params)

    # same barrier rule as near_dups_against_index: the winnowing
    # expression stack under an explode generator evaluates interpreted
    # — persist the batch-scale projection first
    fps = winnow_fingerprints(batch, id_col, text_col,
                              fingerprint_k, fingerprint_w) \
        .select(F.col(id_col).alias("new_id"), "fingerprints").persist()
    fps.count()
    new_f = fps.select("new_id", F.explode("fingerprints").alias("fp"))
    old_f = index_df.select(F.col(id_col).alias("old_id"),
                            F.explode("fingerprints").alias("fp"))
    if max_fingerprint_freq is not None:
        freq = old_f.groupBy("fp").agg(F.count(F.lit(1)).alias("__n"))
        old_f = (old_f.join(freq, "fp")
                 .filter(F.col("__n") <= max_fingerprint_freq)
                 .select("old_id", "fp"))
    out = (old_f.join(new_f, "fp")
           .filter(F.col("old_id") != F.col("new_id"))
           .groupBy("new_id", "old_id")
           .agg(F.count(F.lit(1)).cast("int").alias("shared"))
           .filter(F.col("shared") >= min_shared))
    # materialize the (pair-scale) result so the batch projection's
    # cache blocks release NOW instead of leaking per tick
    out = out.persist()
    out.count()
    fps.unpersist()
    return out


def index_bucket_stats(index_df: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """(band, bucket, __w, __anchor): per-LSH-bucket width and min-id
    anchor over the dedup index — the probe-side hot-bucket guard's
    input. One map-side-combined aggregate at bucket cardinality; a
    long-lived ingest loop computes this once per index maintenance
    cycle and persists it, so per-tick probes pay only the (tiny)
    broadcast-ready join."""
    return (index_df
            .select(F.col(id_col).alias("old_id"),
                    F.posexplode("buckets").alias("band", "bucket"))
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__w"),
                 F.min("old_id").alias("__anchor")))


def near_dups_against_index(batch: DataFrame, index_df: DataFrame,
                            corpus: DataFrame,
                            id_col: str = "doc_id", text_col: str = "text",
                            threshold_bps: int = 5000,
                            shingle_width: int | None = None,
                            bands: int | None = None,
                            rows_per_band: int | None = None,
                            sig_k: int | None = None,
                            max_candidates_per_doc: int | None = None,
                            max_index_bucket_width: int | None = None,
                            bucket_stats: DataFrame | None = None,
                            index_params: dict | None = None
                            ) -> DataFrame:
    """(new_id, old_id, inter, union_sz, jaccard_bps, containment_bps):
    batch documents near-duplicating EXISTING corpus documents — LSH
    candidates from the maintained index, verified by exact n-gram
    Jaccard at ``threshold_bps``; ``containment_bps`` additionally
    reports the asymmetric |new ∩ old| / |new| overlap (partial-copy
    signal) for the surviving pairs. ``corpus`` supplies the existing documents' text
    for verification (the index stores only digests/buckets); it is
    probed by an id semi-join, so only candidate rows are read.

    Candidates are (new x existing) ONLY — batch-internal pairs are the
    batch dedup operators' job (compose both for full hygiene). The
    probe explodes batch buckets (N x bands rows) against the index's
    exploded buckets; the corpus never re-hashes.

    ``max_candidates_per_doc`` is the probe-side HOT-BUCKET guard (the
    batch operators' ``max_bucket_width`` analogue): a boilerplate batch
    doc probing a boilerplate-heavy index matches the ENTIRE hot bucket
    — measured 1.3M verification pairs / 173s wall from a 960-doc batch
    against a 9.6k-doc 30%-boilerplate index (tools/stress_skew.py
    incdedup_probe_hot_bucket). Capped, each new doc verifies only its
    ``max_candidates_per_doc`` lowest-old_id candidates. Recall caveat
    (document, don't hide): a true near-dup can be missed if the cap
    fills with LSH false positives first — but the overflow case IS mass
    boilerplate, where candidates are mutually near-identical, and for
    the dedup DECISION one surviving match suffices. Off (None) by
    default: the pytest parity contract is the exact candidate set.

    ``max_index_bucket_width`` caps the probe from the INDEX side — the
    batch operators' hot-bucket STAR applied to the probe relation: a
    bucket wider than the cap is represented by its min-old_id ANCHOR
    alone, so a boilerplate batch doc joins 1 index row per band
    instead of the whole hot bucket. Measured on the 48k-doc
    30%-boilerplate skew corpus with a 77-doc batch: bucket-join rows
    drop 2.6M -> ~50k; wall only 5.3s -> 5.0s locally because per-job
    floors dominate at this size — the cap is insurance for real
    widths (a 10M-member boilerplate bucket makes the uncapped join
    batch x 10M). Same recall argument as lsh_candidate_pairs' star:
    overflow buckets are mass boilerplate, mutually near-identical, so
    the anchor verifies for the group. The width stats cost one
    (band, bucket) aggregate over the index — pass ``bucket_stats``
    (from ``index_bucket_stats``, persisted once per MAINTENANCE
    cycle) so ticks don't re-pay it; left None, the aggregate runs
    inline and costs about what it saves at this local scale.

    ``index_params`` (from ``index_projection_params(index)``): the
    projection params the index was maintained with. Explicit
    ``bands``/``rows_per_band``/``sig_k``/``shingle_width`` arguments
    are validated against it (mismatch raises — the alternative is a
    silent zero-candidate probe); omitted ones default FROM it, so the
    recommended call passes ``index_params`` and no hashing knobs."""
    shingle_width = _resolve_param("shingle_width", shingle_width,
                                   index_params)
    bands = _resolve_param("bands", bands, index_params)
    rows_per_band = _resolve_param("rows_per_band", rows_per_band,
                                   index_params)
    sig_k = _resolve_param("sig_k", sig_k, index_params)
    # persist the batch projection BEFORE the explode — a generator
    # input drops out of whole-stage codegen, so without the barrier the
    # full minhash tree evaluates INTERPRETED per row (the
    # lsh_candidate_pairs rule; measured here: 131s -> 6s wall on the
    # skew-stress probe — the interpreted tree over just 960 batch docs
    # was the ENTIRE cost). The frame is batch x (id, digest, buckets).
    proj = dedup_projection(batch, id_col, text_col, bands=bands,
                            rows_per_band=rows_per_band,
                            shingle_width=shingle_width, sig_k=sig_k).persist()
    proj.count()
    # band index rides the key: equal bucket hashes in different bands
    # must not collide (same contract as lsh_candidate_pairs)
    new_b = proj.select(F.col(id_col).alias("new_id"),
                        F.posexplode("buckets").alias("band", "bucket"))
    old_b = index_df.select(F.col(id_col).alias("old_id"),
                            F.posexplode("buckets").alias("band", "bucket"))
    if max_index_bucket_width is not None:
        stats = (bucket_stats if bucket_stats is not None
                 else index_bucket_stats(index_df, id_col))
        # LEFT join + missing-stats => width 1 (always kept): callers
        # legitimately pass stats persisted at the LAST maintenance
        # cycle, so buckets of documents indexed since then are absent
        # from stats — an inner join would silently drop those index
        # rows and make freshly-ingested docs UNDETECTABLE as near-dups
        # (worse than uncapped). A just-created bucket cannot be hot
        # yet; treating it as width 1 keeps it until stats refresh.
        old_b = (old_b.join(stats, ["band", "bucket"], "left")
                 .filter((F.coalesce(F.col("__w"), F.lit(1))
                          <= max_index_bucket_width)
                         | (F.col("old_id") == F.col("__anchor")))
                 .select("old_id", "band", "bucket"))
    cand = (old_b.join(new_b, ["band", "bucket"])
            .filter(F.col("old_id") != F.col("new_id"))
            .select("new_id", "old_id").distinct())
    if max_candidates_per_doc is not None:
        from pyspark.sql.window import Window as W
        w = W.partitionBy("new_id").orderBy("old_id")
        cand = (cand.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= max_candidates_per_doc)
                .drop("__rn"))
    # second barrier: the candidate set is consumed TWICE below — as the
    # verification join base and to derive the old-id semi-join set —
    # so without it the bucket join + distinct (+ cap window) re-runs
    # per consumer. The frame is pair-id-scale — tiny, and it is the
    # ONLY cache entry a tick leaves behind: once it materializes, the
    # batch projection has served its purpose and unpersists here, so a
    # long-lived ingest loop accumulates pair-id-scale blocks, not
    # batch-x-bucket ones.
    cand = cand.persist()
    cand.count()
    proj.unpersist()

    shin = lambda df, idc, out: (df.withColumn("__w", words(text_col))
                                 .select(F.col(id_col).alias(idc),
                                         word_shingles("__w", shingle_width)
                                         .alias(out)))
    new_sh = shin(batch, "new_id", "sh_new")
    old_ids = cand.select("old_id").distinct() \
        .withColumnRenamed("old_id", id_col)
    old_sh = shin(corpus.join(old_ids, id_col, "left_semi"),
                  "old_id", "sh_old")
    inter, union = jaccard_counts(F.col("sh_new"), F.col("sh_old"))
    return (cand.join(new_sh, "new_id").join(old_sh, "old_id")
            .withColumn("inter", inter)
            .withColumn("union_sz", union)
            .withColumn("jaccard_bps",
                        F.expr("CAST(inter * 10000 div union_sz AS INT)"))
            # containment = |new ∩ old| / |new|: the ASYMMETRIC overlap —
            # a short doc fully quoted inside a long corpus doc has low
            # Jaccard but containment 10000; report it so partial-copy
            # policies don't need a second scan. Detection still gates
            # on Jaccard (the symmetric near-dup contract).
            .withColumn("containment_bps",
                        F.expr("CAST(inter * 10000 div "
                               "greatest(size(array_distinct(sh_new)), 1) "
                               "AS INT)"))
            .filter(F.col("jaccard_bps") >= threshold_bps)
            .select("new_id", "old_id", "inter", "union_sz", "jaccard_bps",
                    "containment_bps"))
