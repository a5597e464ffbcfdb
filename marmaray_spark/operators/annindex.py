"""Incrementally-maintained IVF index: a materialized (vec_id, cell,
quantized-vector) table kept in sync with a vector base table through the
table's own change stream — the maintained-rollup pattern
(operators/rollup.py) applied to similarity serving.

Why materialize: ``ivf_probe_topk`` assigns every corpus vector to its
cell at QUERY time — fine for one-shot analytics, wasted work for a
serving corpus queried continuously. The index table precomputes the
assignment once per ingested record; the online probe is then one
equi-join of a broadcast probe list against an index scan that Catalyst
prunes to the probed cells.

Freshness: ``maintain_ann_index`` advances the index by exactly the base
table's new commits (``TableSink.consume_changes``): the change batches'
after-images are deduped to the LATEST version per key, assigned to
cells (``similarity.ivf_cells`` — one shared entry point with the probe
path, so the expression/Arrow-kernel auto-switch and tie-break contract
cannot drift), and UPSERTed by vec_id. Commits that DROP keys
(INSERT_OVERWRITE replacing partitions) are honored too: the pre-image
keys come from each commit's ``removes`` manifest — exactly like
rollup.py — and keys absent from the current base snapshot are rewritten
out of the index, so the ``index == assign_cells(base)`` invariant holds
across overwrites, not just appends. Exactly-once rides the standard
work-unit contract — the consumer checkpoint persists via
``metadata.save_changes()`` (called here, after the index commit, as in
maintain_rollup), and a replayed batch re-UPSERTs identical rows
(idempotent). Cost follows the CHANGE volume, never the corpus size —
except a key-dropping overwrite, which additionally pays one index
rewrite (loud in the docstring because overwrite-heavy bases should
prefer rebuilding the index wholesale).

The reference's closest analogue is checkpoint-driven incremental
ingestion (M/common/sources/IWorkUnitCalculator.java:36-90); maintained
secondary structures are beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marmaray_spark.operators.similarity import (_rank_probe_join, ivf_cells,
                                                 quantize)


def assign_cells(vectors: DataFrame, centroids: list[list[int]],
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 use_kernel: bool | None = None) -> DataFrame:
    """(vec_id, cell, cv): nearest-centroid cell + quantized vector for
    every input row — the index projection, delegated to
    ``similarity.ivf_cells`` (shared auto-switch, shared tie-breaks)."""
    base = vectors.select(F.col(id_col).alias("vec_id"),
                          quantize(vec_col).alias("cv"))
    return ivf_cells(base, [list(c) for c in centroids],
                     list(range(len(centroids))), "vec_id", "cv", 1,
                     use_kernel)


def maintain_ann_index(base, index, metadata,
                       centroids: list[list[int]],
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       checkpoint_key: str = "ann_index.last_commit",
                       max_commits: int | None = None) -> int:
    """Advance the index table by the base table's new commits; returns
    rows (re)assigned (0 = nothing new). ``base``/``index``: TableSinks,
    the index keyed by ``vec_id``. Multiple pending commits touching one
    key collapse to the newest version before assignment, so the index
    write is one UPSERT regardless of backlog depth; commits whose
    ``removes`` manifests dropped keys from the base additionally
    rewrite those keys out of the index."""
    from marmaray_spark.operators.maintained import consume_latest
    from marmaray_spark.sinks.table import WriteOp

    latest, affected = consume_latest(base, metadata, [id_col, vec_col],
                                      id_col, checkpoint_key, max_commits)
    if latest is None:
        return 0
    # only keys STILL LIVE in the base are assigned — a backlog that
    # inserted and then overwrite-dropped a key before this run must not
    # resurrect it from the insert's after-image
    live = latest.join(base.read().select(id_col), id_col, "left_semi")
    # persist: the count and the UPSERT both consume the assignment
    # plan (union + latest-version window + cell kernel) — without the
    # barrier every ingest tick pays it twice over the change volume
    assigned = assign_cells(live, centroids, id_col=id_col,
                            vec_col=vec_col).persist()
    try:
        n = assigned.count()
        # affected keys no longer in the base were dropped by an
        # overwrite: rewrite them out (UPSERT cannot delete). The stale
        # set is change-scoped; the rewrite is not — overwrite-heavy
        # bases should rebuild instead of maintain.
        gone_keys = affected.join(base.read().select(id_col),
                                  id_col, "left_anti")
        if (not index.is_empty()) and gone_keys.limit(1).count() > 0:
            if index.partition is not None:
                # INSERT_OVERWRITE only replaces partitions the new
                # frame touches — a partitioned index could silently
                # keep dropped keys (same guard as maintain_rollup)
                raise ValueError(
                    "stale-key rewrite needs an unpartitioned index "
                    f"table; index is partitioned by {index.partition!r}")
            # rewrite = current index minus (dropped keys AND the keys
            # this batch re-assigns), plus the fresh assignments — the
            # anti-join must cover both or re-assigned keys duplicate
            gone = (gone_keys.withColumnRenamed(id_col, "vec_id")
                    .unionByName(assigned.select("vec_id")))
            survivors = index.read().join(gone, "vec_id", "left_anti")
            index.write(survivors.unionByName(assigned),
                        WriteOp.INSERT_OVERWRITE)
        elif n:
            index.write(assigned, WriteOp.UPSERT)
    finally:
        assigned.unpersist()
    # durable only now — after the index commit (work-unit contract)
    metadata.save_changes()
    return n


def ivf_probe_topk_indexed(queries: DataFrame, index_df: DataFrame,
                           centroids: list[list[int]], k: int,
                           nprobe: int = 2, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           use_kernel: bool | None = None) -> DataFrame:
    """Online probe against a MAINTAINED index table (vec_id, cell, cv):
    identical semantics to ``ivf_probe_topk(centroids=...)`` — pinned by
    test — but the corpus side is a plain scan of precomputed
    assignments: no per-query cell math over the corpus, and the cell
    equi-join prunes to the probed cells. The (small) query side pays
    the probe ranking through the same ``ivf_cells`` entry point, so
    large quantizers ride the Arrow kernel here exactly as they did at
    index build time."""
    cids = list(range(len(centroids)))
    base_q = queries.select(F.col(id_col).alias("query_id"),
                            quantize(vec_col).alias("qv"))
    probes = ivf_cells(base_q, [list(c) for c in centroids], cids,
                       "query_id", "qv", nprobe, use_kernel)
    c = index_df.select(F.col("vec_id").alias("neighbor_id"), "cell", "cv")
    return _rank_probe_join(c, probes, k)