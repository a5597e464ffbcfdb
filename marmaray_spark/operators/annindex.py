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
    rewrite those keys out of the index.

    A thin wrapper over the shared maintenance skeleton
    (operators/maintained.py maintain_projection) — the only specifics
    here are the projection itself (``assign_cells``) and that its
    output renames the base key to the index's fixed ``vec_id`` schema
    (the ``derived_key`` parameter)."""
    from marmaray_spark.operators.maintained import maintain_projection

    def project(live):
        return assign_cells(live, centroids, id_col=id_col,
                            vec_col=vec_col)

    return maintain_projection(base, index, metadata, [id_col, vec_col],
                               id_col, project, checkpoint_key,
                               max_commits, derived_key="vec_id")


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