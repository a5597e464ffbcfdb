"""Incrementally-maintained rollup: a materialized aggregate kept in
sync with its base table through the table's own change stream.

The chained-pipeline pattern (reference scope ends at single
source->sink runs; a real warehouse maintains downstream aggregates):
``TableSink.consume_changes`` yields the commits since the last run,
the AFFECTED group keys come from those change batches, ONLY those
groups are re-aggregated from the base snapshot, and the fresh partials
UPSERT into the rollup table (last-write-wins per group key).

Recompute-affected-groups (not delta-merge) because the CDC view serves
after-images only: an update's old value is gone, so additive deltas
can't be formed — but group-scoped recompute needs no before-image, is
correct for ANY aggregate (not just sum/count), and its cost follows the
number of TOUCHED groups, not table size: the recompute scan is pruned
by an equi-join/isin on the group key (partition pruning when the base
is partitioned by it — the common layout for rollup dimensions).

AFFECTED means both sides of every change: the after-image groups from
the change batches, plus the PRE-image groups of the touched records —
an upsert that moves a record to a new group_col value must re-aggregate
the group it LEFT, and an INSERT_OVERWRITE must re-aggregate every group
whose rows the replaced partitions held. The pre-image comes from each
commit's ``removes`` manifest: the rewritten/replaced slices are still
on disk (until vacuum), so old groups are read from exactly the data the
commit displaced — partition-scoped, never a second full-table pass.
Affected groups that recompute to zero rows get their rollup rows
DELETED (a key-scoped DELETE commit), not left stale.

Exactly-once: the consumer checkpoint lives in the caller's
MetadataManager and is persisted only after the rollup commit lands —
the IWorkUnitCalculator durability contract applied to table-to-table
chaining. A crash between rollup commit and checkpoint save replays the
batch; the replayed UPSERT overwrites the same groups with identical
values (idempotent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_rollup(base, rollup, metadata, group_col: str,
                    aggs: dict[str, tuple[str, str]],
                    checkpoint_key: str = "rollup.last_commit",
                    max_commits: int | None = None) -> int:
    """Advance the rollup by the base table's new commits.

    ``base`` / ``rollup``: TableSinks (rollup keyed by ``group_col``);
    ``aggs`` maps output column -> (aggregate fn name, input column),
    e.g. ``{"n": ("count", "*"), "total": ("sum", "amount")}``.
    Returns the number of groups rewritten (0 = nothing new)."""
    from marmaray_spark.sinks.table import WriteOp

    # every raise after consume_changes advanced the checkpoint must
    # roll it back (the shared maintainer contract, r10): otherwise a
    # later caller save_changes() persists a checkpoint for commits
    # whose groups were never re-aggregated
    last = metadata.get(checkpoint_key) or ""
    try:
        # with_op=False: the insert/update tag is unused here, and
        # computing it joins every commit against the entire previous
        # snapshot's key set (the link-edges rehearsal measurement)
        batches = base.consume_changes(metadata,
                                       checkpoint_key=checkpoint_key,
                                       max_commits=max_commits,
                                       with_op=False)
        if not batches:
            return 0
        commits_by_id = {c.commit_id: c for c in base.log.commits()}
        # one schema inference for all pre-image reads this drain —
        # lazy: pure-insert drains never read a pre-image, and eager
        # inference doubles the footer round consume_changes just paid
        _schema_cache: list = []

        def snap_schema():
            if not _schema_cache:
                _schema_cache.append(
                    None if base.is_empty()
                    else base.read(with_meta=True).schema)
            return _schema_cache[0]
        affected: DataFrame | None = None
        for cid, change_df in batches:
            keys = change_df.select(group_col)
            affected = keys if affected is None \
                else affected.unionByName(keys)
            commit = commits_by_id[cid]
            if commit.op == WriteOp.DELETE.value:
                # deleted rows leave their groups: the before-images
                # (recoverable for BOTH copy-on-write rewrites and
                # merge-on-read tombstone deltas) name exactly the
                # groups to re-aggregate — no removes scan, which for a
                # COW delete also holds untouched survivors
                if commit.tombstones:
                    pre = (base.delete_preimages(cid,
                                                 schema=snap_schema())
                           .select(group_col))
                    affected = affected.unionByName(pre)
                continue
            if commit.delta:
                # a merge-on-read delta upsert displaces versions with
                # no removes manifest — a record MOVED to a new group
                # would leave its old group silently un-reaggregated
                raise ValueError(
                    f"commit {cid} is a merge-on-read delta upsert; the "
                    "rollup cannot recover the displaced groups, and "
                    "the commit stays pending (compact() cannot clear "
                    "it — the delta commit itself is what's drained). "
                    "Rebuild the rollup from the current snapshot and "
                    "advance the checkpoint past the delta commits; "
                    "keep rollup-maintained bases copy-on-write to "
                    "prevent this")
            if not commit.removes:
                continue  # pure insert: no record left any group
            missing = [s for s in commit.removes
                       if not (base.table_path / s).exists()]
            if missing:
                # Vacuum deleted the displaced slices — the
                # vacuum-races-the-maintainer window. Retention
                # contract: vacuum must retain at least (unconsumed
                # commits + 1); a lagging consumer gets a loud error,
                # never a stale rollup.
                raise FileNotFoundError(
                    f"commit {cid} pre-image vacuumed ({missing[:3]}...); "
                    "rollup cannot recover the displaced groups — lower "
                    "the consumer lag or raise vacuum "
                    "retain_last_n_commits")
            schema = snap_schema()
            reader = (base.spark.read.schema(schema)
                      if schema is not None
                      else base.spark.read.option("mergeSchema", "true"))
            pre = reader.parquet(*[str(base.table_path / s)
                                   for s in commit.removes])
            if commit.op == WriteOp.INSERT_OVERWRITE.value:
                # replaced partitions: any group they held may have
                # lost rows
                old_groups = pre.select(group_col)
            else:
                # upsert rewrite: old versions of the changed keys live
                # in the removed slices — semi-join recovers exactly
                # their old groups
                changed_keys = change_df.select(base.key).distinct()
                old_groups = (pre.join(changed_keys, base.key,
                                       "left_semi")
                              .select(group_col))
            affected = affected.unionByName(old_groups)
        affected = affected.distinct()

        # no broadcast hint: a backfill batch can touch every group; AQE
        # broadcasts the affected-keys side when it is actually small
        snapshot = base.read().join(affected, group_col, "left_semi")
        partial = snapshot.groupBy(group_col).agg(
            *[(F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col))
              .alias(name) for name, (fn, col) in aggs.items()])
        n = partial.count()
        # affected groups with zero surviving rows must LEAVE the
        # rollup — a key-scoped DELETE commit (slice-pruned, cost
        # follows the stale groups; the earlier INSERT_OVERWRITE form
        # rewrote the ENTIRE rollup whenever one group went stale, and
        # had to refuse partitioned rollups outright)
        stale = affected.join(partial.select(group_col), group_col,
                              "left_anti")
        if not rollup.is_empty() and stale.limit(1).count() > 0:
            rollup.write(stale, WriteOp.DELETE)
        if n:
            rollup.write(partial, WriteOp.UPSERT)
    except BaseException:
        metadata.set(checkpoint_key, last)
        raise
    # durable only now — after the rollup commit (work-unit contract)
    metadata.save_changes()
    return n
