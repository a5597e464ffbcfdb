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

    batches = base.consume_changes(metadata, checkpoint_key=checkpoint_key,
                                   max_commits=max_commits)
    if not batches:
        return 0
    affected: DataFrame | None = None
    for _cid, change_df in batches:
        keys = change_df.select(group_col)
        affected = keys if affected is None else affected.unionByName(keys)
    affected = affected.distinct()

    # no broadcast hint: a backfill batch can touch every group; AQE
    # broadcasts the affected-keys side when it is actually small
    snapshot = base.read().join(affected, group_col, "left_semi")
    partial = snapshot.groupBy(group_col).agg(
        *[(F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col))
          .alias(name) for name, (fn, col) in aggs.items()])
    n = partial.count()
    rollup.write(partial, WriteOp.UPSERT)
    # durable only now — after the rollup commit (work-unit contract)
    metadata.save_changes()
    return n
