"""Shared skeleton for change-stream-maintained structures.

Three operators keep a derived table in sync with a base TableSink's
commit log — maintain_rollup (aggregates), maintain_ann_index
(similarity), maintain_decontamination_report (hygiene). The
change-consumption contract they share lives HERE, once:

- drain ``consume_changes`` batches and collapse the after-images to the
  newest version per key (multiple pending commits touching one key must
  not fan out);
- collect the AFFECTED key set: after-image keys plus the PRE-image keys
  read from each commit's ``removes`` manifest (the displaced slices are
  still on disk until vacuum — reading them is how a maintainer learns
  which keys an INSERT_OVERWRITE dropped), with the vacuum-races-the-
  maintainer FileNotFoundError guard;
- the caller then restricts after-images to keys STILL LIVE in the base
  snapshot (a backlog can insert and then overwrite-drop a key before
  maintenance ever ran — rebuilding from the raw after-images would
  resurrect it) and decides its own stale-row story.

Checkpoint durability stays with the caller: persist via
``metadata.save_changes()`` only after the derived table's commit lands
(the IWorkUnitCalculator contract, M/common/sources/IWorkUnitCalculator
.java:36-90).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def consume_latest(base, metadata, cols: list[str], id_col: str,
                   checkpoint_key: str,
                   max_commits: int | None = None):
    """Drain pending commits; return ``(latest, affected)`` or
    ``(None, None)`` when there is nothing new.

    ``latest``: one row per key — the newest after-image across the
    drained batches, projected to ``cols`` (which must include
    ``id_col``). NOT yet filtered to live keys; callers semi-join
    against ``base.read()`` so a key inserted and then dropped inside
    the same backlog cannot be resurrected.
    ``affected``: distinct ids touched by the batches — after-image ids
    plus pre-image ids from every commit's removes manifest.

    The drain passes ``with_op=False``: nothing here reads the
    insert/update tag, and computing it joins every commit's changes
    against the ENTIRE previous snapshot's key set — the link-edges
    rehearsal measured the tagged drain scanning the corpus once per
    pending commit (r10).

    A ``restore`` after the checkpoint is REFUSED loudly (the cms
    maintainer's posture, generalized r10): a rollback reverts keys to
    older values with no change records, so the maintained structure
    would keep rows derived from versions the base no longer holds —
    rebuild from the current snapshot instead."""
    last = metadata.get(checkpoint_key) or ""
    restored = [c.commit_id for c in base.log.commits()
                if c.commit_id > last and c.op == "restore"]
    if restored:
        raise ValueError(
            f"base table was restored ({restored[0]}) after the "
            "maintained structure's checkpoint; a rollback has no "
            "change records to re-derive from — rebuild the derived "
            "table from the current snapshot")
    batches = base.consume_changes(metadata, checkpoint_key=checkpoint_key,
                                   max_commits=max_commits, with_op=False)
    if not batches:
        return None, None
    commits_by_id = {c.commit_id: c for c in base.log.commits()}
    # one schema inference for all pre-image reads this drain (the
    # per-commit mergeSchema footer round cost a backlog 0.3s/commit —
    # r9 verdict item 7) — computed LAZILY on the first removes-bearing
    # commit: a pure-insert drain never reads a pre-image, and eager
    # inference would double the footer round consume_changes already
    # paid (review find, r10). A PURGED base (zero active slices) has
    # no snapshot to infer from; the rare pre-image read then falls
    # back to per-commit mergeSchema instead of crashing the drain
    _schema_cache: list = []

    def snap_schema():
        if not _schema_cache:
            _schema_cache.append(None if base.is_empty()
                                 else base.read(with_meta=True).schema)
        return _schema_cache[0]

    changed: DataFrame | None = None
    affected: DataFrame | None = None
    for seq, (cid, change_df) in enumerate(batches):
        tagged = change_df.select(*[F.col(c) for c in cols]) \
            .withColumn("__seq", F.lit(seq))
        changed = tagged if changed is None else changed.unionByName(tagged)
        ids = change_df.select(id_col)
        affected = ids if affected is None else affected.unionByName(ids)
        commit = commits_by_id[cid]
        if commit.op == "delete":
            # a delete's after-image is empty; its affected ids are the
            # BEFORE-image rows (works for both COW rewrites and MOR
            # tombstone deltas — delete_preimages resolves either).
            # Cheaper than the removes path below too: a COW delete's
            # removes slices also hold untouched survivors, which would
            # be re-derived for nothing.
            if commit.tombstones:
                pre = (base.delete_preimages(cid, schema=snap_schema())
                       .select(id_col))
                affected = affected.unionByName(pre)
            continue
        if not commit.removes:
            continue  # pure append: no key can have vanished
        missing = [s for s in commit.removes
                   if not (base.table_path / s).exists()]
        if missing:
            raise FileNotFoundError(
                f"commit {cid} pre-image vacuumed ({missing[:3]}...); "
                "the maintained structure cannot identify the displaced "
                "keys — lower the consumer lag or raise vacuum "
                "retain_last_n_commits")
        schema = snap_schema()
        reader = (base.spark.read.schema(schema) if schema is not None
                  else base.spark.read.option("mergeSchema", "true"))
        pre = (reader
               .parquet(*[str(base.table_path / s) for s in commit.removes])
               .select(id_col))
        affected = affected.unionByName(pre)
    latest = (changed
              .withColumn("__rn", F.row_number().over(
                  W.partitionBy(id_col).orderBy(F.col("__seq").desc())))
              .filter(F.col("__rn") == 1).drop("__rn", "__seq"))
    return latest, affected.distinct()


def _drained_append_only(base, last: str, upto: str) -> bool:
    """True when every commit drained in (last, upto] is a
    ``dedup_insert``-family write with no removes — a batch that can
    only have introduced BRAND-NEW keys (dedup-insert filters existing
    keys before writing; nothing was displaced or dropped).

    This is the crawl-tick shape, and it licenses the maintainers' fast
    path: every after-image key is live, nothing existing can have gone
    stale, and no derived row can collide — so the derived write is a
    plain INSERT append with zero reads of the base snapshot OR the
    derived table (crash-replay safety comes from the consumed_through
    fence, not a dedup anti-join — see ``_absorb_replayed``). Without
    it, every tick pays the stale probe (a full derived scan) and the
    copy-on-write merge (a table-sized rewrite): the link-edges
    rehearsal measured the maintainer LOSING to a full re-derive on
    exactly those costs (r10).

    Only ``compact`` is transparent to the check: a ``restore`` in the
    window CHANGES table contents with no change records — a key
    dedup-inserted and then rolled back by restore would be resurrected
    by an unfiltered append — so restore commits land in ``drained``
    and (not being dedup-family) force the slow path, whose live
    semi-join filters the dead keys."""
    drained = [c for c in base.log.commits()
               if last < c.commit_id <= upto and c.op != "compact"]
    return bool(drained) and all(
        c.op in ("dedup_insert", "dedup_bulk_insert") and not c.removes
        for c in drained)


_CONSUMED_META = "maintained.consumed_through."


def _consumed_stamp(metadata, checkpoint_key: str) -> dict[str, str]:
    """Commit-metadata stamp carrying the newest base commit this
    derived write folded — read AFTER the drain advanced the in-memory
    checkpoint, so it names exactly the drained window's end."""
    return {_CONSUMED_META + checkpoint_key:
            metadata.get(checkpoint_key) or ""}


def _absorb_replayed(derived, metadata, checkpoint_key: str) -> None:
    """Crash-replay fence (the cms maintainer's consumed_through
    pattern, shared by both maintainers r10): every derived commit
    stamps the newest base commit it folded; when a crash lands the
    derived commit but not the checkpoint save, the next drain sees
    the stamp ahead of the checkpoint and FAST-FORWARDS instead of
    re-deriving. O(1) driver metadata — the first idempotency fix
    wrote the fast path as a DEDUP_INSERT, whose anti-join re-scanned
    the whole derived table every tick (rehearsal-measured: append
    ticks went from 12k input rows back to 2M)."""
    stamped = derived.log.latest_metadata().get(
        _CONSUMED_META + checkpoint_key)
    if stamped and stamped > (metadata.get(checkpoint_key) or ""):
        metadata.set(checkpoint_key, stamped)
        metadata.save_changes()


def _maybe_compact_mor(derived, max_delta_slices: int) -> None:
    """Bound the MOR read tax BY POLICY at the place that creates it:
    maintainer drains are exactly the write-heavy UPSERT stream
    merge-on-read exists for, so each successful drain asks the policy
    whether enough delta slices accrued to fold (r10 shipped
    ``maybe_compact`` but nothing called it — a real MOR index's
    latest-wins window grew until someone remembered). Runs AFTER the
    checkpoint persisted: compaction is its own atomic commit and a
    crash here just leaves the deltas for the next drain's policy
    call. COW tables are untouched."""
    if getattr(derived, "table_type", "cow") == "mor":
        derived.maybe_compact(max_delta_slices)


def maintain_projection(base, derived, metadata, cols: list[str],
                        id_col: str, project, checkpoint_key: str,
                        max_commits: int | None = None,
                        commit_meta: dict[str, str] | None = None,
                        derived_key: str | None = None,
                        max_delta_slices: int = 10) -> int:
    """Keep ``derived == project(base)`` true across the base table's
    commit stream, for any per-row projection ``project(df) ->
    DataFrame`` that (a) keys its output by ``derived_key`` (default:
    the base's ``id_col``; pass it when the projection renames the key,
    e.g. the ANN index's fixed ``vec_id`` schema), (b) derives
    each output row from exactly one input row (cell assignment, digest
    + LSH buckets, any featurizer), and (c) is INJECTIVE in the base
    key: two different base ids must never emit the same
    ``derived_key``, in this tick or any earlier one. (a)+(b) make the
    slow path's UPSERT coalesce correctly; (c) is what the dedup-insert
    APPEND-ONLY fast path below additionally relies on — it writes
    plain INSERT without probing the derived table, so a cross-id
    derived-key collision that UPSERT would have coalesced last-wins
    ACCUMULATES as duplicate derived rows instead (advisor find, r10).
    Every shipped consumer renames or decorates the base key
    (``vec_id``, link-edge report keys embed the page id), which is
    injective by construction; a projection that buckets ids together
    must route through its own aggregation table, not this maintainer.
    Returns rows (re)projected.

    Generalized from maintain_ann_index's body (now a thin wrapper over
    this): drain-and-collapse via ``consume_latest``,
    restrict after-images to
    keys still live in the base (no backlog resurrection), project ONCE
    behind a persist barrier (count + write both consume the plan), then
    UPSERT — plus, when keys were dropped from the base (overwrite or
    DELETE), a key-scoped DELETE commit on the derived table (UPSERT
    cannot remove; the delete is slice-pruned, so its cost follows the
    gone keys, and partitioned derived tables are fine). The
    consumer checkpoint persists via ``metadata.save_changes()`` only
    after the derived commit lands (IWorkUnitCalculator contract,
    M/common/sources/IWorkUnitCalculator.java:36-90); a replayed batch
    re-UPSERTs identical rows, so crash-replay is idempotent. Cost
    follows the change volume — except key-dropping overwrites, which
    pay one derived-table rewrite (overwrite-heavy bases should rebuild
    wholesale instead).

    ``commit_meta``: stamped onto every derived-table commit (the
    HoodieSink commit-with-extra-metadata leg) — callers record the
    PROJECTION PARAMETERS here so probes can validate against (or
    default from) ``derived.log.latest_metadata()`` instead of silently
    probing with mismatched hashing."""
    from marmaray_spark.sinks.table import WriteOp

    derived_key = derived_key or id_col
    # crash-replay fence FIRST: a previous run may have committed the
    # derived table and died before saving the checkpoint
    _absorb_replayed(derived, metadata, checkpoint_key)
    # every raise after consume_latest advanced the drain checkpoint
    # must roll it back to this pre-drain value, or a later
    # save_changes() by the caller persists a checkpoint for commits
    # whose projections never landed — the silent-divergence failure
    # the cms maintainer's rollback (and its test) pin down
    last = metadata.get(checkpoint_key) or ""
    try:
        latest, affected = consume_latest(base, metadata, cols, id_col,
                                          checkpoint_key, max_commits)
        if latest is None:
            return 0
        stamp = {**(commit_meta or {}),
                 **_consumed_stamp(metadata, checkpoint_key)}
        if _drained_append_only(base, last,
                                metadata.get(checkpoint_key) or ""):
            # new-keys-only drain: every after-image is live, nothing
            # can be stale or displaced — append the projection without
            # touching the base snapshot or the derived table (plain
            # INSERT; the consumed_through fence makes a crash-replayed
            # drain a no-op instead of a duplicate append)
            projected = project(latest).persist()
            try:
                n = projected.count()
                if n:
                    derived.write(projected, WriteOp.INSERT,
                                  metadata=stamp)
            finally:
                projected.unpersist()
            metadata.save_changes()
            _maybe_compact_mor(derived, max_delta_slices)
            return n
        # ONE eager snapshot read serves the live filter and the
        # gone-keys probe; a purged base (no active slices) has an
        # empty live set, not a FileNotFoundError
        base_ids = (latest.select(id_col).filter(F.lit(False))
                    if base.is_empty()
                    else base.read().select(id_col))
        live = latest.join(base_ids, id_col, "left_semi")
        projected = project(live).persist()
        try:
            n = projected.count()
            gone_keys = affected.join(base_ids, id_col, "left_anti")
            if (not derived.is_empty()) and gone_keys.limit(1).count() > 0:
                # keys dropped from the base leave the derived table by
                # a key-scoped DELETE commit (slice-pruned, cost follows
                # the gone keys) — the earlier INSERT_OVERWRITE form
                # rewrote the WHOLE derived table and refused
                # partitioned ones. The delete carries the projection
                # params but NOT the consumed_through stamp: the stamp
                # must ride only the drain's FINAL commit, or a crash
                # between the delete and the upsert would fast-forward
                # the fence past a never-folded projection.
                derived.write(
                    gone_keys.select(F.col(id_col).alias(derived_key)),
                    WriteOp.DELETE, metadata=dict(commit_meta or {}))
            if n:
                derived.write(projected, WriteOp.UPSERT,
                              metadata=stamp)
        finally:
            projected.unpersist()
    except BaseException:
        metadata.set(checkpoint_key, last)
        raise
    metadata.save_changes()
    _maybe_compact_mor(derived, max_delta_slices)
    return n

def maintain_sparse_report(base, report, metadata, cols: list[str],
                           id_col: str, report_fn, checkpoint_key: str,
                           max_commits: int | None = None,
                           max_delta_slices: int = 10) -> int:
    """Maintained pattern for SPARSE per-key reports: projections that
    OMIT non-matching rows (contamination reports — zero-overlap docs
    have no row), where ``maintain_projection``'s one-row-per-key UPSERT
    cannot express "this key's rows just disappeared".

    ``report_fn(live) -> DataFrame`` re-derives the report rows for the
    changed keys only; its output must carry ``id_col`` plus a single
    ``report_key`` column (the report TableSink's key). Stale handling:
    rows of AFFECTED keys not re-asserted by the fresh set leave by a
    key-scoped DELETE commit; an update that keeps a key's rows is a
    plain change-scale UPSERT — the delete fires only when rows must
    actually disappear. Checkpoint persists only after
    the report commit lands, so crash-replay re-derives the same rows
    (idempotent). Extracted from maintain_decontamination_report so the
    n-gram and semantic maintainers share one copy of the stale-row
    story."""
    from marmaray_spark.sinks.table import WriteOp

    # same rollback contract as maintain_projection: a raise after the
    # checkpoint advanced must restore the pre-drain value; the
    # consumed_through fence first absorbs a crash-replayed drain
    _absorb_replayed(report, metadata, checkpoint_key)
    last = metadata.get(checkpoint_key) or ""
    try:
        latest, affected = consume_latest(base, metadata, cols, id_col,
                                          checkpoint_key, max_commits)
        if latest is None:
            return 0
        stamp = _consumed_stamp(metadata, checkpoint_key)
        if _drained_append_only(base, last,
                                metadata.get(checkpoint_key) or ""):
            # new-keys-only drain: append the fresh rows, skip the
            # stale probe (a full report scan) and the live semi-join.
            # Plain INSERT: the consumed_through fence makes a
            # crash-replayed drain a no-op (the first idempotency fix
            # used DEDUP_INSERT, whose anti-join re-scanned the whole
            # report table per tick — rehearsal-measured regression)
            fresh = report_fn(latest).persist()
            try:
                n_rows = fresh.count()
                if n_rows:
                    report.write(fresh, WriteOp.INSERT, metadata=stamp)
            finally:
                fresh.unpersist()
            metadata.save_changes()
            _maybe_compact_mor(report, max_delta_slices)
            return n_rows
        # keys dropped from the base report nothing automatically: only
        # ids still present in the base snapshot are re-derived. One
        # eager snapshot read serves both consumers; a purged base has
        # an empty live set, not a FileNotFoundError
        base_ids = (latest.select(id_col).filter(F.lit(False))
                    if base.is_empty()
                    else base.read().select(id_col))
        live = latest.join(base_ids, id_col, "left_semi")
        fresh = report_fn(live).persist()
        try:
            n_rows = fresh.count()
            if report.is_empty():
                if n_rows:
                    report.write(fresh, WriteOp.INSERT, metadata=stamp)
            else:
                existing = report.read()
                # a key's rows may go stale only if the key was
                # RE-DERIVED (it's in the after-images) or DROPPED from
                # the base — ``affected`` alone over-reaches: an
                # unpartitioned upsert rewrites the whole slice, so its
                # removes manifest lists every SURVIVOR key too, and
                # treating those as affected deleted unchanged keys'
                # rows (caught by the link-edges maintainer's update
                # test, r10)
                touched = (latest.select(id_col)
                           .unionByName(affected.join(base_ids, id_col,
                                                      "left_anti"))
                           .distinct())
                stale = (existing.join(touched, id_col, "left_semi")
                         .join(fresh.select("report_key"), "report_key",
                               "left_anti"))
                if stale.limit(1).count() > 0:
                    # stale rows leave by a key-scoped DELETE commit
                    # (slice-pruned; the INSERT_OVERWRITE form rewrote
                    # the whole report and refused partitioned ones).
                    # No consumed_through stamp here — it must ride
                    # only the drain's final commit (see
                    # maintain_projection's gone-keys note).
                    report.write(stale.select("report_key"),
                                 WriteOp.DELETE)
                if n_rows:
                    report.write(fresh, WriteOp.UPSERT, metadata=stamp)
        finally:
            fresh.unpersist()
    except BaseException:
        metadata.set(checkpoint_key, last)
        raise
    metadata.save_changes()
    _maybe_compact_mor(report, max_delta_slices)
    return n_rows
