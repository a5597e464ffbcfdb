"""table_changes Python DataSource (sources/table_stream.py): the
Structured Streaming / incremental-batch tail of a TableSink commit
log — Hudi streaming-read parity, Spark-4-native.

Reference seam: the Hudi streaming source the reference's consumers
would use to tail a HoodieSink table (HoodieSink.java commit timeline);
after-image semantics mirror sinks/table.py read_changes."""

import pytest

from marmaray_spark.sinks.table import TableSink, WriteOp
from marmaray_spark.sources.table_stream import TableChangesDataSource

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(TableChangesDataSource)
    return spark


def _mk_table(spark, path):
    t = TableSink(spark, path, "k")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
            WriteOp.INSERT)                                # commit 0
    t.write(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]),
            WriteOp.UPSERT)                                # commit 1
    return t


def test_batch_window_matches_read_changes(registered, spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t")
    df = (spark.read.format("table_changes")
          .option("path", str(tmp_path / "t")).load())
    got = {(r["k"], r["v"], r["_change_commit"]) for r in df.collect()}
    # commit 0 introduced (1,a) and (2,b); commit 1 introduced (2,B)
    # and (3,c); the upsert's rewritten survivor (1,a) keeps its
    # ORIGINAL stamp so it appears once, under commit 0
    assert got == {(1, "a", "000000000000"), (2, "b", "000000000000"),
                   (2, "B", "000000000001"), (3, "c", "000000000001")}
    # a start_commit window pulls only the later commit
    df2 = (spark.read.format("table_changes")
           .option("path", str(tmp_path / "t"))
           .option("start_commit", "000000000000").load())
    assert {(r["k"], r["v"]) for r in df2.collect()} == {(2, "B"),
                                                         (3, "c")}


def test_compact_and_restore_emit_nothing(registered, spark, tmp_path):
    """Storage-maintenance commits rewrite rows under their ORIGINAL
    stamps, so the tail never re-emits them (the read_changes stamp
    contract)."""
    t = TableSink(spark, tmp_path / "t", "k", table_type="mor")
    t.write(spark.createDataFrame([(1, "a")], ["k", "v"]), WriteOp.INSERT)
    t.write(spark.createDataFrame([(1, "A")], ["k", "v"]), WriteOp.UPSERT)
    last = t.log.commits()[-1].commit_id
    t.compact()
    t.cluster(n_buckets=2)   # clustering is stamp-preserving too
    df = (spark.read.format("table_changes")
          .option("path", str(tmp_path / "t"))
          .option("start_commit", last).load())
    assert df.count() == 0


def test_streaming_tail_is_exactly_once_across_restarts(
        registered, spark, tmp_path):
    """availableNow drains the backlog into a fault-tolerant sink; a
    restart with the same checkpoint emits ONLY commits that landed in
    between (offsets ride the query checkpoint — the memory sink can't
    recover a checkpoint, so the drain lands in parquet)."""
    t = _mk_table(spark, tmp_path / "t")
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain():
        q = (spark.readStream.format("table_changes")
             .option("path", str(tmp_path / "t")).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["k"], r["v"], r["_change_commit"])
                for r in spark.read.parquet(out).collect()}

    first = drain()
    assert first == {(1, "a", "000000000000"), (2, "b", "000000000000"),
                     (2, "B", "000000000001"), (3, "c", "000000000001")}
    # nothing new: the restarted query adds NOTHING to the sink
    assert drain() == first
    # two more commits land while the stream is down; the next restart
    # emits exactly those (no re-emission of the first four)
    t.write(spark.createDataFrame([(4, "d")], ["k", "v"]),
            WriteOp.DEDUP_INSERT)
    t.write(spark.createDataFrame([(4, "D")], ["k", "v"]), WriteOp.UPSERT)
    got = drain()
    assert got - first == {(4, "d", "000000000002"),
                           (4, "D", "000000000003")}
    assert len(got) == 6


def test_schema_evolution_projects_old_files(registered, spark, tmp_path):
    """A stream declared AFTER a column was added projects pre-evolution
    commits onto the evolved schema (missing column null)."""
    t = TableSink(spark, tmp_path / "t", "k")
    t.write(spark.createDataFrame([(1, "a")], ["k", "v"]), WriteOp.INSERT)
    t.write(spark.createDataFrame([(2, "b", 7)], ["k", "v", "extra"]),
            WriteOp.INSERT)
    df = (spark.read.format("table_changes")
          .option("path", str(tmp_path / "t")).load())
    got = {(r["k"], r["v"], r["extra"]) for r in df.collect()}
    assert got == {(1, "a", None), (2, "b", 7)}


def test_table_to_table_incremental_etl(registered, spark, tmp_path):
    """The managed-table streaming loop end-to-end (the Hudi
    incremental-ETL story): tail table A with format('table_changes'),
    transform, land exactly-once into managed table B via
    foreach_batch_table_sink — then new commits on A flow through a
    restarted pipeline without re-emitting old rows into B."""
    from marmaray_spark.streaming.incremental import (
        foreach_batch_table_sink, run_available_now)

    a = _mk_table(spark, tmp_path / "a")
    ck = str(tmp_path / "ck")

    def pump():
        tail = (spark.readStream.format("table_changes")
                .option("path", str(tmp_path / "a")).load())
        # precombine on the source commit: a backlog drain delivers
        # SEVERAL versions of one key in its first microbatch, and
        # upsert's unique-per-key contract needs the newest to win
        writer = foreach_batch_table_sink(
            tail, str(tmp_path / "b"), "k", None, "upsert", ck,
            transform=lambda df: df.selectExpr(
                "k", "upper(v) AS v", "_change_commit AS src_commit"),
            precombine_field="src_commit")
        run_available_now(writer)

    pump()
    b = TableSink(spark, tmp_path / "b", "k")
    got = {(r["k"], r["v"], r["src_commit"])
           for r in b.read().collect()}
    # upsert on k: the latest after-image per key wins in B
    assert got == {(1, "A", "000000000000"), (2, "B", "000000000001"),
                   (3, "C", "000000000001")}
    n_commits = len(b.log.commits())
    # restart with nothing new: B must not gain commits (empty batches
    # may no-op or land zero rows; either way the DATA is unchanged)
    pump()
    assert {(r["k"], r["v"]) for r in b.read().collect()} == \
        {(1, "A"), (2, "B"), (3, "C")}
    # a new commit on A flows through, old rows are not re-emitted
    a.write(spark.createDataFrame([(1, "zz")], ["k", "v"]),
            WriteOp.UPSERT)
    pump()
    got = {(r["k"], r["v"], r["src_commit"]) for r in b.read().collect()}
    assert got == {(1, "ZZ", "000000000002"), (2, "B", "000000000001"),
                   (3, "C", "000000000001")}
    del n_commits


def test_deletes_invisible_in_after_image_mode(registered, spark,
                                               tmp_path):
    """Plain mode keeps its after-image contract across BOTH delete
    forms: a COW delete re-stamps nothing, and a MOR tombstone delta —
    whose marker rows ARE stamped with the delete commit — must not
    surface as phantom records."""
    for ttype in ("cow", "mor"):
        p = tmp_path / ttype
        t = TableSink(spark, p, "k", table_type=ttype)
        t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
                WriteOp.INSERT)
        t.write(spark.createDataFrame([(1,)], ["k"]), WriteOp.DELETE)
        df = (spark.read.format("table_changes")
              .option("path", str(p)).load())
        got = {(r["k"], r["v"]) for r in df.collect()}
        assert got == {(1, "a"), (2, "b")}, ttype   # no phantom rows
        assert "_change_op" not in df.columns


def test_change_feed_emits_delete_keys(registered, spark, tmp_path):
    """option('change_feed', 'true'): the batch window (and stream — one
    schema path) tags rows 'upsert'/'delete'; delete rows carry the
    record key from the tombstone manifest, other columns null, under
    the delete commit's id."""
    t = TableSink(spark, tmp_path / "t", "k")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
            WriteOp.INSERT)                                 # commit 0
    t.write(spark.createDataFrame([(1,), (9,)], ["k"]),
            WriteOp.DELETE)                                 # commit 1
    t.write(spark.createDataFrame([(3, "c")], ["k", "v"]),
            WriteOp.UPSERT)                                 # commit 2
    df = (spark.read.format("table_changes")
          .option("path", str(tmp_path / "t"))
          .option("change_feed", "true").load())
    got = {(r["k"], r["v"], r["_change_commit"], r["_change_op"])
           for r in df.collect()}
    assert got == {
        (1, "a", "000000000000", "upsert"),
        (2, "b", "000000000000", "upsert"),
        (1, None, "000000000001", "delete"),    # key 9 never existed:
        (3, "c", "000000000002", "upsert"),     # no delete event for it
    }


def test_change_feed_streaming_tail_includes_deletes(registered, spark,
                                                     tmp_path):
    """The streaming form of the change feed: a downstream mirror table
    applies upserts AND deletes from the feed and converges to the
    source snapshot."""
    src = TableSink(spark, tmp_path / "src", "k")
    src.write(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                    ["k", "v"]), WriteOp.INSERT)
    src.write(spark.createDataFrame([(2,)], ["k"]), WriteOp.DELETE)
    src.write(spark.createDataFrame([(4, "d"), (1, "A")], ["k", "v"]),
              WriteOp.UPSERT)

    mirror = TableSink(spark, tmp_path / "mirror", "k")

    def apply_batch(batch_df, _epoch):
        ups = batch_df.filter("_change_op = 'upsert'") \
            .select("k", "v").orderBy("_change_commit")
        dels = batch_df.filter("_change_op = 'delete'").select("k")
        # per-key newest version within the microbatch wins
        if ups.count():
            mirror.write(ups, WriteOp.UPSERT)
        if dels.count():
            mirror.write(dels, WriteOp.DELETE)

    q = (spark.readStream.format("table_changes")
         .option("path", str(tmp_path / "src"))
         .option("change_feed", "true").load()
         .writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # NB: one availableNow run may fold all three commits into one
    # microbatch; the delete key (2) was inserted in commit 0 and
    # deleted in commit 1 — applying upserts-then-deletes inside the
    # batch gets the ordering right for this history shape
    got = {r["k"]: r["v"] for r in mirror.read().collect()}
    assert got == {1: "A", 3: "c", 4: "d"}
