"""Incrementally-maintained IVF index (operators/annindex.py): change-
stream maintenance, rebuild equivalence, probe parity, exactly-once."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from marmaray_spark.metadata.manager import FileSystemMetadataManager
from marmaray_spark.operators.annindex import (assign_cells,
                                               ivf_probe_topk_indexed,
                                               maintain_ann_index)
from marmaray_spark.operators.similarity import ivf_probe_topk
from marmaray_spark.sinks.table import TableSink, WriteOp


def _vecs(spark, ids, dim=8, seed=11):
    rng = np.random.default_rng(seed)
    rows = [(int(i),
             [float(x) for x in rng.normal(size=dim)]) for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _centroids(spark, dim=8):
    rng = np.random.default_rng(5)
    from marmaray_spark.operators.similarity import QUANT_SCALE
    return [[int(round(float(x) * QUANT_SCALE)) for x in rng.normal(size=dim)]
            for _ in range(4)]


def test_maintained_index_equals_full_rebuild(spark, tmp_path):
    cents = _centroids(spark)
    base = TableSink(spark, tmp_path / "base", "vec_id")
    index = TableSink(spark, tmp_path / "idx", "vec_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    base.write(_vecs(spark, range(0, 40)), WriteOp.INSERT)
    assert maintain_ann_index(base, index, md, cents) == 40

    # second batch: 20 new + 10 updated vectors (new embeddings)
    base.write(_vecs(spark, range(40, 60), seed=12), WriteOp.INSERT)
    base.write(_vecs(spark, range(0, 10), seed=13), WriteOp.UPSERT)
    assert maintain_ann_index(base, index, md, cents) == 30

    got = {(r["vec_id"], r["cell"], tuple(r["cv"]))
           for r in index.read().collect()}
    want = {(r["vec_id"], r["cell"], tuple(r["cv"]))
            for r in assign_cells(base.read(), cents).collect()}
    assert got == want and len(got) == 60

    # nothing new -> no-op
    assert maintain_ann_index(base, index, md, cents) == 0


def test_indexed_probe_matches_query_time_assignment(spark, tmp_path):
    cents = _centroids(spark)
    base = TableSink(spark, tmp_path / "base", "vec_id")
    index = TableSink(spark, tmp_path / "idx", "vec_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    base.write(_vecs(spark, range(100)), WriteOp.INSERT)
    maintain_ann_index(base, index, md, cents)

    queries = _vecs(spark, range(1000, 1008), seed=21)
    via_index = ivf_probe_topk_indexed(queries, index.read(), cents,
                                       k=5, nprobe=2)
    direct = ivf_probe_topk(queries, base.read(), k=5, nprobe=2,
                            centroids=cents)
    assert sorted(map(tuple, via_index.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_overwrite_commit_drops_stale_keys_from_index(spark, tmp_path):
    """INSERT_OVERWRITE on the base shrinks the key set; the maintained
    index must shed the dropped keys (via the commit's removes
    manifest) or the probe serves neighbors that no longer exist."""
    cents = _centroids(spark)
    base = TableSink(spark, tmp_path / "base", "vec_id")
    index = TableSink(spark, tmp_path / "idx", "vec_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    base.write(_vecs(spark, range(0, 10)), WriteOp.INSERT)
    assert maintain_ann_index(base, index, md, cents) == 10
    # replace the whole table with only ids 0..4 (5..9 dropped)
    base.write(_vecs(spark, range(0, 5), seed=19), WriteOp.INSERT_OVERWRITE)
    assert maintain_ann_index(base, index, md, cents) == 5

    got = {(r["vec_id"], r["cell"], tuple(r["cv"]))
           for r in index.read().collect()}
    want = {(r["vec_id"], r["cell"], tuple(r["cv"]))
            for r in assign_cells(base.read(), cents).collect()}
    assert got == want and len(got) == 5      # 5..9 gone, 0..4 fresh


def test_backlog_with_overwrite_does_not_resurrect_dropped_keys(spark,
                                                                tmp_path):
    """A lagging consumer drains [INSERT 0..9, OVERWRITE to 0..4] in ONE
    maintenance run: keys 5..9 appear in an after-image but are dead in
    the base — they must not be written into the index. Also covers the
    first-run-with-overwrite-history path (index starts empty)."""
    cents = _centroids(spark)
    base = TableSink(spark, tmp_path / "base", "vec_id")
    index = TableSink(spark, tmp_path / "idx", "vec_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    base.write(_vecs(spark, range(0, 10)), WriteOp.INSERT)
    base.write(_vecs(spark, range(0, 5), seed=23), WriteOp.INSERT_OVERWRITE)
    assert maintain_ann_index(base, index, md, cents) == 5

    got = {(r["vec_id"], r["cell"], tuple(r["cv"]))
           for r in index.read().collect()}
    want = {(r["vec_id"], r["cell"], tuple(r["cv"]))
            for r in assign_cells(base.read(), cents).collect()}
    assert got == want and len(got) == 5


def test_maintenance_replay_is_idempotent(spark, tmp_path):
    """Crash between index commit and checkpoint save: the next drain
    must converge to the same index. Since r10's ``_absorb_replayed``
    fence (operators/maintained.py) every derived commit stamps the
    newest base commit it folded, so the replayed drain detects the
    landed-but-unchecked commit and FAST-FORWARDS the checkpoint —
    zero rows re-projected — instead of re-upserting identical rows
    (the pre-fence behavior this test used to pin)."""
    cents = _centroids(spark)
    base = TableSink(spark, tmp_path / "base", "vec_id")
    index = TableSink(spark, tmp_path / "idx", "vec_id")
    base.write(_vecs(spark, range(25)), WriteOp.INSERT)

    md1 = FileSystemMetadataManager(str(tmp_path / "md"))
    # simulate the crash: metadata.save_changes is swallowed this run
    real_save = md1.save_changes
    md1.save_changes = lambda: None
    assert maintain_ann_index(base, index, md1, cents) == 25
    before = sorted(map(tuple, index.read().collect()))

    md2 = FileSystemMetadataManager(str(tmp_path / "md"))   # fresh reader
    assert maintain_ann_index(base, index, md2, cents) == 0  # fence absorbs
    assert sorted(map(tuple, index.read().collect())) == before
    assert maintain_ann_index(base, index, md2, cents) == 0   # now durable
    # the fence also persisted the fast-forwarded checkpoint: a THIRD
    # fresh reader starts durable too
    md3 = FileSystemMetadataManager(str(tmp_path / "md"))
    assert maintain_ann_index(base, index, md3, cents) == 0
    del real_save
