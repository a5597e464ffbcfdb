"""Complete example: tiered ANN retrieval over an embedding corpus.

The serving layout a 100 TB vector corpus uses, assembled from this
engine's operators:

  embeddings parquet (float, full precision)
    -> OFFLINE index build, run once:
         compress_embeddings  -> int8-packed binary tier (8x less
                                 scan/shuffle/memory than the working form)
         train_ivf_centroids  -> KMeans coarse quantizer
         save_ivf_index       -> centroids persisted through any
                                 MetadataManager (tiny, reload anywhere)
    -> ONLINE query path:
         ivf_probe_topk       -> probe nprobe cells only (recall knob;
                                 auto-switches to the Arrow matmul kernel
                                 for large quantizers)
         int8_topk            -> alternative full-scan tier on the packed
                                 corpus: coarse int8 matmul keeps
                                 k*oversample survivors, exact re-score
                                 restores full-precision order

Run:  python examples/ann_retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.metadata.manager import FileSystemMetadataManager  # noqa: E402
from marmaray_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    compress_embeddings,
    int8_topk,
    ivf_probe_topk,
    load_ivf_index,
    save_ivf_index,
    train_ivf_centroids,
)
from marmaray_spark.session import SparkFactory  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = tempfile.mkdtemp(prefix="ann_example_")
    spark = SparkFactory(app_name="ann_retrieval_pipeline").get_or_create()

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 8)
    n = corpus.count()
    print(f"corpus: {n} vectors")

    # ---- offline: build + persist the index artifacts -------------------
    c8_path = os.path.join(work, "corpus_int8.parquet")
    compress_embeddings(corpus).write.mode("overwrite").parquet(c8_path)
    centroids = train_ivf_centroids(corpus, n_centroids=16, seed=7)
    meta = FileSystemMetadataManager(os.path.join(work, "meta"))
    save_ivf_index(meta, centroids, name="example")
    meta.save_changes()
    print(f"index built: {len(centroids)} centroids, int8 tier at {c8_path}")

    # ---- online: a fresh session would start here -----------------------
    cents = load_ivf_index(meta, name="example")
    ivf = ivf_probe_topk(queries, corpus, k=5, nprobe=4, centroids=cents)
    print(f"ivf probe (nprobe=4): {ivf.count()} results")

    corpus8 = spark.read.parquet(c8_path)
    tiered = int8_topk(queries, corpus8, corpus, k=5, oversample=4)
    print(f"int8 tier + exact re-score: {tiered.count()} results")

    # recall report vs exact brute force (the operators' own QA loop)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(queries, corpus, k=5).collect()}
    for name, df in (("ivf", ivf), ("int8", tiered)):
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        print(f"recall@{5} {name}: {len(truth & got) / len(truth):.3f}")

    # ---- maintained index: serving freshness at ingest ------------------
    # The corpus becomes a commit-log table; the index table advances by
    # exactly the new commits (operators/annindex.py), and the online
    # probe reads materialized assignments — no per-query cell math.
    from marmaray_spark.operators.annindex import (ivf_probe_topk_indexed,
                                                   maintain_ann_index)
    from marmaray_spark.sinks.table import TableSink, WriteOp

    base = TableSink(spark, os.path.join(work, "vectors"), "vec_id")
    index = TableSink(spark, os.path.join(work, "index"), "vec_id")
    base.write(corpus.filter(F.col("vec_id") % 2 == 0), WriteOp.INSERT)
    print("maintained:", maintain_ann_index(base, index, meta, cents),
          "vectors indexed (initial load)")
    base.write(corpus.filter(F.col("vec_id") % 2 == 1), WriteOp.INSERT)
    print("maintained:", maintain_ann_index(base, index, meta, cents),
          "vectors indexed (incremental batch)")
    # (no save_changes here: the maintainer persists its own checkpoint
    # after the index commit — the work-unit contract)
    served = ivf_probe_topk_indexed(queries, index.read(), cents, k=5,
                                    nprobe=4)
    match = sorted(map(tuple, served.collect())) == \
        sorted(map(tuple, ivf.collect()))
    print(f"indexed probe == query-time assignment: {match}")


if __name__ == "__main__":
    main()
