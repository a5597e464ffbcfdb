"""Scale rehearsal: cluster() vs interleaved-commit point-probe cost.

The claim behind the clustering table service: a table built from many
commits that each span the key space has USELESS range stats (every
slice overlaps every probe), so point lookups and dedup-insert
anti-joins scan O(commits) slices; after cluster(n_buckets) the same
probes touch one range-disjoint slice. This prices that claim: N
interleaved commits, then the same point-lookup battery before and
after clustering, wall + admitted-slice counts.

Usage: python tools/scale_rehearsal_cluster.py [n_commits] [rows_each]
       (defaults: 40 50000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.session import SparkFactory  # noqa: E402


def probe_battery(t, keys) -> dict:
    t0 = time.time()
    admitted = 0
    rows = 0
    for k in keys:
        admitted += len(t.slices_for_key_range(k, k))
        rows += t.lookup(k).count()
    return {"wall_s": round(time.time() - t0, 2),
            "slices_admitted_by_ranges": admitted, "rows": rows}


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rows_each = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = SparkFactory(app_name="scale_rehearsal_cluster").get_or_create()

    from marmaray_spark.sinks.table import TableSink, WriteOp

    work = ".scale_rehearsal_cluster"
    shutil.rmtree(work, ignore_errors=True)
    t = TableSink(spark, os.path.join(work, "t"), "k", bloom_min_bytes=0)
    n_total = n_commits * rows_each
    for c in range(n_commits):
        # commit c holds keys {c, c + n_commits, c + 2*n_commits, ...}:
        # every commit's [min, max] spans ~the whole key space
        t.write(spark.range(rows_each).select(
            (F.col("id") * n_commits + c).alias("k"),
            F.lit(f"c{c}").alias("v")), WriteOp.INSERT)

    keys = [int(n_total * f) for f in (0.1, 0.3, 0.5, 0.7, 0.9)]
    before = probe_battery(t, keys)
    t0 = time.time()
    commit = t.cluster(n_buckets=max(n_commits // 2, 4))
    cluster_wall = round(time.time() - t0, 2)
    after = probe_battery(t, keys)

    print(json.dumps({
        "n_commits": n_commits, "rows_each": rows_each,
        "before": before, "after": after,
        "cluster_wall_s": cluster_wall,
        "n_buckets": len(commit.adds),
        "probe_speedup": round(before["wall_s"] /
                               max(after["wall_s"], 1e-9), 2),
        "slice_prune_ratio": round(
            before["slices_admitted_by_ranges"]
            / max(after["slices_admitted_by_ranges"], 1), 1),
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
