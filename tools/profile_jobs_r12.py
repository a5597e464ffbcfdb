"""Per-query Spark-JOB census: run declared queries with a job group and
report wall time + how many Spark jobs each fired (guide §1 — on this
box every job pays a ~0.1-0.25s scheduling floor, so a query that is
"slow" can simply be one that runs 30 sequential driver round-trips).

Usage: python tools/profile_jobs_r12.py <query>[,<query>...] [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marmaray_spark import queries as Q  # noqa: E402
from marmaray_spark.session import SparkFactory  # noqa: E402


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = SparkFactory("profile_jobs").get_or_create()
    sc = spark.sparkContext
    registry = Q.all_queries()
    # warm the JVM + python worker pool like bench.py does
    Q.load(spark, sf_dir, "region").count()
    spark.range(sc.defaultParallelism * 4).repartition(
        sc.defaultParallelism).mapInPandas(
        lambda it: it, schema="id long").count()
    for name in names:
        times = []
        n_jobs = 0
        for rep in range(reps):
            group = f"prof-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = registry[name](spark, sf_dir)
            n = df.count()
            times.append(time.time() - t0)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
            spark.catalog.clearCache()
        print(f"{name}: rows={n} jobs={n_jobs} "
              f"cold={times[0]:.2f}s warm={min(times[1:] or times):.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
