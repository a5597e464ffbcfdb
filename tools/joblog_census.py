"""Event-log job census for ONE declared query: run it twice (cold+warm)
with the Spark event log on, then print every job of the warm run with
its description and wall duration — the per-job breakdown behind the
job-count numbers in OPTIMIZATION_r12.md.

Usage: python tools/joblog_census.py <query> [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marmaray_spark import queries as Q  # noqa: E402
from marmaray_spark.session import SparkFactory  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    log_dir = "/tmp/spark-events-census"
    os.makedirs(log_dir, exist_ok=True)
    import shutil
    shutil.rmtree(log_dir)
    os.makedirs(log_dir)
    spark = SparkFactory("joblog_census", {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
        "spark.eventLog.compress": "false",
    }).get_or_create()
    sc = spark.sparkContext
    registry = Q.all_queries()
    Q.load(spark, sf_dir, "region").count()
    registry[name](spark, sf_dir).count()  # cold
    spark.catalog.clearCache()
    sc.setJobGroup("census", name)
    t0 = time.time()
    registry[name](spark, sf_dir).count()  # warm, the measured pass
    wall = time.time() - t0
    sc.setJobGroup(None, None)
    group_ids = set(sc.statusTracker().getJobIdsForGroup("census"))
    spark.stop()
    time.sleep(1.0)

    starts, ends = {}, {}
    for path in [p for p in glob.glob(log_dir + "/**", recursive=True)
                 if os.path.isfile(p)]:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    starts[ev["Job ID"]] = (
                        ev["Submission Time"],
                        ev.get("Properties", {})
                        .get("spark.job.description", ""))
                elif ev.get("Event") == "SparkListenerJobEnd":
                    ends[ev["Job ID"]] = ev["Completion Time"]
    rows = []
    for jid, (t, desc) in starts.items():
        if jid in group_ids and jid in ends:
            rows.append((ends[jid] - t, jid, desc))
    rows.sort(key=lambda r: -r[0])
    print(f"{name}: wall={wall:.2f}s jobs={len(rows)} "
          f"job-time-sum={sum(r[0] for r in rows)/1000:.2f}s")
    for ms, jid, desc in rows:
        print(f"  {ms/1000:6.3f}s  job {jid:4d}  {desc[:110]}")


if __name__ == "__main__":
    main()
