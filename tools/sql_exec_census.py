"""SQL-execution census for ONE declared query: run it cold+warm with
the event log on, then print the warm run's SQL executions in timeline
order with their description (callsite), duration, and the driver gap
since the previous execution ended — the breakdown that says which
*actions* to merge (guide §1.2: the distributed algorithm first).

Usage: python tools/sql_exec_census.py <query> [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marmaray_spark import queries as Q  # noqa: E402
from marmaray_spark.session import SparkFactory  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    log_dir = "/tmp/spark-events-sqlcensus"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir)
    spark = SparkFactory("sql_exec_census", {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
        "spark.eventLog.compress": "false",
    }).get_or_create()
    registry = Q.all_queries()
    Q.load(spark, sf_dir, "region").count()
    registry[name](spark, sf_dir).count()  # cold
    spark.catalog.clearCache()
    t0 = time.time()
    t0_ms = int(t0 * 1000)
    registry[name](spark, sf_dir).count()  # warm, the measured pass
    wall = time.time() - t0
    spark.stop()
    time.sleep(1.0)

    execs: dict[int, dict] = {}
    for path in [p for p in glob.glob(log_dir + "/**", recursive=True)
                 if os.path.isfile(p)]:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event", "")
                if e.endswith("SQLExecutionStart"):
                    execs[ev["executionId"]] = {
                        "start": ev["time"],
                        "desc": ev.get("description", "")[:100]}
                elif e.endswith("SQLExecutionEnd"):
                    if ev["executionId"] in execs:
                        execs[ev["executionId"]]["end"] = ev["time"]

    warm = sorted((x for x in execs.values()
                   if "end" in x and x["start"] >= t0_ms),
                  key=lambda x: x["start"])
    print(f"{name}: wall={wall:.2f}s  sql-executions={len(warm)}")
    prev_end = t0_ms
    gap_sum = 0.0
    for x in warm:
        gap = (x["start"] - prev_end) / 1000.0
        dur = (x["end"] - x["start"]) / 1000.0
        gap_sum += max(gap, 0.0)
        print(f"  gap {gap:6.3f}s | exec {dur:6.3f}s | {x['desc']}")
        prev_end = max(prev_end, x["end"])
    tail = (t0_ms + wall * 1000 - prev_end) / 1000.0
    print(f"  tail after last execution: {tail:.3f}s; "
          f"gap-sum {gap_sum:.3f}s of {wall:.2f}s wall")


if __name__ == "__main__":
    main()
