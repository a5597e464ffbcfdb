"""sf1-scale rehearsal of the heavyweight declared queries (r12 verdict
item 7): sf0.1 is scheduling-floor-bound on local[32], so the low-core
scaling axis says nothing — this runs the named queries at ~10x volume
and reports per-stage skew (max/median task time) and spill from the
event log, the two pathologies that only show up with real data volume.

The ~sf1 input is a DETERMINISTIC 10x replication of sf0.1 with shifted
ids (documents: doc_id + k*10M; events: event_id + k*100M, user_id +
k*10M), built once under /tmp/sf1_rehearsal_data/. Replication keeps
the text/value distributions and ADDS realistic dedup pressure (every
document exists 10x across the id space — exact/fuzzy dedup see hot
clusters). /root/testdata stays untouched (read-only contract).

Usage: python tools/scale_rehearsal_sf1_queries.py [query,query,...]
Defaults to the four queries the verdict names. Prints a markdown
report to stdout (redirect into plans/r13/).
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marmaray_spark import queries as Q  # noqa: E402
from marmaray_spark.session import SparkFactory  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_rehearsal_data"
COPIES = 10
DEFAULT = ("fuzzy_dedup_corpus", "table_delete_readback",
           "language_report", "term_heavy_hitters")


def build_data(spark) -> None:
    from pyspark.sql import functions as F
    if os.path.exists(os.path.join(DST, "_READY")):
        return
    os.makedirs(DST, exist_ok=True)
    for table in ("documents", "events", "embeddings", "orders",
                  "customer", "lineitem", "region", "nation", "part",
                  "supplier"):
        src = f"{SRC}/{table}.parquet"
        df = spark.read.parquet(src)
        if table == "documents":
            parts = [df.withColumn("doc_id",
                                   F.col("doc_id") + F.lit(k * 10_000_000))
                     for k in range(COPIES)]
        elif table == "events":
            parts = [df.withColumn("event_id",
                                   F.col("event_id") + F.lit(k * 100_000_000))
                     .withColumn("user_id",
                                 F.col("user_id") + F.lit(k * 10_000_000))
                     for k in range(COPIES)]
        elif table == "embeddings":
            parts = [df.withColumn("vec_id",
                                   F.col("vec_id") + F.lit(k * 10_000_000))
                     for k in range(COPIES)]
        else:
            # dimension-ish tables ride along unreplicated: the four
            # rehearsal queries only read documents/events, the rest
            # exist so load() works if a query touches them
            parts = [df]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
    open(os.path.join(DST, "_READY"), "w").write("ok")


def stage_report(log_dir: str, t0_ms: int) -> list[dict]:
    """Per-stage (tasks, max/median task ms, spill MB) from the event
    log, for stages submitted after t0_ms."""
    stages: dict[tuple[int, int], dict] = {}
    for path in [p for p in glob.glob(log_dir + "/**", recursive=True)
                 if os.path.isfile(p)]:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    si = ev.get("Stage ID"), ev.get("Stage Attempt ID")
                    ti = ev.get("Task Info", {})
                    tm = ev.get("Task Metrics") or {}
                    if ti.get("Launch Time", 0) < t0_ms:
                        continue
                    s = stages.setdefault(si, {"durs": [], "spill": 0})
                    s["durs"].append(ti.get("Finish Time", 0)
                                     - ti.get("Launch Time", 0))
                    s["spill"] += (tm.get("Memory Bytes Spilled", 0)
                                   + tm.get("Disk Bytes Spilled", 0))
    out = []
    for (sid, _att), s in sorted(stages.items()):
        durs = sorted(s["durs"])
        if not durs:
            continue
        out.append({
            "stage": sid, "tasks": len(durs),
            "max_ms": durs[-1],
            "med_ms": statistics.median(durs),
            "skew": round(durs[-1] / max(statistics.median(durs), 1), 1),
            "spill_mb": round(s["spill"] / 1048576, 1)})
    return out


def main() -> None:
    names = (sys.argv[1].split(",") if len(sys.argv) > 1 else list(DEFAULT))
    log_dir = "/tmp/spark-events-sf1"
    import shutil
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir)
    spark = SparkFactory("sf1_rehearsal", {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
        "spark.eventLog.compress": "false",
    }).get_or_create()
    build_data(spark)
    registry = Q.all_queries()
    print(f"# sf1 scale rehearsal ({COPIES}x sf0.1 replication, "
          f"local[{spark.sparkContext.defaultParallelism}])\n")
    # canary for host-steal context
    t0 = time.time()
    Q.load(spark, SRC, "lineitem").groupBy("l_returnflag").count().count()
    print(f"canary (sf0.1 lineitem agg): {time.time() - t0:.2f}s\n")
    for name in names:
        spark.catalog.clearCache()
        t0 = time.time()
        t0_ms = int(t0 * 1000)
        n = registry[name](spark, DST).count()
        wall = time.time() - t0
        # event logs flush asynchronously; give the listener a beat
        time.sleep(2.0)
        rep = stage_report(log_dir, t0_ms)
        worst = sorted(rep, key=lambda r: -r["max_ms"])[:6]
        spill = sum(r["spill_mb"] for r in rep)
        skewed = [r for r in rep if r["skew"] >= 5 and r["max_ms"] > 1000]
        print(f"## {name}: wall {wall:.1f}s, {n} rows, "
              f"{len(rep)} stages, total spill {spill:.1f} MB")
        print("| stage | tasks | max ms | med ms | skew | spill MB |")
        print("|---|---|---|---|---|---|")
        for r in worst:
            print(f"| {r['stage']} | {r['tasks']} | {r['max_ms']} "
                  f"| {r['med_ms']} | {r['skew']} | {r['spill_mb']} |")
        print(f"skew pathologies (skew>=5x AND max>1s): "
              f"{[r['stage'] for r in skewed] or 'none'}\n")


if __name__ == "__main__":
    main()
