"""Scale rehearsal: copy-on-write vs merge-on-read upsert ticks.

TableSink(table_type='mor') claims batch-cost writes at the price of a
latest-wins window on reads until compact(). This tool prices BOTH
sides of the trade at a corpus:batch ratio, same currency as the other
rehearsals (wall + shuffle/input records from the Spark REST API):

- cow_tick:   UPSERT a batch into the COW table (slice-pruned rewrite —
              cost follows the slices the batch's key range overlaps)
- mor_tick:   the same batch into the MOR twin (pure delta append)
- mor_read:   full scan of the MOR table WITH uncompacted deltas (the
              read tax: one window over the scanned rows)
- compact:    fold the deltas (one table rewrite, amortized over ticks)
- read_after: the same scan after compact (tax gone)

Usage: python tools/scale_rehearsal_mor.py [n_rows] [ratio] [n_ticks]
       (defaults: 600000 100 5)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.session import SparkFactory  # noqa: E402

UI_PORT = 4054


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}",
                                timeout=10) as r:
        return json.load(r)


def _stage_floor() -> int:
    app_id = _api("/applications")[0]["id"]
    done = [s["stageId"] for s in
            _api(f"/applications/{app_id}/stages?status=complete")]
    return (max(done) + 1) if done else 0


def _rows_since(floor: int) -> dict:
    app_id = _api("/applications")[0]["id"]
    rd = wr = inp = 0
    for st in _api(f"/applications/{app_id}/stages?status=complete"):
        if st["stageId"] < floor:
            continue
        rd += st.get("shuffleReadRecords", 0)
        wr += st.get("shuffleWriteRecords", 0)
        inp += st.get("inputRecords", 0)
    return {"shuffle_read_rows": rd, "shuffle_write_rows": wr,
            "input_rows": inp}


def measure(name: str, fn) -> dict:
    floor = _stage_floor()
    t0 = time.time()
    res = fn()
    out = {"result": res, "wall_s": round(time.time() - t0, 2)}
    out.update(_rows_since(floor))
    print(f"#   {name}: {json.dumps(out)}", file=sys.stderr)
    return out


def synth(spark, n: int, offset: int = 0, salt: int = 0):
    return spark.range(n).select(
        (F.col("id") + offset).alias("k"),
        F.expr(f"concat('v', pmod(xxhash64(id + {offset} + {salt}), "
               f"1000000))").alias("v"))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    ratio = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_ticks = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    n_batch = max(n_rows // ratio, 10)
    spark = SparkFactory(app_name="scale_rehearsal_mor",
                         conf={"spark.ui.enabled": "true",
                               "spark.ui.port": str(UI_PORT)}).get_or_create()

    from marmaray_spark.sinks.table import TableSink, WriteOp

    work = ".scale_rehearsal_mor"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    cow = TableSink(spark, os.path.join(work, "cow"), "k",
                    cluster_by_key=True)
    mor = TableSink(spark, os.path.join(work, "mor"), "k",
                    cluster_by_key=True, table_type="mor")
    base = synth(spark, n_rows)
    cow.write(base, WriteOp.BULK_INSERT)
    mor.write(base, WriteOp.BULK_INSERT)

    results: dict = {"n_rows": n_rows, "ratio": ratio, "n_ticks": n_ticks,
                     "ticks": []}
    for t in range(n_ticks):
        # updates spread across the key space (the COW worst case the
        # link-edges rehearsal hit: lexical pruning can't skip slices)
        # max(..., 1): ratio=1 (full-table update) makes the span zero
        batch = synth(spark, n_batch,
                      offset=(t * 37) % max(n_rows - n_batch, 1),
                      salt=t + 1)
        cow_tick = measure(f"cow_tick_{t}",
                           lambda: cow.write(batch, WriteOp.UPSERT)
                           .counts["written"])
        mor_tick = measure(f"mor_tick_{t}",
                           lambda: mor.write(batch, WriteOp.UPSERT)
                           .counts["written"])
        results["ticks"].append({"cow": cow_tick, "mor": mor_tick})

    mor_read = measure("mor_read_with_deltas", lambda: mor.read().count())
    cow_read = measure("cow_read", lambda: cow.read().count())
    compact = measure("mor_compact",
                      lambda: mor.compact().counts["written"])
    read_after = measure("mor_read_after_compact",
                         lambda: mor.read().count())
    assert mor_read["result"] == cow_read["result"] == read_after["result"]
    cw = sum(x["cow"]["wall_s"] for x in results["ticks"])
    mw = sum(x["mor"]["wall_s"] for x in results["ticks"])
    results.update({
        "mor_read": mor_read, "cow_read": cow_read,
        "compact": compact, "read_after_compact": read_after,
        "tick_wall_cow_total": round(cw, 2),
        "tick_wall_mor_total": round(mw, 2),
        "write_speedup": round(cw / max(mw, 1e-9), 2),
        "read_tax": round(mor_read["wall_s"]
                          / max(cow_read["wall_s"], 1e-9), 2),
        # the break-even view: ticks+compact vs ticks of rewrites
        "mor_total_incl_compact": round(mw + compact["wall_s"], 2),
    })
    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
