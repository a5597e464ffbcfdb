"""Scale rehearsal: maintained host-edge graph vs full re-derive.

maintain_link_edges' claim is the sparse-report asymptotic: folding a
pages commit into the edge table costs CHANGE-BATCH work (re-derive
edges for changed pages, rewrite stale rows), while the per-tick
alternative re-explodes every page's link_hosts — so at 100 TB the
maintainer's advantage grows with the corpus:batch ratio. Same currency
as the termsketch/incdedup/image rehearsals: wall AND
shuffle/input-record counts from the Spark REST API.

Per ratio the SAME question is answered both ways ("what does the host
edge table look like after this tick?"):

- maintained: commit a batch (70% new pages, 30% updates whose link
  sets CHANGE — exercising the stale-edge rewrite) to the pages table,
  then maintain_link_edges folds exactly that commit's delta.
- rederive: link_host_edges over the whole post-commit corpus (what a
  maintainer-less pipeline recomputes each tick).

Usage: python tools/scale_rehearsal_linkedges.py [n_pages] [ratios...]
       (defaults: 120000 10 100)
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

UI_PORT = 4053


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


def synth_pages(spark, n: int, id_offset: int = 0, n_hosts: int = 2000,
                links_per_page: int = 8, salt: int = 0):
    """Deterministic synthetic pages: one URL per id, ``links_per_page``
    out-link hosts drawn by hash (``salt`` varies an update's link set
    away from the original, so updates exercise the stale-edge path)."""
    return spark.range(n).select(
        F.expr(f"concat('http://h', pmod(id + {id_offset}, {n_hosts}), "
               f"'.com/p/', id + {id_offset})").alias("target_uri"),
        F.expr(f"""
          array_distinct(transform(sequence(1, {links_per_page}),
            i -> concat('h', pmod(xxhash64((id + {id_offset}) * 1009
                                           + i + {salt}), {n_hosts}),
                        '.com')))
        """).alias("link_hosts"))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    ratios = [int(x) for x in sys.argv[2:]] or [10, 100]
    spark = SparkFactory(app_name="scale_rehearsal_linkedges",
                         conf={"spark.ui.enabled": "true",
                               "spark.ui.port": str(UI_PORT)}).get_or_create()

    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.web import (link_host_edges,
                                              maintain_link_edges)
    from marmaray_spark.sinks.table import TableSink, WriteOp

    work = ".scale_rehearsal_linkedges"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    pages = TableSink(spark, os.path.join(work, "pages"), "target_uri")
    edges = TableSink(spark, os.path.join(work, "edges"), "report_key")
    md = FileSystemMetadataManager(os.path.join(work, "md"))

    pages.write(synth_pages(spark, n_pages), WriteOp.BULK_INSERT)
    t0 = time.time()
    maintain_link_edges(pages, edges, md, "target_uri")
    initial_fold = round(time.time() - t0, 2)

    results: dict = {"n_pages": n_pages, "initial_fold_s": initial_fold,
                     "ratios": {}}
    next_id = n_pages
    for ratio in ratios:
        n_batch = max(n_pages // ratio, 10)

        # tick shape 1 — APPEND (the crawl case): new pages only,
        # landed the way the crawl tick lands them (DEDUP_INSERT) —
        # the commit op is what licenses the maintainer's append-only
        # fast path (new-keys-guaranteed, so no stale probe, no merge)
        fresh = synth_pages(spark, n_batch, id_offset=next_id)
        next_id += n_batch
        pages.write(fresh, WriteOp.DEDUP_INSERT)
        append_tick = measure(
            f"append-maintain@1:{ratio}",
            lambda: maintain_link_edges(pages, edges, md, "target_uri"))

        # tick shape 2 — 70% new / 30% updated pages whose link sets
        # change (salt): the stale-edge rewrite path, priced honestly
        fresh = synth_pages(spark, int(n_batch * 0.7), id_offset=next_id)
        next_id += int(n_batch * 0.7)
        n_upd = n_batch - int(n_batch * 0.7)
        upd_offset = min((ratio % 7) * 1000, max(n_pages - n_upd, 0))
        updates = synth_pages(spark, n_upd, id_offset=upd_offset,
                              salt=ratio)
        pages.write(fresh.unionByName(updates), WriteOp.UPSERT)
        maintained = measure(
            f"upsert-maintain@1:{ratio}",
            lambda: maintain_link_edges(pages, edges, md, "target_uri"))

        rederive = measure(
            f"rederive@1:{ratio}",
            lambda: link_host_edges(pages.read(), "target_uri").count())
        # NB: the rederive leg only COUNTS the edges — a real pipeline
        # would also land them somewhere, so its numbers are a FLOOR.
        # Two honest stories: the append (dedup-insert) tick is
        # change-scale via the maintainers' new-keys fast path; the
        # update tick pays the copy-on-write stale-rewrite — O(table)
        # write amplification that amortizes via max_commits batching,
        # the documented COW-vs-MOR trade.
        results["ratios"][str(ratio)] = {
            "n_batch": n_batch, "append_tick": append_tick,
            "maintained": maintained, "rederive": rederive,
            "append_input_ratio": round(
                rederive["input_rows"] / max(append_tick["input_rows"], 1),
                2),
            "append_wall_speedup": round(
                rederive["wall_s"] / max(append_tick["wall_s"], 1e-9), 2),
            "update_wall_speedup": round(
                rederive["wall_s"] / max(maintained["wall_s"], 1e-9), 2),
            "update_input_ratio": round(
                rederive["input_rows"] / max(maintained["input_rows"], 1),
                2),
        }

    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
