"""Scale rehearsal: sitemap discovery tick at a 100+-sitemap backlog.

``sitemap_discovery_tick`` runs three ``limit(1).count()`` probes and up
to three DEDUP_INSERT commits per tick — constant plan work per tick,
correct, but the WARC-style one-level-per-tick drain means a deep
backlog pays that constant serially. This rehearsal prices the constant
at a realistic publisher shape so the cadence guidance is a measured
number, not a guess (the r10 treatment the CMS drain got):

- tick 1: ONE <sitemapindex> root referencing ``n_children`` child
  sitemaps (discovery: the index level);
- tick 2: ALL child bodies arrive at once — ``n_children`` sitemaps x
  ``urls_per`` <url> entries parse and dedup-insert as seed rows in a
  single tick (the wide-backlog case: one LEVEL is one tick however
  many sitemaps it holds, so a 200-sitemap backlog is NOT 200 ticks);
- tick 3: steady state — same bodies offered again, everything already
  consumed (the cost of a nothing-new tick in a polling loop);
- tick 4: replay — tick 2's bodies re-offered after deleting the
  parsed-set is NOT simulated here (replay idempotency is pytest
  territory); instead we re-run an idle tick to confirm idle cost is
  stable.

Same currency as the linkedges/termsketch rehearsals: wall seconds and
shuffle/input record counts from the Spark REST API.

Usage: python tools/scale_rehearsal_sitemaps.py [n_children] [urls_per]
       (defaults: 200 1000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marmaray_spark.session import SparkFactory  # noqa: E402

UI_PORT = 4055


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
    out = {"report": res, "wall_s": round(time.time() - t0, 2)}
    out.update(_rows_since(floor))
    print(f"#   {name}: {json.dumps(out)}", file=sys.stderr)
    return out


def xml_index(child_urls: list[str]) -> str:
    body = "".join(f"<sitemap><loc>{u}</loc></sitemap>"
                   for u in child_urls)
    return ('<sitemapindex xmlns='
            '"http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{body}</sitemapindex>")


def xml_urlset(child_i: int, urls_per: int) -> str:
    body = "".join(
        f"<url><loc>http://h{child_i}.com/p/{j}</loc>"
        f"<lastmod>2026-0{1 + j % 9}-01</lastmod>"
        f"<priority>0.{j % 10}</priority></url>"
        for j in range(urls_per))
    return ('<urlset xmlns='
            '"http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{body}</urlset>")


def main() -> None:
    n_children = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    urls_per = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = SparkFactory(app_name="scale_rehearsal_sitemaps",
                         conf={"spark.ui.enabled": "true",
                               "spark.ui.port": str(UI_PORT)}).get_or_create()

    from marmaray_spark.operators.web import sitemap_discovery_tick
    from marmaray_spark.sinks.table import TableSink

    work = ".scale_rehearsal_sitemaps"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    discovered = TableSink(spark, os.path.join(work, "seen"),
                           "sitemap_url")
    parsed = TableSink(spark, os.path.join(work, "parsed"), "sitemap_url")
    seeds = TableSink(spark, os.path.join(work, "seeds"), "url")

    root_url = "http://h0.com/sitemap.xml"
    child_urls = [f"http://h{i}.com/sitemap.xml"
                  for i in range(1, n_children + 1)]
    root_bodies = spark.createDataFrame(
        [(root_url, xml_index(child_urls))], "sitemap_url string, xml string")
    child_bodies = spark.createDataFrame(
        [(u, xml_urlset(i + 1, urls_per))
         for i, u in enumerate(child_urls)],
        "sitemap_url string, xml string")
    new = spark.createDataFrame([(root_url,)], "sitemap_url string")

    results = {"n_children": n_children, "urls_per": urls_per, "ticks": {}}
    results["ticks"]["t1_root_index"] = measure(
        "t1 root index", lambda: sitemap_discovery_tick(
            discovered, parsed, seeds, bodies=root_bodies,
            new_sitemaps=new))
    results["ticks"]["t2_children_level"] = measure(
        f"t2 {n_children} children x {urls_per} urls",
        lambda: sitemap_discovery_tick(discovered, parsed, seeds,
                                       bodies=child_bodies))
    results["ticks"]["t3_idle"] = measure(
        "t3 idle (all consumed)",
        lambda: sitemap_discovery_tick(discovered, parsed, seeds,
                                       bodies=child_bodies))
    results["ticks"]["t4_idle"] = measure(
        "t4 idle (stability)",
        lambda: sitemap_discovery_tick(discovered, parsed, seeds,
                                       bodies=child_bodies))

    n_seeds = seeds.read().count()
    results["seed_rows"] = n_seeds
    results["seeds_per_sec_t2"] = round(
        n_seeds / max(results["ticks"]["t2_children_level"]["wall_s"],
                      1e-9))
    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
