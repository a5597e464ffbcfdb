"""Scale rehearsal: LINEAR sketch maintenance vs full rebuild.

maintain_term_sketch's claim is asymptotic: folding a commit into the
sketch costs CHANGE-BATCH work (+after-image terms, -displaced-version
terms), while a rebuild re-explodes the CORPUS — so at 100 TB the
maintainer's advantage grows with the corpus:batch ratio. This tool
measures both sides — wall AND shuffle-read/write records from the
Spark REST API, the same currency as the incdedup/image rehearsals —
over a commit-logged TableSink corpus at ratios of 10x and 100x.

Per ratio the SAME question is answered both ways ("what does the term
sketch look like after this tick?"):

- maintained: commit a batch (70% new docs, 30% updates of existing
  keys) to the base table, then maintain_term_sketch folds exactly that
  commit's delta into the sketch table.
- rebuild: cms_build over every token of the post-commit corpus
  (what a sketch-less pipeline re-runs each tick).

Usage: python tools/scale_rehearsal_termsketch.py [n_corpus] [ratios...]
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

UI_PORT = 4052


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}",
                                timeout=10) as r:
        return json.load(r)


def _stage_floor() -> int:
    app_id = _api("/applications")[0]["id"]
    done = [s["stageId"] for s in
            _api(f"/applications/{app_id}/stages?status=complete")]
    return (max(done) + 1) if done else 0


def _shuffle_rows_since(floor: int) -> dict:
    app_id = _api("/applications")[0]["id"]
    rd = wr = inp = 0
    for st in _api(f"/applications/{app_id}/stages?status=complete"):
        if st["stageId"] < floor:
            continue
        rd += st.get("shuffleReadRecords", 0)
        wr += st.get("shuffleWriteRecords", 0)
        inp += st.get("inputRecords", 0)
    # NB: both legs' shuffles are map-side combined down to sketch
    # geometry x parallelism, so shuffle rows are corpus-INDEPENDENT on
    # both sides — the asymptotic separation lives in input rows
    # scanned (and wall): the rebuild re-reads the corpus every tick,
    # the maintainer reads the change batch + displaced slices
    return {"shuffle_read_rows": rd, "shuffle_write_rows": wr,
            "input_rows": inp}


def measure(name: str, fn) -> dict:
    floor = _stage_floor()
    t0 = time.time()
    res = fn()
    out = {"result": res, "wall_s": round(time.time() - t0, 2)}
    out.update(_shuffle_rows_since(floor))
    print(f"#   {name}: {json.dumps(out)}", file=sys.stderr)
    return out


def synth_docs(spark, n: int, id_offset: int = 0, vocab: int = 5000,
               doc_words: int = 60, salt: int = 0):
    """Deterministic synthetic docs (the incdedup rehearsal generator;
    ``salt`` varies update text away from the original)."""
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"),
        F.expr(f"""
          concat_ws(' ', transform(sequence(1, {doc_words}),
            i -> concat('w', pmod(xxhash64((id + {id_offset}) * 1009
                                           + i + {salt}), {vocab}))))
        """).alias("text"))


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    ratios = [int(x) for x in sys.argv[2:]] or [10, 100]
    spark = SparkFactory(app_name="scale_rehearsal_termsketch",
                         conf={"spark.ui.enabled": "true",
                               "spark.ui.port": str(UI_PORT)}).get_or_create()

    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.cms import cms_build, maintain_term_sketch
    from marmaray_spark.sinks.table import TableSink, WriteOp

    work = ".scale_rehearsal_termsketch"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    base = TableSink(spark, os.path.join(work, "base"), "doc_id")
    sketch = TableSink(spark, os.path.join(work, "sketch"), "cell_key")
    md = FileSystemMetadataManager(os.path.join(work, "md"))

    base.write(synth_docs(spark, n_corpus), WriteOp.BULK_INSERT)
    t0 = time.time()
    maintain_term_sketch(base, sketch, md)
    initial_fold = round(time.time() - t0, 2)

    results: dict = {"n_corpus": n_corpus, "initial_fold_s": initial_fold,
                     "ratios": {}}
    next_id = n_corpus
    for ratio in ratios:
        n_batch = max(n_corpus // ratio, 10)

        # tick shape 1 — APPEND (the crawl case): no removes, the
        # maintainer's input is exactly the batch
        fresh = synth_docs(spark, n_batch, id_offset=next_id)
        next_id += n_batch
        base.write(fresh, WriteOp.BULK_INSERT)
        append_tick = measure(
            f"append-maintain@1:{ratio}",
            lambda: maintain_term_sketch(base, sketch, md))

        # tick shape 2 — 70% inserts / 30% updates: copy-on-write
        # displaces every slice the updated keys touch, so input
        # follows touched slices (the honest rewrite amplification)
        fresh = synth_docs(spark, int(n_batch * 0.7), id_offset=next_id)
        next_id += int(n_batch * 0.7)
        n_upd = n_batch - int(n_batch * 0.7)
        # clamp into the original id range so the updates really are
        # updates — off-range ids would silently turn this leg into a
        # second append tick and never exercise the decrement path
        upd_offset = min((ratio % 7) * 1000, max(n_corpus - n_upd, 0))
        updates = synth_docs(spark, n_upd, id_offset=upd_offset,
                             salt=ratio)
        base.write(fresh.unionByName(updates), WriteOp.UPSERT)
        maintained = measure(
            f"upsert-maintain@1:{ratio}",
            lambda: maintain_term_sketch(base, sketch, md))

        rebuild = measure(
            f"rebuild@1:{ratio}",
            lambda: cms_build(
                base.read().select(F.explode(F.split(
                    F.trim(F.lower(F.col("text"))), r"\s+")).alias("t"))
                .filter(F.col("t") != ""), "t").count())
        results["ratios"][str(ratio)] = {
            "n_batch": n_batch, "append_tick": append_tick,
            "maintained": maintained, "rebuild": rebuild,
            "wall_speedup": round(
                rebuild["wall_s"] / max(maintained["wall_s"], 1e-9), 2),
            "input_row_ratio": round(
                rebuild["input_rows"] / max(maintained["input_rows"], 1),
                2),
        }

    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
