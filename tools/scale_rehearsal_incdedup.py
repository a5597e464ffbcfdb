"""Scale rehearsal: maintained-dedup-index PROBE vs FULL RE-DEDUP.

NOTES (r7) honestly records that at 48k docs the index probe TIES a full
re-dedup on local wall clock because per-job floors dominate. The claim
that matters at 100 TB is the ASYMPTOTIC one: probe shuffles follow the
BATCH, full re-dedup shuffles follow the CORPUS. This tool measures both
sides — wall AND total shuffle-read records from the Spark REST API — at
index:batch ratios of 10x and 100x, so the crossover is a number, not an
argument (VERDICT r7, Next round #7).

What is compared per ratio (same hygiene question answered both ways:
"which batch docs duplicate or near-duplicate the existing corpus?"):

- full re-dedup: exact digest groupBy over (corpus UNION batch), plus the
  LSH candidate pairs + exact-Jaccard verify over the union, keeping only
  pairs touching a batch doc. Every shuffle carries corpus+batch rows.
- index probe: exact_dups_against_index + near_dups_against_index over a
  PREBUILT (digest, buckets) index parquet — the maintained state. Index
  build cost is one-time (amortized across every future tick) and is
  reported separately.

Usage: python tools/scale_rehearsal_incdedup.py [n_index] [ratios...]
       (defaults: 48000 10 100)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.session import SparkFactory  # noqa: E402

UI_PORT = 4051


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
    """Total shuffle read/write RECORDS over completed stages >= floor —
    the scale currency of the asymptotic claim."""
    app_id = _api("/applications")[0]["id"]
    rd = wr = 0
    for st in _api(f"/applications/{app_id}/stages?status=complete"):
        if st["stageId"] < floor:
            continue
        rd += st.get("shuffleReadRecords", 0)
        wr += st.get("shuffleWriteRecords", 0)
    return {"shuffle_read_rows": rd, "shuffle_write_rows": wr}


def measure(name: str, fn) -> dict:
    floor = _stage_floor()
    t0 = time.time()
    rows = fn()
    out = {"rows": rows, "wall_s": round(time.time() - t0, 2)}
    out.update(_shuffle_rows_since(floor))
    print(f"#   {name}: {json.dumps(out)}", file=sys.stderr)
    return out


def synth_docs(spark, n: int, id_offset: int = 0, vocab: int = 5000,
               doc_words: int = 60):
    """Deterministic synthetic corpus: every token chosen by xxhash64 of
    (id, position) over a closed vocabulary — no driver-side data, no
    randomness, reproducible across sessions."""
    # hash the OFFSET id: with the raw `id`, an offset batch would emit
    # byte-identical text to corpus docs 0..n-1 and silently turn the
    # "fresh" leg into exact duplicates (caught in round-8 review)
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"),
        F.expr(f"""
          concat_ws(' ', transform(sequence(1, {doc_words}),
            i -> concat('w', pmod(xxhash64((id + {id_offset}) * 1009 + i),
                                  {vocab}))))
        """).alias("text"))


def main() -> None:
    n_index = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000
    ratios = [int(x) for x in sys.argv[2:]] or [10, 100]
    spark = SparkFactory(app_name="scale_rehearsal",
                         conf={"spark.ui.enabled": "true",
                               "spark.ui.port": str(UI_PORT)}).get_or_create()

    from marmaray_spark.operators.dedup import (exact_dedup, jaccard_counts,
                                                lsh_candidate_pairs)
    from marmaray_spark.operators.incdedup import (dedup_projection,
                                                   exact_dups_against_index,
                                                   near_dups_against_index)
    from marmaray_spark.operators.text import word_shingles, words

    work = ".scale_rehearsal"
    os.makedirs(work, exist_ok=True)
    corpus_path = f"{work}/corpus_{n_index}.parquet"
    index_path = f"{work}/index_{n_index}.parquet"

    if not os.path.exists(corpus_path):
        synth_docs(spark, n_index).write.mode("overwrite") \
            .parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    # one-time index build (the maintained state; amortized per tick)
    build = None
    if not os.path.exists(index_path):
        t0 = time.time()
        dedup_projection(corpus).write.mode("overwrite").parquet(index_path)
        build = round(time.time() - t0, 2)
    index_df = spark.read.parquet(index_path)

    results: dict = {"n_index": n_index, "index_build_s": build}
    for ratio in ratios:
        n_batch = max(n_index // ratio, 10)
        # batch: 60% fresh docs, 25% near-copies of corpus docs (one
        # appended token), 15% exact copies — enough hits that the
        # verify leg does real work
        fresh = synth_docs(spark, int(n_batch * 0.6), id_offset=10_000_000)
        src = corpus.limit(int(n_batch * 0.4)).withColumn(
            "__r", F.monotonically_increasing_id())
        near = (src.filter(F.col("__r") % 8 < 5)
                .select((F.col("doc_id") + 20_000_000).alias("doc_id"),
                        F.concat("text", F.lit(" extraword")).alias("text")))
        exact = (src.filter(F.col("__r") % 8 >= 5)
                 .select((F.col("doc_id") + 30_000_000).alias("doc_id"),
                         "text"))
        batch = fresh.unionByName(near).unionByName(exact).persist()
        nb = batch.count()
        print(f"# ratio {ratio}x: index {n_index} batch {nb}",
              file=sys.stderr)
        tag = f"ratio_{ratio}x"
        results[tag] = {"n_batch": nb}

        # ---- full re-dedup over the union ------------------------------
        union = corpus.unionByName(batch)

        def full_rededup():
            ex = exact_dedup(union, "doc_id", "text") \
                .filter((F.col("dup_count") > 1)
                        & (F.col("keeper_id") < 10_000_000))
            proj = dedup_projection(union).persist()
            proj.count()
            cand = lsh_candidate_pairs(proj, "doc_id", "buckets") \
                .filter((F.col("b") >= 10_000_000)
                        & (F.col("a") < 10_000_000))
            sh = union.withColumn("__w", words("text")) \
                .select("doc_id", word_shingles("__w", 3).alias("sh"))
            inter, un = jaccard_counts(F.col("sh_a"), F.col("sh_b"))
            ver = (cand
                   .join(sh.select(F.col("doc_id").alias("a"),
                                   F.col("sh").alias("sh_a")), "a")
                   .join(sh.select(F.col("doc_id").alias("b"),
                                   F.col("sh").alias("sh_b")), "b")
                   .withColumn("inter", inter)
                   .withColumn("un", un)
                   .filter(F.expr("inter * 10000 >= 5000 * un")))
            n = ex.count() + ver.count()
            proj.unpersist()
            return n

        results[tag]["full_rededup"] = measure(f"{tag} full_rededup",
                                               full_rededup)

        # ---- index probe ----------------------------------------------
        def probe():
            e = exact_dups_against_index(batch, index_df).count()
            n = near_dups_against_index(batch, index_df, corpus,
                                        threshold_bps=5000).count()
            return e + n
        results[tag]["index_probe"] = measure(f"{tag} index_probe", probe)

        f_ = results[tag]["full_rededup"]
        p_ = results[tag]["index_probe"]
        results[tag]["wall_ratio"] = round(
            f_["wall_s"] / max(p_["wall_s"], 1e-9), 2)
        results[tag]["shuffle_ratio"] = round(
            (f_["shuffle_read_rows"] + 1)
            / (p_["shuffle_read_rows"] + 1), 2)
        batch.unpersist()

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
