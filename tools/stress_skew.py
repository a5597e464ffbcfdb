"""Skew stress: run the bucketed dedup/ANN operators on the adversarial
.skewdata tables and MEASURE per-stage task skew (max vs median task
time) through Spark's REST status API.

Converts the "argued scale-safe" plans into measured ones (VERDICT round
2 item 3): boilerplate-heavy corpora make one LSH / SimHash / SRP bucket
hot; the numbers here show (a) how bad the uncapped quadratic blowup is
and (b) that the ``max_bucket_width`` star fallback bounds it.

Usage: python tools/stress_skew.py [skew_dir]     (prints one JSON line)
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

UI_PORT = 4050


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}",
                                timeout=10) as r:
        return json.load(r)


def stage_skew(stage_floor: int) -> dict:
    """Max/median task duration over every stage since ``stage_floor``;
    returns the worst stage plus the count of stages with >10x skew."""
    apps = _api("/applications")
    app_id = apps[0]["id"]
    worst = {"skew": 0.0}
    over10 = 0
    for st in _api(f"/applications/{app_id}/stages?status=complete"):
        if st["stageId"] < stage_floor or st["numCompleteTasks"] < 2:
            continue
        try:
            q = _api(f"/applications/{app_id}/stages/{st['stageId']}"
                     f"/{st['attemptId']}/taskSummary?quantiles=0.5,1.0")
        except Exception:
            continue
        med, mx = q["executorRunTime"]
        skew = (mx / med) if med > 0 else float(mx > 0)
        if med >= 50 and skew > 10:     # ignore sub-50ms noise stages
            over10 += 1
        if skew > worst["skew"] and med >= 50:
            worst = {"skew": round(skew, 1), "stage": st["stageId"],
                     "name": st["name"].split("\n")[0][:60],
                     "median_ms": med, "max_ms": mx,
                     "tasks": st["numCompleteTasks"]}
    return {"worst_stage": worst, "stages_over_10x": over10}


def run(name: str, fn, spark) -> dict:
    floor = max([s.stageId for s in
                 spark.sparkContext.statusTracker().getActiveStageIds()] or [0])
    # floor from the REST side instead: remember current completed count
    apps = _api("/applications")
    app_id = apps[0]["id"]
    done = [s["stageId"] for s in
            _api(f"/applications/{app_id}/stages?status=complete")]
    floor = (max(done) + 1) if done else 0
    t0 = time.time()
    n = fn()
    wall = round(time.time() - t0, 2)
    out = {"rows": n, "wall_s": wall}
    out.update(stage_skew(floor))
    print(f"# {name}: {json.dumps(out)}", file=sys.stderr)
    return out


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else ".skewdata"
    spark = SparkFactory(app_name="stress_skew",
                         conf={"spark.ui.enabled": "true",
                               "spark.ui.port": str(UI_PORT)}).get_or_create()
    from marmaray_spark.operators.batching import batched_by_size
    from marmaray_spark.operators.dedup import (lsh_band_buckets,
                                                lsh_candidate_pairs,
                                                minhash_digests,
                                                minhash_signature,
                                                simhash16,
                                                simhash_banded_near_dup)
    from marmaray_spark.operators.similarity import srp_banded_near_dup_pairs
    from marmaray_spark.operators.text import word_shingles, words

    docs = (spark.read.parquet(f"{skew_dir}/documents.parquet")
            .withColumn("w", words("text"))
            .withColumn("sh", word_shingles("w", 3)))
    banded = (docs.withColumn("hh", minhash_digests("sh"))
              .withColumn("sig", minhash_signature("hh", 16))
              .withColumn("buckets", lsh_band_buckets("sig", 8, 2)))
    sims = docs.select("doc_id", simhash16("w").alias("simhash"))
    emb = spark.read.parquet(f"{skew_dir}/embeddings.parquet")
    events = spark.read.parquet(f"{skew_dir}/events.parquet")

    results = {}
    results["lsh_capped_w64"] = run(
        "lsh_capped_w64",
        lambda: lsh_candidate_pairs(banded, "doc_id", "buckets",
                                    max_bucket_width=64).count(), spark)
    # uncapped on a 20% slice only: the full hot bucket is ~36k docs ->
    # ~6.5e8 candidate pairs, which is exactly the blowup the cap exists
    # to prevent; the slice still carries a ~7k-wide hot bucket
    banded_slice = banded.filter(F.col("doc_id") % 5 == 0)
    results["lsh_uncapped_20pct"] = run(
        "lsh_uncapped_20pct",
        lambda: lsh_candidate_pairs(banded_slice, "doc_id", "buckets").count(),
        spark)
    results["simhash_capped_w64"] = run(
        "simhash_capped_w64",
        lambda: simhash_banded_near_dup(sims, "doc_id", "simhash",
                                        max_bucket_width=64).count(), spark)
    results["embedding_near_dup_capped_w64"] = run(
        "embedding_near_dup_capped_w64",
        lambda: srp_banded_near_dup_pairs(emb, threshold_milli=400000,
                                          max_bucket_width=64).count(),
        spark)
    results["batched_hot_user"] = run(
        "batched_hot_user",
        lambda: batched_by_size(events.select("user_id", "event_id"),
                                ["user_id", "event_id"], 1000)
        .groupBy().agg(F.max("batch_id")).count(), spark)

    # AQE skew-join split: a sort-merge join keyed on the hot user
    # (one user_id owns ~65% of the 6M events -> one ~3.9M-row shuffle
    # partition) is the straggler pattern salting fixes for AGGS
    # (skew_salted_agg); for JOINS the engine answer is AQE's
    # OptimizeSkewedJoin, which splits the hot partition into
    # advisory-sized reads and replicates the matching dim partition.
    # Two contract details this case pins down:
    # - the dim side must be a plain scan->shuffle->sort child; an
    #   aggregate between (e.g. joining .distinct() output directly)
    #   breaks the SMJ(Sort(Shuffle), Sort(Shuffle)) pattern and the
    #   optimizer silently declines — materialize dims first.
    # - at 100 TB the default 256 MB threshold trips on its own; the
    #   local slice is ~60 MB so the thresholds scale down
    #   proportionally here (a knob, not a code path).
    # Measured split-off vs split-on (that order, so warm inputs favor
    # the OFF case) on identical plans; the final plan must carry the
    # 'skewed' AQEShuffleRead marker when on.
    dim_path = os.path.join(skew_dir, "user_dim.parquet")
    if not os.path.exists(dim_path):
        (events.select("user_id").distinct()
         .withColumn("seg", F.expr("cast(user_id % 97 as int)"))
         .write.parquet(dim_path))
    dim = spark.read.parquet(dim_path)

    def skew_join(split: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                       "true" if split else "false")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        try:
            j = (events.select("user_id", "value")
                 .join(dim.hint("merge"), "user_id")
                 .groupBy("seg").agg(F.sum("value").alias("v")))
            n = len(j.collect())
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert ("and skewed" in plan) == split, \
                f"AQE skew marker expected={split} in final plan"
            return n
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            spark.conf.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
            spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    results["smj_hot_key_no_split"] = run(
        "smj_hot_key_no_split", lambda: skew_join(False), spark)
    results["smj_hot_key_aqe_split"] = run(
        "smj_hot_key_aqe_split", lambda: skew_join(True), spark)

    # shuffle-shard + temperature mix on the 6M-row events under the hot
    # user: both key on md5 of the row id, so value skew cannot make a
    # bucket hot — the stage-skew numbers prove the claim
    from marmaray_spark.operators.shard import shard_assignments
    from marmaray_spark.operators.text import temperature_mix

    ev_docs = (events.select(F.col("event_id").alias("id"), "user_id")
               .withColumn("n_tok",
                           (F.lit(50) + F.pmod("id", F.lit(100))).cast("int")))
    results["shuffle_shard_6m"] = run(
        "shuffle_shard_6m",
        lambda: shard_assignments(ev_docs, "id", "n_tok",
                                  budget_tokens=1_000_000)
        .groupBy().agg(F.countDistinct("shard")).count(), spark)
    # group = user_id: one group holds ~65% of rows; the rate table stays
    # group-count-scale and the corpus-side filter is shuffle-free
    results["temperature_mix_hot_group"] = run(
        "temperature_mix_hot_group",
        lambda: temperature_mix(ev_docs, "id", "user_id",
                                keep_bps=2000).count(), spark)

    # exact-substring span removal on the boilerplate-heavy corpus: the
    # 30% verbatim copies make ONE window text carry ~30% of all window
    # rows, so the wins<->counts join has a single mega-hot key. The
    # count agg itself is safe (map-side combine); the join relies on
    # AQE's skew split — the duplicated-counts side has ONE row per
    # window, which OptimizeSkewedJoin replicates across the split
    # reads. Run on a 20% slice (the full corpus's hot window is fine
    # for the join but the per-doc start lists of 36k identical docs
    # make the collect_list agg memory-heavy locally).
    from marmaray_spark.operators.dedup import remove_duplicate_spans
    docs_slice = docs.filter(F.col("doc_id") % 5 == 0)
    # collect the SUM, not .count() of the agg frame: count() prunes the
    # sum column, the left join to the starts table prunes with it
    # (unique-key left joins are removable), and the whole operator
    # optimizes away — measured 0.29s "wall" for what is really ~9s
    results["span_removal_boilerplate_20pct"] = run(
        "span_removal_boilerplate_20pct",
        lambda: int(remove_duplicate_spans(docs_slice, "doc_id", "w",
                                           window=3, hash_exchange=True)
                    .agg(F.sum("kept_tokens")).collect()[0][0]), spark)

    # PQ tier on the 40%-one-repeated-vector embeddings: encode is a
    # pure projection (skew-free by construction); the ADC rank shuffle
    # sees 40% identical scores for each query — ties all land one
    # (query_id, dot) region but _local_topk prefilters per Arrow batch
    # so the rank exchange stays batches x Q x k*oversample
    from marmaray_spark.operators.pq import (deterministic_pq_codebooks,
                                             pq_adc_topk, pq_encode)
    cbs = deterministic_pq_codebooks(emb, m=4, k=8)
    codes = pq_encode(emb, cbs).persist()
    codes.count()
    queries = emb.filter(F.col("vec_id") < 8)
    results["pq_adc_topk_repeated_vectors"] = run(
        "pq_adc_topk_repeated_vectors",
        lambda: pq_adc_topk(queries, codes, emb, k=10, codebooks=cbs).count(),
        spark)
    codes.unpersist()

    # incremental near-dup probe where the INDEX has a hot bucket (the
    # boilerplate docs all share band buckets): a boilerplate batch doc
    # candidates against the whole hot bucket — O(N_batch x W), linear
    # in the bucket width, never W^2 (the batch never self-joins here),
    # but W here is ~2.9k and verification pays per candidate: measured
    # 1.3M pairs / 173s uncapped vs the capped probe below — the cap is
    # the difference between "bounded" and "fast enough"
    from marmaray_spark.operators.incdedup import (dedup_projection,
                                                   near_dups_against_index)
    corpus_docs = docs.select("doc_id", "text").filter(F.col("doc_id") % 5 == 0)
    index_df = dedup_projection(corpus_docs).persist()
    index_df.count()
    batch = (corpus_docs.filter(F.col("doc_id") % 50 == 0)
             .withColumn("doc_id", F.col("doc_id") + 10_000_000))
    results["incdedup_probe_hot_bucket_cap8"] = run(
        "incdedup_probe_hot_bucket_cap8",
        lambda: near_dups_against_index(batch, index_df, corpus_docs,
                                        threshold_bps=8000,
                                        max_candidates_per_doc=8).count(),
        spark)
    index_df.unpersist()

    # paragraph dedup where ONE paragraph digest carries ~30% of all
    # occurrences (the boilerplate docs' line grid repeats corpus-wide):
    # the occurrence join's hot key is the case AQE's skew split handles
    # (both children plain scan->shuffle); reassembly groups by doc —
    # uniform by construction
    from marmaray_spark.operators.dedup import remove_duplicate_paragraphs
    lined = docs_slice.withColumn("lines", F.expr(
        "transform(sequence(0, cast(ceil(size(w) / 8.0) as int) - 1), "
        "i -> concat_ws(' ', slice(w, i*8+1, 8)))"))
    results["paragraph_dedup_boilerplate_20pct"] = run(
        "paragraph_dedup_boilerplate_20pct",
        lambda: int(remove_duplicate_paragraphs(lined, "doc_id", "lines")
                    .agg(F.sum("kept_paras")).collect()[0][0]), spark)

    print(json.dumps({"sf": "skew-sf1", **{k: {kk: vv for kk, vv in v.items()}
                                           for k, v in results.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
