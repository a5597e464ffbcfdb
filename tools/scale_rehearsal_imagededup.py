"""Scale rehearsal: maintained IMAGE-hash index PROBE vs FULL re-dedup.

The image twin of scale_rehearsal_incdedup.py, same asymptotic claim,
plus one modality-specific term: DECODE cost. A full perceptual re-dedup
re-decodes and re-hashes the whole corpus every tick (the Arrow kernel
walks every payload); the index probe decodes the BATCH only and scans
the prebuilt (id, dhash) index pruned to the batch's pigeonhole buckets.
Both wall and total shuffle-read records come from the Spark REST API.

What is compared per ratio (same hygiene question both ways: "which
batch images are perceptual duplicates of the existing corpus?"):

- full re-dedup: image_dhash over (corpus UNION batch), banded Hamming
  pairs over the union, kept where the pair crosses corpus x batch.
  Every decode and every shuffle carries corpus+batch rows.
- index probe: image_near_dups_against_index over the prebuilt index
  parquet — batch-side decode, bucket-pruned index scan. Index build is
  one-time (amortized across every future tick), reported separately.

Images are synthesized EXECUTOR-SIDE (blocky 8x9-level BMPs keyed on the
row id — deterministic, no driver-side data): near-copies are corpus
images brightness-shifted by +4 (dHash-invariant => hamming 0), exact
copies are byte-identical re-ids, fresh images draw new grids.

Usage: python tools/scale_rehearsal_imagededup.py [n_index] [ratios...]
       (defaults: 20000 10 100)
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


def synth_images(spark, n: int, id_offset: int = 0, shift: int = 0,
                 grid_salt: int = 0):
    """Deterministic synthetic images, built in the executors: each row
    id seeds a blocky 8x9 grid of 8 well-separated gray levels (stable
    under the +4 brightness shift used for the near leg)."""
    def kernel(batches):
        import numpy as np
        import pandas as pd

        from marmaray_spark.functions.media_codec import encode_bmp

        for pdf in batches:
            payloads = []
            for rid in pdf["id"]:
                rng = np.random.default_rng(int(rid) + grid_salt)
                grid = rng.integers(0, 8, size=(8, 9)) * 30 + 8 + shift
                px = np.repeat(np.repeat(grid, 6, axis=0), 7, axis=1)
                px = px[:48, :63]
                payloads.append(encode_bmp(
                    np.repeat(px[:, :, None], 3, axis=2).astype("uint8")))
            yield pd.DataFrame({
                "media_id": (pdf["id"] + id_offset).astype("int64"),
                "payload": payloads,
            })

    return spark.range(n).mapInPandas(
        kernel, "media_id long, payload binary")


def main() -> None:
    n_index = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    ratios = [int(x) for x in sys.argv[2:]] or [10, 100]
    # autoBroadcast OFF: at toy scale the planner would happily broadcast
    # the exploded CORPUS side of the full-re-dedup join (a few MB here,
    # impossible at 100 TB), which hides the full side's true shuffle
    # shape. The probe's own F.broadcast calls are explicit and
    # batch-scale — they survive and are legitimate at any corpus size.
    spark = SparkFactory(app_name="scale_rehearsal_image",
                         conf={"spark.ui.enabled": "true",
                               "spark.ui.port": str(UI_PORT),
                               "spark.sql.autoBroadcastJoinThreshold": "-1"}
                         ).get_or_create()

    from marmaray_spark.operators.multimodal import (
        dhash_near_dup_pairs, image_dhash, image_near_dups_against_index,
        media_index_bucket_stats)

    work = ".scale_rehearsal"
    os.makedirs(work, exist_ok=True)
    corpus_path = f"{work}/media_{n_index}.parquet"
    index_path = f"{work}/media_index_{n_index}.parquet"

    if not os.path.exists(corpus_path):
        synth_images(spark, n_index).write.mode("overwrite") \
            .parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    stats_path = f"{work}/media_stats_{n_index}.parquet"
    build = None
    if not os.path.exists(index_path):
        t0 = time.time()
        image_dhash(corpus).write.mode("overwrite").parquet(index_path)
        # bucket stats maintain alongside the index (one aggregate);
        # the probe's hot-bucket guard then costs zero pruned-row
        # shuffles (media_index_bucket_stats docstring)
        media_index_bucket_stats(spark.read.parquet(index_path)) \
            .write.mode("overwrite").parquet(stats_path)
        build = round(time.time() - t0, 2)
    index_df = spark.read.parquet(index_path)
    stats_df = spark.read.parquet(stats_path)

    results: dict = {"n_index": n_index, "index_build_s": build}
    for ratio in ratios:
        n_batch = max(n_index // ratio, 10)
        n_fresh = int(n_batch * 0.6)
        n_near = int(n_batch * 0.25)
        n_exact = n_batch - n_fresh - n_near
        # fresh grids draw from a DIFFERENT seed space (grid_salt);
        # near = brightness-shifted re-ids of corpus images 0..n_near;
        # exact = byte-identical re-ids of the next n_exact corpus images
        fresh = synth_images(spark, n_fresh, id_offset=10_000_000,
                             grid_salt=77_000_000)
        near = synth_images(spark, n_near, id_offset=20_000_000, shift=4)
        exact = synth_images(spark, n_exact, id_offset=30_000_000)
        batch = fresh.unionByName(near).unionByName(exact).persist()
        nb = batch.count()
        print(f"# ratio {ratio}x: index {n_index} batch {nb}",
              file=sys.stderr)
        tag = f"ratio_{ratio}x"
        results[tag] = {"n_batch": nb}

        union = corpus.unionByName(batch)

        def full_rededup():
            hashed = image_dhash(union).filter("ok")
            pairs = dhash_near_dup_pairs(hashed, "media_id") \
                .filter((F.col("a") < 10_000_000)
                        & (F.col("b") >= 10_000_000))
            return pairs.count()

        results[tag]["full_rededup"] = measure(f"{tag} full_rededup",
                                               full_rededup)

        def probe():
            return image_near_dups_against_index(
                batch, index_df, max_bucket_width=64,
                bucket_stats=stats_df).count()

        results[tag]["index_probe"] = measure(f"{tag} index_probe", probe)

        f_ = results[tag]["full_rededup"]
        p_ = results[tag]["index_probe"]
        results[tag]["wall_ratio"] = round(
            f_["wall_s"] / max(p_["wall_s"], 0.01), 1)
        results[tag]["shuffle_ratio"] = round(
            f_["shuffle_read_rows"] / max(p_["shuffle_read_rows"], 1), 1)
        batch.unpersist()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
