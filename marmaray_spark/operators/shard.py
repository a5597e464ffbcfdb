"""Deterministic global shuffle + token-budget sharding — the training-
output writer of an LLM data pipeline. After cleaning/dedup/mixing, the
corpus must be (a) globally shuffled so every training shard is an i.i.d.
slice (public recipe in GPT-NeoX/Megatron/T5 data tooling: shuffle once at
preparation time, stream shards sequentially at training time), and
(b) cut into shards of a fixed TOKEN budget so data-parallel ranks get
even work. The reference (uber/marmaray) has no such surface; this
belongs to the beyond-reference LLM-data-pipeline tier.

Scale design (the 100 TB story):

- The shuffle key is ``md5(salt:id)`` — deterministic across engines,
  retries and partitionings (the same rationale as
  operators/text.deterministic_sample; ``rand()`` is none of those).
- A GLOBAL ordered prefix-sum would be a single-partition window — the
  classic scale-killer. Instead: the hex prefix of the key buckets rows
  into ``16**hex_chars`` uniform ranges (md5 is uniform), the running
  token count is a per-BUCKET window (parallel, spillable), and bucket
  offsets come from one tiny per-bucket total + an ordered window over
  ≤4096 rows — the textbook two-pass distributed prefix sum. One corpus
  shuffle total (the bucket exchange); everything else is map-side or
  driver-scale.
- Shard id = ``floor(global_token_start / budget)``: every shard holds
  ≈``budget`` tokens (boundary documents spill into the next shard —
  documents are never split; sequence_packing handles intra-shard
  packing). Within a shard, rows stay in key order, so a shard's file is
  byte-deterministic no matter how the job was partitioned.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _clean_shard_dir(data_dir: str, suffix: str) -> None:
    """Remove this container's shard files (and torn ``.inprogress`` temps)
    before a re-run writes fewer shards than the last one.

    The tar/tfrecord writers emit one file per shard via applyInPandas —
    there is no Spark ``overwrite`` mode to lean on like the parquet
    writer has, so without this sweep a re-run that produces FEWER shards
    leaves stale ``shard-NNNNNN.*`` files behind and the glob-based
    readers would silently ingest samples that contradict the fresh
    manifest. Suffix-scoped so tar and tfrecord outputs can coexist under
    one root (their manifests already do)."""
    import glob as _glob
    for pat in (f"shard-*.{suffix}", f".shard-*.{suffix}.inprogress"):
        for p in _glob.glob(os.path.join(data_dir, pat)):
            os.remove(p)


def shard_assignments(df: DataFrame, id_col: str, tokens_col: str,
                      budget_tokens: int, salt: str = "s0",
                      hex_chars: int = 2) -> DataFrame:
    """Attach the deterministic shuffle key and token-budget shard id.

    Returns the input columns plus ``sort_key`` (md5 hex), ``bucket``
    (its ``hex_chars``-char prefix), ``start_tokens`` (global tokens
    before this document in shuffle order) and ``shard`` (bigint).
    Exactly one corpus shuffle (the per-bucket window exchange)."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    keyed = df.withColumn("sort_key", key) \
              .withColumn("bucket", F.substring("sort_key", 1, hex_chars))
    wb = (W.partitionBy("bucket").orderBy("sort_key", id_col)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = keyed.withColumn(
        "_cum", F.sum(F.col(tokens_col).cast("long")).over(wb))
    totals = (keyed.groupBy("bucket")
              .agg(F.sum(F.col(tokens_col).cast("long")).alias("_tot")))
    wo = (W.orderBy("bucket")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    offsets = (totals
               .withColumn("_off", F.sum("_tot").over(wo) - F.col("_tot"))
               .select("bucket", "_off"))
    return (cum.join(F.broadcast(offsets), "bucket")
            .withColumn("start_tokens",
                        F.col("_off") + F.col("_cum")
                        - F.col(tokens_col).cast("long"))
            .withColumn("shard",
                        F.expr(f"start_tokens div {int(budget_tokens)}"))
            .drop("_cum", "_off"))


def write_training_shards(df: DataFrame, path: str, id_col: str,
                          tokens_col: str, budget_tokens: int,
                          salt: str = "s0", hex_chars: int = 2,
                          fmt: str = "parquet") -> dict:
    """Shuffle-shard the corpus to ``path`` and write a manifest.

    Layout: ``path/data/shard=N/`` one file per shard (each shard lands
    wholly in one task via ``repartition(n, shard)``; rows inside are in
    ``sort_key`` order, so output bytes are reproducible), plus
    ``path/manifest.json`` with per-shard document and token counts.
    The manifest aggregate is shard-count-scale — the only driver
    materialization."""
    # persist: the stats action and the write both consume `assigned`,
    # and everything upstream of it (often the whole prep funnel) would
    # otherwise execute twice — at corpus scale that doubles the most
    # expensive stages
    assigned = shard_assignments(df, id_col, tokens_col, budget_tokens,
                                 salt=salt, hex_chars=hex_chars).persist()
    try:
        stats = (assigned.groupBy("shard")
                 .agg(F.count(F.lit(1)).alias("docs"),
                      F.sum(F.col(tokens_col).cast("long")).alias("tokens"))
                 .orderBy("shard").collect())
        n_shards = max((r["shard"] for r in stats), default=-1) + 1
        # 'shard' leads the sort: partitionBy requires ordering on the
        # partition column, and if it isn't already a satisfied prefix the
        # file writer inserts its OWN (non-stable) sort — which would void
        # the byte-deterministic sort_key order this sort exists to pin
        (assigned.drop("bucket")
         .repartition(max(int(n_shards), 1), "shard")
         .sortWithinPartitions("shard", "sort_key", id_col)
         .write.mode("overwrite").partitionBy("shard")
         .format(fmt).save(os.path.join(path, "data")))
    finally:
        assigned.unpersist()
    manifest = {
        "salt": salt,
        "budget_tokens": int(budget_tokens),
        "n_shards": int(n_shards),
        "total_docs": int(sum(r["docs"] for r in stats)),
        "total_tokens": int(sum(r["tokens"] for r in stats)),
        "shards": [{"shard": int(r["shard"]), "docs": int(r["docs"]),
                    "tokens": int(r["tokens"])} for r in stats],
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def write_webdataset_shards(df: DataFrame, path: str, id_col: str,
                            members: dict, tokens_col: str | None = None,
                            budget_tokens: int = 1 << 28,
                            salt: str = "wd0", hex_chars: int = 2) -> dict:
    """Write the corpus as WebDataset-style tar shards — the standard
    container for MULTIMODAL training data (one ``shard-NNNNNN.tar``
    per shard; a sample's members are adjacent entries sharing a key
    prefix: ``{id}.txt``, ``{id}.bin``, ... — streamable sequentially
    by any tar reader, no random access needed at training time).

    ``members`` maps extension -> column: string columns are written
    UTF-8, binary columns raw — the multimodal (text + opaque bytes +
    metadata) row shape lands as one sample. Sharding reuses
    shard_assignments (deterministic md5 global shuffle + token
    budget; pass ``tokens_col=None`` to budget by BYTES of the binary
    members instead — the natural knob when payload size, not token
    count, bounds a shard).

    Physical plan: ONE corpus shuffle (groupBy shard ->
    applyInPandas); each task writes its whole shard via a temp file +
    atomic os.replace, so re-runs are idempotent and readers never see
    a torn tar. Tar metadata is pinned (mtime=0, uid/gid=0, mode 644)
    and rows are emitted in sort_key order — shard bytes are
    REPRODUCIBLE no matter how the job was partitioned or retried.
    A shard must fit one task's memory (the applyInPandas group bound)
    — that is what ``budget_tokens`` is for; size it like any target
    output file (default 256 MiB-equivalent). Local/POSIX paths write
    directly from executors; an object-store deployment points this at
    a fuse mount or swaps the two file calls for a multipart-upload
    client (sinks/object_store.py seam)."""
    for ext, col in members.items():
        if not ext or "/" in ext or "." in ext:
            raise ValueError(f"bad member extension {ext!r}")
        if col not in df.columns:
            raise ValueError(f"member column {col!r} not in frame")
    if tokens_col is None:
        size_expr = " + ".join(
            f"coalesce(octet_length({c}), 0)" for c in members.values())
        df = df.withColumn("__wd_sz", F.expr(size_expr).cast("long"))
        tokens_col = "__wd_sz"
    assigned = shard_assignments(df, id_col, tokens_col, budget_tokens,
                                 salt=salt, hex_chars=hex_chars)
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    _clean_shard_dir(data_dir, "tar")
    exts = sorted(members)           # fixed member order inside a sample

    def write_shard(key, pdf):
        import io
        import tarfile

        import pandas as pd

        shard = int(key[0])
        pdf = pdf.sort_values(["sort_key", id_col])
        fname = f"shard-{shard:06d}.tar"
        tmp = os.path.join(data_dir, f".{fname}.inprogress")
        n_bytes = 0
        with open(tmp, "wb") as raw:
            with tarfile.open(fileobj=raw, mode="w",
                              format=tarfile.USTAR_FORMAT) as tf:
                for _, row in pdf.iterrows():
                    sample_key = str(row[id_col])
                    for ext in exts:
                        val = row[members[ext]]
                        if val is None:
                            continue
                        blob = (val if isinstance(val, (bytes, bytearray))
                                else str(val).encode("utf-8"))
                        info = tarfile.TarInfo(name=f"{sample_key}.{ext}")
                        info.size = len(blob)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        info.mode = 0o644
                        tf.addfile(info, io.BytesIO(bytes(blob)))
                        n_bytes += len(blob)
            raw.flush()
            os.fsync(raw.fileno())
        os.replace(tmp, os.path.join(data_dir, fname))
        return pd.DataFrame([{"shard": shard, "docs": len(pdf),
                              "n_bytes": n_bytes, "file": fname}])

    stats = (assigned.groupBy("shard")
             .applyInPandas(write_shard,
                            "shard long, docs long, n_bytes long, "
                            "file string")
             .orderBy("shard").collect())
    manifest = {
        "salt": salt,
        "budget_tokens": int(budget_tokens),
        "n_shards": len(stats),
        "total_docs": int(sum(r["docs"] for r in stats)),
        "total_bytes": int(sum(r["n_bytes"] for r in stats)),
        "members": {ext: members[ext] for ext in exts},
        "shards": [{"shard": int(r["shard"]), "docs": int(r["docs"]),
                    "n_bytes": int(r["n_bytes"]), "file": r["file"]}
                   for r in stats],
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def read_webdataset_shards(spark, path: str,
                           members: dict[str, str] | None = None) -> DataFrame:
    """Read WebDataset-style tar shards back as one row per SAMPLE — the
    inverse of :func:`write_webdataset_shards`, closing the round-trip a
    training pipeline needs when it verifies or re-filters shards it
    produced (and the shape any tar-emitting producer can be ingested
    through).

    ``members`` maps extension -> output type (``'string'`` members are
    decoded UTF-8, ``'binary'`` stay raw bytes); defaults to the
    ``members`` block of the directory's ``manifest.json`` with every
    column typed binary unless the manifest records nothing. Output:
    ``(key string, shard long, <ext> ...)`` — ``key`` is the sample key
    prefix (the writer's stringified id), absent members are NULL.

    100 TB posture: the scan is Spark's ``binaryFile`` source over
    ``data/shard-*.tar`` (in-progress dotfiles excluded by the glob), so
    parallelism = shard count and tar bytes never leave their executor;
    one Arrow kernel walks each tar sequentially — the WebDataset
    contract is that samples are ADJACENT entries sharing a key prefix,
    so the walk is single-pass with no random access. A shard must fit a
    task (the same bound the writer enforces via ``budget_tokens``; the
    binaryFile source itself caps files at spark.sql's 2 GiB column
    limit)."""
    from pyspark.sql import types as T

    if members is None:
        members = {}
        try:
            with open(os.path.join(path, "manifest.json")) as fh:
                members = {ext: "binary"
                           for ext in json.load(fh).get("members", {})}
        except (OSError, ValueError):
            pass
        if not members:
            raise ValueError(f"no members given and no readable manifest "
                             f"under {path!r}")
    for ext, typ in members.items():
        if not ext or "/" in ext or "." in ext:
            raise ValueError(f"bad member extension {ext!r}")
        if typ not in ("string", "binary"):
            raise ValueError(f"member {ext!r}: type must be string|binary, "
                             f"got {typ!r}")
    exts = sorted(members)
    out_schema = T.StructType(
        [T.StructField("key", T.StringType()),
         T.StructField("shard", T.LongType())]
        + [T.StructField(ext, T.StringType() if members[ext] == "string"
                         else T.BinaryType()) for ext in exts])

    def kernel(batches):
        import io
        import re
        import tarfile

        import pandas as pd

        shard_re = re.compile(r"shard-(\d+)\.tar$")
        for pdf in batches:
            rows: list[dict] = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                m = shard_re.search(str(fpath))
                shard = int(m.group(1)) if m else -1
                sample: dict | None = None
                with tarfile.open(fileobj=io.BytesIO(blob), mode="r") as tf:
                    for info in tf:
                        if not info.isfile() or "." not in info.name:
                            continue
                        key, ext = info.name.rsplit(".", 1)
                        if ext not in members:
                            continue
                        if sample is None or sample["key"] != key:
                            if sample is not None:
                                rows.append(sample)
                            sample = {"key": key, "shard": shard}
                        data = tf.extractfile(info).read()
                        sample[ext] = (data.decode("utf-8")
                                       if members[ext] == "string" else data)
                if sample is not None:
                    rows.append(sample)
            yield pd.DataFrame(rows, columns=["key", "shard", *exts])

    files = (spark.read.format("binaryFile")
             .load(_shard_scan_paths(path, "manifest.json", "shard-*.tar"))
             .select("path", "content"))
    return files.mapInPandas(kernel, out_schema)


def _shard_scan_paths(path: str, manifest_name: str,
                      glob_pat: str) -> list[str]:
    """The exact shard files the manifest recorded, else the glob.

    The writer sweeps stale shards before writing, but a reader pointed at
    a directory written by an OLDER writer (or torn by a mid-sweep crash)
    must still never ingest samples the manifest doesn't vouch for — the
    manifest's shard list is the source of truth when it exists."""
    try:
        with open(os.path.join(path, manifest_name)) as fh:
            shards = json.load(fh).get("shards") or []
        files = [os.path.join(path, "data", s["file"]) for s in shards]
        if files:
            return files
    except (OSError, ValueError, KeyError, TypeError):
        pass
    return [os.path.join(path, "data", glob_pat)]


# TFRecord manifest name: distinct from the tar writer's manifest so both
# containers can coexist under one output root
_TFRECORD_MANIFEST = "tfrecord_manifest.json"

_TF_TYPES = {"binary", "string", "long", "double",
             "array<long>", "array<double>", "array<string>"}


def write_tfrecord_shards(df: DataFrame, path: str, id_col: str,
                          features: dict, tokens_col: str | None = None,
                          budget_tokens: int = 1 << 28,
                          salt: str = "tfr0", hex_chars: int = 2) -> dict:
    """Write the corpus as TFRecord shards of ``tf.train.Example``
    records — the OTHER standard training container next to WebDataset
    (functions/tfrecord_codec.py holds the hand-rolled public wire
    formats: protobuf Example + CRC32C-framed records).

    ``features`` maps feature name -> column: string columns land as
    UTF-8 bytes features, binary raw, long/array<long> as int64 lists,
    double/array<double> as float lists (float32 by proto spec). The
    record always carries the stringified ``id_col`` as feature
    ``__key__`` so the round-trip keys rows without relying on order.
    Sharding, determinism and the physical plan are exactly
    write_webdataset_shards': deterministic md5 shuffle + token/byte
    budget, ONE corpus shuffle (groupBy shard -> applyInPandas), temp
    file + atomic os.replace per shard, rows in sort_key order and
    canonical Example encoding — shard bytes are reproducible under any
    partitioning or retry."""
    from pyspark.sql import types as T  # noqa: F401

    types: dict[str, str] = {}
    for name, col in features.items():
        # __key__ is the writer's own key feature; key/shard are the
        # reader's output columns — any of them as a feature name would
        # collide on the round-trip
        if not name or name in ("__key__", "key", "shard"):
            raise ValueError(f"bad feature name {name!r}")
        if col not in df.columns:
            raise ValueError(f"feature column {col!r} not in frame")
        t = df.schema[col].dataType.simpleString()
        t = {"int": "long", "bigint": "long", "float": "double",
             "array<bigint>": "array<long>", "array<int>": "array<long>",
             "array<float>": "array<double>"}.get(t, t)
        if t not in _TF_TYPES:
            raise ValueError(f"feature {name!r}: unsupported column type "
                             f"{t!r}")
        types[name] = t
    if tokens_col is None:
        size_expr = " + ".join(
            f"coalesce(octet_length(cast({c} as string)), 0)"
            for c in features.values())
        df = df.withColumn("__tf_sz", F.expr(size_expr).cast("long"))
        tokens_col = "__tf_sz"
    assigned = shard_assignments(df, id_col, tokens_col, budget_tokens,
                                 salt=salt, hex_chars=hex_chars)
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    _clean_shard_dir(data_dir, "tfrecord")
    names = sorted(features)

    def write_shard(key, pdf):
        import pandas as pd

        from marmaray_spark.functions.tfrecord_codec import (encode_example,
                                                             frame_record)

        shard = int(key[0])
        pdf = pdf.sort_values(["sort_key", id_col])
        fname = f"shard-{shard:06d}.tfrecord"
        tmp = os.path.join(data_dir, f".{fname}.inprogress")
        n_bytes = 0
        with open(tmp, "wb") as out:
            for _, row in pdf.iterrows():
                feats: dict = {"__key__": str(row[id_col]).encode("utf-8")}
                for name in names:
                    val = row[features[name]]
                    if val is None:
                        continue
                    t = types[name]
                    if t == "string":
                        feats[name] = str(val).encode("utf-8")
                    elif t == "binary":
                        feats[name] = bytes(val)
                    elif t == "long":
                        feats[name] = [int(val)]
                    elif t == "double":
                        feats[name] = [float(val)]
                    elif t == "array<long>":
                        feats[name] = [int(v) for v in val]
                    elif t == "array<double>":
                        feats[name] = [float(v) for v in val]
                    else:                       # array<string>
                        feats[name] = [str(v).encode("utf-8") for v in val]
                rec = frame_record(encode_example(feats))
                out.write(rec)
                n_bytes += len(rec)
            out.flush()
            os.fsync(out.fileno())
        os.replace(tmp, os.path.join(data_dir, fname))
        return pd.DataFrame([{"shard": shard, "docs": len(pdf),
                              "n_bytes": n_bytes, "file": fname}])

    stats = (assigned.groupBy("shard")
             .applyInPandas(write_shard,
                            "shard long, docs long, n_bytes long, "
                            "file string")
             .orderBy("shard").collect())
    manifest = {
        "salt": salt,
        "budget_tokens": int(budget_tokens),
        "n_shards": len(stats),
        "total_docs": int(sum(r["docs"] for r in stats)),
        "total_bytes": int(sum(r["n_bytes"] for r in stats)),
        "features": {n: types[n] for n in names},
        "shards": [{"shard": int(r["shard"]), "docs": int(r["docs"]),
                    "n_bytes": int(r["n_bytes"]), "file": r["file"]}
                   for r in stats],
    }
    with open(os.path.join(path, _TFRECORD_MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def read_tfrecord_shards(spark, path: str,
                         features: dict[str, str] | None = None) -> DataFrame:
    """One row per Example — the inverse of write_tfrecord_shards (and
    an ingest path for ANY TFRecord producer whose features fit the
    supported kinds). ``features`` maps name -> spark type (defaults to
    the directory's tfrecord manifest); CRC failures raise — a torn
    shard fails the task, never yields silent garbage.

    Same 100 TB posture as the tar reader: binaryFile scan over
    ``data/shard-*.tfrecord`` (parallelism = shard count, shard bytes
    never leave their executor), one Arrow kernel walks each shard's
    frames sequentially."""
    from pyspark.sql import types as T

    if features is None:
        try:
            with open(os.path.join(path, _TFRECORD_MANIFEST)) as fh:
                features = json.load(fh)["features"]
        except (OSError, ValueError, KeyError):
            raise ValueError(f"no features given and no readable "
                             f"{_TFRECORD_MANIFEST} under {path!r}")
    for name, t in features.items():
        if name in ("key", "shard", "__key__"):
            raise ValueError(f"feature name {name!r} collides with a "
                             f"reader output column")
        if t not in _TF_TYPES:
            raise ValueError(f"feature {name!r}: type must be one of "
                             f"{sorted(_TF_TYPES)}, got {t!r}")
    names = sorted(features)
    spark_t = {"binary": T.BinaryType(), "string": T.StringType(),
               "long": T.LongType(), "double": T.DoubleType(),
               "array<long>": T.ArrayType(T.LongType()),
               "array<double>": T.ArrayType(T.DoubleType()),
               "array<string>": T.ArrayType(T.StringType())}
    out_schema = T.StructType(
        [T.StructField("key", T.StringType()),
         T.StructField("shard", T.LongType())]
        + [T.StructField(n, spark_t[features[n]]) for n in names])

    def kernel(batches):
        import re

        import pandas as pd

        from marmaray_spark.functions.tfrecord_codec import (decode_example,
                                                             iter_records)

        def convert(vals, t):
            if vals is None:
                return None
            if t == "binary":
                return vals[0]
            if t == "string":
                return vals[0].decode("utf-8")
            if t == "long":
                return int(vals[0])
            if t == "double":
                return float(vals[0])
            if t == "array<long>":
                return [int(v) for v in vals]
            if t == "array<double>":
                return [float(v) for v in vals]
            return [v.decode("utf-8") for v in vals]

        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                m = re.search(r"shard-(\d+)\.tfrecord$", fpath)
                shard = int(m.group(1)) if m else -1
                for payload in iter_records(bytes(blob)):
                    ex = decode_example(payload)
                    row = {"key": ex["__key__"][0].decode("utf-8"),
                           "shard": shard}
                    for n in names:
                        row[n] = convert(ex.get(n), features[n])
                    rows.append(row)
            yield pd.DataFrame(rows, columns=["key", "shard"] + names) \
                if rows else pd.DataFrame(
                    {c: [] for c in ["key", "shard"] + names})

    scan = (spark.read.format("binaryFile")
            .load(_shard_scan_paths(path, _TFRECORD_MANIFEST,
                                    "shard-*.tfrecord"))
            .select("path", "content"))
    return scan.mapInPandas(kernel, out_schema)
