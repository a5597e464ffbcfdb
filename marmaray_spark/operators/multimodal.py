"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-batched
mapInPandas stages.

New surface for LLM data pipelines (BASELINE.json north star). The
container has no image/audio codecs, so the decode kernels are STUBBED
behind ``_decode_image``/``_decode_audio`` (deterministic fakes driven by
the payload bytes; a real deployment swaps in PIL/soundfile). Everything
Spark-side — schema, batch shape, partition-local processing — is real:

- media rows are (id, media_type, payload binary, meta struct);
- kernels run via ``mapInPandas`` so each Arrow batch is processed
  vectorized in one Python call (the 10-100x-over-row-UDF path);
- nothing ever collects to the driver; batches stream partition-local,
  so the pipeline scales with executors at 100 TB.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("source", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("head_hex", T.StringType(), True),  # magic bytes
    ]), True),
])


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata from the raw bytes — pure expressions, no Python."""
    return df.withColumn("meta", F.struct(
        F.coalesce(F.col("source"), F.lit(None).cast("string")).alias("source")
        if "source" in df.columns else F.lit(None).cast("string").alias("source"),
        F.octet_length(F.col(payload_col)).cast("long").alias("byte_len"),
        F.lower(F.hex(F.expr(f"substring({payload_col}, 1, 4)"))).alias("head_hex"),
    ))


def synth_media_from_text(df: DataFrame, id_col: str, text_col: str,
                          media_type: str = "image") -> DataFrame:
    """Deterministic fake media: utf-8 bytes of the text as the payload.
    Lets the whole pipeline (schema, batching, kernels) run and be tested
    without codecs."""
    out = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
    return attach_media_metadata(out)


# -- decode kernels (STUBS — deterministic fakes; swap for real codecs) ------

def _decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB: (width, height, channels) derived from the byte stream.
    Real impl: PIL.Image.open(io.BytesIO(payload)).size — not available
    in this container."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("real image decode requires PIL; empty payload")
    w = 16 + (len(payload) % 240)
    h = 16 + (payload[0] % 240)
    return w, h, 3


def _decode_audio(payload: bytes) -> tuple[int, int]:
    """STUB: (sample_rate, n_samples). Real impl: soundfile.read."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("real audio decode requires soundfile; empty payload")
    return 16000, len(payload) * 4


IMAGE_FEATURES_SCHEMA = ("media_id long, width int, height int, channels int, "
                         "aspect_milli long, byte_len long")


def extract_image_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Output: one row per image with decoded dimensions and integer
    aspect ratio (milli-units, engine-exact for testing).
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_decode_image)
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
                "channels": dims.map(lambda d: d[2]).astype("int32"),
                "byte_len": pdf["payload"].map(len).astype("int64"),
            })
            out["aspect_milli"] = (out["width"] * 1000 // out["height"]).astype("int64")
            yield out[["media_id", "width", "height", "channels",
                       "aspect_milli", "byte_len"]]

    cols = df.filter(F.col("media_type") == "image").select("media_id", "payload")
    return cols.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """STUB resize: passes payload through, rewrites dims — the real kernel
    would re-encode pixels; the Spark plumbing (batch in/out, binary
    column round-trip) is what's exercised."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": target_w,
                "height": target_h,
                "payload": pdf["payload"],
            })

    cols = df.filter(F.col("media_type") == "image").select("media_id", "payload")
    return cols.mapInPandas(kernel, schema=RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """STUB frame sampler: emits one 'frame' per every_n_bytes slice of the
    payload (a real video kernel emits decoded frames at a stride). Shows
    the 1->N batch fan-out shape under mapInPandas."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, start in enumerate(range(0, len(payload), every_n_bytes)):
                    rows.append((mid, idx, bytes(payload[start:start + every_n_bytes])))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_payload"])

    cols = df.filter(F.col("media_type") == "video").select("media_id", "payload")
    return cols.mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)
