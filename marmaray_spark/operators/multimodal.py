"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-batched
mapInPandas stages.

New surface for LLM data pipelines (BASELINE.json north star). Decode is
REAL for formats that need no external libraries — uncompressed 24-bit
BMP and PCM-16 WAV (functions/media_codec.py: header parse, pixel/sample
arrays, nearest-neighbor resize, RMS) — while compressed formats
(JPEG/PNG/MP3) stay behind deterministic byte-driven stubs (a real
deployment swaps in PIL/soundfile at the same seam). Everything
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


def synth_gradient_bmp(df: DataFrame, id_col: str,
                       n_variants: int = 8) -> DataFrame:
    """Deterministic REAL BMP images from ids — oracle-checkable media.

    Each id paints an 18x16 gray-RGB image whose pixel value is closed-
    form integer arithmetic: ``v(x, y) = (g*(x+1) + 7*y) % 251`` with
    ``g = id // n_variants`` (the gradient family), except the 2x2 cell
    at ``(x//2 == k, y//2 == k)`` with ``k = id % n_variants`` which is
    darkened to 0 (one grid block per variant — the near-dup structure).
    The dims are chosen so dhash64's 9x8 grid lands on EXACT 2x2 blocks
    (xs stride 2 over w=18, ys stride 2 over h=16): every block mean is
    a 4-pixel integer sum // 4, so the perceptual hash of each image is
    itself a closed-form integer an external SQL oracle can compute —
    the engine-exact gate pattern (cf. the semantic-decontam matmul).
    Payloads are real BMPs through encode_bmp, so the full decode path
    (not a stub) is what the gate exercises."""
    import numpy as np

    from marmaray_spark.functions.media_codec import encode_bmp

    nv = int(n_variants)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        x = np.arange(18, dtype=np.int64)[None, :]
        y = np.arange(16, dtype=np.int64)[:, None]

        def one(i: int) -> bytes:
            g, k = i // nv, i % nv
            v = (g * (x + 1) + 7 * y) % 251
            v = np.where((x // 2 == k) & (y // 2 == k), 0, v)
            px = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
            return encode_bmp(np.ascontiguousarray(px))

        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "media_type": "image",
                "payload": [one(int(i)) for i in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(
        kernel, schema="media_id long, media_type string, payload binary")


def synth_tone_wav(df: DataFrame, id_col: str,
                   n_variants: int = 8) -> DataFrame:
    """Deterministic REAL WAV clips from ids — the audio twin of
    synth_gradient_bmp. 130 PCM-16 mono samples at 8 kHz, all
    NON-NEGATIVE closed-form integers
    ``s(j) = (g*(j+1)*37 + 13*k) % 1999``
    (``g = id // n_variants``, ``k = id % n_variants``): 130 = 2 * 65,
    so adhash64's 65-frame energy envelope lands on exact 2-sample
    frames and each envelope value is ``(s(2i) + s(2i+1)) // 2`` —
    abs() is the identity on these samples, making the envelope hash a
    closed-form integer a SQL oracle can mirror. The *37 multiplier
    makes the modulus wrap often even for small g, so envelopes are
    non-monotone and the near-dup pair structure is non-degenerate
    (without it, small-g envelopes rise monotonically and every such
    clip hashes to 0 — near-vacuous pairs)."""
    import numpy as np

    from marmaray_spark.functions.media_codec import encode_wav_pcm16

    nv = int(n_variants)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j = np.arange(130, dtype=np.int64)

        def one(i: int) -> bytes:
            g, k = i // nv, i % nv
            s = (g * (j + 1) * 37 + 13 * k) % 1999
            return encode_wav_pcm16(s.astype(np.int16), 8000)

        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "media_type": "audio",
                "payload": [one(int(i)) for i in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(
        kernel, schema="media_id long, media_type string, payload binary")


def synth_gif_video(df: DataFrame, id_col: str, n_frames: int = 4,
                    n_variants: int = 8) -> DataFrame:
    """Deterministic REAL animated GIFs from ids — the video twin of
    synth_gradient_bmp. Each id paints ``n_frames`` 18x16 frames over a
    251-entry grayscale palette (palette[i] = (i, i, i), so the decoded
    pixel's luma IS the index): frame f's pixel is
    ``(g*(x+1) + 7*y + 11*f) % 251`` with the (k, k) grid block darkened
    to 0 (``g = id // n_variants``, ``k = id % n_variants``). Same
    2x2-block alignment as the BMP generator, so every sampled frame's
    dHash is closed-form integer arithmetic — the whole GIF decode ->
    frame composite -> PNG re-encode -> hash chain becomes
    oracle-checkable."""
    import numpy as np

    from marmaray_spark.functions.gif_codec import encode_gif

    nv, nf = int(n_variants), int(n_frames)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        x = np.arange(18, dtype=np.int64)[None, :]
        y = np.arange(16, dtype=np.int64)[:, None]
        pal = np.stack([np.arange(251)] * 3, axis=1).astype(np.uint8)

        def one(i: int) -> bytes:
            g, k = i // nv, i % nv
            dark = (x // 2 == k) & (y // 2 == k)
            frames = []
            for f in range(nf):
                v = (g * (x + 1) + 7 * y + 11 * f) % 251
                frames.append(np.where(dark, 0, v).astype(np.uint8))
            return encode_gif(frames, pal)

        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "media_type": "video",
                "payload": [one(int(i)) for i in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(
        kernel, schema="media_id long, media_type string, payload binary")


# -- decode kernels: REAL for BMP/WAV, deterministic stubs otherwise ---------

def _decode_image(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels). REAL parse for BMP and PNG payloads
    (functions/media_codec.py — PNG incl. the zlib inflate + all five
    scanline filters), and for JPEG/WebP/GIF whenever PIL is importable
    (import-try seam: same kernel, the adapter only activates when the
    cluster image ships the library). Other formats — and compressed
    formats in codec-less containers — fall back to the deterministic
    byte-driven stub so the pipeline shape stays testable anywhere."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload (compressed formats need PIL)")
    if payload[:2] == b"BM":
        from marmaray_spark.functions.media_codec import decode_bmp
        px = decode_bmp(bytes(payload))
        return px.shape[1], px.shape[0], px.shape[2]
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from marmaray_spark.functions.media_codec import decode_png
        px = decode_png(bytes(payload))
        return px.shape[1], px.shape[0], px.shape[2]
    from marmaray_spark.functions.media_codec import (decode_image_pil,
                                                      decode_jpeg_best,
                                                      looks_like_jpeg,
                                                      pil_available)
    if looks_like_jpeg(bytes(payload[:3])):
        # REAL decode either way: PIL when the wheel exists, else the
        # pure-numpy baseline decoder (functions/jpeg_codec.py)
        px = decode_jpeg_best(bytes(payload))
        return px.shape[1], px.shape[0], px.shape[2]
    if bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
        from marmaray_spark.functions.gif_codec import decode_gif
        px = decode_gif(bytes(payload))
        return px.shape[1], px.shape[0], px.shape[2]
    from marmaray_spark.functions.media_codec import (looks_like_webp,
                                                      parse_webp_dims)
    if looks_like_webp(bytes(payload[:12])):
        # REAL header parse (VP8/VP8L/VP8X all carry dims+alpha in fixed
        # layouts); pixel decode stays behind the PIL seam
        return parse_webp_dims(bytes(payload))
    if pil_available():
        try:
            px = decode_image_pil(bytes(payload))   # WebP/GIF/TIFF/...
            return px.shape[1], px.shape[0], px.shape[2]
        except Exception:
            pass
    w = 16 + (len(payload) % 240)
    h = 16 + (payload[0] % 240)
    return w, h, 3


def _decode_audio(payload: bytes) -> tuple[int, int]:
    """(sample_rate, n_samples). REAL parse for PCM-16 WAV payloads, and
    for MP3/FLAC/OGG whenever soundfile is importable (import-try seam);
    stub otherwise."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload (compressed formats need soundfile)")
    if payload[:4] == b"RIFF":
        from marmaray_spark.functions.media_codec import decode_wav
        rate, channels, samples = decode_wav(bytes(payload))
        return rate, len(samples) // max(channels, 1)
    from marmaray_spark.functions.media_codec import (decode_audio_best,
                                                      looks_like_flac,
                                                      looks_like_mp3,
                                                      soundfile_available)
    if looks_like_flac(bytes(payload[:4])) or \
            (looks_like_mp3(bytes(payload[:3])) and soundfile_available()):
        # FLAC decodes for real either way (pure-Python codec in
        # functions/flac_codec.py when soundfile is absent); MP3 needs
        # the soundfile wheel
        rate, channels, samples = decode_audio_best(bytes(payload))
        return rate, len(samples) // max(channels, 1)
    if looks_like_mp3(bytes(payload[:3])):
        # no soundfile: REAL stream metadata from the Layer III frame
        # walk (rate + sample count); sample decode stays behind the
        # adapter seam (functions/media_codec.py explains why a pure-
        # Python Layer III decoder can't be validated in this env)
        from marmaray_spark.functions.media_codec import mp3_stream_info
        rate, n_samples, _frames = mp3_stream_info(bytes(payload))
        return rate, n_samples
    return 16000, len(payload) * 4


IMAGE_FEATURES_SCHEMA = ("media_id long, width int, height int, channels int, "
                         "aspect_milli long, byte_len long")


def extract_image_features(df: DataFrame,
                           passthrough: list[str] | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Output: one row per image with decoded dimensions and integer
    aspect ratio (milli-units, engine-exact for testing).

    ``passthrough`` names extra input columns echoed into the output by
    the kernel itself — metadata riding along in the SAME Arrow pass, so
    callers never self-join features back onto the source (a whole-table
    join at corpus scale)."""
    passthrough = [c for c in (passthrough or []) if c != "media_id"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload):
            # decode-or-error: a corrupt payload (truncated BMP, hostile
            # PNG) marks ITS row ok=False — never kills the batch (the
            # same per-record contract as the Avro decode kernels)
            try:
                w, h, c = _decode_image(payload)
                return w, h, c, True
            except (NotImplementedError, ValueError):   # MediaCodecError is a ValueError
                return -1, -1, -1, False

        for pdf in batches:
            dims = pdf["payload"].map(one)
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
                "channels": dims.map(lambda d: d[2]).astype("int32"),
                "byte_len": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0).astype("int64"),
                "ok": dims.map(lambda d: d[3]).astype("bool"),
            })
            out["aspect_milli"] = (out["width"] * 1000
                                   // out["height"].where(out["height"] > 0, 1)
                                   ).where(out["ok"], 0).astype("int64")
            for c in passthrough:
                out[c] = pdf[c]
            yield out[["media_id", "width", "height", "channels",
                       "aspect_milli", "byte_len", "ok"] + passthrough]

    src = df.filter(F.col("media_type") == "image")
    cols = src.select("media_id", "payload", *passthrough)
    # id keeps the SOURCE column's type (the compression_signals lesson,
    # same as image_dhash): a hardcoded long turns a string-id media
    # table — reachable straight from the YAML media.* block — into a
    # mid-run Arrow conversion error
    schema = T.StructType(
        [T.StructField("media_id", src.schema["media_id"].dataType),
         T.StructField("width", T.IntegerType()),
         T.StructField("height", T.IntegerType()),
         T.StructField("channels", T.IntegerType()),
         T.StructField("aspect_milli", T.LongType()),
         T.StructField("byte_len", T.LongType()),
         T.StructField("ok", T.BooleanType())]
        + [src.schema[c] for c in passthrough])
    return cols.mapInPandas(kernel, schema=schema)


def audio_quality_gates(features: DataFrame, min_ms: int = 500,
                        max_ms: int = 10 * 60 * 1000,
                        rms_milli_bounds: tuple[int, int] = (5, 900),
                        min_rate: int = 8000) -> DataFrame:
    """Audio quality gates as pure expressions over the
    extract_audio_features output (no second decode): duration band
    (sub-half-second blips and hour-long streams are both junk for most
    training mixes), RMS loudness band (near-zero = silence/DC, near
    full-scale = clipping or noise), and a sample-rate floor. Stub-
    decoded rows (rms_milli = -1, no real sample decode available) fail
    the RMS rule by construction — an unverifiable clip must not pass a
    loudness gate. Adds per-rule booleans + combined ``gate_pass``
    (decode failures fail); integer-only."""
    lo, hi = rms_milli_bounds
    return (features
            .withColumn("dur_ok", (F.col("duration_ms") >= min_ms)
                        & (F.col("duration_ms") <= max_ms))
            .withColumn("rms_ok", (F.col("rms_milli") >= lo)
                        & (F.col("rms_milli") <= hi))
            .withColumn("rate_ok", F.col("sample_rate") >= min_rate)
            .withColumn("gate_pass",
                        F.col("ok") & F.col("dur_ok") & F.col("rms_ok")
                        & F.col("rate_ok")))


def image_quality_gates(features: DataFrame, min_width: int = 64,
                        min_height: int = 64,
                        aspect_milli_bounds: tuple[int, int] = (333, 3000),
                        min_bytes_per_kpx: int = 30) -> DataFrame:
    """LAION-style image quality gates as pure expressions over the
    extract_image_features output (no second decode): resolution floor,
    aspect-ratio band (extreme aspect = banners/sprites, the classic
    web-crawl junk), and a bytes-per-kilopixel floor — a near-constant
    image compresses to almost nothing, the image analog of the text
    zlib compression gate (compression already happened in the codec, so
    byte_len over pixel count IS the signal; BMP is uncompressed and
    passes trivially, which is honest: the gate measures the stored
    encoding). Adds the per-rule booleans + the combined ``gate_pass``
    (decode failures fail the gate by definition); integer-only, stays
    in whole-stage codegen downstream of the one feature pass."""
    lo, hi = aspect_milli_bounds
    kpx = "(CAST(width AS BIGINT) * height div 1000)"
    return (features
            .withColumn("res_ok", (F.col("width") >= min_width)
                        & (F.col("height") >= min_height))
            .withColumn("aspect_ok", (F.col("aspect_milli") >= lo)
                        & (F.col("aspect_milli") <= hi))
            .withColumn("density_ok", F.expr(
                f"byte_len >= {int(min_bytes_per_kpx)} "
                f"* greatest({kpx}, 1)"))
            .withColumn("gate_pass",
                        F.col("ok") & F.col("res_ok") & F.col("aspect_ok")
                        & F.col("density_ok")))


# {id} slot: the id type is derived from the input frame at call time
# (hardcoding long breaks string-id media tables mid-run — see
# image_dhash's note on the compression_signals lesson)
AUDIO_FEATURES_SCHEMA = ("media_id {id}, sample_rate int, n_samples long, "
                         "duration_ms long, rms_milli int, ok boolean")


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Audio decode + features via mapInPandas: sample rate, sample
    count, integer duration and RMS loudness (milli-units). REAL for
    PCM-16 WAV and FLAC payloads (FLAC via the pure-Python codec in
    functions/flac_codec.py when soundfile is absent); stub-decoded
    otherwise (rms -1 marks the stub path so downstream filters can
    tell)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from marmaray_spark.functions.media_codec import (decode_audio_best,
                                                          decode_wav,
                                                          looks_like_flac,
                                                          wav_rms_milli)

        def one(payload):
            # decode-or-error: corrupt bytes behind a valid magic mark
            # THIS row ok=False instead of killing the task
            try:
                if payload is not None and bytes(payload[:4]) == b"RIFF":
                    rate, channels, samples = decode_wav(bytes(payload))
                    n = len(samples) // max(channels, 1)
                    return (rate, n, n * 1000 // rate,
                            wav_rms_milli(samples), True)
                if payload is not None \
                        and looks_like_flac(bytes(payload[:4])):
                    rate, channels, samples = decode_audio_best(bytes(payload))
                    n = len(samples) // max(channels, 1)
                    return (rate, n, n * 1000 // rate,
                            wav_rms_milli(samples), True)
                rate, n = _decode_audio(payload)
                return rate, n, n * 1000 // rate, -1, True
            except (NotImplementedError, ValueError):   # MediaCodecError is a ValueError
                return -1, 0, 0, -1, False

        for pdf in batches:
            feats = pdf["payload"].map(one)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": feats.map(lambda f: f[0]).astype("int32"),
                "n_samples": feats.map(lambda f: f[1]).astype("int64"),
                "duration_ms": feats.map(lambda f: f[2]).astype("int64"),
                "rms_milli": feats.map(lambda f: f[3]).astype("int32"),
                "ok": feats.map(lambda f: f[4]).astype("bool"),
            })

    cols = df.filter(F.col("media_type") == "audio").select("media_id", "payload")
    id_type = df.schema["media_id"].dataType.simpleString()
    return cols.mapInPandas(
        kernel, schema=AUDIO_FEATURES_SCHEMA.format(id=id_type))


RESIZE_SCHEMA = ("media_id {id}, width int, height int, payload binary, "
                 "ok boolean")


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize: REAL nearest-neighbor re-encode for BMP/PNG/JPEG payloads
    (decode -> sample grid -> re-encode; JPEG through PIL when the wheel
    exists, else the pure-numpy baseline codec in functions/jpeg_codec.py
    — real either way). Other formats pass payload through with rewritten
    dims (the stub seam). Batch in/out, binary column round-trip."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from marmaray_spark.functions.media_codec import (decode_bmp,
                                                          decode_jpeg_best,
                                                          decode_png,
                                                          encode_bmp,
                                                          encode_jpeg_best,
                                                          encode_png,
                                                          looks_like_jpeg,
                                                          resize_nearest)

        def one(payload):
            if payload is not None and bytes(payload[:2]) == b"BM":
                px = resize_nearest(decode_bmp(bytes(payload)),
                                    target_w, target_h)
                return encode_bmp(px)
            if payload is not None and bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
                px = resize_nearest(decode_png(bytes(payload)),
                                    target_w, target_h)
                return encode_png(px)
            if payload is not None and looks_like_jpeg(bytes(payload[:3])):
                px = resize_nearest(decode_jpeg_best(bytes(payload))[:, :, :3],
                                    target_w, target_h)
                return encode_jpeg_best(px)
            if payload is not None \
                    and bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
                # first frame, re-encoded lossless (PNG) at the new size
                from marmaray_spark.functions.gif_codec import decode_gif
                px = resize_nearest(decode_gif(bytes(payload)),
                                    target_w, target_h)
                return encode_png(px)
            return payload

        def safe(payload):
            # decode-or-error: corrupt decodable-magic payloads pass the
            # ORIGINAL bytes through marked ok=False — the task survives
            try:
                return one(payload), True
            except (NotImplementedError, ValueError):   # MediaCodecError is a ValueError
                return payload, False

        for pdf in batches:
            res = pdf["payload"].map(safe)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": target_w,
                "height": target_h,
                "payload": res.map(lambda r: r[0]),
                "ok": res.map(lambda r: r[1]).astype("bool"),
            })

    cols = df.filter(F.col("media_type") == "image").select("media_id", "payload")
    id_type = df.schema["media_id"].dataType.simpleString()
    return cols.mapInPandas(kernel, schema=RESIZE_SCHEMA.format(id=id_type))


def _decode_pixels(payload: bytes):
    """Pixel array (H x W x C uint8) for payloads with a REAL decode
    path: BMP/PNG/JPEG/GIF through the pure-Python codecs, anything else
    through PIL when the wheel exists. Raises NotImplementedError /
    MediaCodecError for undecodable payloads — unlike _decode_image
    there is deliberately NO byte-driven stub here: a perceptual hash of
    fake pixels would produce confidently wrong near-dup pairs, so
    callers fork undecodable rows instead (decode-or-error)."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload")
    if payload[:2] == b"BM":
        from marmaray_spark.functions.media_codec import decode_bmp
        return decode_bmp(bytes(payload))
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from marmaray_spark.functions.media_codec import decode_png
        return decode_png(bytes(payload))
    from marmaray_spark.functions.media_codec import (decode_image_pil,
                                                      decode_jpeg_best,
                                                      looks_like_jpeg,
                                                      pil_available)
    if looks_like_jpeg(bytes(payload[:3])):
        return decode_jpeg_best(bytes(payload))
    if bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
        from marmaray_spark.functions.gif_codec import decode_gif
        return decode_gif(bytes(payload))
    if pil_available():
        return decode_image_pil(bytes(payload))
    raise NotImplementedError("no real decoder for this payload")


def dhash64(pixels) -> int:
    """64-bit difference hash of a decoded pixel array — the classic
    dHash perceptual fingerprint (Krawetz 2013, "Kind of Like That"):
    integer luma, block-mean downsample to a 9x8 grid, one bit per
    horizontal neighbor pair (left > right), packed row-major into a
    SIGNED int64 (two's complement, so Spark's bit_count/XOR work on it
    directly). Everything is integer arithmetic on exact block sums —
    no float resize — so the hash is deterministic across numpy builds
    and re-runs; brightness shifts and small edits move few bits while
    the gradient STRUCTURE carries the identity."""
    import numpy as np

    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] >= 3:
        p = px[:, :, :3].astype(np.int64)
        g = (p[:, :, 0] * 299 + p[:, :, 1] * 587 + p[:, :, 2] * 114) // 1000
    else:
        # 1 channel (gray) or 2 (gray+alpha, PNG type 4): luma IS
        # channel 0 — indexing a missing channel 2 here raised
        # IndexError, which the decode-or-error fork does not catch
        g = px[:, :, 0].astype(np.int64)
    h, w = g.shape
    if h < 1 or w < 1:
        raise ValueError("empty pixel array")
    ys = [(r * h) // 8 for r in range(9)]
    xs = [(c * w) // 9 for c in range(10)]
    grid = [[0] * 9 for _ in range(8)]
    for r in range(8):
        y0 = ys[r]
        y1 = max(ys[r + 1], y0 + 1)
        for c in range(9):
            x0 = xs[c]
            x1 = max(xs[c + 1], x0 + 1)
            block = g[y0:y1, x0:x1]
            grid[r][c] = int(block.sum()) // block.size
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | (1 if grid[r][c] > grid[r][c + 1] else 0)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def image_dhash(df: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload",
                passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Perceptual dHash per image: one Arrow-batched mapInPandas pass,
    bytes never leave executors. Undecodable payloads fork per-row
    (ok=False, err carries the reason) — the repo-wide decode-or-error
    contract — instead of hashing a stub or killing the task.
    ``passthrough`` columns ride along typed (the video path carries
    frame_idx through so clip frames stay addressable)."""
    # id keeps its own type (the compression_signals lesson: a hardcoded
    # long turns a string-id corpus into a mid-run Arrow error)
    id_type = df.schema[id_col].dataType.simpleString()
    pt = [(c, df.schema[c].dataType.simpleString()) for c in passthrough]
    out_schema = ", ".join(
        [f"{id_col} {id_type}"] + [f"{c} {t}" for c, t in pt]
        + ["dhash long", "ok boolean", "err string"])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload):
            try:
                return dhash64(_decode_pixels(
                    bytes(payload) if payload is not None else b"")), \
                    True, None
            except (NotImplementedError, ValueError) as e:  # MediaCodecError
                return None, False, f"{type(e).__name__}: {e}"

        for pdf in batches:
            res = [one(p) for p in pdf[payload_col]]
            out = {id_col: pdf[id_col].to_numpy()}
            for c, _t in pt:
                out[c] = pdf[c].to_numpy()
            out["dhash"] = pd.array([r[0] for r in res], dtype="Int64")
            out["ok"] = [r[1] for r in res]
            out["err"] = [r[2] for r in res]
            yield pd.DataFrame(out)

    return df.select(id_col, *passthrough, payload_col) \
        .mapInPandas(kernel, schema=out_schema)


def dhash_near_dup_pairs(df: DataFrame, id_col: str = "media_id",
                         dhash_col: str = "dhash", max_hamming: int = 3,
                         max_bucket_width: int | None = None) -> DataFrame:
    """Image near-duplicates: banded Hamming join over 64-bit dHashes —
    the pigeonhole pattern the text SimHash path uses, reused with four
    16-bit slices (operators/dedup.py simhash_banded_near_dup, which
    carries the hot-bucket star-anchor guard for saturated fingerprint
    spaces). Full recall for max_hamming <= 3 by pigeonhole; candidates
    are O(rows x 4) bucket keys, never all pairs. Returns (a, b,
    hamming). Rows with NULL hashes (forked decode errors) are dropped
    first — they are report material, not dedup candidates."""
    from marmaray_spark.operators.dedup import simhash_banded_near_dup
    return simhash_banded_near_dup(
        df.filter(F.col(dhash_col).isNotNull()), id_col, dhash_col,
        max_hamming=max_hamming, max_bucket_width=max_bucket_width,
        hash_bits=64, n_bands=4)


def _decode_samples(payload: bytes):
    """(rate, channels, samples) for payloads with a REAL sample decode
    path: WAV (PCM-16 / G.711 / IMA-ADPCM) and FLAC through the
    pure-Python codecs, MP3/OGG through soundfile when the wheel exists.
    Raises for undecodable payloads — like _decode_pixels, deliberately
    no stub: a fingerprint of fake samples fabricates near-dup pairs."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload")
    p = bytes(payload)
    if p[:4] == b"RIFF":
        from marmaray_spark.functions.media_codec import decode_wav
        return decode_wav(p)
    from marmaray_spark.functions.media_codec import (decode_audio_best,
                                                      looks_like_flac,
                                                      soundfile_available)
    if looks_like_flac(p[:4]) or soundfile_available():
        return decode_audio_best(p)
    raise NotImplementedError("no real sample decoder for this payload")


def adhash64(samples, channels: int = 1) -> int:
    """64-bit difference hash of an audio clip's ENERGY ENVELOPE — the
    dHash idea transposed to audio: integer mono mixdown, 65 equal
    frames, per-frame mean absolute amplitude on exact integer sums,
    one bit per neighbor pair (louder-than-next), packed into a signed
    int64. Volume scaling preserves a comparison whenever the two frame
    energies differ by more than the integer-mean rounding wobble (frame
    lengths differ by at most 1, so flooring can flip only near-ties —
    NOT the exact theorem image dHash has for brightness shifts, where
    (sum + k*size)//size == sum//size + k makes every bit provably
    stable); in practice a re-levelled copy lands within a few bits
    while a different recording's envelope scatters ~32. All-integer =>
    deterministic across numpy builds. Needs >= 65 mono samples
    (shorter clips have no envelope to hash — callers fork them)."""
    import numpy as np

    s = np.asarray(samples).astype(np.int64).ravel()
    if channels > 1:
        n = (len(s) // channels) * channels
        s = s[:n].reshape(-1, channels).sum(axis=1) // channels
    if len(s) < 65:
        raise ValueError(f"audio too short for a 65-frame envelope "
                         f"({len(s)} mono samples)")
    bounds = [(i * len(s)) // 65 for i in range(66)]
    e = [int(np.abs(s[bounds[i]:bounds[i + 1]]).sum())
         // (bounds[i + 1] - bounds[i]) for i in range(65)]
    bits = 0
    for i in range(64):
        bits = (bits << 1) | (1 if e[i] > e[i + 1] else 0)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def audio_dhash(df: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload") -> DataFrame:
    """Perceptual envelope hash per audio clip: one Arrow-batched
    mapInPandas pass, samples never leave executors; undecodable or
    too-short payloads fork per-row (ok=False). Pair downstream with
    dhash_near_dup_pairs (the same 64-bit banded Hamming join images
    use) or maintain via maintain_projection with this as the
    projection, mirroring maintain_image_hash_index."""
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, dhash long, ok boolean, err string"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload):
            try:
                _rate, ch, samples = _decode_samples(payload)
                return adhash64(samples, ch), True, None
            except (NotImplementedError, ValueError) as e:  # MediaCodecError
                return None, False, f"{type(e).__name__}: {e}"

        for pdf in batches:
            res = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "dhash": pd.array([r[0] for r in res], dtype="Int64"),
                "ok": [r[1] for r in res],
                "err": [r[2] for r in res],
            })

    return df.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(kernel, schema=out_schema)


def _dhash_bands(col: str):
    # four 16-bit slices of the 64-bit dHash — the pigeonhole keys
    # (shiftright sign-extends; the mask truncates per slice)
    return F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright(F.col(col), b * 16).bitwiseAND(0xFFFF)
                 .alias("slice"))
        for b in range(4)
    ])


def maintain_image_hash_index(base, index, metadata, id_col: str = "media_id",
                              payload_col: str = "payload",
                              checkpoint_key: str = "image_dhash_index",
                              max_commits: int | None = None) -> int:
    """Keep ``index == image_dhash(base)`` true across the media table's
    commit stream — the maintained-dedup-index pattern applied to the
    IMAGE modality, so a new image batch probes an existing 100 TB media
    corpus at batch cost (maintain each tick, then
    image_near_dups_against_index for the hygiene question). Rides
    maintained.maintain_projection: drain-and-collapse, exactly-once
    checkpoint after the index commit, crash-replay idempotent. The hash
    parameters are stamped into the index's commit metadata so probes
    can refuse a drifted hashing scheme instead of silently returning
    zero candidates (the r7-ADVICE lesson on the text index)."""
    from marmaray_spark.operators.maintained import maintain_projection
    return maintain_projection(
        base, index, metadata, [id_col, payload_col], id_col,
        lambda df: image_dhash(df, id_col, payload_col),
        checkpoint_key, max_commits,
        commit_meta={"image_hash": "dhash64", "hash_bits": "64",
                     "n_bands": "4"})


def image_near_dups_against_index(batch: DataFrame, index,
                                  id_col: str = "media_id",
                                  payload_col: str = "payload",
                                  dhash_col: str = "dhash",
                                  max_hamming: int = 3,
                                  max_bucket_width: int | None = None,
                                  bucket_stats: DataFrame | None = None,
                                  prehashed: bool = False
                                  ) -> DataFrame:
    """(new_id, index_id, hamming) for every batch image within
    ``max_hamming`` of an already-indexed image — WITHOUT re-hashing or
    shuffling the corpus. Batch-cost plan: hash the batch (one Arrow
    pass over batch payloads only), explode both sides to the four
    16-bit pigeonhole keys, semi-prune the INDEX scan by the broadcast
    batch bucket set BEFORE any join (the text-index pattern — index
    rows outside the batch's buckets are never read past the scan),
    then verify exact Hamming. Undecodable batch rows fork out of the
    probe (they are report material); identical ids on both sides (a
    re-ingested image probing its own index row) are excluded.

    ``max_bucket_width``: a saturated bucket (constant-ish images —
    black frames, letterboxing) pairs every batch row with every index
    row in it; past the cap the bucket collapses to its min-id index
    anchor, preserving "this batch image HAS an indexed near-dup" while
    capping the join at one candidate (the incdedup star-anchor guard,
    index side). ``index`` is the index TableSink (validates the
    stamped hash params) or a plain DataFrame of (id, dhash)."""
    return _media_near_dups_against_index(
        batch, index, image_dhash, "dhash64", id_col, payload_col,
        dhash_col, max_hamming, max_bucket_width, bucket_stats,
        prehashed)


def maintain_audio_hash_index(base, index, metadata, id_col: str = "media_id",
                              payload_col: str = "payload",
                              checkpoint_key: str = "audio_dhash_index",
                              max_commits: int | None = None) -> int:
    """maintain_image_hash_index's audio twin: keep ``index ==
    audio_dhash(base)`` across the media table's commit stream, envelope
    hash params stamped for drift refusal."""
    from marmaray_spark.operators.maintained import maintain_projection
    return maintain_projection(
        base, index, metadata, [id_col, payload_col], id_col,
        lambda df: audio_dhash(df, id_col, payload_col),
        checkpoint_key, max_commits,
        commit_meta={"image_hash": "adhash64", "hash_bits": "64",
                     "n_bands": "4"})


def audio_near_dups_against_index(batch: DataFrame, index,
                                  id_col: str = "media_id",
                                  payload_col: str = "payload",
                                  dhash_col: str = "dhash",
                                  max_hamming: int = 3,
                                  max_bucket_width: int | None = None,
                                  bucket_stats: DataFrame | None = None,
                                  prehashed: bool = False
                                  ) -> DataFrame:
    """image_near_dups_against_index's audio twin: batch clips decode +
    envelope-hash in one Arrow pass, probe the maintained audio index
    through the same bucket-pruned banded join."""
    return _media_near_dups_against_index(
        batch, index, audio_dhash, "adhash64", id_col, payload_col,
        dhash_col, max_hamming, max_bucket_width, bucket_stats,
        prehashed)


def media_index_bucket_stats(index_df: DataFrame,
                             id_col: str = "media_id",
                             dhash_col: str = "dhash") -> DataFrame:
    """(bk, width, anchor_b, anchor_hb) per pigeonhole bucket of a media
    hash index — one map-side-combinable aggregate over the index,
    maintainable once per maintenance cycle (the text index's
    index_bucket_stats pattern). Feeding this to a probe's
    ``bucket_stats`` replaces the per-probe Window over pruned index
    rows with a broadcast attach: measured on the 100k/10x scale
    rehearsal the probe's shuffle drops from 208k rows (window over
    pruned) to the batch-bucket-scale stats rows only."""
    return (index_df.filter(F.col(dhash_col).isNotNull())
            .select(F.col(id_col).alias("b"),
                    F.col(dhash_col).alias("hb"),
                    F.explode(_dhash_bands(dhash_col)).alias("bk"))
            .groupBy("bk")
            .agg(F.count(F.lit(1)).alias("width"),
                 F.min(F.struct("b", "hb")).alias("__a"))
            .select("bk", "width", F.col("__a.b").alias("anchor_b"),
                    F.col("__a.hb").alias("anchor_hb")))


def _media_near_dups_against_index(batch: DataFrame, index, hasher,
                                   scheme: str, id_col: str,
                                   payload_col: str, dhash_col: str,
                                   max_hamming: int,
                                   max_bucket_width: int | None,
                                   bucket_stats: DataFrame | None = None,
                                   prehashed: bool = False
                                   ) -> DataFrame:
    # one probe plan for every 64-bit media hash; `scheme` must match
    # the stamp the maintainer wrote, or the probe refuses
    if hasattr(index, "read"):
        meta = (index.log.latest_metadata() or {}) \
            if hasattr(index, "log") else {}
        stamped = meta.get("image_hash")
        if stamped is not None and stamped != scheme:
            raise ValueError(
                f"index was maintained with image_hash={stamped!r}; "
                f"this probe hashes {scheme} — rebuild or re-probe with "
                f"the matching scheme")
        idx_df = index.read()
    else:
        idx_df = index
    # prehashed: the caller already ran the hash kernel (an ingest tick
    # needs the hashes for decode-health flags anyway — hashing once per
    # tick, not per consumer, halves the batch decode cost); batch is
    # then (id, dhash, ok, ...) instead of raw payloads
    hashed = (batch if prehashed
              else hasher(batch, id_col, payload_col)).filter(F.col("ok"))
    bk = hashed.select(F.col(id_col).alias("a"),
                       F.col("dhash").alias("ha"),
                       F.explode(_dhash_bands("dhash")).alias("bk"))
    idx = (idx_df.filter(F.col(dhash_col).isNotNull())
           .select(F.col(id_col).alias("b"),
                   F.col(dhash_col).alias("hb"),
                   F.explode(_dhash_bands(dhash_col)).alias("bk")))
    # batch bucket set is batch-scale: broadcast semi-join prunes the
    # index scan without shuffling it
    bset = bk.select("bk").distinct()
    pruned = idx.join(F.broadcast(bset), "bk", "left_semi")
    if max_bucket_width is not None and bucket_stats is not None:
        # stats path (media_index_bucket_stats, maintainable): the stats
        # frame semi-prunes to the batch's buckets (batch-scale) and
        # broadcast-attaches — the hot-bucket filter costs ZERO shuffles
        # of pruned index rows. Missing buckets (indexed since the stats
        # snapshot) default to width 1 = always kept, never dropped —
        # the r7-ADVICE stale-stats lesson from the text index.
        st = bucket_stats.join(F.broadcast(bset), "bk", "left_semi")
        pruned = (pruned.join(F.broadcast(st), "bk", "left")
                  .filter((F.coalesce(F.col("width"), F.lit(1))
                           <= max_bucket_width)
                          | ((F.col("b") == F.col("anchor_b"))
                             & (F.col("hb") == F.col("anchor_hb"))))
                  .select("bk", "b", "hb"))
    elif max_bucket_width is not None:
        from pyspark.sql import Window
        w = Window.partitionBy("bk")
        sized = (pruned
                 .withColumn("__n__", F.count(F.lit(1)).over(w))
                 .withColumn("__mn__", F.min(F.struct("b", "hb")).over(w)))
        pruned = (sized.filter(
            (F.col("__n__") <= max_bucket_width)
            | ((F.col("b") == F.col("__mn__.b"))
               & (F.col("hb") == F.col("__mn__.hb"))))
            .drop("__n__", "__mn__"))
    return (pruned.join(F.broadcast(bk), "bk")
            .filter(F.col("a") != F.col("b"))
            .select("a", "b",
                    F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                    .alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def video_frame_dhash(df: DataFrame, stride: int = 1,
                      max_frames: int = 16) -> DataFrame:
    """(media_id, frame_idx, dhash, ok, err) per sampled video frame —
    sample_frames (real MJPEG-AVI / animated-GIF frame decode) composed
    with image_dhash: frames sample inside their executor, each sampled
    frame's payload hashes in the same Arrow pipeline, raw video bytes
    never shuffle. Stub-sampled frames from codec-less containers carry
    no image magic and fork ok=False like any undecodable payload."""
    frames = sample_frames(df, stride=stride, max_frames=max_frames)
    return image_dhash(frames.filter(F.col("frame_idx") >= 0),
                       id_col="media_id", payload_col="frame_payload",
                       passthrough=("frame_idx",))


def video_near_dup_pairs(frames: DataFrame, id_col: str = "media_id",
                         frame_col: str = "frame_idx",
                         dhash_col: str = "dhash", max_hamming: int = 3,
                         min_shared_frames: int = 2) -> DataFrame:
    """Clip-level near-duplicates from frame hashes: two clips are near
    dups when at least ``min_shared_frames`` DISTINCT frames of the
    earlier clip have a frame of the later clip within ``max_hamming``
    — the shot-based video dedup shape (a re-encode, watermark, or
    trim shares most frames; one coincidentally similar frame does
    not make two clips duplicates). Banded pigeonhole join over the
    frame hashes (O(frames x 4) keys, never all frame pairs), exact
    Hamming verify, then one pair-keyed aggregate. Returns (a, b,
    shared_frames, min_hamming)."""
    ok = frames.filter(F.col(dhash_col).isNotNull())
    left = ok.select(F.col(id_col).alias("a"),
                     F.col(frame_col).alias("fa"),
                     F.col(dhash_col).alias("ha"),
                     F.explode(_dhash_bands(dhash_col)).alias("bk"))
    right = ok.select(F.col(id_col).alias("b"),
                      F.col(frame_col).alias("fb"),
                      F.col(dhash_col).alias("hb"),
                      F.explode(_dhash_bands(dhash_col)).alias("bk"))
    matched = (left.join(right, (left["bk"] == right["bk"])
                         & (F.col("a") < F.col("b")))
               .drop("bk")
               .withColumn("hamming", F.bit_count(
                   F.col("ha").bitwiseXOR(F.col("hb"))))
               .filter(F.col("hamming") <= max_hamming)
               .select("a", "b", "fa", "fb", "hamming")
               .distinct())
    return (matched.groupBy("a", "b")
            .agg(F.countDistinct("fa").alias("shared_frames"),
                 F.min("hamming").alias("min_hamming"))
            .filter(F.col("shared_frames") >= min_shared_frames))


FRAME_SAMPLE_SCHEMA = "media_id {id}, frame_idx int, frame_payload binary"


def sample_frames(df: DataFrame, every_n_bytes: int = 64,
                  stride: int = 1, max_frames: int = 16) -> DataFrame:
    """Frame sampler with the 1->N batch fan-out shape under mapInPandas.

    REAL for MJPEG AVI containers (functions/avi_codec.py walks the
    RIFF chunk tree; each sampled frame's payload is its independent
    baseline JPEG, decodable by functions/jpeg_codec.py) and for
    animated GIFs (functions/gif_codec.py composites frames; each
    sampled frame re-encodes as PNG, the lossless in-env format).
    ``stride`` keeps every stride-th frame up to ``max_frames``. Other
    containers fall back to the deterministic byte-slice stub so the
    pipeline shape stays testable with codec-less payloads."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from marmaray_spark.functions.avi_codec import (decode_avi_frames,
                                                        looks_like_avi,
                                                        parse_avi)
        from marmaray_spark.functions.gif_codec import decode_gif_frames
        from marmaray_spark.functions.media_codec import encode_png

        def one(mid, payload) -> list:
            rows = []
            # NULL payload is legal per MEDIA_SCHEMA: emit the corrupt-
            # container marker row instead of letting bytes(None) kill
            # the task (the per-row decode-or-error contract)
            if payload is None:
                return [(mid, -1, None)]
            p = bytes(payload)
            try:
                if looks_like_avi(p[:12]):
                    raw = parse_avi(p)["frames"]
                    for idx, f in enumerate(raw[::max(stride, 1)][:max_frames]):
                        rows.append((mid, idx, f))          # JPEG bytes
                    return rows
                if p[:6] in (b"GIF87a", b"GIF89a"):
                    frames = decode_gif_frames(p, max_frames * max(stride, 1))
                    for idx, f in enumerate(
                            frames[::max(stride, 1)][:max_frames]):
                        rows.append((mid, idx, encode_png(f)))
                    return rows
            except (NotImplementedError, ValueError):   # MediaCodecError is a ValueError
                # decode-or-error: a corrupt container yields one
                # frame_idx=-1 marker row, never a dead task
                return [(mid, -1, None)]
            for idx, start in enumerate(range(0, len(p), every_n_bytes)):
                rows.append((mid, idx, p[start:start + every_n_bytes]))
            return rows

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rows.extend(one(mid, payload))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame_payload"])

    cols = df.filter(F.col("media_type") == "video").select("media_id", "payload")
    id_type = df.schema["media_id"].dataType.simpleString()
    return cols.mapInPandas(
        kernel, schema=FRAME_SAMPLE_SCHEMA.format(id=id_type))
