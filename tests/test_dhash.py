"""Image perceptual-hash near-dup: dHash kernel + banded Hamming join.

The image leg of the dedup family — real pixels through the pure-Python
codecs (functions/media_codec.py), integer dHash (operators/multimodal.py
dhash64), and the generalized pigeonhole banding shared with the text
SimHash path (operators/dedup.py simhash_banded_near_dup at
hash_bits=64)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from marmaray_spark.functions.media_codec import encode_bmp
from marmaray_spark.operators.multimodal import (_decode_pixels,
                                                 dhash64,
                                                 dhash_near_dup_pairs,
                                                 image_dhash)


def _gradient(w=63, h=48, reverse=False, dark_block=None):
    """Horizontal gradient test image; optionally darken one 9x8 grid
    block (r, c) to flip a known pair of dHash bits."""
    x = np.arange(w, dtype=np.int64)
    if reverse:
        x = x[::-1]
    row = np.clip(x * 230 // max(w - 1, 1), 0, 240).astype(np.uint8)
    px = np.repeat(row[None, :, None], h, axis=0)
    px = np.repeat(px, 3, axis=2).copy()
    if dark_block is not None:
        r, c = dark_block
        y0, y1 = (r * h) // 8, ((r + 1) * h) // 8
        x0, x1 = (c * w) // 9, ((c + 1) * w) // 9
        px[y0:y1, x0:x1, :] = 0
    return px


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (1, encode_bmp(_gradient())),                      # base
        (2, encode_bmp(np.clip(_gradient().astype(np.int64) + 5, 0, 255)
                       .astype(np.uint8))),                # brightness shift
        (3, encode_bmp(_gradient(dark_block=(2, 4)))),     # one block edited
        (4, encode_bmp(_gradient(reverse=True))),          # structural change
        (5, b"BM" + b"\x00" * 10),                         # corrupt BMP
        (6, b"just some text bytes, no image magic"),      # undecodable
    ]
    return spark.createDataFrame(rows, ["media_id", "payload"])


def test_dhash_kernel_matches_driver_side(spark, images):
    got = {r["media_id"]: r for r in image_dhash(images).collect()}
    rows = {r["media_id"]: r["payload"] for r in images.collect()}
    for mid in (1, 2, 3, 4):
        want = dhash64(_decode_pixels(bytes(rows[mid])))
        assert got[mid]["ok"] and got[mid]["dhash"] == want, mid


def test_dhash_invariance_and_sensitivity(spark, images):
    got = {r["media_id"]: r["dhash"] for r in
           image_dhash(images).filter("ok").collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    # uniform brightness shift preserves every left>right comparison
    assert ham(got[1], got[2]) == 0
    # one edited grid block flips only its neighbor-pair bits
    assert 1 <= ham(got[1], got[3]) <= 3
    # reversing the gradient flips (nearly) every bit
    assert ham(got[1], got[4]) > 32


def test_dhash_corrupt_payloads_fork_not_kill(spark, images):
    got = {r["media_id"]: r for r in image_dhash(images).collect()}
    assert len(got) == 6
    for mid in (5, 6):
        assert got[mid]["ok"] is False
        assert got[mid]["dhash"] is None
        assert got[mid]["err"]


def test_dhash_near_dup_pairs_end_to_end(spark, images):
    hashes = image_dhash(images)
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             dhash_near_dup_pairs(hashes, "media_id").collect()}
    # 1-2-3 mutually near; 4 structurally different; 5/6 null-forked
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] >= 1


def _noise(seed=7, w=63, h=48):
    """Deterministic blocky noise — far from any gradient in dHash."""
    rng = np.random.default_rng(seed)
    grid = rng.integers(0, 256, size=(8, 9), dtype=np.int64)
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for r in range(8):
        for c in range(9):
            px[(r * h) // 8:((r + 1) * h) // 8,
               (c * w) // 9:((c + 1) * w) // 9, :] = grid[r, c]
    return px


def test_maintained_image_hash_index_and_probe(spark, tmp_path):
    """The maintained image-hash index tracks ingest + update through the
    commit stream (index == image_dhash(base) after every tick), stamps
    its hash params, and the batch probe finds near-dups against it at
    batch cost — excluding re-ingested identical ids."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.multimodal import (
        image_near_dups_against_index, maintain_image_hash_index)
    from marmaray_spark.sinks.table import TableSink, WriteOp

    def frame(rows):
        return spark.createDataFrame(rows, "media_id long, payload binary")

    base = TableSink(spark, tmp_path / "media", "media_id")
    index = TableSink(spark, tmp_path / "idx", "media_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    base.write(frame([(1, encode_bmp(_gradient())),
                      (2, encode_bmp(_noise(seed=7)))]), WriteOp.INSERT)
    assert maintain_image_hash_index(base, index, md) == 2
    want = {r["media_id"]: r["dhash"]
            for r in image_dhash(base.read()).collect()}
    got = {r["media_id"]: r["dhash"] for r in index.read().collect()}
    assert got == want
    assert index.log.latest_metadata().get("image_hash") == "dhash64"

    # probe: 10 = brightness-shifted copy of 1; 11 = fresh noise;
    # 12 = corrupt (forks out); 1 = re-ingest of an indexed id (excluded)
    batch = frame([
        (10, encode_bmp(np.clip(_gradient().astype(np.int64) + 4, 0, 255)
                        .astype(np.uint8))),
        (11, encode_bmp(_noise(seed=99))),
        (12, b"BM" + b"\x01" * 8),
        (1, encode_bmp(_gradient())),
    ])
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             image_near_dups_against_index(batch, index).collect()}
    assert pairs == {(10, 1): 0}

    # UPDATE: image 2's pixels change -> exactly one row re-projected,
    # index stays == projection(base)
    base.write(frame([(2, encode_bmp(_gradient(dark_block=(3, 3))))]),
               WriteOp.UPSERT)
    assert maintain_image_hash_index(base, index, md) == 1
    want2 = {r["media_id"]: r["dhash"]
             for r in image_dhash(base.read()).collect()}
    got2 = {r["media_id"]: r["dhash"] for r in index.read().collect()}
    assert got2 == want2 and got2[2] != got[2]


def test_image_probe_hot_bucket_anchor_and_param_drift(spark, tmp_path):
    """A saturated index bucket collapses to its min-id anchor under the
    cap (one pair, not W); a drifted hash stamp makes the probe refuse
    instead of silently missing everything."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.maintained import maintain_projection
    from marmaray_spark.operators.multimodal import (
        image_near_dups_against_index, maintain_image_hash_index)
    from marmaray_spark.sinks.table import TableSink, WriteOp

    def frame(rows):
        return spark.createDataFrame(rows, "media_id long, payload binary")

    base = TableSink(spark, tmp_path / "media", "media_id")
    index = TableSink(spark, tmp_path / "idx", "media_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    payload = encode_bmp(_gradient())
    base.write(frame([(100 + i, payload) for i in range(20)]),
               WriteOp.INSERT)
    assert maintain_image_hash_index(base, index, md) == 20

    batch = frame([(50, payload)])
    capped = {(r["a"], r["b"]) for r in image_near_dups_against_index(
        batch, index, max_bucket_width=5).collect()}
    assert capped == {(50, 100)}          # the min-id anchor, once
    full = {(r["a"], r["b"]) for r in image_near_dups_against_index(
        batch, index).collect()}
    assert len(full) == 20                # uncapped: every copy pairs

    # drift refusal: an index committed under a different hash scheme
    other = TableSink(spark, tmp_path / "idx2", "media_id")
    md2 = FileSystemMetadataManager(str(tmp_path / "md2"))
    maintain_projection(
        base, other, md2, ["media_id", "payload"], "media_id",
        lambda df: image_dhash(df, "media_id", "payload"),
        "drifted", commit_meta={"image_hash": "phash9000"})
    with pytest.raises(ValueError, match="dhash64"):
        image_near_dups_against_index(batch, other)


def _vframe(seed, w=48, h=32):
    """Video test frame: per-row rolled permutation of 9 well-separated
    gray levels — adjacent dHash grid cells always differ by >= 28, so
    the hash is stable under JPEG round-trip noise and small brightness
    shifts, while different seeds scatter it."""
    rng = np.random.default_rng(seed)
    vals = rng.permutation(9).astype(np.int64) * 28 + 8
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for r in range(8):
        row = np.roll(vals, r)
        for c in range(9):
            px[(r * h) // 8:((r + 1) * h) // 8,
               (c * w) // 9:((c + 1) * w) // 9, :] = row[c]
    return px


def test_video_near_dup_via_frame_hashes(spark):
    """Clip near-dup from sampled-frame dHashes over REAL MJPEG-AVI
    decode: a re-encoded brightness-shifted copy shares its frames; a
    different clip shares none; one coincidental frame does not pair
    two clips at min_shared_frames=2."""
    from marmaray_spark.functions.avi_codec import encode_avi_mjpeg
    from marmaray_spark.functions.jpeg_codec import encode_jpeg
    from marmaray_spark.operators.multimodal import (video_frame_dhash,
                                                     video_near_dup_pairs)

    def avi(frames):
        return encode_avi_mjpeg(
            [encode_jpeg(f, quality=90) for f in frames], 48, 32)

    f = [_vframe(s) for s in (1, 2, 3, 4, 5, 6, 7, 8)]
    shift = [np.clip(x.astype(np.int64) + 4, 0, 255).astype(np.uint8)
             for x in f[:4]]
    rows = [
        (1, "video", avi(f[:4])),              # base clip
        (2, "video", avi(shift + [f[4]])),     # re-encode + extra frame
        (3, "video", avi(f[5:8])),             # unrelated clip
        (4, "video", avi([f[0], _vframe(20), _vframe(21)])),
        # ^ exactly ONE frame in common with clip 1, none with clip 3
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, "
                                     "payload binary")
    hashed = video_frame_dhash(df)
    per_clip = {r["media_id"]: r["n"] for r in
                hashed.filter("ok").groupBy("media_id")
                .agg(F.count("*").alias("n")).collect()}
    assert per_clip == {1: 4, 2: 5, 3: 3, 4: 3}

    pairs = {(r["a"], r["b"]): r for r in
             video_near_dup_pairs(hashed, min_shared_frames=2).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)]["shared_frames"] == 4
    # the single-common-frame pair appears at threshold 1, not 2
    loose = {(r["a"], r["b"]) for r in
             video_near_dup_pairs(hashed, min_shared_frames=1).collect()}
    assert (1, 4) in loose and (1, 2) in loose and (1, 3) not in loose


def _clip(env, seed=3, frame=400):
    """Deterministic waveform: seeded noise shaped by an amplitude
    envelope (one entry per frame of `frame` samples)."""
    rng = np.random.default_rng(seed)
    noise = rng.integers(-1000, 1001, size=frame * len(env)).astype(np.int64)
    amp = np.repeat(np.asarray(env, dtype=np.int64), frame)
    return np.clip(noise * amp // 100, -32768, 32767).astype(np.int16)


def test_audio_dhash_envelope_invariance_and_pairs(spark):
    """Volume scaling keeps the envelope hash identical; a re-shaped
    envelope scatters it; short/corrupt clips fork. The audio leg rides
    the same banded pairing as images."""
    from marmaray_spark.functions.media_codec import encode_wav_pcm16
    from marmaray_spark.operators.multimodal import (adhash64, audio_dhash,
                                                     dhash_near_dup_pairs)

    env = [(i * 37) % 100 + 5 for i in range(80)]        # varied envelope
    a = _clip(env)
    b = (a.astype(np.int64) * 7 // 10).astype(np.int16)  # volume down
    env_edit = list(env)
    env_edit[10] = 1          # dropout: flips both neighbor comparisons
    c = _clip(env_edit)
    d = _clip(list(reversed(env)))                       # re-shaped
    rows = [
        (1, encode_wav_pcm16(a, 16000)),
        (2, encode_wav_pcm16(b, 16000)),
        (3, encode_wav_pcm16(c, 16000)),
        (4, encode_wav_pcm16(d, 16000)),
        (5, encode_wav_pcm16(np.zeros(10, dtype=np.int16), 16000)),  # short
        (6, b"RIFF" + b"\x00" * 8),                                  # corrupt
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_dhash(df).collect()}
    assert got[5]["ok"] is False and got[6]["ok"] is False
    h = {k: r["dhash"] for k, r in got.items() if r["ok"]}
    # kernel == driver-side hash
    from marmaray_spark.operators.multimodal import _decode_samples
    rate, ch, s = _decode_samples(rows[0][1])
    assert h[1] == adhash64(s, ch)

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(h[1], h[2]) == 0                  # volume-invariant
    assert 1 <= ham(h[1], h[3]) <= 3             # one envelope edit
    assert ham(h[1], h[4]) > 20                  # different shape
    pairs = {(r["a"], r["b"]) for r in
             dhash_near_dup_pairs(audio_dhash(df), "media_id").collect()}
    assert (1, 2) in pairs and (1, 3) in pairs and (1, 4) not in pairs


def test_dhash64_channel_shapes():
    """Gray, gray+alpha (PNG type 4 / PIL 'LA') and RGB arrays all hash;
    the 2-channel case used to raise IndexError past the decode-or-error
    fork. Gray and LA agree (alpha is not luma)."""
    g = _gradient()[:, :, 0]
    h_gray = dhash64(g)
    la = np.stack([g, np.full_like(g, 255)], axis=2)
    assert dhash64(la) == h_gray
    assert dhash64(_gradient()) == h_gray   # equal-channel RGB == gray


def test_maintained_audio_hash_index_and_probe(spark, tmp_path):
    """The audio twins: maintained envelope-hash index + batch probe,
    sharing the generalized probe plan; an image-scheme index refuses an
    audio probe (scheme stamp mismatch)."""
    from marmaray_spark.functions.media_codec import encode_wav_pcm16
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.multimodal import (
        audio_dhash, audio_near_dups_against_index,
        maintain_audio_hash_index, maintain_image_hash_index)
    from marmaray_spark.sinks.table import TableSink, WriteOp

    def frame(rows):
        return spark.createDataFrame(rows, "media_id long, payload binary")

    env = [(i * 41) % 90 + 10 for i in range(80)]
    a = _clip(env, seed=5)
    base = TableSink(spark, tmp_path / "audio", "media_id")
    index = TableSink(spark, tmp_path / "aidx", "media_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    base.write(frame([
        (1, encode_wav_pcm16(a, 16000)),
        (2, encode_wav_pcm16(_clip(list(reversed(env)), seed=5), 16000)),
    ]), WriteOp.INSERT)
    assert maintain_audio_hash_index(base, index, md) == 2
    assert index.log.latest_metadata().get("image_hash") == "adhash64"
    got = {r["media_id"]: r["dhash"] for r in index.read().collect()}
    want = {r["media_id"]: r["dhash"]
            for r in audio_dhash(base.read()).collect()}
    assert got == want

    louder = (a.astype(np.int64) * 13 // 10).astype(np.int16)
    batch = frame([(10, encode_wav_pcm16(louder, 16000))])
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             audio_near_dups_against_index(batch, index).collect()}
    assert pairs == {(10, 1): 0}

    # an IMAGE index refuses the audio probe
    img_base = TableSink(spark, tmp_path / "media", "media_id")
    img_idx = TableSink(spark, tmp_path / "iidx", "media_id")
    md2 = FileSystemMetadataManager(str(tmp_path / "md2"))
    img_base.write(frame([(5, encode_bmp(_gradient()))]), WriteOp.INSERT)
    maintain_image_hash_index(img_base, img_idx, md2)
    with pytest.raises(ValueError, match="adhash64"):
        audio_near_dups_against_index(batch, img_idx)


def test_image_quality_gates(spark):
    """Resolution / aspect / byte-density gates over the single feature
    pass: a tiny image, a banner aspect, and a JPEG-compressed
    near-constant image each fail their own rule; a normal image and a
    decode failure behave as documented."""
    from marmaray_spark.functions.jpeg_codec import encode_jpeg
    from marmaray_spark.operators.multimodal import (extract_image_features,
                                                     image_quality_gates)

    # big enough that entropy-coded content, not headers, sets byte_len
    flat = np.full((512, 512, 3), 128, dtype=np.uint8)
    rows = [
        (1, "image", encode_bmp(_gradient(w=96, h=64))),   # fine
        (2, "image", encode_bmp(_gradient(w=16, h=16))),   # too small
        (3, "image", encode_bmp(_gradient(w=640, h=64))),  # banner 10:1
        (4, "image", encode_jpeg(flat, quality=75)),       # near-constant
        (5, "image", b"BM\x00broken"),                     # decode fail
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, "
                                     "payload binary")
    got = {r["media_id"]: r for r in
           image_quality_gates(extract_image_features(df)).collect()}
    assert got[1]["gate_pass"]
    assert not got[2]["res_ok"] and not got[2]["gate_pass"]
    assert not got[3]["aspect_ok"] and got[3]["res_ok"]
    assert not got[4]["density_ok"] and got[4]["aspect_ok"]
    assert not got[5]["ok"] and not got[5]["gate_pass"]


def test_leakage_safe_splits_over_image_components(spark):
    """The text-side leakage-safe split machinery is modality-agnostic:
    image near-dup pairs -> connected components -> every member of a
    perceptual-duplicate group lands in the SAME train/val/test split."""
    from marmaray_spark.operators.dedup import (connected_components,
                                                leakage_safe_splits)
    from marmaray_spark.operators.multimodal import (dhash_near_dup_pairs,
                                                     image_dhash)

    variants = [np.clip(_gradient().astype(np.int64) + k, 0, 255)
                .astype(np.uint8) for k in (0, 2, 4)]
    rows = ([(i + 1, encode_bmp(v)) for i, v in enumerate(variants)]
            + [(10 + i, encode_bmp(_noise(seed=40 + i))) for i in range(6)])
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = image_dhash(df)
    pairs = dhash_near_dup_pairs(hashed, "media_id")
    comps = connected_components(pairs)
    labeled = hashed.join(
        comps.withColumnRenamed("node", "media_id"), "media_id", "left") \
        .withColumn("component", F.coalesce("component", "media_id"))
    split = {r["media_id"]: r["split"] for r in leakage_safe_splits(
        labeled, "component").collect()}
    assert len(split) == 9
    assert split[1] == split[2] == split[3]   # the whole dup group moves
    assert len(set(split.values())) > 1       # singletons still spread


def test_banded_64bit_equals_pairwise_including_sign_bit(spark):
    """The generalized banding (hash_bits=64, four 16-bit slices) finds
    exactly the pairwise hamming<=3 set, including hashes with the sign
    bit set (shiftright sign-extension is masked per slice)."""
    import random

    from marmaray_spark.operators.dedup import simhash_banded_near_dup

    rng = random.Random(64)
    base = [rng.getrandbits(64) for _ in range(30)]
    vals = list(base)
    for h in base[:10]:                       # plant near-dups
        flips = rng.sample(range(64), rng.randrange(0, 4))
        v = h
        for b in flips:
            v ^= 1 << b
        vals.append(v)
    vals = [v - (1 << 64) if v >= 1 << 63 else v for v in vals]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["id", "h"])
    got = {(r["a"], r["b"]) for r in simhash_banded_near_dup(
        df, "id", "h", max_hamming=3, hash_bits=64, n_bands=4).collect()}
    want = set()
    for i, vi in rows:
        for j, vj in rows:
            if i < j and bin((vi ^ vj) & ((1 << 64) - 1)).count("1") <= 3:
                want.add((i, j))
    assert got == want and len(want) >= 8


def test_image_probe_bucket_stats_path_equals_window_path(spark, tmp_path):
    """The maintainable bucket-stats path (broadcast attach, zero
    pruned-row shuffle) returns exactly the window path's pairs, and
    STALE stats can't hide freshly-indexed images (missing bucket =>
    width 1 => kept) — the text index's r7-ADVICE lesson."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.multimodal import (
        image_near_dups_against_index, maintain_image_hash_index,
        media_index_bucket_stats)
    from marmaray_spark.sinks.table import TableSink, WriteOp

    def frame(rows):
        return spark.createDataFrame(rows, "media_id long, payload binary")

    base = TableSink(spark, tmp_path / "media", "media_id")
    index = TableSink(spark, tmp_path / "idx", "media_id")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    hot = encode_bmp(_gradient())
    base.write(frame([(100 + i, hot) for i in range(20)]
                     + [(200, encode_bmp(_noise(seed=1)))]),
               WriteOp.INSERT)
    maintain_image_hash_index(base, index, md)
    stats = media_index_bucket_stats(index.read())

    batch = frame([(50, hot), (51, encode_bmp(_noise(seed=1)))])
    via_window = {(r["a"], r["b"], r["hamming"]) for r in
                  image_near_dups_against_index(
                      batch, index, max_bucket_width=5).collect()}
    via_stats = {(r["a"], r["b"], r["hamming"]) for r in
                 image_near_dups_against_index(
                     batch, index, max_bucket_width=5,
                     bucket_stats=stats).collect()}
    assert via_stats == via_window
    assert (50, 100, 0) in via_stats and (51, 200, 0) in via_stats

    # stale stats: a NEW image indexed after the snapshot is still found
    base.write(frame([(300, encode_bmp(_noise(seed=2)))]), WriteOp.INSERT)
    maintain_image_hash_index(base, index, md)
    fresh_probe = frame([(60, encode_bmp(_noise(seed=2)))])
    found = {(r["a"], r["b"]) for r in image_near_dups_against_index(
        fresh_probe, index, max_bucket_width=5,
        bucket_stats=stats).collect()}
    assert (60, 300) in found


def test_dhash_brightness_shift_invariance_is_exact():
    """The brightness-shift theorem, property-tested: for ANY image and
    any uniform shift that stays inside [0, 255], every dHash bit is
    stable — block means shift exactly ((sum + k*size) // size ==
    sum // size + k), so no left>right comparison can flip."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(seed=st.integers(min_value=0, max_value=10_000),
           w=st.integers(min_value=1, max_value=40),
           h=st.integers(min_value=1, max_value=40),
           k=st.integers(min_value=1, max_value=50))
    def prop(seed, w, h, k):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256 - k, size=(h, w, 3)).astype(np.uint8)
        assert dhash64(px) == dhash64((px.astype(np.int64) + k)
                                      .astype(np.uint8))

    prop()


def test_audio_quality_gates(spark):
    """Duration / RMS / rate gates over the one audio feature pass: a
    blip, a silent clip, a clipped-loud clip and a low-rate clip each
    fail their own rule; stub-decoded payloads (no real sample decode)
    fail the RMS rule by construction."""
    from marmaray_spark.functions.media_codec import encode_wav_pcm16
    from marmaray_spark.operators.multimodal import (audio_quality_gates,
                                                     extract_audio_features)

    env = [(i * 37) % 80 + 10 for i in range(80)]
    good = _clip(env, frame=400)                          # 2s at 16 kHz
    rows = [
        (1, "audio", encode_wav_pcm16(good, 16000)),
        (2, "audio", encode_wav_pcm16(good[:1600], 16000)),   # 0.1s blip
        (3, "audio", encode_wav_pcm16(
            np.zeros(32000, dtype=np.int16), 16000)),         # silence
        (4, "audio", encode_wav_pcm16(
            np.full(32000, 32000, dtype=np.int16), 16000)),   # clipped/DC
        (5, "audio", encode_wav_pcm16(good, 4000)),           # low rate
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, "
                                     "payload binary")
    got = {r["media_id"]: r for r in
           audio_quality_gates(extract_audio_features(df)).collect()}
    assert got[1]["gate_pass"]
    assert not got[2]["dur_ok"] and not got[2]["gate_pass"]
    assert not got[3]["rms_ok"] and got[3]["dur_ok"]
    assert not got[4]["rms_ok"]
    assert not got[5]["rate_ok"] and got[5]["rms_ok"]


def test_media_feature_schemas_follow_string_id(spark):
    """extract_image_features / extract_audio_features / resize_images /
    sample_frames derive the media_id OUTPUT type from the input frame —
    a string-id media table (reachable straight from the YAML media.*
    block, which aliases an arbitrary id_col with no cast) must flow
    through without a mid-run Arrow conversion error."""
    from marmaray_spark.functions.media_codec import encode_wav_pcm16
    from marmaray_spark.operators.multimodal import (extract_audio_features,
                                                     extract_image_features,
                                                     resize_images,
                                                     sample_frames)

    rows = [
        ("img-a", "image", encode_bmp(_gradient())),
        ("aud-b", "audio", encode_wav_pcm16(
            np.array([0, 1000] * 400, dtype=np.int16), 8000)),
        ("vid-c", "video", b"\x01\x02" * 80),
    ]
    df = spark.createDataFrame(
        rows, "media_id string, media_type string, payload binary")

    feats = extract_image_features(df)
    assert dict(feats.dtypes)["media_id"] == "string"
    assert [r["media_id"] for r in feats.collect()] == ["img-a"]

    af = extract_audio_features(df)
    assert dict(af.dtypes)["media_id"] == "string"
    a = af.collect()[0]
    assert a["media_id"] == "aud-b" and a["ok"] and a["sample_rate"] == 8000

    rz = resize_images(df, 8, 8)
    assert dict(rz.dtypes)["media_id"] == "string"
    assert rz.collect()[0]["media_id"] == "img-a"

    fr = sample_frames(df, every_n_bytes=32)
    assert dict(fr.dtypes)["media_id"] == "string"
    assert {r["media_id"] for r in fr.collect()} == {"vid-c"}


def test_sample_frames_null_payload_forks_not_kills(spark):
    """NULL payload is legal per MEDIA_SCHEMA: sample_frames must emit
    the frame_idx=-1 marker row for it (the per-row decode-or-error
    contract), not die in bytes(None)."""
    from marmaray_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, "video", None), (2, "video", b"\x07" * 100)],
        "media_id long, media_type string, payload binary")
    rows = sample_frames(df, every_n_bytes=64).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert [(r["frame_idx"], r["frame_payload"]) for r in by_id[1]] \
        == [(-1, None)]
    assert all(r["frame_idx"] >= 0 for r in by_id[2]) and len(by_id[2]) == 2


def test_synth_media_hashes_match_closed_form(spark):
    """synth_gradient_bmp / synth_tone_wav payloads hash (through the
    REAL encode -> decode -> hash kernels) to the same integers as the
    pure closed-form mirror — the arithmetic the DuckDB oracle of
    multimodal_features' dhash/adhash sections re-implements in SQL."""
    from marmaray_spark.operators.multimodal import (audio_dhash,
                                                     image_dhash,
                                                     synth_gradient_bmp,
                                                     synth_tone_wav)

    def mirror_dhash(i, nv=8):
        g, k = i // nv, i % nv

        def vv(x, y):
            if x // 2 == k and y // 2 == k:
                return 0
            return (g * (x + 1) + 7 * y) % 251

        grid = [[(vv(2 * c, 2 * r) + vv(2 * c + 1, 2 * r)
                  + vv(2 * c, 2 * r + 1) + vv(2 * c + 1, 2 * r + 1)) // 4
                 for c in range(9)] for r in range(8)]
        bits = 0
        for r in range(8):
            for c in range(8):
                bits = (bits << 1) | (1 if grid[r][c] > grid[r][c + 1] else 0)
        return bits - (1 << 64 if bits >= 1 << 63 else 0)

    def mirror_adhash(i, nv=8):
        g, k = i // nv, i % nv
        s = [(g * (j + 1) * 37 + 13 * k) % 1999 for j in range(130)]
        e = [(s[2 * q] + s[2 * q + 1]) // 2 for q in range(65)]
        bits = 0
        for q in range(64):
            bits = (bits << 1) | (1 if e[q] > e[q + 1] else 0)
        return bits - (1 << 64 if bits >= 1 << 63 else 0)

    ids = spark.range(40).withColumnRenamed("id", "doc_id")
    ih = image_dhash(synth_gradient_bmp(ids, "doc_id")).collect()
    assert all(r["ok"] for r in ih) and len(ih) == 40
    assert {r["media_id"]: r["dhash"] for r in ih} \
        == {i: mirror_dhash(i) for i in range(40)}
    ah = audio_dhash(synth_tone_wav(ids, "doc_id")).collect()
    assert all(r["ok"] for r in ah) and len(ah) == 40
    assert {r["media_id"]: r["dhash"] for r in ah} \
        == {i: mirror_adhash(i) for i in range(40)}


def test_synth_gif_video_hashes_match_closed_form(spark):
    """synth_gif_video payloads, through the REAL GIF decode -> frame
    sample -> PNG re-encode -> hash chain, match the pure closed-form
    mirror the DuckDB video_dhash oracle re-implements."""
    from marmaray_spark.operators.multimodal import (synth_gif_video,
                                                     video_frame_dhash)

    def mirror(i, f, nv=8):
        g, k = i // nv, i % nv

        def vv(x, y):
            if x // 2 == k and y // 2 == k:
                return 0
            return (g * (x + 1) + 7 * y + 11 * f) % 251

        grid = [[(vv(2 * c, 2 * r) + vv(2 * c + 1, 2 * r)
                  + vv(2 * c, 2 * r + 1) + vv(2 * c + 1, 2 * r + 1)) // 4
                 for c in range(9)] for r in range(8)]
        bits = 0
        for r in range(8):
            for c in range(8):
                bits = (bits << 1) | (1 if grid[r][c] > grid[r][c + 1] else 0)
        return bits - (1 << 64 if bits >= 1 << 63 else 0)

    ids = spark.range(24).withColumnRenamed("id", "doc_id")
    vf = video_frame_dhash(synth_gif_video(ids, "doc_id", n_frames=3),
                           max_frames=3).collect()
    assert all(r["ok"] for r in vf) and len(vf) == 72
    got = {(r["media_id"], r["frame_idx"]): r["dhash"] for r in vf}
    assert got == {(i, f): mirror(i, f) for i in range(24) for f in range(3)}
