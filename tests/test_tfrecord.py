"""TFRecord shards (operators/shard.py write/read_tfrecord_shards +
functions/tfrecord_codec.py): wire-format golden bytes, CRC vectors,
write->read round-trip, reproducibility, torn-shard failure."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from marmaray_spark.functions.tfrecord_codec import (crc32c, decode_example,
                                                     encode_example,
                                                     frame_record,
                                                     iter_records, masked_crc)
from marmaray_spark.operators.shard import (read_tfrecord_shards,
                                            write_tfrecord_shards)


def test_crc32c_known_vectors():
    # RFC 3720 appendix B / the classic check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_example_golden_bytes_and_roundtrip():
    """Canonical encoding pinned byte-for-byte (sorted keys, packed
    numeric lists, 64-bit two's-complement negatives)."""
    ex = encode_example({"text": b"hi", "n": [3, -1], "score": [0.5]})
    assert ex.hex() == (
        "0a390a140a016e120f1a0d0a0b03ffffffffffffffffff01"
        "0a110a0573636f7265120812060a040000003f"
        "0a0e0a047465787412060a040a026869")
    assert decode_example(ex) == {"text": [b"hi"], "n": [3, -1],
                                  "score": [0.5]}
    # framing round-trip + torn-record detection
    stream = frame_record(ex) + frame_record(encode_example({"a": [1]}))
    recs = [decode_example(p) for p in iter_records(stream)]
    assert recs[1] == {"a": [1]}
    torn = bytearray(stream)
    torn[20] ^= 0xFF
    with pytest.raises(ValueError, match="crc mismatch"):
        list(iter_records(bytes(torn)))
    # mask formula spot-check against the TF definition
    c = crc32c(b"abc")
    assert masked_crc(b"abc") == (((c >> 15) | (c << 17))
                                  + 0xA282EAD8) & 0xFFFFFFFF


def _df(spark):
    rows = [(i, f"doc {i} text", bytes([i % 256]) * (10 + i),
             [i, i * 2], float(i) / 4) for i in range(20)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, payload binary, "
              "toks array<bigint>, w double")


FEATS = {"text": "text", "payload": "payload", "toks": "toks", "w": "w"}


def test_tfrecord_write_read_roundtrip(spark, tmp_path):
    df = _df(spark)
    man = write_tfrecord_shards(df, str(tmp_path), "doc_id", FEATS,
                                tokens_col=None, budget_tokens=200)
    assert man["total_docs"] == 20 and man["n_shards"] > 1
    back = read_tfrecord_shards(spark, str(tmp_path))
    got = {int(r["key"]): r for r in back.collect()}
    assert len(got) == 20
    for r in df.collect():
        b = got[r["doc_id"]]
        assert b["text"] == r["text"]
        assert bytes(b["payload"]) == bytes(r["payload"])
        assert list(b["toks"]) == list(r["toks"])
        # float features are float32 by proto spec
        assert abs(b["w"] - r["w"]) < 1e-6
    # shard column matches the manifest's assignment
    per_shard = back.groupBy("shard").count().collect()
    assert {r["shard"] for r in per_shard} \
        == {s["shard"] for s in man["shards"]}


def test_tfrecord_bytes_reproducible(spark, tmp_path):
    def digest(p):
        out = {}
        d = os.path.join(p, "data")
        for f in sorted(os.listdir(d)):
            if f.endswith(".tfrecord"):
                out[f] = hashlib.md5(
                    open(os.path.join(d, f), "rb").read()).hexdigest()
        return out

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_tfrecord_shards(_df(spark), a, "doc_id", FEATS,
                          budget_tokens=200)
    write_tfrecord_shards(_df(spark).repartition(7), b, "doc_id", FEATS,
                          budget_tokens=200)
    assert digest(a) == digest(b) and digest(a)


def test_tfrecord_null_feature_and_validation(spark, tmp_path):
    rows = [(1, "has text", None), (2, None, b"\x01\x02")]
    df = spark.createDataFrame(rows,
                               "doc_id long, text string, payload binary")
    write_tfrecord_shards(df, str(tmp_path), "doc_id",
                          {"text": "text", "payload": "payload"},
                          budget_tokens=1000)
    got = {int(r["key"]): r for r in
           read_tfrecord_shards(spark, str(tmp_path)).collect()}
    assert got[1]["text"] == "has text" and got[1]["payload"] is None
    assert got[2]["text"] is None and bytes(got[2]["payload"]) == b"\x01\x02"

    with pytest.raises(ValueError, match="unsupported column type"):
        write_tfrecord_shards(
            df.withColumn("s", F.struct("doc_id")), str(tmp_path / "x"),
            "doc_id", {"s": "s"})
    with pytest.raises(ValueError, match="bad feature name"):
        write_tfrecord_shards(df, str(tmp_path / "y"), "doc_id",
                              {"__key__": "text"})


def test_tfrecord_torn_shard_fails_the_read(spark, tmp_path):
    write_tfrecord_shards(_df(spark), str(tmp_path), "doc_id",
                          {"text": "text"}, budget_tokens=10_000)
    d = os.path.join(str(tmp_path), "data")
    fname = next(f for f in os.listdir(d) if f.endswith(".tfrecord"))
    p = os.path.join(d, fname)
    blob = bytearray(open(p, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    with pytest.raises(Exception, match="crc mismatch"):
        read_tfrecord_shards(spark, str(tmp_path)).collect()


def test_tfrecord_rerun_sweeps_stale_shards(spark, tmp_path):
    """Re-run with fewer shards: stale shard-*.tfrecord files are swept
    by the writer and the reader's manifest-restricted scan never sees
    shards the fresh manifest doesn't list."""
    df = _df(spark)
    many = write_tfrecord_shards(df, str(tmp_path), "doc_id", FEATS,
                                 budget_tokens=200)
    assert many["n_shards"] > 1
    few = write_tfrecord_shards(df.filter("doc_id < 2"), str(tmp_path),
                                "doc_id", FEATS, budget_tokens=1 << 28)
    files = [f for f in os.listdir(os.path.join(str(tmp_path), "data"))
             if f.endswith(".tfrecord")]
    assert len(files) == few["n_shards"] < many["n_shards"]
    back = read_tfrecord_shards(spark, str(tmp_path))
    assert {int(r["key"]) for r in back.collect()} == {0, 1}


def test_crc32c_numpy_equals_serial_on_awkward_sizes():
    """The slice-by-4 column-parallel CRC (the shard writer's hot path
    when the native wheel is absent) is bit-identical to the serial
    table loop across the boundary cases of its chunking: power-of-two
    heads, remainder chunks, and byte tails."""
    import os
    import random

    from marmaray_spark.functions.tfrecord_codec import (_CHUNK,
                                                         _crc32c_best,
                                                         _crc32c_numpy,
                                                         _crc32c_py)

    assert _crc32c_py(b"\x00" * 32) == 0x8A9136AA      # RFC 3720
    rng = random.Random(42)
    sizes = [_CHUNK, _CHUNK + 1, 2 * _CHUNK - 1, 4 * _CHUNK,
             4 * _CHUNK + 13, 7 * _CHUNK + 3,
             rng.randrange(_CHUNK, 300000)]
    for n in sizes:
        d = rng.randbytes(n)
        assert _crc32c_numpy(d) == _crc32c_py(d), n
    for n in (0, 1, 100, 4 * _CHUNK - 1):              # serial-path sizes
        d = rng.randbytes(n)
        assert _crc32c_best(d) == _crc32c_py(d), n
