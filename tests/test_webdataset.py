"""WebDataset-style tar shard writer (operators/shard.py
write_webdataset_shards): tar round-trip, member encoding, byte-budget
splitting, byte-level reproducibility, and the atomic-write contract."""

import hashlib
import os
import tarfile

import pytest

from marmaray_spark.operators.shard import write_webdataset_shards


def _df(spark):
    rows = [(i, f"doc {i} text", bytes([i % 256]) * (10 + i))
            for i in range(20)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, payload binary")


def _read_all(path):
    """{(member name): bytes} across all shards, plus per-shard member
    order."""
    out, order = {}, {}
    data = os.path.join(path, "data")
    for fname in sorted(os.listdir(data)):
        if not fname.endswith(".tar"):
            continue
        with tarfile.open(os.path.join(data, fname)) as tf:
            names = tf.getnames()
            order[fname] = names
            for n in names:
                out[n] = tf.extractfile(n).read()
    return out, order


def test_webdataset_roundtrip_members_and_manifest(spark, tmp_path):
    path = str(tmp_path / "wd")
    manifest = write_webdataset_shards(
        _df(spark), path, "doc_id", {"txt": "text", "bin": "payload"},
        budget_tokens=1 << 20)
    members, order = _read_all(path)
    assert manifest["total_docs"] == 20
    assert manifest["n_shards"] == len(order) == 1
    for i in range(20):
        assert members[f"{i}.txt"] == f"doc {i} text".encode()
        assert members[f"{i}.bin"] == bytes([i % 256]) * (10 + i)
    # a sample's members are ADJACENT (the WebDataset contract)
    names = next(iter(order.values()))
    for j in range(0, len(names), 2):
        assert names[j].split(".")[0] == names[j + 1].split(".")[0]
    assert manifest["total_bytes"] == sum(len(v) for v in members.values())


def test_webdataset_budget_splits_shards(spark, tmp_path):
    path = str(tmp_path / "wd")
    manifest = write_webdataset_shards(
        _df(spark), path, "doc_id", {"txt": "text", "bin": "payload"},
        budget_tokens=120)
    assert manifest["n_shards"] > 3
    # every doc lands exactly once across all shards
    members, _ = _read_all(path)
    assert {n for n in members if n.endswith(".txt")} \
        == {f"{i}.txt" for i in range(20)}
    # no in-progress temp files survive
    assert not [f for f in os.listdir(os.path.join(path, "data"))
                if f.startswith(".")]


def test_webdataset_bytes_reproducible(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    for p in (p1, p2):
        write_webdataset_shards(
            _df(spark), p, "doc_id", {"txt": "text", "bin": "payload"},
            budget_tokens=200)
    def digests(p):
        d = os.path.join(p, "data")
        return {f: hashlib.sha256(open(os.path.join(d, f), "rb").read())
                .hexdigest() for f in os.listdir(d)}
    assert digests(p1) == digests(p2)


def test_webdataset_null_member_skipped(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "has text", None), (2, None, b"\x01\x02")],
        "doc_id long, text string, payload binary")
    path = str(tmp_path / "wd")
    write_webdataset_shards(df, path, "doc_id",
                            {"txt": "text", "bin": "payload"},
                            budget_tokens=1 << 20)
    members, _ = _read_all(path)
    assert set(members) == {"1.txt", "2.bin"}


def test_webdataset_rejects_bad_members(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        write_webdataset_shards(df, "/tmp/x", "doc_id", {"a.b": "text"})
    with pytest.raises(ValueError):
        write_webdataset_shards(df, "/tmp/x", "doc_id", {"txt": "missing"})
