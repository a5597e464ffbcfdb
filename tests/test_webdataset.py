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


def test_webdataset_reader_roundtrips_writer(spark, tmp_path):
    """write -> read closes the loop: every sample comes back with its
    key, shard id, decoded text and raw bytes equal to the source rows;
    NULL members stay NULL; manifest-driven member discovery works."""
    from marmaray_spark.operators.shard import read_webdataset_shards

    df = _df(spark)
    path = str(tmp_path / "wd")
    manifest = write_webdataset_shards(
        df, path, "doc_id", {"txt": "text", "bin": "payload"},
        budget_tokens=200)
    out = read_webdataset_shards(
        spark, path, {"txt": "string", "bin": "binary"})
    got = {r["key"]: (r["txt"], bytes(r["bin"]), r["shard"])
           for r in out.collect()}
    want = {str(r["doc_id"]): (r["text"], bytes(r["payload"]))
            for r in df.collect()}
    assert {k: v[:2] for k, v in got.items()} == want
    assert len(got) == manifest["total_docs"]
    # shard ids are the writer's; every manifest shard is represented
    assert ({s for _, _, s in got.values()}
            == {s["shard"] for s in manifest["shards"]})
    # partitioning-proof: same rows regardless of scan parallelism
    again = {r["key"]: (r["txt"], bytes(r["bin"]), r["shard"])
             for r in out.repartition(5).collect()}
    assert again == got

    # manifest-driven discovery (all members binary by default)
    auto = read_webdataset_shards(spark, path)
    r0 = {r["key"]: r for r in auto.collect()}
    assert bytes(r0["3"]["txt"]) == b"doc 3 text"


def test_webdataset_reader_null_member_and_validation(spark, tmp_path):
    from marmaray_spark.operators.shard import read_webdataset_shards

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, b"\x01\x02")],
        "doc_id long, text string, payload binary")
    path = str(tmp_path / "wd")
    write_webdataset_shards(df, path, "doc_id",
                            {"txt": "text", "bin": "payload"},
                            budget_tokens=1 << 20)
    got = {r["key"]: (r["txt"], r["bin"]) for r in read_webdataset_shards(
        spark, path, {"txt": "string", "bin": "binary"}).collect()}
    assert got["1"] == ("a", None)
    assert got["2"][0] is None and bytes(got["2"][1]) == b"\x01\x02"
    with pytest.raises(ValueError):
        read_webdataset_shards(spark, path, {"txt": "int"})
    with pytest.raises(ValueError):
        read_webdataset_shards(spark, str(tmp_path / "nowhere"))


def test_webdataset_rerun_sweeps_stale_shards(spark, tmp_path):
    """A re-run that produces FEWER shards must not leave stale shard
    files from the prior run: the writer sweeps same-suffix shard files
    (and torn .inprogress temps) before writing, and the reader trusts
    the manifest's shard list over the directory glob."""
    from marmaray_spark.operators.shard import read_webdataset_shards

    df = _df(spark)
    path = str(tmp_path / "wd")
    many = write_webdataset_shards(
        df, path, "doc_id", {"txt": "text"}, budget_tokens=60)
    assert many["n_shards"] > 2
    # plant a torn temp too — the sweep must clear it
    open(os.path.join(path, "data", ".shard-000099.tar.inprogress"),
         "wb").write(b"torn")
    few = write_webdataset_shards(
        df.filter("doc_id < 3"), path, "doc_id", {"txt": "text"},
        budget_tokens=1 << 20)
    assert few["n_shards"] < many["n_shards"]
    files = os.listdir(os.path.join(path, "data"))
    assert len([f for f in files if f.endswith(".tar")]) == few["n_shards"]
    assert not [f for f in files if f.startswith(".")]
    got = {r["key"] for r in
           read_webdataset_shards(spark, path, {"txt": "string"}).collect()}
    assert got == {"0", "1", "2"}


def test_webdataset_reader_restricts_to_manifest(spark, tmp_path):
    """Directory written by an older writer: a stale shard file the
    manifest doesn't list must not be ingested."""
    import json as _json

    from marmaray_spark.operators.shard import read_webdataset_shards

    df = _df(spark)
    path = str(tmp_path / "wd")
    write_webdataset_shards(df.filter("doc_id < 5"), path, "doc_id",
                            {"txt": "text"}, budget_tokens=1 << 20)
    man = _json.load(open(os.path.join(path, "manifest.json")))
    listed = {s["file"] for s in man["shards"]}
    # plant a stale shard the manifest doesn't know about
    stale = os.path.join(path, "data", "shard-000042.tar")
    assert "shard-000042.tar" not in listed
    with tarfile.open(stale, "w") as tf:
        import io as _io
        info = tarfile.TarInfo(name="999.txt")
        blob = b"stale sample"
        info.size = len(blob)
        tf.addfile(info, _io.BytesIO(blob))
    got = {r["key"] for r in
           read_webdataset_shards(spark, path, {"txt": "string"}).collect()}
    assert "999" not in got and got == {"0", "1", "2", "3", "4"}
