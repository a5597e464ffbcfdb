"""Avro object-container-file source (sources/avro_file.py): round-trip
through both codecs, schema peek, corrupt-block detection, Spark-side
parallel decode."""

from __future__ import annotations

import pytest

from marmaray_spark.functions.avro_codec import AvroCodecError
from marmaray_spark.sources.avro_file import (AvroFileSource, read_ocf_bytes,
                                              write_ocf)
from marmaray_spark.sources.file import FileWorkUnitCalculator

AVSC = {
    "type": "record", "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tag", "type": ["null", "string"], "default": None},
    ],
}

ROWS = [{"id": i, "title": f"doc-{i}", "score": i / 8,
         "tag": None if i % 3 == 0 else f"t{i % 5}"} for i in range(257)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_bytes(tmp_path, codec):
    p = tmp_path / f"d_{codec}.avro"
    write_ocf(str(p), AVSC, ROWS, codec=codec, records_per_block=100)
    schema, records = read_ocf_bytes(p.read_bytes())
    assert records == ROWS
    assert schema["name"] == "Doc"


def test_ocf_corrupt_sync_detected(tmp_path):
    p = tmp_path / "d.avro"
    write_ocf(str(p), AVSC, ROWS[:10])
    data = bytearray(p.read_bytes())
    data[-1] ^= 0xFF  # flip a bit in the trailing sync marker
    with pytest.raises(AvroCodecError, match="sync"):
        read_ocf_bytes(bytes(data))


def test_spark_source_reads_many_files_with_schema_peek(spark, tmp_path):
    # three files, mixed codecs, schema taken from the first header
    for i, codec in enumerate(["null", "deflate", "null"]):
        write_ocf(str(tmp_path / f"part-{i}.avro"), AVSC,
                  ROWS[i * 50:(i + 1) * 50], codec=codec)
    [unit] = FileWorkUnitCalculator(tmp_path, file_type="avro").compute_work_units()
    df = AvroFileSource(spark).get_data(unit)
    got = sorted((r["id"], r["title"], r["tag"]) for r in df.collect())
    exp = sorted((r["id"], r["title"], r["tag"]) for r in ROWS[:150])
    assert got == exp
    assert dict(df.dtypes) == {"id": "bigint", "title": "string",
                               "score": "double", "tag": "string"}


def test_spark_source_explicit_reader_schema(spark, tmp_path):
    write_ocf(str(tmp_path / "x.avro"), AVSC, ROWS[:5])
    [unit] = FileWorkUnitCalculator(tmp_path, file_type="avro").compute_work_units()
    df = AvroFileSource(spark, avsc=AVSC).get_data(unit)
    assert df.count() == 5


from hypothesis import given, settings
from hypothesis import strategies as st

rec_st = st.fixed_dictionaries({
    "id": st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
    "title": st.text(max_size=40),
    "score": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "tag": st.one_of(st.none(), st.text(max_size=10)),
})


@settings(max_examples=60, deadline=None)
@given(records=st.lists(rec_st, max_size=40),
       codec=st.sampled_from(["null", "deflate"]),
       per_block=st.integers(min_value=1, max_value=7))
def test_ocf_roundtrip_property(tmp_path_factory, records, codec, per_block):
    p = tmp_path_factory.mktemp("ocf") / "r.avro"
    write_ocf(str(p), AVSC, records, codec=codec,
              records_per_block=per_block)
    _, got = read_ocf_bytes(p.read_bytes())
    assert got == records


def test_forked_read_quarantines_corrupt_file(spark, tmp_path):
    write_ocf(str(tmp_path / "ok-0.avro"), AVSC, ROWS[:40])
    write_ocf(str(tmp_path / "ok-1.avro"), AVSC, ROWS[40:80])
    bad = bytearray((tmp_path / "ok-0.avro").read_bytes())
    bad[-1] ^= 0xFF  # corrupt the trailing sync marker (breaks framing)
    (tmp_path / "bad.avro").write_bytes(bytes(bad))

    [unit] = FileWorkUnitCalculator(tmp_path, file_type="avro").compute_work_units()
    valid, errors = AvroFileSource(spark, avsc=AVSC).get_data_forked(unit)
    assert sorted(r["id"] for r in valid.collect()) == list(range(80))
    errs = errors.collect()
    assert len(errs) == 1
    assert "bad.avro" in errs[0]["hadoop_error_source_data"]


def test_ocf_ingest_to_table_to_rollup_e2e(spark, tmp_path):
    """The new pieces compose: OCF warehouse files -> corpus_hygiene
    (PII redaction) -> commit-log table -> per-lang rollup."""
    from marmaray_spark.operators.pii import corpus_hygiene
    from marmaray_spark.sinks.table import TableSink, WriteOp

    doc_avsc = {"type": "record", "name": "D", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "lang", "type": "string"},
        {"name": "text", "type": "string"}]}
    recs = [{"doc_id": i, "lang": "en" if i % 2 else "de",
             "text": f"doc {i} body with plenty of words here "
                     + ("mail x{}@corp.io ".format(i) if i % 3 == 0 else "")}
            for i in range(60)]
    for part in range(3):
        write_ocf(str(tmp_path / f"part-{part}.avro"), doc_avsc,
                  recs[part * 20:(part + 1) * 20])

    [unit] = FileWorkUnitCalculator(tmp_path, file_type="avro").compute_work_units()
    docs = AvroFileSource(spark, avsc=doc_avsc).get_data(unit)
    clean = corpus_hygiene(docs)

    table = tmp_path / "docs_table"
    sink = TableSink(spark, table, "doc_id", partition_field="lang")
    sink.write(clean, WriteOp.INSERT)
    back = sink.read()
    assert back.count() == 60
    assert back.filter(back.text.contains("@")).count() == 0  # redacted
    assert back.filter("pii_found > 0").count() == 20  # every i%3==0 doc

    from pyspark.sql import functions as F
    roll = back.groupBy("lang").agg(F.count("*").alias("n"))
    assert {(r["lang"], r["n"]) for r in roll.collect()} == {("en", 30), ("de", 30)}


def test_ocf_streaming_ingest_exactly_once(spark, tmp_path):
    """read_ocf_stream decodes each arriving .avro file exactly once
    across restarts (file-source checkpoint), through the same per-block
    kernel as the batch reader."""
    from marmaray_spark.sources.avro_file import read_ocf_stream
    from marmaray_spark.streaming.incremental import run_available_now

    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    src.mkdir()
    write_ocf(str(src / "a.avro"), AVSC, ROWS[:30], codec="deflate")

    def drain():
        stream = read_ocf_stream(spark, str(src), AVSC)
        run_available_now(stream.writeStream.format("parquet")
                          .option("path", str(out))
                          .option("checkpointLocation", str(ckpt)))

    drain()
    assert sorted(r["id"] for r in spark.read.parquet(str(out)).collect()) \
        == list(range(30))
    write_ocf(str(src / "b.avro"), AVSC, ROWS[30:50])
    drain()  # restart: only the NEW file is decoded
    assert sorted(r["id"] for r in spark.read.parquet(str(out)).collect()) \
        == list(range(50))


def test_ocf_stream_nonstrict_skips_corrupt_file(spark, tmp_path):
    from marmaray_spark.sources.avro_file import read_ocf_stream
    from marmaray_spark.streaming.incremental import run_available_now

    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    src.mkdir()
    write_ocf(str(src / "good.avro"), AVSC, ROWS[:20])
    (src / "broken.avro").write_bytes(b"Obj\x01garbage")

    stream = read_ocf_stream(spark, str(src), AVSC, strict=False)
    run_available_now(stream.writeStream.format("parquet")
                      .option("path", str(out))
                      .option("checkpointLocation", str(ckpt)))
    assert sorted(r["id"] for r in spark.read.parquet(str(out)).collect()) \
        == list(range(20))


def test_forked_read_no_driver_collect_in_probe(spark, tmp_path):
    """The quarantine path must stay distributed: building (valid,
    errors) may not trigger a driver collect (r5 verdict item 8 — at
    millions of OCF files a verdict list on the driver is a scale
    bug). Guarded by patching DataFrame.collect for the plan-build."""
    from unittest import mock

    from pyspark.sql import DataFrame as SparkDF

    write_ocf(str(tmp_path / "a.avro"), AVSC, ROWS[:10])
    (tmp_path / "junk.avro").write_bytes(b"not an avro file at all")
    [unit] = FileWorkUnitCalculator(tmp_path, file_type="avro").compute_work_units()
    src = AvroFileSource(spark, avsc=AVSC)
    with mock.patch.object(SparkDF, "collect",
                           side_effect=AssertionError("driver collect")):
        valid, errors = src.get_data_forked(unit)
    assert sorted(r["id"] for r in valid.collect()) == list(range(10))
    errs = errors.collect()
    assert len(errs) == 1 and "junk.avro" in errs[0]["hadoop_error_source_data"]


def test_forked_read_schema_peek_skips_corrupt_first_file(spark, tmp_path):
    """avsc=None with a corrupt file that sorts FIRST: the peek must
    fall through to a healthy header (ADVICE r5) instead of raising."""
    (tmp_path / "0-corrupt.avro").write_bytes(b"\x00" * 64)
    write_ocf(str(tmp_path / "1-good.avro"), AVSC, ROWS[:15])
    [unit] = FileWorkUnitCalculator(tmp_path, file_type="avro").compute_work_units()
    valid, errors = AvroFileSource(spark).get_data_forked(unit)
    assert sorted(r["id"] for r in valid.collect()) == list(range(15))
    assert errors.count() == 1


def test_forked_read_all_corrupt_no_schema(spark, tmp_path):
    """avsc=None and ZERO healthy files: every file lands in the error
    frame and valid is an empty column-less frame — never an
    AvroCodecError out of the fork (ADVICE r5)."""
    (tmp_path / "x.avro").write_bytes(b"garbage")
    (tmp_path / "y.avro").write_bytes(b"Obj\x01" + b"\xff" * 32)
    [unit] = FileWorkUnitCalculator(tmp_path, file_type="avro").compute_work_units()
    valid, errors = AvroFileSource(spark).get_data_forked(unit)
    assert valid.count() == 0 and len(valid.schema.fields) == 0
    assert errors.count() == 2


# -- snappy codec -----------------------------------------------------------

def test_snappy_codec_roundtrip_and_backrefs():
    from marmaray_spark.functions.snappy_codec import compress, uncompress
    samples = [b"", b"a", b"abcd" * 100, bytes(range(256)) * 5,
               b"x" * 100000,                 # long runs -> overlapping copies
               b"the quick brown fox " * 37]
    for s in samples:
        c = compress(s)
        assert uncompress(c) == s
    # repetitive input must actually compress (back-references emitted)
    big = b"abcdefgh" * 4096
    assert len(compress(big)) < len(big) // 4


def test_snappy_corrupt_raises_codec_error():
    from marmaray_spark.functions.avro_codec import AvroCodecError
    from marmaray_spark.functions.snappy_codec import compress, uncompress
    good = compress(b"hello world " * 50)
    for bad in (b"", good[:3], good[:-5],
                b"\x05" + b"\xff\xff\xff\xff\xff"):
        with pytest.raises(AvroCodecError):
            uncompress(bad)


@given(st.binary(max_size=5000))
@settings(max_examples=200, deadline=None)
def test_snappy_roundtrip_property(data):
    from marmaray_spark.functions.snappy_codec import compress, uncompress
    assert uncompress(compress(data)) == data


def test_ocf_snappy_roundtrip(tmp_path):
    p = tmp_path / "s.avro"
    write_ocf(str(p), AVSC, ROWS, codec="snappy", records_per_block=100)
    schema, got = read_ocf_bytes(p.read_bytes())
    assert got == ROWS


def test_ocf_snappy_crc_mismatch_quarantined(spark, tmp_path):
    write_ocf(str(tmp_path / "good.avro"), AVSC, ROWS[:30], codec="snappy")
    raw = bytearray((tmp_path / "good.avro").read_bytes())
    # flip one byte inside the LAST 5 bytes before the trailing sync:
    # corrupts the CRC (or the compressed tail) without touching framing
    raw[-20] ^= 0x01
    (tmp_path / "bad.avro").write_bytes(bytes(raw))
    [unit] = FileWorkUnitCalculator(tmp_path, file_type="avro").compute_work_units()
    valid, errors = AvroFileSource(spark, avsc=AVSC).get_data_forked(unit)
    assert sorted(r["id"] for r in valid.collect()) == \
        sorted(r["id"] for r in ROWS[:30])
    assert errors.count() == 1


def test_ocf_snappy_streaming(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    write_ocf(str(src / "a.avro"), AVSC, ROWS[:25], codec="snappy")
    from marmaray_spark.sources.avro_file import read_ocf_stream
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    q = (read_ocf_stream(spark, str(src), AVSC)
         .writeStream.format("parquet")
         .option("path", str(out)).option("checkpointLocation", str(ck))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.read.parquet(str(out)).collect())
    assert got == sorted(r["id"] for r in ROWS[:25])


@pytest.mark.parametrize("codec", ["bzip2", "xz"])
def test_ocf_stdlib_codecs_roundtrip(tmp_path, codec):
    p = tmp_path / f"{codec}.avro"
    write_ocf(str(p), AVSC, ROWS, codec=codec, records_per_block=100)
    _, got = read_ocf_bytes(p.read_bytes())
    assert got == ROWS


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_ocf_parser_never_leaks_raw_exceptions(data):
    """Fuzz the OCF framing with arbitrary bytes (and with a valid magic
    prefix grafted on): the quarantine contract is that ONLY
    AvroCodecError escapes — any IndexError/KeyError/struct.error out of
    the parser would crash the forked read instead of quarantining."""
    from marmaray_spark.functions.avro_codec import AvroCodecError
    from marmaray_spark.sources.avro_file import iter_ocf_blocks
    for payload in (data, b"Obj\x01" + data):
        try:
            for _ in iter_ocf_blocks(payload):
                pass
        except AvroCodecError:
            pass
