"""End-to-end slice (SURVEY §7 step 1): partitioned parquet table ->
ParquetWorkUnitCalculator -> ParquetSource -> SchemaProjectionConverter
(valid/error fork) -> FileSink CSV + error table. Read back and verify."""

import csv

from pyspark.sql import functions as F

from marmaray_spark.converters import SchemaProjectionConverter
from marmaray_spark.metadata import InMemoryMetadataManager, PartitionManager
from marmaray_spark.operators.errors import write_error_table
from marmaray_spark.sinks.file import FileSink, estimate_size_mb, plan_num_files
from marmaray_spark.sources.hive import ParquetSource, ParquetWorkUnitCalculator


def test_slice(spark, orders, tmp_path):
    # arrange: write orders as a month-partitioned table (FIXTURES.md F4)
    table = tmp_path / "orders_table"
    dirty = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None)).otherwise(F.col("o_custkey")),
    ).withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
    dirty.write.partitionBy("month").parquet(str(table))

    meta = InMemoryMetadataManager()
    pm = PartitionManager(table, meta)
    calc = ParquetWorkUnitCalculator(pm)
    source = ParquetSource(spark)

    # run 1: first partition only
    units = calc.compute_work_units()
    assert len(units) == 1
    first_month = units[0].partition_value
    df = source.get_data(units[0])

    conv = SchemaProjectionConverter(required_keys=["o_orderkey", "o_custkey"])
    res = conv.map(df.drop("month"))

    expected_part = dirty.filter(F.col("month") == first_month)
    expected_bad = expected_part.filter(F.col("o_custkey").isNull()).count()
    assert res.error_count == expected_bad
    assert res.valid_count == expected_part.count() - expected_bad

    # sink: CSV with header + error table
    out = tmp_path / "out_csv"
    sink = FileSink(out, fmt="csv", header=True, file_name_prefix="orders")
    n_files = sink.write(res.valid)
    assert n_files >= 1
    write_error_table(res.errors, str(tmp_path / "orders_sink"))

    # read back: valid rows round-trip
    files = sorted(out.glob("orders_*"))
    assert files, "renamed output files missing"
    rows = []
    for fp in files:
        with open(fp) as f:
            rows.extend(list(csv.DictReader(f)))
    assert len(rows) == res.valid_count

    err_back = spark.read.parquet(str(tmp_path / "orders_sink_error"))
    assert err_back.count() == expected_bad
    assert "hadoop_error_exception" in err_back.columns

    # checkpoint commits -> next run picks the next partition
    calc.save_next_run_state(units)
    units2 = calc.compute_work_units()
    assert units2[0].partition_value > first_month


def test_file_sizing_plan(spark, lineitem):
    mb = estimate_size_mb(lineitem)
    assert mb > 0
    assert plan_num_files(mb, -1) == 1
    assert plan_num_files(100.0, 10.0) == 10
    assert plan_num_files(0.5, 10.0) == 1


def test_file_sink_compressed_output(spark, customer, tmp_path):
    """LZ4-compressed CSV (reference: LZ4 sequence files) round-trips."""
    from marmaray_spark.sinks.file import FileSink

    dest = tmp_path / "lz4_out"
    FileSink(dest, fmt="csv", compression="lz4", header=True).write(customer)
    files = list(dest.glob("part-*.csv.lz4"))
    assert files, f"no lz4 parts in {list(dest.iterdir())}"
    back = spark.read.option("header", True).csv(str(dest))
    assert back.count() == customer.count()


def test_file_sink_rejects_bad_compression(tmp_path):
    import pytest

    from marmaray_spark.sinks.file import FileSink

    with pytest.raises(ValueError, match="compression"):
        FileSink(tmp_path, compression="rar")


def test_sequence_file_sink_roundtrip_lz4(spark, orders, tmp_path):
    """SequenceFile (Text,Text) + LZ4 write and read-back — the reference's
    sequence branch (FileSink.java:134-165) with the JSON converter
    providing (row_identifier key, json line) pairs."""
    from marmaray_spark.converters import encode_json_lines
    from marmaray_spark.sinks.file import SequenceFileSink

    src = orders.limit(500).select("o_orderkey", "o_custkey", "o_totalprice")
    pairs = encode_json_lines(src, row_identifier="o_orderkey")

    sink = SequenceFileSink(tmp_path / "seq", file_size_mb=0.01,
                            compression="lz4")
    n_files = sink.write(pairs)
    assert n_files >= 2                      # size-targeted multi-file output
    files = list((tmp_path / "seq").glob("part-*"))
    assert len(files) == n_files
    # SequenceFile magic header + the configured codec recorded per file
    blob = files[0].read_bytes()
    assert blob.startswith(b"SEQ") and b"Lz4Codec" in blob

    back = sink.read(spark)
    assert back.count() == 500
    keys = {r["key"] for r in back.select("key").collect()}
    assert keys == {str(r["o_orderkey"]) for r in src.collect()}
    # values are intact json lines
    import json
    row = json.loads(back.first()["line"])
    assert set(row) == {"o_orderkey", "o_custkey", "o_totalprice"}


def test_sequence_file_sink_rejects_unknown_codec(tmp_path):
    import pytest

    from marmaray_spark.sinks.file import SequenceFileSink

    with pytest.raises(ValueError, match="not supported"):
        SequenceFileSink(tmp_path / "x", compression="gzip")


def test_versioned_dispersal(spark, tmp_path):
    """VERSION dispersal (the reference's default DispersalType): each
    run lands in its own 12-digit version dir; old versions stay readable
    until retention prunes the oldest; duplicate/bad versions raise."""
    import pytest

    from marmaray_spark.sinks.file import VersionedFileSink

    sink = VersionedFileSink(tmp_path / "disp", retain_versions=2,
                             fmt="csv", file_name_prefix="out")
    df1 = spark.createDataFrame([(1, "a")], ["k", "v"])
    df2 = spark.createDataFrame([(2, "b")], ["k", "v"])

    v0 = sink.write(df1)
    assert v0 == "000000000000"
    v1 = sink.write(df2)
    assert sink.versions() == [v0, v1]
    # both versions readable concurrently (consumers pin a version)
    assert spark.read.option("header", True).csv(
        str(tmp_path / "disp" / v0)).collect()[0]["v"] == "a"
    assert sink.latest_path().name == v1

    v2 = sink.write(df1)                      # retention: v0 pruned
    assert sink.versions() == [v1, v2]
    assert not (tmp_path / "disp" / v0).exists()

    with pytest.raises(FileExistsError):
        sink.write(df1, version=v2)
    with pytest.raises(ValueError):
        sink.write(df1, version="7")
    with pytest.raises(ValueError):
        VersionedFileSink(tmp_path / "x", retain_versions=0)
