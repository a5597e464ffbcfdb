"""JSON file source + work-unit listing (modeled on
T/common/sources/file/TestFileWorkUnitCalculator.java and
JSONFileSourceDataConverter malformed-record tests)."""

from pyspark.sql import types as T

from marmaray_spark.sources.file import FileWorkUnitCalculator, JsonFileSource

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
])


def test_work_units_filtered_by_suffix_and_sorted(tmp_path):
    (tmp_path / "b.json").write_text('{"id": 2, "name": "b"}\n')
    (tmp_path / "a.json").write_text('{"id": 1, "name": "a"}\n')
    (tmp_path / "skip.csv").write_text("id,name\n3,c\n")
    units = FileWorkUnitCalculator(tmp_path).compute_work_units()
    assert len(units) == 1
    assert [p.rsplit("/", 1)[-1] for p in units[0].paths] == ["a.json", "b.json"]


def test_missing_dir_and_no_matches_yield_no_work(tmp_path):
    assert FileWorkUnitCalculator(tmp_path / "absent").compute_work_units() == []
    (tmp_path / "only.csv").write_text("x\n")
    assert FileWorkUnitCalculator(tmp_path).compute_work_units() == []


def test_json_source_valid_and_malformed_split(spark, tmp_path):
    f = tmp_path / "data.json"
    f.write_text('{"id": 1, "name": "ok"}\n'
                 "this is not json\n"
                 '{"id": 2, "name": "also ok"}\n')
    [unit] = FileWorkUnitCalculator(tmp_path).compute_work_units()
    res = JsonFileSource(spark, SCHEMA).get_data(unit)

    rows = {r["id"]: r["name"] for r in res.valid.collect()}
    assert rows == {1: "ok", 2: "also ok"}
    assert res.valid_count == 2 and res.error_count == 1

    errs = res.errors.collect()
    assert len(errs) == 1
    assert "not json" in errs[0]["hadoop_error_source_data"]


def test_csv_source_valid_and_malformed_split(spark, tmp_path):
    from marmaray_spark.sources.file import CsvFileSource

    f = tmp_path / "data.csv"
    f.write_text("id,name\n"
                 "1,ok\n"
                 "not-a-number,bad\n"
                 "2,also ok\n")
    [unit] = FileWorkUnitCalculator(tmp_path, file_type="csv").compute_work_units()
    res = CsvFileSource(spark, SCHEMA, header=True).get_data(unit)

    rows = {r["id"]: r["name"] for r in res.valid.collect()}
    assert rows == {1: "ok", 2: "also ok"}
    assert res.valid_count == 2 and res.error_count == 1

    errs = res.errors.collect()
    assert len(errs) == 1
    assert "not-a-number" in errs[0]["hadoop_error_source_data"]


def test_csv_source_custom_separator_no_header(spark, tmp_path):
    from marmaray_spark.sources.file import CsvFileSource

    (tmp_path / "p.csv").write_text("1|ok\n2|fine\n")
    [unit] = FileWorkUnitCalculator(tmp_path, file_type="csv").compute_work_units()
    res = CsvFileSource(spark, SCHEMA, header=False, sep="|").get_data(unit)
    assert res.valid_count == 2 and res.error_count == 0
    assert {r["name"] for r in res.valid.collect()} == {"ok", "fine"}


# -- columnar corrupt-file quarantine (r6) -----------------------------------

def _write_single_parquet(spark, df, dest):
    import glob
    import shutil
    tmp = str(dest) + "_tmp"
    df.coalesce(1).write.parquet(tmp)
    shutil.move(glob.glob(tmp + "/part-*.parquet")[0], str(dest))
    shutil.rmtree(tmp)


def test_columnar_quarantine_parquet(spark, tmp_path):
    from marmaray_spark.sources.columnar_file import ColumnarFileSource

    good1, good2 = tmp_path / "a.parquet", tmp_path / "b.parquet"
    _write_single_parquet(
        spark, spark.createDataFrame([(1, "x"), (2, "y")], ["id", "s"]), good1)
    _write_single_parquet(
        spark, spark.createDataFrame([(3, "z")], ["id", "s"]), good2)
    truncated = tmp_path / "c.parquet"
    truncated.write_bytes(good1.read_bytes()[:-6])      # tail magic gone
    garbage = tmp_path / "d.parquet"
    garbage.write_bytes(b"this was never a parquet file")

    src = ColumnarFileSource(spark, "parquet")
    valid, errors = src.get_data_forked(
        [good1, good2, truncated, garbage])
    assert sorted(r["id"] for r in valid.collect()) == [1, 2, 3]
    errs = errors.collect()
    assert len(errs) == 2
    reasons = " | ".join(e["hadoop_error_exception"] for e in errs)
    assert "magic" in reasons
    # quarantined paths preserved for replay
    assert {e["hadoop_error_source_data"].count("parquet") > 0
            for e in errs} == {True}


def test_columnar_quarantine_orc(spark, tmp_path):
    import glob
    import shutil

    from marmaray_spark.sources.columnar_file import ColumnarFileSource

    tmp = str(tmp_path / "orc_tmp")
    spark.createDataFrame([(1, "x"), (2, "y")], ["id", "s"]) \
        .coalesce(1).write.orc(tmp)
    good = tmp_path / "a.orc"
    shutil.move(glob.glob(tmp + "/part-*.orc")[0], str(good))
    shutil.rmtree(tmp)
    bad = tmp_path / "b.orc"
    bad.write_bytes(good.read_bytes()[:-2])             # postscript torn

    src = ColumnarFileSource(spark, "orc")
    valid, errors = src.get_data_forked([good, bad])
    assert sorted(r["id"] for r in valid.collect()) == [1, 2]
    assert errors.count() == 1


def test_columnar_probe_contracts():
    import pytest as _pytest

    from marmaray_spark.sources.columnar_file import (ColumnarProbeError,
                                                      probe_orc_bytes,
                                                      probe_parquet_bytes)

    with _pytest.raises(ColumnarProbeError):
        probe_parquet_bytes(b"PAR1")                    # too short
    with _pytest.raises(ColumnarProbeError):
        probe_parquet_bytes(b"PAR1" + b"\x00" * 20)     # no tail magic
    # footer length beyond file size
    with _pytest.raises(ColumnarProbeError):
        probe_parquet_bytes(b"PAR1" + b"\x00" * 8
                            + b"\xff\xff\xff\x7f" + b"PAR1")
    with _pytest.raises(ColumnarProbeError):
        probe_orc_bytes(b"OR")                          # too short
    with _pytest.raises(ColumnarProbeError):
        probe_orc_bytes(b"\x00" * 10)                   # no magic, len 0
