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
