"""Converter tests — modeled on T/common/converters/data/
TestSparkSourceDataConverter.java (required-key validation) and
TestCassandraSinkDataConverter semantics (projection, ts handling)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marmaray_spark.converters import (
    JsonDecodeConverter,
    SchemaProjectionConverter,
    add_record_key_and_partition,
    encode_csv_lines,
    encode_json_lines,
    with_columns,
)


@pytest.fixture()
def dirty_customer(customer):
    # null out a required column for ~1/5 of rows (FIXTURES.md F1 error case)
    return customer.withColumn(
        "c_name",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None)).otherwise(F.col("c_name")),
    ).withColumn("_internal", F.lit("x"))


def test_required_keys_split(spark, dirty_customer):
    conv = SchemaProjectionConverter(required_keys=["c_custkey", "c_name"])
    res = conv.map(dirty_customer)
    bad = dirty_customer.filter(F.col("c_name").isNull()).count()
    assert res.error_count == bad
    assert res.valid_count == dirty_customer.count() - bad
    # underscore-prefixed fields dropped from the valid stream
    assert "_internal" not in res.valid.columns
    # error records carry the canonical schema
    assert set(res.errors.columns) == {
        "hadoop_row_key", "hadoop_error_source_data", "hadoop_error_exception",
        "hadoop_changelog_columns", "hadoop_application_id", "error_date"}
    assert res.errors.count() == bad


def test_fail_on_invalid(spark, dirty_customer):
    conv = SchemaProjectionConverter(required_keys=["c_name"], fail_on_invalid=True)
    with pytest.raises(ValueError):
        conv.map(dirty_customer)


def test_fields_to_convert_projection(spark, customer):
    conv = SchemaProjectionConverter(fields_to_convert=["c_custkey", "c_acctbal"])
    res = conv.map(customer)
    assert res.valid.columns == ["c_custkey", "c_acctbal"]
    assert res.error_count == 0


def test_json_decode_with_corrupt_records(spark):
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    lines = spark.createDataFrame(
        [('{"id": 1, "name": "a"}',), ('{"id": 2, "name": "b"}',), ("NOT JSON{{{",)],
        ["value"],
    )
    res = JsonDecodeConverter("value", schema).map(lines)
    assert res.valid_count == 2
    assert res.error_count == 1
    assert res.valid.columns == ["id", "name"]


def test_with_columns_map_and_chain(spark, customer):
    out = with_columns(customer, {"c_name": F.upper("c_name")})
    assert out.filter(F.col("c_name") != F.upper("c_name")).count() == 0
    out2 = with_columns(customer, [lambda d: d.withColumn("x", F.lit(1)),
                                   lambda d: d.withColumn("y", F.col("x") + 1)])
    assert out2.select("y").first()["y"] == 2


def test_record_key_and_partition_path(spark, orders):
    out = add_record_key_and_partition(orders, "o_orderkey", "o_orderdate")
    row = out.select("record_key", "partition_path", "o_orderdate").first()
    assert row["record_key"].isdigit()
    y, m, d = row["partition_path"].split("/")
    assert int(y) == row["o_orderdate"].year
    assert int(m) == row["o_orderdate"].month
    assert int(d) == row["o_orderdate"].day
    # epoch-millis numeric ts also accepted (reference wire format)
    from marmaray_spark.functions import timestamp_to_millis
    ms = orders.withColumn("ts_ms", timestamp_to_millis("o_orderdate"))
    out2 = add_record_key_and_partition(ms, "o_orderkey", "ts_ms")
    assert out2.select("partition_path").first()[0] == row["partition_path"]


def test_csv_encode_quoting(spark):
    df = spark.createDataFrame(
        [(1, 'plain'), (2, 'has,comma'), (3, 'has"quote'), (4, 'multi\nline')],
        ["id", "s"])
    lines = {r["line"] for r in encode_csv_lines(df).collect()}
    assert "1,plain" in lines
    assert '2,"has,comma"' in lines
    assert '3,"has""quote"' in lines
    assert '4,"multi\nline"' in lines


def test_json_encode_with_row_identifier(spark, customer):
    out = encode_json_lines(customer.limit(3), row_identifier="c_custkey")
    rows = out.collect()
    assert set(out.columns) == {"key", "line"}
    assert all(r["line"].startswith("{") for r in rows)


def test_converter_chain_merges_stage_errors(spark):
    from pyspark.sql import functions as F

    from marmaray_spark.converters import ConverterChain, SchemaProjectionConverter

    class Positive(SchemaProjectionConverter):
        def validity(self, df):
            return F.col("score") > 0

        def error_message(self, df):
            return F.lit("score not positive")

    rows = [(1, "a", 5.0), (None, "b", 3.0), (3, "c", -1.0), (4, None, 2.0)]
    df = spark.createDataFrame(rows, "id long, name string, score double")

    chain = ConverterChain([
        ("required", SchemaProjectionConverter(required_keys=["id", "name"])),
        ("domain", Positive()),
    ])
    res = chain.map(df)

    # survivors: only id=1 (id=None and name=None fail stage 1; id=3
    # fails the domain stage)
    valid_ids = sorted(r["id"] for r in res.valid.collect())
    assert valid_ids == [1]
    assert res.valid_count == 1 and res.error_count == 3

    stages = [r["hadoop_changelog_columns"]
              for r in res.errors.select("hadoop_changelog_columns").collect()]
    assert sorted(stages) == ["domain", "required", "required"]


def test_converter_chain_rejects_dup_names():
    import pytest

    from marmaray_spark.converters import ConverterChain, SchemaProjectionConverter

    with pytest.raises(ValueError, match="duplicate"):
        ConverterChain([("a", SchemaProjectionConverter()),
                        ("a", SchemaProjectionConverter())])
