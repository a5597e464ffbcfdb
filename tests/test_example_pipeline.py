"""The examples/ pipeline end-to-end: incremental partition ingest with
checkpointing, upsert table, error table, locks, metrics."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

from parquet_to_table_pipeline import build_dag  # noqa: E402

from marmaray_spark.sinks.table import TableSink  # noqa: E402


def test_example_ingests_one_partition_per_run(spark, tmp_path):
    wd = str(tmp_path / "wd")

    dag1 = build_dag(spark, wd)
    assert dag1.execute(spark) is True
    t = TableSink(spark, os.path.join(wd, "table"), record_key_field="o_orderkey")
    rows_after_1 = t.read().count()
    assert rows_after_1 > 0

    # second run picks the NEXT partition; table grows
    dag2 = build_dag(spark, wd)
    assert dag2.execute(spark) is True
    rows_after_2 = t.read().count()
    assert rows_after_2 > rows_after_1

    # error table captures invalid rows when the processed partitions had
    # any (small partitions may be all-valid — then no error dir exists)
    err_dir = os.path.join(wd, "errors")
    if os.path.exists(err_dir):
        errs = spark.read.parquet(err_dir)
        assert "hadoop_error_exception" in errs.columns

    # metrics recorded work
    names = [m.name for m in dag2.metrics.metrics]
    assert "work_unit_count" in names and "success" in names
