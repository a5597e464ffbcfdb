"""Complete example: incremental parquet ingestion into a managed table.

The canonical reference flow (Hive partition -> validate -> Hudi upsert +
error table, ParquetToCassandraJob/KafkaToHudi shape) assembled from this
engine's parts:

  partitioned parquet source
    -> work-unit calculator (one new partition per run, checkpointed)
    -> schema projection + required-key validation (valid | error fork)
    -> JobSubDag: TableSink UPSERT (priority 100) + error table (priority 0)
    -> JobManager with file locks, metrics, timeout watchdog

Run:  python examples/parquet_to_table_pipeline.py [work_dir]
Each invocation processes at most one NEW partition (work-unit
semantics); re-running with no new data is a no-op. State lives under
<work_dir>/: checkpoint.json, table/, errors/, locks/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marmaray_spark.converters import SchemaProjectionConverter  # noqa: E402
from marmaray_spark.metadata import (  # noqa: E402
    FileSystemMetadataManager,
    PartitionManager,
)
from marmaray_spark.metrics import ConsoleReporter  # noqa: E402
from marmaray_spark.operators.errors import write_error_table  # noqa: E402
from marmaray_spark.plans.dag import JobDag, JobManager, JobSubDag, SinkNode  # noqa: E402
from marmaray_spark.plans.locking import FileLockManager  # noqa: E402
from marmaray_spark.session import SparkFactory  # noqa: E402
from marmaray_spark.sinks.table import TableSink, WriteOp  # noqa: E402
from marmaray_spark.sources.hive import (  # noqa: E402
    ParquetSource,
    ParquetWorkUnitCalculator,
)


def seed_source_table(spark, src_path: str) -> None:
    """Demo input: orders month-partitioned, with some invalid rows."""
    if os.path.exists(src_path):
        return
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (orders
     .withColumn("o_custkey", F.when(F.col("o_orderkey") % 11 == 0, None)
                 .otherwise(F.col("o_custkey")))
     .withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
     .write.partitionBy("month").parquet(src_path))


def build_dag(spark, work_dir: str) -> JobDag:
    src = os.path.join(work_dir, "source")
    seed_source_table(spark, src)

    meta = FileSystemMetadataManager(os.path.join(work_dir, "checkpoints"))
    calc = ParquetWorkUnitCalculator(PartitionManager(src, meta))
    source = ParquetSource(spark)
    conv = SchemaProjectionConverter(required_keys=["o_orderkey", "o_custkey"])
    table = TableSink(spark, os.path.join(work_dir, "table"),
                      record_key_field="o_orderkey")

    state: dict = {}

    def transform(df):
        res = conv.map(df.drop("month"))
        state["errors"] = res.errors
        return res.valid

    def write_valid(df):
        return table.write(df, WriteOp.UPSERT, metadata=meta.all())

    def write_errors(_df):
        write_error_table(state["errors"], os.path.join(work_dir, "errors"))

    sub_dag = JobSubDag([
        SinkNode("errors", write_errors, priority=0),   # commits first
        SinkNode("table", write_valid, priority=100),
    ])
    return JobDag("orders_ingest", calc, source.get_data, sub_dag, meta,
                  transform=transform)


def main() -> None:
    work_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/marmaray_spark_example"
    spark = SparkFactory("example").get_or_create()
    dag = build_dag(spark, work_dir)

    mgr = JobManager(spark, lock_manager=FileLockManager(
        os.path.join(work_dir, "locks")))
    mgr.add_job_dag(dag)
    results = mgr.run()
    dag.metrics.emit(ConsoleReporter(stream=sys.stdout))

    table = TableSink(spark, os.path.join(work_dir, "table"),
                      record_key_field="o_orderkey")
    had_work = results["orders_ingest"] is True
    print(f"processed_new_partition={had_work} "
          f"table_rows={table.read().count() if had_work or True else 0}")


if __name__ == "__main__":
    main()
