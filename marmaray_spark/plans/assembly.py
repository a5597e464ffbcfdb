"""Config-driven pipeline assembly: YAML/properties -> runnable JobDag.

Reference parity: every reference job is wired from a YAML config
(ParquetToCassandraJob.java:330-371 CLI ``-c file``/``-j json``); this
module is the equivalent factory for this engine's parts. Keys:

    job.name                  pipeline / lock / metrics name
    source.type               parquet | json
    source.path               table or directory path
    source.schema_json        (json source) StructType JSON string
    converter.required_keys   comma-separated non-null key columns
    converter.fields          optional comma-separated projection
    sink.type                 table | csv | json
    sink.path                 output path
    sink.record_key           (table) record key field
    sink.partition_field      (table) optional partition column
    sink.op                   (table) insert|bulk_insert|dedup_insert|
                              upsert|insert_overwrite
    sink.cluster_by_key       (table) sorted disjoint-range slices
    sink.target_file_size_mb  (table) parallelism auto-tune target
    sink.compression          (csv/json) lz4|gzip|snappy|zstd
    error_table.path          optional error-table parquet dir
    checkpoints.path          metadata manager directory

Unknown sink/source types raise — fail at assembly, not mid-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from marmaray_spark.config import Configuration
from marmaray_spark.converters import SchemaProjectionConverter
from marmaray_spark.metadata import FileSystemMetadataManager, PartitionManager
from marmaray_spark.operators.errors import write_error_table
from marmaray_spark.plans.dag import JobDag, JobSubDag, SinkNode
from marmaray_spark.sinks.file import FileSink
from marmaray_spark.sinks.table import TableSink, WriteOp
from marmaray_spark.sources.hive import ParquetSource, ParquetWorkUnitCalculator


def build_job_dag(spark: SparkSession, config: Configuration) -> JobDag:
    name = config.get_required("job.name")
    meta = FileSystemMetadataManager(config.get_required("checkpoints.path"))

    src_type = config.get("source.type", "parquet")
    if src_type == "parquet":
        calc = ParquetWorkUnitCalculator(
            PartitionManager(config.get_required("source.path"), meta))
        source = ParquetSource(spark)
        get_data = source.get_data
    elif src_type == "json":
        from pyspark.sql import types as T

        from marmaray_spark.sources.file import (
            FileWorkUnitCalculator,
            JsonFileSource,
        )
        calc = FileWorkUnitCalculator(config.get_required("source.path"))
        schema = T.StructType.fromJson(
            __import__("json").loads(config.get_required("source.schema_json")))
        jsrc = JsonFileSource(spark, schema)
        get_data = lambda wu: jsrc.get_data(wu).valid  # noqa: E731
    else:
        raise ValueError(f"unknown source.type {src_type!r}")

    required = [k for k in (config.get("converter.required_keys") or "").split(",")
                if k]
    fields = [k for k in (config.get("converter.fields") or "").split(",") if k]
    conv = SchemaProjectionConverter(
        required_keys=required, fields_to_convert=fields or None) \
        if required or fields else None

    state: dict = {}

    def transform(df: DataFrame) -> DataFrame:
        if conv is None:
            return df
        res = conv.map(df)
        state["errors"] = res.errors
        return res.valid

    nodes: list[SinkNode] = []
    err_path = config.get("error_table.path")
    if err_path and conv is not None:
        nodes.append(SinkNode(
            "errors", lambda _df: write_error_table(state["errors"], err_path),
            priority=0))

    sink_type = config.get_required("sink.type")
    if sink_type == "table":
        table = TableSink(spark, config.get_required("sink.path"),
                          record_key_field=config.get_required("sink.record_key"),
                          partition_field=config.get("sink.partition_field"),
                          cluster_by_key=config.get_bool("sink.cluster_by_key", False),
                          target_file_size_mb=config.get_float(
                              "sink.target_file_size_mb", 128.0))
        op = WriteOp(config.get("sink.op", "upsert"))

        # Two-phase: the write phase only STAGES slices (invisible to
        # readers); publication happens in the commit phase, which
        # JobSubDag fires in priority order after EVERY sink's write
        # succeeded (JobSubDag.java commit-by-priority). A sibling-sink
        # failure therefore never leaves a published-but-uncheckpointed
        # table commit (the duplicate-reprocess hazard).
        def write_table(df: DataFrame, _table=table, _op=op):
            state["staged"] = _table.stage(df, _op, metadata=meta.all())

        def commit_table(_table=table):
            _table.commit_staged(state.pop("staged", None))

        nodes.append(SinkNode("table", write_table, commit=commit_table,
                              priority=100))
    elif sink_type in ("csv", "json"):
        fsink = FileSink(config.get_required("sink.path"), fmt=sink_type,
                         file_size_mb=config.get_float("sink.file_size_mb", -1),
                         compression=config.get("sink.compression"))
        nodes.append(SinkNode("file", fsink.write, priority=100))
    else:
        raise ValueError(f"unknown sink.type {sink_type!r}")

    return JobDag(name, calc, get_data, JobSubDag(nodes), meta,
                  transform=transform)
