"""Error-table protocol: every converter/sink can emit rejected records.

Reference parity: M/utilities/ErrorTableUtil.java:63-196 writes error
records with columns (hadoop_row_key, hadoop_error_source_data,
hadoop_error_exception, hadoop_changelog_columns, hadoop_application_id)
to a date-partitioned ``<table>_error`` Hudi table, spreading record keys
over 256 random suffixes. Field extraction is pluggable
(M/utilities/ErrorExtractor.java).

Spark-first translation: the error channel is a DataFrame carrying the
same columns; the sink is an append-mode date-partitioned parquet write.
The 256-suffix key spread exists only to avoid hot Hudi file groups — on
parquet the append write is already partition-parallel, so a deterministic
key is kept instead (better for testing, no hot spot to avoid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERROR_SCHEMA_COLS = [
    "hadoop_row_key",
    "hadoop_error_source_data",
    "hadoop_error_exception",
    "hadoop_changelog_columns",
    "hadoop_application_id",
    "error_date",
]


def to_error_records(df: DataFrame, error_message: Column | str,
                     row_key: Column | None = None,
                     changelog_columns: Column | None = None) -> DataFrame:
    """Project arbitrary rejected rows into the canonical error schema.

    ``hadoop_error_source_data`` stringifies the full source row as JSON
    (reference stringifies the Avro record, ErrorTableUtil.java:178-190).
    """
    msg = F.lit(error_message) if isinstance(error_message, str) else error_message
    key = row_key if row_key is not None else F.lit("")
    app_id = df.sparkSession.sparkContext.applicationId
    return df.select(
        key.cast("string").alias("hadoop_row_key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("hadoop_error_source_data"),
        msg.cast("string").alias("hadoop_error_exception"),
        (changelog_columns if changelog_columns is not None else F.lit("")).cast("string")
        .alias("hadoop_changelog_columns"),
        F.lit(app_id).alias("hadoop_application_id"),
        F.date_format(F.current_date(), "yyyy/MM/dd").alias("error_date"),
    )


def write_error_table(errors: DataFrame, table_path: str) -> None:
    """Append error records to ``<table>_error`` parquet, date-partitioned."""
    (errors.write.mode("append").partitionBy("error_date")
     .parquet(table_path.rstrip("/") + "_error"))


def read_error_table(spark, table_path: str,
                     error_date: str | None = None) -> DataFrame:
    """Read the ``<table>_error`` table back (optionally one date
    partition — partition-pruned scan)."""
    df = spark.read.parquet(table_path.rstrip("/") + "_error")
    return df.filter(F.col("error_date") == error_date) if error_date else df


def replay_error_records(spark, table_path: str, schema,
                         error_date: str | None = None) -> DataFrame:
    """Quarantine replay: parse ``hadoop_error_source_data`` back into
    typed rows so fixed records re-enter the pipeline (the operational
    follow-up the reference's error tables exist for). Rows whose JSON no
    longer matches ``schema`` parse to nulls — validate again downstream."""
    errs = read_error_table(spark, table_path, error_date)
    return (errs.select(F.from_json("hadoop_error_source_data", schema)
                        .alias("r"))
            .select("r.*"))
