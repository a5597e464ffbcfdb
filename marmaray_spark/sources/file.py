"""File source: JSON-lines (and CSV) files discovered by a work-unit listing.

Reference parity: FileWorkUnitCalculator lists a directory and filters by
configured suffix (``.json``), stateless
(M/common/sources/file/FileWorkUnitCalculator.java:40-118); FileSource
reads the listed files via textFile and decodes JSON per record
(M/common/sources/file/FileSource.java:41-75), malformed records going to
the error channel (JSONFileSourceDataConverter.java:35-73).

Spark-first: ``spark.read.schema(s).json(paths)`` with PERMISSIVE mode +
``_corrupt_record`` gives the decode-or-error semantics in one JVM-side
pass; the raw-line error channel is preserved for the error table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marmaray_spark.converters import ConversionResult
from marmaray_spark.operators.errors import to_error_records
from marmaray_spark.operators.fork import ERROR_KEY, VALID_KEY, valid_error_fork

CORRUPT_COL = "_corrupt_record"


@dataclass
class FileWorkUnit:
    paths: list[str] = field(default_factory=list)


class FileWorkUnitCalculator:
    """Lists ``<dir>/*.<type>``, lexicographically sorted; stateless."""

    def __init__(self, directory: str | Path, file_type: str = "json") -> None:
        self.directory = Path(directory)
        self.file_type = file_type.lstrip(".")

    def compute_work_units(self) -> list[FileWorkUnit]:
        if not self.directory.is_dir():
            return []
        paths = sorted(str(p) for p in self.directory.glob(f"*.{self.file_type}"))
        return [FileWorkUnit(paths)] if paths else []


class JsonFileSource:
    """Reads JSON-lines with schema; malformed rows -> error channel."""

    def __init__(self, spark: SparkSession, schema: T.StructType) -> None:
        self.spark = spark
        # PERMISSIVE + corrupt-record column captures undecodable lines.
        self.schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])

    def get_data(self, work_unit: FileWorkUnit) -> ConversionResult:
        df = (self.spark.read.schema(self.schema)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", CORRUPT_COL)
              .json(work_unit.paths))
        fork = valid_error_fork(df, F.col(CORRUPT_COL).isNull())
        valid = fork.get_fork_data(VALID_KEY).drop(CORRUPT_COL)
        errors = to_error_records(
            fork.get_fork_data(ERROR_KEY).select(F.col(CORRUPT_COL).alias("raw_line")),
            F.lit("malformed JSON record"),
        )
        return ConversionResult(valid, errors,
                                fork.get_count(VALID_KEY), fork.get_count(ERROR_KEY))


class CsvFileSource:
    """Reads CSV with schema; malformed rows -> error channel.

    Same decode-or-error contract as ``JsonFileSource`` (reference:
    FileSource.java:41-75 routes undecodable records to the error
    converter): PERMISSIVE mode captures rows whose fields don't parse
    into the schema in ``_corrupt_record``, and the fork sends them to
    the error table with the raw line preserved. Header rows are
    skipped per file when ``header=True``; the scan is one JVM-side
    pass (no Python), splittable per file at scale.
    """

    def __init__(self, spark: SparkSession, schema: T.StructType, *,
                 header: bool = False, sep: str = ",") -> None:
        self.spark = spark
        self.header = header
        self.sep = sep
        self.schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])

    def get_data(self, work_unit: FileWorkUnit) -> ConversionResult:
        df = (self.spark.read.schema(self.schema)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", CORRUPT_COL)
              .option("header", str(self.header).lower())
              .option("sep", self.sep)
              .option("enforceSchema", "false")
              .csv(work_unit.paths))
        fork = valid_error_fork(df, F.col(CORRUPT_COL).isNull())
        valid = fork.get_fork_data(VALID_KEY).drop(CORRUPT_COL)
        errors = to_error_records(
            fork.get_fork_data(ERROR_KEY).select(F.col(CORRUPT_COL).alias("raw_line")),
            F.lit("malformed CSV record"),
        )
        return ConversionResult(valid, errors,
                                fork.get_count(VALID_KEY), fork.get_count(ERROR_KEY))
