"""Data converters: project / validate / transform with a valid|error fork.

Reference parity: AbstractDataConverter.map() wraps per-record convert()
in a ForkOperator producing VALID(0)/ERROR(1) streams, appending errors to
the error table (M/common/converters/data/AbstractDataConverter.java:102-171).
Concrete converters re-expressed here:

- SparkSourceDataConverter (Row->Avro, required-keys validation, drop
  ``_``-prefixed fields, :61-159)     -> SchemaProjectionConverter
- KafkaSourceDataConverter (byte[]->record + chained row rewriters,
  :43-103)                            -> JsonDecodeConverter + with_columns
- JSONFileSourceDataConverter (malformed JSON -> error, :35-73)
                                      -> JsonDecodeConverter (PERMISSIVE)
- TSBasedHoodieSinkDataConverter (recordKey + yyyy/MM/dd partitionPath
  from an epoch ts field, :42-79)     -> add_record_key_and_partition
- FileSinkDataCSVConverter / FileSinkDataJSONConverter (:51-135/:48-135)
                                      -> encode_csv_lines / encode_json_lines

The per-record ``convert()`` contract becomes a Catalyst expression; the
semantics kept are: every input row lands in exactly one of (valid, error)
and the error row carries a message plus the stringified source record.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marmaray_spark.operators.errors import to_error_records
from marmaray_spark.operators.fork import ERROR_KEY, VALID_KEY, valid_error_fork


@dataclass
class ConversionResult:
    """Success XOR error split of one conversion pass.

    Reference: ConverterResult success/error cell
    (M/common/converters/converterresult/ConverterResult.java) lifted from
    per-record to per-DataFrame.
    """

    valid: DataFrame
    errors: DataFrame          # canonical error schema (operators.errors)
    valid_count: int
    error_count: int


class DataConverter:
    """Base: subclasses define a validity predicate + a transform.

    map() = fork(valid|error) -> transform(valid), with counts observed in
    the same pass (AbstractDataConverter.map semantics).
    """

    persist_level: str = "MEMORY_AND_DISK"

    def validity(self, df: DataFrame) -> Column:
        return F.lit(True)

    def error_message(self, df: DataFrame) -> Column:
        return F.lit("validation failed")

    def row_key(self, df: DataFrame) -> Column | None:
        return None

    def transform(self, df: DataFrame) -> DataFrame:
        return df

    def map(self, df: DataFrame) -> ConversionResult:
        fork = valid_error_fork(df, self.validity(df), self.persist_level)
        valid = self.transform(fork.get_fork_data(VALID_KEY))
        errors = to_error_records(
            fork.get_fork_data(ERROR_KEY),
            self.error_message(df),
            row_key=self.row_key(df),
        )
        return ConversionResult(valid, errors,
                                fork.get_count(VALID_KEY), fork.get_count(ERROR_KEY))


class SchemaProjectionConverter(DataConverter):
    """Project to target fields, drop ``_``-prefixed fields, validate
    required keys (null/missing -> error channel).

    Reference: SparkSourceDataConverter.java:61-159 (required-keys check ->
    error record or hard fail under SHOULD_SKIP_INVALID_ROWS=false) and the
    ``_`` drop at :77-78.
    """

    def __init__(self, required_keys: Sequence[str] = (),
                 fields_to_convert: Sequence[str] | None = None,
                 fail_on_invalid: bool = False) -> None:
        self.required_keys = list(required_keys)
        self.fields_to_convert = list(fields_to_convert) if fields_to_convert else None
        self.fail_on_invalid = fail_on_invalid

    def validity(self, df: DataFrame) -> Column:
        cond = F.lit(True)
        for k in self.required_keys:
            cond = cond & F.col(k).isNotNull()
        return cond

    def error_message(self, df: DataFrame) -> Column:
        return F.lit(f"required fields missing: one of {self.required_keys}")

    def row_key(self, df: DataFrame) -> Column | None:
        if self.required_keys:
            return F.concat_ws("|", *[F.col(k).cast("string") for k in self.required_keys])
        return None

    def transform(self, df: DataFrame) -> DataFrame:
        cols = self.fields_to_convert or df.columns
        cols = [c for c in cols if not c.startswith("_")]
        return df.select(*cols)

    def map(self, df: DataFrame) -> ConversionResult:
        result = super().map(df)
        if self.fail_on_invalid and result.error_count > 0:
            raise ValueError(
                f"{result.error_count} rows failed required-key validation "
                f"{self.required_keys} and SHOULD_SKIP_INVALID_ROWS is false")
        return result


class JsonDecodeConverter(DataConverter):
    """Decode a JSON-string column against a schema; malformed -> error.

    Reference: JSONFileSourceDataConverter.java:35-73 (MercifulJsonConverter
    parse-or-error) and KafkaSourceDataConverter's decode step. PERMISSIVE
    semantics: a row whose JSON does not parse into the schema fans to the
    error channel with the raw line preserved.
    """

    DECODED = "__decoded__"
    CORRUPT = "_corrupt_record"

    def __init__(self, json_col: str, schema: T.StructType) -> None:
        self.json_col = json_col
        self.schema = schema

    def map(self, df: DataFrame) -> ConversionResult:
        # PERMISSIVE from_json fills a corrupt-record field on malformed
        # input (an all-null struct otherwise looks identical to a valid
        # all-null row, so the marker column is required).
        decode_schema = T.StructType(
            list(self.schema.fields) + [T.StructField(self.CORRUPT, T.StringType(), True)])
        decoded = df.withColumn(
            self.DECODED,
            F.from_json(F.col(self.json_col), decode_schema,
                        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": self.CORRUPT}))
        ok = F.col(self.DECODED).isNotNull() & \
            F.col(f"{self.DECODED}.{self.CORRUPT}").isNull()
        fork = valid_error_fork(decoded, ok, self.persist_level)
        valid = (fork.get_fork_data(VALID_KEY)
                 .select(f"{self.DECODED}.*").drop(self.CORRUPT))
        errors = to_error_records(
            fork.get_fork_data(ERROR_KEY).drop(self.DECODED),
            F.lit("malformed JSON record"),
        )
        return ConversionResult(valid, errors,
                                fork.get_count(VALID_KEY), fork.get_count(ERROR_KEY))


class AvroDecodeConverter(DataConverter):
    """Decode an Avro-binary column against a registry-served ``.avsc``
    schema; malformed payloads fan to the error channel with the raw
    bytes preserved (hex-stringified in the error record).

    Reference: KafkaSourceDataConverter.java:43-103 decode step backed by
    HDFSSchemaService.getReader (HDFSSchemaService.java:62,173-195) — the
    reader is pinned to an explicit schema version or follows latest.
    Decode runs via functions/avro_codec.decode_avro (Arrow-batched
    mapInPandas; see that module for why not ``from_avro``).
    """

    OK = "__avro_ok__"

    def __init__(self, registry, name: str, version: int | None = None,
                 value_col: str = "value") -> None:
        self.registry = registry
        self.name = name
        self.version = version
        self.value_col = value_col

    def map(self, df: DataFrame) -> ConversionResult:
        from marmaray_spark.functions.avro_codec import decode_avro

        avsc = self.registry.get_avro_schema(self.name, self.version)
        decoded = decode_avro(df, avsc, value_col=self.value_col, ok_col=self.OK)
        fork = valid_error_fork(decoded, F.col(self.OK), self.persist_level)
        decoded_fields = [f for f in decoded.columns
                          if f not in df.columns and f != self.OK]
        valid = fork.get_fork_data(VALID_KEY).select(*decoded_fields)
        err_src = (fork.get_fork_data(ERROR_KEY)
                   .select(*[F.hex(F.col(c)).alias(c)
                             if dict(df.dtypes).get(c) == "binary" else F.col(c)
                             for c in df.columns]))
        errors = to_error_records(
            err_src, F.lit(f"malformed avro payload (schema {self.name})"))
        return ConversionResult(valid, errors,
                                fork.get_count(VALID_KEY), fork.get_count(ERROR_KEY))


def with_columns(df: DataFrame,
                 update_fns: Mapping[str, Column] | Sequence[Callable[[DataFrame], DataFrame]]
                 ) -> DataFrame:
    """Chained row rewriters (KafkaSourceDataConverter updateFunctions,
    :54-56): either a {col: expression} map or a list of DataFrame->DataFrame
    callables applied in order."""
    if isinstance(update_fns, Mapping):
        return df.withColumns(dict(update_fns))
    for fn in update_fns:
        df = fn(df)
    return df


def add_record_key_and_partition(df: DataFrame, record_key_field: str,
                                 ts_field: str,
                                 key_col: str = "record_key",
                                 partition_col: str = "partition_path") -> DataFrame:
    """recordKey = field value; partitionPath = yyyy/MM/dd of a timestamp.

    Reference: TSBasedHoodieSinkDataConverter.java:42-79 (epoch-millis field
    -> date partition path). Accepts either TimestampType or epoch-millis
    numeric columns (the reference stores ms-since-epoch longs,
    SchemaUtil.java:187-199).
    """
    ts = F.col(ts_field)
    dtype = dict(df.dtypes)[ts_field]
    if dtype in ("bigint", "int", "double", "float", "decimal"):
        ts = F.timestamp_millis(ts.cast("long"))
    return (df
            .withColumn(key_col, F.col(record_key_field).cast("string"))
            .withColumn(partition_col, F.date_format(ts, "yyyy/MM/dd")))


def encode_csv_lines(df: DataFrame, sep: str = ",") -> DataFrame:
    """Rows -> one CSV-encoded string column ``line`` (quote ``"``, escape
    doubling). Reference: FileSinkDataCSVConverter.java:51-135."""
    encoded = [
        F.when(
            F.col(c).cast("string").rlike('[,"\n\r]') | F.col(c).cast("string").contains(sep),
            F.concat(F.lit('"'),
                     F.regexp_replace(F.col(c).cast("string"), '"', '""'),
                     F.lit('"')),
        ).otherwise(F.col(c).cast("string"))
        for c in df.columns
    ]
    return df.select(F.concat_ws(sep, *encoded).alias("line"))


def encode_json_lines(df: DataFrame, row_identifier: str | None = None) -> DataFrame:
    """Rows -> JSON-object string column ``line`` (+ optional key column).

    Reference: FileSinkDataJSONConverter.java:48-135 (key = row_identifier
    field for sequence-file output)."""
    out = df.select(F.to_json(F.struct(*df.columns)).alias("line"))
    if row_identifier is not None:
        out = df.select(F.col(row_identifier).cast("string").alias("key"),
                        F.to_json(F.struct(*df.columns)).alias("line"))
    return out


class ConverterChain:
    """Run converters in sequence: each stage's valid stream feeds the
    next; every stage's rejects land in ONE merged error table with a
    ``hadoop_changelog_columns`` stage tag saying which stage rejected
    the row.

    Reference: the DAG wires one converter per edge and Kafka converters
    chain row-level update functions (KafkaSourceDataConverter.java:54-56);
    real pipelines validate in layers (decode -> schema -> domain), and
    operationally you want one error table for the whole feed.
    """

    def __init__(self, stages: Sequence[tuple[str, DataConverter]]) -> None:
        if not stages:
            raise ValueError("need at least one stage")
        names = [n for n, _ in stages]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stage names: {names}")
        self.stages = list(stages)

    def map(self, df: DataFrame) -> ConversionResult:
        valid = df
        all_errors: DataFrame | None = None
        valid_count = 0
        error_count = 0
        for name, conv in self.stages:
            res = conv.map(valid)
            valid = res.valid
            valid_count = res.valid_count
            error_count += res.error_count
            staged = res.errors.withColumn("hadoop_changelog_columns",
                                           F.lit(name))
            all_errors = staged if all_errors is None \
                else all_errors.unionByName(staged)
        return ConversionResult(valid, all_errors, valid_count, error_count)
