"""Scalar functions mirroring the reference's small utility surface.

Reference parity (SURVEY §2.8): timestamp encode/decode to epoch millis
(M/utilities/SchemaUtil.java:187-199 — Avro 1.7 lacks timestamps so the
reference stores ms-since-epoch longs), yyyy/MM/dd date partition format
(M/utilities/DateUtil.java, TSBasedHoodieSinkDataConverter.java:71-78),
micro/milli conversion (M/utilities/TimeUnitUtil.java). All pure Catalyst
expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def timestamp_to_millis(col: Column | str) -> Column:
    """TimestampType -> epoch millis long (the reference's wire encoding)."""
    c = F.col(col) if isinstance(col, str) else col
    # parquet naive timestamps arrive as TIMESTAMP_NTZ in Spark 4; with the
    # session pinned to UTC the cast is value-preserving.
    return F.unix_millis(c.cast("timestamp"))


def millis_to_timestamp(col: Column | str) -> Column:
    """Epoch millis long -> TimestampType (decode at the edge)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def micros_to_millis(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("long") / F.lit(1000)).cast("long")


def date_partition(ts: Column | str, fmt: str = "yyyy/MM/dd") -> Column:
    """Timestamp -> date partition path string."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, fmt)
