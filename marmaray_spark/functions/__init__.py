"""Scalar function helpers (timestamp codecs, date partitions, encodings)."""

from marmaray_spark.functions.scalars import (
    date_partition,
    micros_to_millis,
    millis_to_timestamp,
    timestamp_to_millis,
)

__all__ = [
    "timestamp_to_millis",
    "millis_to_timestamp",
    "micros_to_millis",
    "date_partition",
]
