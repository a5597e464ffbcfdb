"""Bucketed range (interval) join: point-in-interval matching without a
cross product.

Spark plans a plain ``lo <= v AND v <= hi`` join as BroadcastNestedLoop
(O(L x R)) — fine for tiny interval sets, fatal at scale. The classic
fix: quantize the value domain into fixed-width buckets, explode each
interval to the buckets it overlaps, equi-join point-bucket to
interval-bucket (hash shuffle, not nested loop), then apply the exact
range predicate. Cost O(L + R x avg_buckets_per_interval + matches).

Pick ``bucket_width`` near the median interval width: much smaller
multiplies the interval explosion; much larger degrades toward the
cross product within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET = "__rb__"


def bucketed_range_join(points: DataFrame, intervals: DataFrame,
                        value_col: str, lo_col: str, hi_col: str,
                        bucket_width: int, how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with
    ``lo_col <= value_col <= hi_col``. Column sets must be disjoint.
    Values/bounds must be integral (quantize floats upstream)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"overlapping columns: {sorted(overlap)}")

    p = points.withColumn(
        BUCKET, F.floor(F.col(value_col) / bucket_width).cast("bigint"))
    i = intervals.withColumn(
        BUCKET,
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / bucket_width).cast("bigint"),
            F.floor(F.col(hi_col) / bucket_width).cast("bigint"))))
    joined = (p.join(i, BUCKET, how)
              .filter((F.col(lo_col) <= F.col(value_col))
                      & (F.col(value_col) <= F.col(hi_col))))
    return joined.drop(BUCKET)
