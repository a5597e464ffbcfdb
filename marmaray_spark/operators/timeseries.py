"""Time-series resampling: fixed-interval rollup with gap fill and
last-observation-carried-forward (the hypertable/"time_bucket_gapfill"
shape).

New surface (not in the reference — BASELINE.md north star): metrics and
event streams are the other big table family a 100 TB platform serves;
the resample-to-grid + LOCF combination is what Spark lacks as a
built-in.

100 TB posture: the dense spine is generated PER KEY from each key's own
min/max bucket (groupBy + sequence + explode) — no driver-side range
collect, no global cross join; the left join back to observed buckets is
an equi-join on (key, bucket); LOCF is one window per key ordered by
bucket. Everything shuffles on the key — uniform if the key is (as here)
a series id. Timestamps are treated as epoch-nanos BIGINTs end to end
(integer div bucketing — engine-exact; the synthetic events table stores
TIMESTAMP(NANOS), read via nanosAsLong)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(df: DataFrame, *, key_col: str, ts_ns_col: str,
                  value_col: str, every_s: int) -> DataFrame:
    """Per key: bucket to ``every_s``-second intervals, aggregate
    (n_events, avg value), densify the bucket range between the key's
    first and last observation, and forward-fill value gaps.

    Returns (key, bucket_start_s, n_events, value_filled) where empty
    buckets carry n_events = 0 and the previous bucket's avg value.
    ``bucket_start_s`` is epoch seconds of the bucket's left edge."""
    if every_s <= 0:
        raise ValueError("every_s must be positive")
    step = every_s * 1_000_000_000
    bucketed = (df
                .withColumn("__b", F.expr(f"cast({ts_ns_col} as bigint) div {step}"))
                .groupBy(key_col, "__b")
                .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                     F.avg(F.col(value_col).cast("double")).alias("__avg")))
    spine = (bucketed.groupBy(key_col)
             .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
             .select(key_col, F.explode(F.expr("sequence(__lo, __hi)")).alias("__b")))
    dense = (spine.join(bucketed, [key_col, "__b"], "left")
             .withColumn("n_events", F.coalesce("n_events", F.lit(0))))
    w = (Window.partitionBy(key_col).orderBy("__b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (dense
            .withColumn("value_filled", F.last("__avg", ignorenulls=True).over(w))
            .select(key_col,
                    (F.col("__b") * every_s).alias("bucket_start_s"),
                    "n_events",
                    F.round("value_filled", 4).alias("value_filled")))
