"""Table profiling: per-column data-quality stats in one pass.

The ingest-time QA report every pipeline wants before trusting a feed:
row count, null count, exact distinct count per column — the inputs to
required-key validation thresholds, partition-key choice, and skew
detection (a huge top-1 frequency = salt that key).

One wide aggregate computes every column's stats in a single scan
(count/count-distinct are map-side partial), then unpivots to long form.
All metrics are integers — engine-exact for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-format profile: (column, n_rows, n_nulls, n_distinct,
    top_freq) per column. ``top_freq`` is the count of the most frequent
    non-null value — the skew signal."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .alias(f"__nulls_{c}__"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}__"))
    wide = df.agg(*aggs)

    # top value frequency per column: one groupBy per column over the
    # same scan (cheap columns; for very wide tables sample or restrict)
    freqs = None
    for c in cols:
        f1 = (df.filter(F.col(c).isNotNull()).groupBy(F.col(c)).count()
              .agg(F.max("count").alias("top_freq"))
              .withColumn("column", F.lit(c)))
        freqs = f1 if freqs is None else freqs.unionByName(f1)

    rows = None
    for c in cols:
        r = wide.select(F.lit(c).alias("column"),
                        F.col("__n__").alias("n_rows"),
                        F.col(f"__nulls_{c}__").cast("bigint").alias("n_nulls"),
                        F.col(f"__nd_{c}__").cast("bigint").alias("n_distinct"))
        rows = r if rows is None else rows.unionByName(r)
    return rows.join(freqs, "column", "left") \
        .select("column", "n_rows", "n_nulls", "n_distinct",
                F.coalesce(F.col("top_freq"), F.lit(0)).cast("bigint")
                .alias("top_freq"))
