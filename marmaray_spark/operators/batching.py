"""Scalable total ordering: global row numbers / batch ids without a
single-task window.

Reference parity: CassandraSSTableSink sorts by composite key and assigns
size-capped batches via zipWithIndex
(M/common/sinks/cassandra/CassandraSSTableSink.java:155-192,262-284).

A naive ``row_number() OVER (ORDER BY ...)`` funnels every row through ONE
task — fine at sf0.01, fatal at 100 TB. The scalable plan is the classic
two-phase zipWithIndex:

1. range-partition by the sort keys (repartitionByRange — samples the
   keys, so partitions are balanced even under skew);
2. local row_number within each (sorted) partition;
3. broadcast-join each partition's cumulative row-count offset, computed
   from a tiny per-partition count aggregate;
4. global position = partition offset + local row number.

Only tiny metadata (num_partitions rows) crosses the driver; the data
path is one range shuffle — the same cost the total sort itself requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

PART_COL = "__range_pid__"
LOCAL_RN = "__local_rn__"
OFFSET_COL = "__part_offset__"


def global_row_numbers(df: DataFrame, sort_cols: list[str],
                       num_partitions: int | None = None,
                       out_col: str = "row_num") -> DataFrame:
    """1-based global row numbers in (sort_cols) order, shuffle-scalable."""
    cols = [F.col(c) for c in sort_cols]
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (df.repartitionByRange(int(n), *cols)
              .withColumn(PART_COL, F.spark_partition_id()))
    local = ranged.withColumn(
        LOCAL_RN, F.row_number().over(W.partitionBy(PART_COL).orderBy(*cols)))
    # MUST materialize: spark_partition_id is nondeterministic and the
    # range boundaries are sampled — the offsets branch and the join
    # branch below would otherwise re-evaluate `local` independently and
    # can disagree (observed: overlapping row numbers). One persisted
    # evaluation makes both branches read identical partition ids.
    local = local.persist()
    local.count()
    # tiny: one row per partition
    offsets = (local.groupBy(PART_COL).agg(F.count(F.lit(1)).alias("cnt"))
               .withColumn(
                   OFFSET_COL,
                   F.coalesce(
                       F.sum("cnt").over(
                           W.orderBy(PART_COL)
                           .rowsBetween(W.unboundedPreceding, -1)),
                       F.lit(0)))
               .drop("cnt"))
    return (local.join(F.broadcast(offsets), PART_COL)
            .withColumn(out_col, (F.col(OFFSET_COL) + F.col(LOCAL_RN)).cast("bigint"))
            .drop(PART_COL, LOCAL_RN, OFFSET_COL))


def batched_by_size(df: DataFrame, sort_cols: list[str], batch_size: int,
                    batch_col: str = "batch_id") -> DataFrame:
    """Total sort + stable size-capped batch ids (the SSTable bulk-load
    shape: sorted runs, bounded batch memory)."""
    numbered = global_row_numbers(df, sort_cols, out_col="__rn__")
    return (numbered
            .withColumn(batch_col,
                        F.floor((F.col("__rn__") - 1) / batch_size).cast("bigint"))
            .drop("__rn__"))
