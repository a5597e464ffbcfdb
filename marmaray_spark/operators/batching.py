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
    """1-based global row numbers in (sort_cols) order, shuffle-scalable.

    Local numbering decodes ``monotonically_increasing_id`` — Spark
    packs (partition id << 33) + per-partition row counter, assigned in
    row order within each already-range-sorted partition. Pure JVM
    projection: no second exchange (a ``row_number() OVER (PARTITION BY
    spark_partition_id())`` window forces a full hash shuffle right
    after the range exchange) and no Python round-trip of the data
    (an Arrow pass measured slower than the shuffle it saved).
    """
    cols = [F.col(c) for c in sort_cols]
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (df.repartitionByRange(int(n), *cols)
              .sortWithinPartitions(*cols))
    mid = F.monotonically_increasing_id()
    local = (ranged.withColumn("__mid__", mid)
             .withColumn(PART_COL, F.shiftright("__mid__", 33).cast("int"))
             .withColumn(LOCAL_RN,
                         (F.col("__mid__").bitwiseAND((1 << 33) - 1) + 1))
             .drop("__mid__"))
    # MUST materialize: range boundaries are sampled, so the offsets
    # branch and the join branch below would otherwise re-evaluate
    # `local` independently and can disagree (observed: overlapping row
    # numbers). One persisted evaluation fixes the partition layout.
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
