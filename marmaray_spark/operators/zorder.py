"""Z-order (Morton) clustering: multi-column data layout for 2-D+ pruning.

Beyond the reference (single-sort layouts only). Range-partitioning by a
single key gives tight file min/max on that key alone; interleaving the
bits of several keys into one Morton value and range-clustering on it
gives *simultaneously* bounded ranges on every participating column —
parquet footer min/max then prunes files for predicates on ANY of them
(the Delta/Iceberg OPTIMIZE ZORDER move, done with plain expressions).

All-integer bit arithmetic on non-negative keys — engine-exact, so a SQL
oracle reproduces the values bit-for-bit. Map non-integer/negative keys
into rank space first (ntile or percent_rank * 2^bits) at the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__z__"


def zorder_value(cols: list[str], bits: int = 16) -> Column:
    """Morton interleave of ``bits`` low bits of each column.

    Bit b of column i lands at output position b * n_cols + i; columns
    must be non-negative integers (cast/rank upstream). n_cols * bits
    must fit a signed 64-bit long."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    if n * bits > 62:
        raise ValueError("n_cols * bits must be <= 62")
    terms = [
        f"shiftleft(shiftright(cast({c} as bigint), {b}) & 1, {b * n + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return F.expr(" + ".join(terms))


def rank_bucket(df: DataFrame, col: str, bits: int = 16,
                out_col: str | None = None) -> DataFrame:
    """Map ANY orderable column (float, string, timestamp) into integer
    rank space [0, 2^bits) via ntile — the preprocessing that makes it
    z-orderable. One pass over a single-column window; for very large
    inputs substitute approx percentiles for the same effect."""
    from pyspark.sql import Window as W

    out = out_col or f"{col}_rank"
    return df.withColumn(
        out, (F.ntile(1 << bits).over(W.orderBy(F.col(col))) - 1).cast("bigint"))


def boundary_rank(col: str, boundaries: list[float]) -> Column:
    """Rank-bucket ``col`` against a PRE-COMPUTED ascending boundary
    list (e.g. from ``approxQuantile``): bucket = number of boundaries
    strictly below the value — a codegen fold over the broadcast
    literal array, no shuffle, no window. NULLs land in bucket 0. The
    scale-honest alternative to ``rank_bucket``'s global-window ntile
    (one quantile PASS sizes the boundaries; each row then pays an
    O(len(boundaries)) expression, fine for the 255-entry 8-bit grid a
    z-order layout wants)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr, F.lit(0).cast("bigint"),
        lambda acc, b: acc + F.when(F.col(col).cast("double") > b,
                                    F.lit(1)).otherwise(F.lit(0)))


def zorder_cluster(df: DataFrame, cols: list[str], bits: int = 16,
                   num_partitions: int | None = None) -> DataFrame:
    """Cluster rows by Morton value: one range shuffle (the same cost a
    single-column sort pays) after which every output partition holds a
    compact z-range — tight per-file min/max on EVERY zorder column."""
    z = df.withColumn(Z_COL, zorder_value(cols, bits))
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (z.repartitionByRange(n, F.col(Z_COL))
            .sortWithinPartitions(Z_COL)
            .drop(Z_COL))
