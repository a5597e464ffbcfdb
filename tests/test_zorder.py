"""Z-order clustering: value correctness and the pruning payoff (per-file
min/max ranges bounded on BOTH dimensions)."""

import pytest
from pyspark.sql import functions as F

from marmaray_spark.operators.zorder import zorder_cluster, zorder_value


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3)], ["x", "y"])
    got = {(r["x"], r["y"]): r["z"] for r in
           df.select("x", "y", zorder_value(["x", "y"], bits=4).alias("z"))
           .collect()}
    # x bits at even positions, y bits at odd: z = interleave(x, y)
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1      # x bit0 -> position 0
    assert got[(0, 1)] == 2      # y bit0 -> position 1
    assert got[(1, 1)] == 3
    assert got[(2, 0)] == 4      # x bit1 -> position 2
    assert got[(3, 3)] == 15


def test_zorder_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        zorder_value(["x"])
    with pytest.raises(ValueError):
        zorder_value(["a", "b", "c", "d"], bits=16)


def _file_ranges(path, col):
    """(min, max) of col per parquet file, from footers."""
    from pathlib import Path

    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).rglob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        ci = next(i for i in range(md.num_columns)
                  if md.row_group(0).column(i).path_in_schema == col)
        lo = min(md.row_group(r).column(ci).statistics.min
                 for r in range(md.num_row_groups))
        hi = max(md.row_group(r).column(ci).statistics.max
                 for r in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    """After z-clustering into 8 files, a box predicate on (x, y) prunes
    most files via footer min/max; a single-column sort layout only
    bounds its own column."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, ["x", "y"])

    zpath = str(tmp_path / "z")
    zorder_cluster(df, ["x", "y"], bits=6, num_partitions=8) \
        .write.parquet(zpath)
    spath = str(tmp_path / "s")
    df.repartitionByRange(8, "x").sortWithinPartitions("x") \
        .write.parquet(spath)

    def overlapping(path, qx, qy):
        xs = _file_ranges(path, "x")
        ys = _file_ranges(path, "y")
        return sum(1 for (xlo, xhi), (ylo, yhi) in zip(xs, ys)
                   if not (xhi < qx[0] or xlo > qx[1]
                           or yhi < qy[0] or ylo > qy[1]))

    n_files = len(_file_ranges(zpath, "x"))

    # 2-D box: z-layout prunes
    z_box = overlapping(zpath, (8, 15), (8, 15))
    assert z_box < n_files

    # y-only predicate — the case single-column sort CANNOT prune (every
    # x-sorted file spans all y); z-order still does
    z_y = overlapping(zpath, (0, 63), (8, 15))
    s_y = overlapping(spath, (0, 63), (8, 15))
    assert s_y == n_files            # x-sort layout scans everything
    assert z_y < s_y                 # z-layout prunes on y too
    # correctness: clustering only reorders rows
    assert spark.read.parquet(zpath).count() == len(rows)


def test_rank_bucket_maps_floats_to_zorderable_ints(spark):
    from marmaray_spark.operators.zorder import rank_bucket, zorder_value

    df = spark.createDataFrame([(i, i * 0.37 % 13.0) for i in range(256)],
                               ["id", "price"])
    ranked = rank_bucket(df, "price", bits=4)
    vals = [r["price_rank"] for r in ranked.collect()]
    assert min(vals) == 0 and max(vals) == 15
    # order-preserving: higher price never gets a lower bucket
    rows = sorted((r["price"], r["price_rank"]) for r in ranked.collect())
    assert all(a[1] <= b[1] for a, b in zip(rows, rows[1:]))
    # and the result feeds zorder_value directly
    z = ranked.withColumn("id_r", (F.col("id") % 16).cast("bigint"))
    z.select(zorder_value(["id_r", "price_rank"], bits=4).alias("z")).collect()
