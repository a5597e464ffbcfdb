"""Skew mitigation: salted two-phase aggregation and salted replicate
join for hot keys.

Beyond the reference (its only agg/join surfaces never met skewed keys;
ours — dedup digests, upsert keys, LSH buckets — will at 100 TB). AQE's
skew-join handles sort-merge cases adaptively; these helpers cover what
AQE can't: single hot GROUP BY keys and broadcast-ineligible hot-key
joins, as explicit plan shapes.

Both are deterministic: the salt derives from a hash of other columns,
never from rand(), so retries/speculative tasks and the DuckDB oracle
agree row-for-row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


def _salt_from(cols: Sequence[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of the non-key columns —
    uniform spread without rand()'s retry nondeterminism."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_aggregate(df: DataFrame, group_cols: list[str],
                     aggs: dict[str, tuple[str, str]],
                     salt_buckets: int = 32,
                     salt_source: Sequence[str] | None = None) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``salt_buckets`` tasks; phase 2 merges the per-salt partials by key.
    ``aggs`` maps output name -> (function, column) for the re-aggregable
    functions: sum, count, min, max.

    Spark's hash aggregate already does map-side partial aggregation, so
    this only wins when ONE reduce key overwhelms its task — i.e. true
    key skew, not volume. That's exactly when it's needed.
    """
    supported = {"sum", "count", "min", "max"}
    bad = {fn for fn, _ in aggs.values()} - supported
    if bad:
        raise ValueError(f"not re-aggregable under salting: {sorted(bad)}")

    salt_source = list(salt_source or [c for c in df.columns if c not in group_cols])
    if not salt_source:
        raise ValueError("need at least one non-key column to derive the salt")

    salted = df.withColumn(SALT_COL, _salt_from(salt_source, salt_buckets))
    partial = (salted.groupBy(*group_cols, SALT_COL)
               .agg(*[getattr(F, fn)(col).alias(name)
                      for name, (fn, col) in aggs.items()]))
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return (partial.groupBy(*group_cols)
            .agg(*[merge[fn](name).alias(name)
                   for name, (fn, _) in aggs.items()]))


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt_buckets: int = 8,
                salt_source: Sequence[str] | None = None) -> DataFrame:
    """Inner equi-join resilient to hot keys on the LEFT side.

    Left rows get a deterministic salt in [0, buckets); the right side is
    replicated once per salt value (explode of a literal range — rows x
    buckets, so keep the right side the smaller one). The join key
    becomes (key, salt): a hot left key now lands on ``salt_buckets``
    tasks instead of one.

    When the right side is broadcast-small, prefer broadcast(right) — no
    salt needed; this shape is for mid-size right tables where a hot left
    key would stall one sort-merge task.
    """
    salt_source = list(salt_source or [c for c in left.columns if c != key])
    if not salt_source:
        raise ValueError("need at least one non-key column to derive the salt")

    l = left.withColumn(SALT_COL, _salt_from(salt_source, salt_buckets))
    r = right.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             F.lit(salt_buckets - 1).cast("bigint"))))
    return l.join(r, [key, SALT_COL]).drop(SALT_COL)
