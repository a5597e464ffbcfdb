"""Count-min sketch: mergeable frequency estimates in depth x width
integer cells (Cormode & Muthukrishnan 2005).

Exact per-term counts need a shuffle keyed by the full term dictionary —
at 100 TB that dictionary is billions of keys and the count table itself
is a large dataset. The CMS bounds the state at ``depth * width`` cells
REGARDLESS of corpus size: every occurrence increments one cell per
hash row, the estimate for a term is the min over its cells, and
``est >= true`` always (collisions only ever inflate). Sketches built on
disjoint corpus slices merge by cell-wise addition, so per-partition /
per-day sketches roll up without touching raw data again — the property
that makes this the scale path for streaming term stats, while the exact
top-k query stays the small-SF oracle.

Engine-exact by construction: cells are derived from md5 (same
bit-for-bit in Spark and DuckDB via the established
``('0x' || substring(md5(...), 1, 8))::BIGINT`` mirror), all arithmetic
is integer, so the declared query's 'cms' section is hash-checked
against the oracle recomputing the sketch in SQL.

Reference parity: uber/marmaray has no sketch layer; this extends the
engine the way its JobMetrics rollups aggregate bounded state
(marmaray/src/main/java/com/uber/marmaray/common/metrics/JobMetrics.java)
— bounded-size summaries that merge associatively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_cell(term: Column, row: int, width: int) -> Column:
    """Hash row ``row``'s cell index for a term: the first 32 bits of a
    salted md5, mod ``width`` — non-negative, engine-exact."""
    h = F.md5(F.concat(F.lit(f"cms{row}:"), term))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(width)).alias(f"cell_{row}")


def cms_build(df: DataFrame, term_col: str, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Build the sketch over one term occurrence per input row.

    Returns ``(row int, cell long, cnt long)`` — at most ``depth *
    width`` rows however large the corpus. One explode (depth entries
    per occurrence) into one map-side-combined groupBy; the shuffle
    carries at most ``depth * width`` distinct keys per partition, not
    the term dictionary."""
    cells = F.explode(F.array(*[
        F.struct(F.lit(j).alias("row"),
                 cms_cell(F.col(term_col), j, width).alias("cell"))
        for j in range(depth)
    ])).alias("rc")
    return (df.select(cells)
            .groupBy(F.col("rc.row").alias("row"),
                     F.col("rc.cell").alias("cell"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (depth, width): cell-wise sum.
    The algebraic property that lets per-slice sketches roll up."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "cell").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(sketch: DataFrame, terms: DataFrame, term_col: str,
               depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate each candidate term: min over its ``depth`` cells.

    The candidate set is expected to be small (a top-k list, a watch
    list); the sketch is bounded at ``depth * width`` rows by
    construction, so the planner/AQE broadcasts it on its own — no
    forced hint (the size bound is a config constant, but the allowlist
    policy is "let the planner see it")."""
    probes = terms.select(
        F.col(term_col),
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("row"),
                     cms_cell(F.col(term_col), j, width).alias("cell"))
            for j in range(depth)
        ])).alias("rc"))
    return (probes.select(term_col, F.col("rc.row").alias("row"),
                          F.col("rc.cell").alias("cell"))
            .join(sketch, ["row", "cell"], "left")
            .groupBy(term_col)
            # an absent cell means NOTHING hashed there -> that row's
            # counter is 0, so a never-seen term estimates 0, not the
            # min of whatever cells happen to exist
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("cms_est")))
