"""Dataflow + relational operators (fork/error-channel, dedup, upsert,
similarity, text analysis, multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_scalar(df: DataFrame, scalar: DataFrame,
                  key: str = "__one__") -> DataFrame:
    """Attach a 1-row aggregate (a corpus total, a threshold, a floor)
    to every row of ``df`` as columns: ``crossJoin(broadcast(scalar))``,
    centralized.

    The physical plan is a BroadcastNestedLoopJoin whose build side is
    EXACTLY ONE ROW — linear in ``df``, never quadratic; it is the same
    work a BroadcastHashJoin would do minus the hash table, and it is
    how Spark itself would execute an uncorrelated scalar subquery's
    join-back. Every use of this helper is therefore a DELIBERATE BNLJ;
    the repo-wide plan test (tests/test_plans.py
    test_no_allpairs_plan_in_any_declared_query) allowlists the queries
    that attach scalars and flags any OTHER nested-loop join as a bug.

    (A constant-key equi-join does NOT work around the BNLJ node:
    ``lit(1)`` keys fold to a TRUE condition, and Spark 4's optimizer
    even folds ``hash(col)*0+1`` keys and deletes the condition —
    measured, both paths replan as the same BNLJ. The honest plan is
    the explicit one.)

    If the scalar frame has 0 rows the inner cross join drops every
    row; callers attach global aggregates, which always produce exactly
    one row (``groupBy().agg`` emits NULLs, not zero rows, on empty
    input)."""
    del key  # kept for signature stability; the cross join needs none
    return df.crossJoin(F.broadcast(scalar))
