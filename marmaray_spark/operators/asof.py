"""As-of join: for each left row, the temporally closest right row per
key — pandas ``merge_asof`` semantics (backward / forward / nearest,
optional tolerance) as a scalable Spark operator.

Spark has no native as-of join. The classic implementations are a range
join (quadratic blowup on dense keys) or a per-key ``applyInPandas``
(Python in the hot path). This one is the UNION-TAG plan: tag and union
both sides, one shuffle on (key, time), then a running
``last_value(ignore nulls)`` (backward) and/or ``first_value`` over the
following frame (forward) carries the nearest right payload to every
left row. Cost = one shuffle + one window pass, linear at any scale —
the same shape as the declared ``asof_join_last_purchase`` query
(queries.py), generalized to two arbitrary frames, struct payloads and
all three directions.

Ordering detail: right rows sort BEFORE left rows at an equal
timestamp, so an exact-tie right row matches backward (pandas
``allow_exact_matches=True`` default) and forward alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              direction: str = "backward",
              tolerance: int | None = None,
              payload_prefix: str = "r_") -> DataFrame:
    """Returns ``left`` plus, per row, the matched right row's payload
    columns (every non-key right column, renamed ``{payload_prefix}{c}``)
    and ``{payload_prefix}{on}`` (the matched timestamp; null = no match).

    ``on`` must be an orderable numeric/timestamp column present in both
    frames; ``by`` the equi-key; ``tolerance`` (same units as ``on``)
    drops matches farther than the bound, like merge_asof's."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    payload_cols = [c for c in right.columns if c not in (on, by)]

    # collision guard: the plan uses fixed internal names and generates
    # prefixed outputs — inputs that already carry any of them would
    # silently produce duplicate/ambiguous columns or wrong struct
    # extraction, so fail loudly instead
    reserved = {"__side__", "__p__", "__b__", "__f__", "__m__"}
    clash = sorted(reserved & set(left.columns) | reserved & set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserves column names {clash}; "
                         "rename them on the input frames")
    if "__t__" in payload_cols:
        raise ValueError("asof_join reserves '__t__' inside the right "
                         "payload; rename that column")
    out_names = [f"{payload_prefix}{c}" for c in (on, *payload_cols)]
    dup_out = sorted(set(out_names) & set(left.columns))
    if dup_out:
        raise ValueError(
            f"prefixed payload columns {dup_out} collide with left columns; "
            f"pass a different payload_prefix than {payload_prefix!r}")

    r = right.select(
        F.col(by), F.col(on),
        F.lit(0).alias("__side__"),
        F.struct(F.col(on).alias("__t__"), *payload_cols).alias("__p__"))
    l = left.withColumn("__side__", F.lit(1)) \
        .withColumn("__p__", F.lit(None).cast(r.schema["__p__"].dataType))
    lcols = [c for c in left.columns]
    unioned = l.select(*lcols, "__side__", "__p__") \
        .unionByName(r.select(F.col(by), F.col(on), "__side__", "__p__"),
                     allowMissingColumns=True)

    # tie order is direction-specific so equal timestamps match both ways
    # (merge_asof allow_exact_matches=True): backward scans need the
    # equal-ts right row BEFORE the left row, forward scans need it AFTER
    back_w = (Window.partitionBy(by).orderBy(F.col(on).asc(),
                                             F.col("__side__").asc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fwd_w = (Window.partitionBy(by).orderBy(F.col(on).asc(),
                                            F.col("__side__").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))

    out = unioned
    if direction in ("backward", "nearest"):
        out = out.withColumn("__b__", F.last("__p__", ignorenulls=True)
                             .over(back_w))
    if direction in ("forward", "nearest"):
        out = out.withColumn("__f__", F.first("__p__", ignorenulls=True)
                             .over(fwd_w))
    out = out.filter(F.col("__side__") == 1)

    if direction == "backward":
        match = F.col("__b__")
    elif direction == "forward":
        match = F.col("__f__")
    else:
        bd = F.abs(F.col(on) - F.col("__b__.__t__"))
        fd = F.abs(F.col("__f__.__t__") - F.col(on))
        match = (F.when(F.col("__b__").isNull(), F.col("__f__"))
                 .when(F.col("__f__").isNull(), F.col("__b__"))
                 # tie -> backward, matching merge_asof
                 .when(bd <= fd, F.col("__b__"))
                 .otherwise(F.col("__f__")))
    out = out.withColumn("__m__", match)
    if tolerance is not None:
        out = out.withColumn(
            "__m__",
            F.when(F.abs(F.col(on) - F.col("__m__.__t__")) <= tolerance,
                   F.col("__m__")))

    sel = [*lcols,
           F.col("__m__.__t__").alias(f"{payload_prefix}{on}")]
    sel += [F.col(f"__m__.{c}").alias(f"{payload_prefix}{c}")
            for c in payload_cols]
    return out.select(*sel)
