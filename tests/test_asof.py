"""As-of join operator: pandas merge_asof parity (the public semantics
oracle) across directions, tolerance, and randomized inputs."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from marmaray_spark.operators.asof import asof_join

TRADES = [("a", 10, 1), ("a", 20, 2), ("a", 35, 3), ("b", 5, 4), ("b", 100, 5)]
QUOTES = [("a", 8, 1.0), ("a", 20, 2.0), ("a", 30, 3.0), ("b", 50, 4.0)]


def _pandas_ref(trades, quotes, direction, tolerance=None):
    tp = pd.DataFrame(trades, columns=["sym", "t", "trade_id"]).sort_values("t")
    qp = pd.DataFrame(quotes, columns=["sym", "t", "px"]).sort_values("t")
    ref = pd.merge_asof(tp, qp, on="t", by="sym", direction=direction,
                        tolerance=tolerance)
    return {(r.sym, r.t): (None if pd.isna(r.px) else r.px)
            for r in ref.itertuples()}


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_matches_merge_asof(spark, direction):
    trades = spark.createDataFrame(TRADES, ["sym", "t", "trade_id"])
    quotes = spark.createDataFrame(QUOTES, ["sym", "t", "px"])
    got = {(r["sym"], r["t"]): r["r_px"] for r in
           asof_join(trades, quotes, on="t", by="sym",
                     direction=direction).collect()}
    assert got == _pandas_ref(TRADES, QUOTES, direction)


def test_asof_tolerance_and_matched_ts(spark):
    trades = spark.createDataFrame(TRADES, ["sym", "t", "trade_id"])
    quotes = spark.createDataFrame(QUOTES, ["sym", "t", "px"])
    out = asof_join(trades, quotes, on="t", by="sym",
                    direction="backward", tolerance=5)
    got = {(r["sym"], r["t"]): (r["r_px"], r["r_t"]) for r in out.collect()}
    ref = _pandas_ref(TRADES, QUOTES, "backward", tolerance=5)
    assert {k: v[0] for k, v in got.items()} == ref
    # matched timestamp surfaces alongside the payload
    assert got[("a", 10)] == (1.0, 8)
    assert got[("b", 5)] == (None, None)


def test_asof_rejects_unknown_direction(spark):
    df = spark.createDataFrame([("a", 1, 1)], ["sym", "t", "v"])
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df, on="t", by="sym", direction="sideways")


def test_asof_plan_is_one_shuffle_no_range_join(spark):
    trades = spark.createDataFrame(TRADES, ["sym", "t", "trade_id"])
    quotes = spark.createDataFrame(QUOTES, ["sym", "t", "px"])
    plan = asof_join(trades, quotes, on="t", by="sym")._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan          # union-tag, not a join
    # exactly one data exchange: the (key) window partitioning
    assert plan.count("Exchange hashpartitioning") <= 1


@given(st.lists(st.tuples(st.sampled_from(["x", "y"]),
                          st.integers(min_value=0, max_value=50)),
                min_size=1, max_size=25),
       st.lists(st.tuples(st.sampled_from(["x", "y"]),
                          st.integers(min_value=0, max_value=50)),
                min_size=0, max_size=25),
       st.sampled_from(["backward", "forward", "nearest"]))
@settings(max_examples=15, deadline=None)
def test_asof_property_matches_pandas(spark, lefts, rights, direction):
    # unique (sym, t) on the right: merge_asof picks the LAST of equal
    # timestamps, our window the struct of the last-sorted row — dedupe
    # to keep the oracle comparison well-defined
    rights = list({(s, t): (s, t) for s, t in rights}.values())
    trades = [(s, t, i) for i, (s, t) in enumerate(lefts)]
    quotes = [(s, t, float(i)) for i, (s, t) in enumerate(rights)]
    ldf = spark.createDataFrame(trades, ["sym", "t", "trade_id"])
    rdf = (spark.createDataFrame(quotes, ["sym", "t", "px"])
           if quotes else
           spark.createDataFrame([], "sym string, t long, px double"))
    got = {(r["sym"], r["t"], r["trade_id"]): r["r_px"] for r in
           asof_join(ldf, rdf, on="t", by="sym",
                     direction=direction).collect()}
    tp = pd.DataFrame(trades, columns=["sym", "t", "trade_id"]).sort_values(
        ["t", "trade_id"])
    qp = pd.DataFrame(quotes, columns=["sym", "t", "px"]) \
        .astype({"t": "int64", "px": "float64"}).sort_values("t")
    ref = pd.merge_asof(tp, qp, on="t", by="sym", direction=direction)
    refd = {(r.sym, r.t, r.trade_id): (None if pd.isna(r.px) else r.px)
            for r in ref.itertuples()}
    assert got == refd


def test_asof_rejects_reserved_and_colliding_columns(spark):
    trades = spark.createDataFrame(TRADES, ["sym", "t", "trade_id"])
    quotes = spark.createDataFrame(QUOTES, ["sym", "t", "px"])

    # reserved internal name on either side
    with pytest.raises(ValueError, match="reserves column names"):
        asof_join(trades.withColumn("__side__", F.lit(1)), quotes,
                  on="t", by="sym")
    with pytest.raises(ValueError, match="reserves column names"):
        asof_join(trades, quotes.withColumn("__p__", F.lit(1)),
                  on="t", by="sym")
    # right payload column named __t__ would break struct extraction
    with pytest.raises(ValueError, match="__t__"):
        asof_join(trades, quotes.withColumnRenamed("px", "__t__"),
                  on="t", by="sym")
    # generated r_px collides with an existing left column
    with pytest.raises(ValueError, match="payload_prefix"):
        asof_join(trades.withColumn("r_px", F.lit(0.0)), quotes,
                  on="t", by="sym")
    # ...and a different prefix resolves it
    out = asof_join(trades.withColumn("r_px", F.lit(0.0)), quotes,
                    on="t", by="sym", payload_prefix="q_")
    assert "q_px" in out.columns and "r_px" in out.columns
