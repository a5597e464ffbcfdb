"""Bucketed co-located join: the shuffle happens at write time, never at
join time — asserted on the physical plan."""

import pytest

from marmaray_spark.plans.bucketing import colocated_join, write_bucketed_table


@pytest.fixture()
def bucketed_pair(spark, orders, customer, tmp_path):
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed_table(orders, "b_orders", ["o_custkey"], 8,
                         sort_cols=["o_custkey"], path=str(tmp_path / "bo"))
    write_bucketed_table(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", ["o_custkey"], 8,
        sort_cols=["o_custkey"], path=str(tmp_path / "bc"))
    yield "b_orders", "b_customer"
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_join_has_no_exchange(spark, orders, customer, bucketed_pair):
    bo, bc = bucketed_pair
    joined = colocated_join(spark, bo, bc, on=["o_custkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # buckets are co-located

    # and the answer matches the plain (shuffling) join
    assert joined.count() == orders.join(
        customer, orders.o_custkey == customer.c_custkey).count()


def test_bucketed_write_roundtrip(spark, orders, bucketed_pair):
    bo, _ = bucketed_pair
    back = spark.table(bo)
    assert back.count() == orders.count()
    assert dict(back.dtypes) == dict(orders.dtypes)
