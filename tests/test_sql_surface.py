"""SQL entry surface (marmaray_spark/sql.py): views over the warehouse,
answer parity with the DataFrame API, and plan quality through views."""

from __future__ import annotations

from marmaray_spark import queries as Q
from marmaray_spark import sql as S

SF = "/root/testdata/sf0.001"


def test_register_and_query_matches_dataframe_api(spark):
    S.register_tables(spark, SF)
    got = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """).collect()
    exp = {(r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
           for r in Q.pricing_summary(spark, SF).collect()}
    assert {(r["l_returnflag"], r["l_linestatus"]):
            (r["sum_qty"], r["count_order"]) for r in got} == exp


def test_events_ts_normalized_in_sql_views(spark):
    """The scan-edge ts normalization (epoch-nanos long) reaches SQL users
    identically to the DataFrame path."""
    S.register_tables(spark, SF)
    row = spark.sql("SELECT min(ts) AS mn, max(ts) AS mx FROM events").first()
    dt = dict(spark.table("events").dtypes)["ts"]
    assert dt == "bigint"
    assert row["mn"] > 10 ** 17  # epoch-nanos magnitude, not micros/millis


def test_pushdown_applies_through_view(spark):
    S.register_tables(spark, SF)
    df = spark.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "1-URGENT" in plan


def test_suffix_namespacing(spark):
    S.register_tables(spark, SF, tables=["region"], suffix="_a")
    assert spark.table("region_a").count() == 5
