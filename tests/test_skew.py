"""Skew mitigation: salted aggregation/join match their plain twins and
actually spread hot keys over salt buckets."""

import pytest
from pyspark.sql import functions as F

from marmaray_spark.operators.skew import _salt_from, salted_aggregate, salted_join


@pytest.fixture()
def hot(spark):
    # one hot key (k=1, 900 rows) + long tail
    rows = [(1, i, float(i % 7)) for i in range(900)] + \
           [(k, k * 1000, float(k)) for k in range(2, 52)]
    return spark.createDataFrame(rows, ["k", "rid", "v"])


def test_salted_aggregate_matches_plain(hot):
    got = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
           for r in salted_aggregate(
               hot, ["k"],
               {"n": ("count", "rid"), "s": ("sum", "v"),
                "mn": ("min", "rid"), "mx": ("max", "rid")},
               salt_buckets=16).collect()}
    want = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
            for r in hot.groupBy("k").agg(
                F.count("rid").alias("n"), F.sum("v").alias("s"),
                F.min("rid").alias("mn"), F.max("rid").alias("mx")).collect()}
    assert got == want


def test_salt_actually_spreads_hot_key(hot):
    n_buckets = (hot.filter("k = 1")
                 .select(_salt_from(["rid"], 16).alias("salt"))
                 .distinct().count())
    assert n_buckets == 16  # 900 rows cover all 16 salt buckets


def test_salted_aggregate_rejects_non_reaggregable(hot):
    with pytest.raises(ValueError, match="not re-aggregable"):
        salted_aggregate(hot, ["k"], {"a": ("avg", "v")})


def test_salted_join_matches_plain(spark, hot):
    right = spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 52)], ["k", "name"])
    got = sorted((r["k"], r["rid"], r["name"])
                 for r in salted_join(hot, right, "k", salt_buckets=4).collect())
    want = sorted((r["k"], r["rid"], r["name"])
                  for r in hot.join(right, "k").collect())
    assert got == want and len(got) == hot.count()


def test_salted_join_requires_salt_source(spark):
    left = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="non-key column"):
        salted_join(left, left, "k")
