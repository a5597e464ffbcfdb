"""ForkOperator tests — modeled on T/common/forkoperator/TestForkOperator.java
(fork counts, unregistered-key failure, overlap semantics)."""

import pytest
from pyspark.sql import functions as F

from marmaray_spark.operators.fork import (
    ERROR_KEY,
    VALID_KEY,
    ForkOperator,
    valid_error_fork,
)


def test_two_way_split_counts(spark, customer):
    fork = valid_error_fork(customer, F.col("c_acctbal") >= 0)
    fork.execute()
    valid = fork.get_fork_data(VALID_KEY)
    errors = fork.get_fork_data(ERROR_KEY)
    total = customer.count()
    assert fork.get_count(VALID_KEY) == valid.count()
    assert fork.get_count(ERROR_KEY) == errors.count()
    assert fork.get_count(VALID_KEY) + fork.get_count(ERROR_KEY) == total
    assert fork.total_count == total
    # fork tag column must not leak
    assert "__fork_keys__" not in valid.columns
    fork.unpersist()


def test_unregistered_key_raises(spark, customer):
    fork = valid_error_fork(customer, F.lit(True))
    with pytest.raises(KeyError):
        fork.get_fork_data(42)
    fork.unpersist()


def test_overlapping_forks(spark, customer):
    # a row may carry multiple keys (ForkOperator allows overlap)
    tag = F.when(F.col("c_acctbal") >= 0, F.array(F.lit(0), F.lit(2))) \
        .otherwise(F.array(F.lit(1)))
    fork = ForkOperator(customer, tag, [0, 1, 2])
    fork.execute()
    assert fork.get_count(0) == fork.get_count(2)
    assert fork.get_count(0) + fork.get_count(1) == customer.count()
    fork.unpersist()


def test_empty_tag_drops_rows(spark, customer):
    # rows tagged with no key appear in no fork output
    tag = F.when(F.col("c_custkey") % 2 == 0, F.array(F.lit(0))) \
        .otherwise(F.array().cast("array<int>"))
    fork = ForkOperator(customer, tag, [0])
    fork.execute()
    evens = customer.filter(F.col("c_custkey") % 2 == 0).count()
    assert fork.get_count(0) == evens
    assert fork.get_fork_data(0).count() == evens
    fork.unpersist()


def test_no_keys_registered_raises(spark, customer):
    with pytest.raises(ValueError):
        ForkOperator(customer, F.array(F.lit(0)), [])


def test_error_table_roundtrip_and_replay(spark, tmp_path):
    from pyspark.sql import functions as F

    from marmaray_spark.operators.errors import (
        read_error_table,
        replay_error_records,
        to_error_records,
        write_error_table,
    )

    bad = spark.createDataFrame([(1, None, 5.0), (2, "x", None)],
                                "id long, name string, score double")
    errs = to_error_records(bad, "required key missing",
                            row_key=F.col("id").cast("string"))
    path = str(tmp_path / "mytable")
    write_error_table(errs, path)

    back = read_error_table(spark, path)
    assert back.count() == 2
    assert set(back.select("hadoop_error_exception").distinct()
               .toPandas()["hadoop_error_exception"]) == {"required key missing"}

    replayed = replay_error_records(spark, path, bad.schema)
    rows = {r["id"]: (r["name"], r["score"]) for r in replayed.collect()}
    assert rows == {1: (None, 5.0), 2: ("x", None)}
