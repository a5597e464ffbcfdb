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


def test_fork_persist_level_matrix(spark, customer):
    """TestForkOperator persist-level matrix (:109-125) + record-mix cases
    (error-only / correct-only / mixed): every configured level yields
    identical counts and per-key data."""
    import pytest
    from pyspark.sql import functions as F

    from marmaray_spark.operators.fork import ERROR_KEY, VALID_KEY, ForkOperator

    df = customer.limit(400)
    cond = F.col("c_acctbal") >= 0

    expected_valid = df.filter(cond).count()
    expected_error = df.filter(~cond | F.col("c_acctbal").isNull()).count()

    for level in ("DISK_ONLY", "MEMORY_ONLY", "MEMORY_AND_DISK", "NONE"):
        tag = (F.when(cond, F.array(F.lit(VALID_KEY)))
               .otherwise(F.array(F.lit(ERROR_KEY))))
        fork = ForkOperator(df, tag, [VALID_KEY, ERROR_KEY], persist_level=level)
        fork.execute()
        assert fork.get_count(VALID_KEY) == expected_valid, level
        assert fork.get_count(ERROR_KEY) == expected_error, level
        assert fork.get_fork_data(VALID_KEY).count() == expected_valid, level
        fork.unpersist()

    # error-only and correct-only mixes (TestForkOperator record mixes)
    all_error = (F.when(F.lit(False), F.array(F.lit(VALID_KEY)))
                 .otherwise(F.array(F.lit(ERROR_KEY))))
    fk = ForkOperator(df, all_error, [VALID_KEY, ERROR_KEY])
    fk.execute()
    assert fk.get_count(VALID_KEY) == 0
    assert fk.get_count(ERROR_KEY) == df.count()
    assert fk.get_fork_data(VALID_KEY).count() == 0
    fk.unpersist()

    all_valid = (F.when(F.lit(True), F.array(F.lit(VALID_KEY)))
                 .otherwise(F.array(F.lit(ERROR_KEY))))
    fk2 = ForkOperator(df, all_valid, [VALID_KEY, ERROR_KEY])
    fk2.execute()
    assert fk2.get_count(ERROR_KEY) == 0
    assert fk2.get_count(VALID_KEY) == df.count()
    fk2.unpersist()

    # unregistered key access raises (reference: invalid fork key)
    with pytest.raises(KeyError):
        fk2.get_fork_data(99)
