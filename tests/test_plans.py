"""Physical-plan assertions: the 100-TB posture is verified by inspecting
what Catalyst actually planned — filters reach the parquet scan, small
dimensions broadcast, no single-task global windows, scans prune columns."""

import re

import pytest
from pyspark.sql import functions as F

from marmaray_spark import queries as Q

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = Q.pricing_summary(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_on_scan(spark):
    df = Q.pricing_summary(spark, SF)
    plan = plan_of(df)
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    read_cols = {c.split("#")[0] for c in m.group(1).split(",")}
    # only the 6 referenced columns are read, not all 11
    assert read_cols == {"l_returnflag", "l_linestatus", "l_quantity",
                         "l_extendedprice", "l_discount", "l_shipdate"}


def test_dimension_join_broadcasts(spark):
    df = Q.top_revenue_orders(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_dedup_anti_join_planned(spark):
    df = Q.dedup_insert_anti_join(spark, SF)
    plan = plan_of(df)
    assert "LeftAnti" in plan


def test_sorted_batching_has_no_global_window(spark):
    """The scalable two-phase row-number must not range-shuffle everything
    into a single partition (the classic global-window trap)."""
    df = Q.cassandra_writetime_batches(spark, SF)
    plan = plan_of(df)
    # local windows are partitioned by the range-partition id
    assert "__range_pid__" in plan
    # offsets join is broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan


def test_validation_split_filters_pushed(spark):
    df = Q.validate_required_keys_valid(spark, SF)
    plan = plan_of(df)
    # the fork persist sits between scan and filter, so pushdown cannot
    # reach parquet — but the split itself must be a simple Filter over
    # the persisted tagged frame, not a re-scan
    assert "InMemoryTableScan" in plan or "PushedFilters" in plan


def test_whole_stage_codegen_covers_text_ops(spark):
    df = Q.doc_nlp_profile(spark, SF)
    df.collect()  # finalize the AQE plan so codegen markers are visible
    plan = plan_of(df)
    # '*(n)' prefixes mark whole-stage-codegen'd operators
    assert re.search(r"\*\(\d+\) Project", plan), plan


def test_srp_probe_is_broadcast_bucket_join(spark):
    df = Q.embedding_srp_probe_topk(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_partition_pruned_source(spark, orders, tmp_path):
    """ParquetSource partition filter must prune at scan time."""
    from marmaray_spark.sources.hive import ParquetSource, ParquetWorkUnit

    table = tmp_path / "t"
    (orders.withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
     .write.partitionBy("month").parquet(str(table)))
    src = ParquetSource(spark)
    df = src.get_data(ParquetWorkUnit(str(table), "month=1994-01"))
    plan = plan_of(df.select("o_orderkey"))
    m = re.search(r"RequiredDataFilters: \[.*month.*\]|PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "1994-01" in plan


def test_ivf_probe_broadcasts_and_assigns_without_shuffle(spark):
    """IVF: centroid literals make cell assignment a projection; the only
    join is corpus-cell x broadcast probe list."""
    df = Q.all_queries()["embedding_ivf_probe_topk"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    # no sort-merge join anywhere: nothing shuffles both sides
    assert "SortMergeJoin" not in plan


def test_no_corpus_scale_forced_broadcast():
    """No declared query may force-broadcast a corpus-derived relation.

    ``F.broadcast`` overrides the planner REGARDLESS of size, so a hint on
    anything that grows with the corpus (dedup keepers, contamination id
    sets, SF-scaled tables like customer) is a guaranteed OOM at 100 TB.
    The allowlist is exactly the relations whose size is bounded by
    construction: nation/region (25/5 rows at every TPC-H SF), 1-row
    global aggregates (avg_bal, mx), and the argmax-filtered top set.
    Everything else must leave the strategy to the planner/AQE, which
    still broadcasts small relations — without the hint's scale cliff."""
    import inspect
    src = inspect.getsource(Q)
    targets = set(re.findall(r"F\.broadcast\((\w+)", src))
    allowed = {"nation", "region", "avg_bal", "mx", "top"}
    assert targets <= allowed, f"forced broadcast of {targets - allowed}"


def test_no_allpairs_plan_in_any_declared_query(spark):
    """The scale plan IS the declared plan: no declared query may compile
    to a CartesianProduct, and the only tolerated BroadcastNestedLoopJoin
    is brute-force top-k's broadcast of a tiny fixed query set against the
    corpus scan (linear in corpus size, never quadratic)."""
    # validate_required_keys_valid / table_incremental_cdc attach a 1-row
    # global-aggregate count as a constant column via crossJoin(broadcast) —
    # a BNLJ whose build side is exactly one row: linear, never quadratic.
    # bm25_topical_ranking attaches the 1-row (n_docs, total_dl) global
    # stats the same way — a single-row broadcast build side
    # relational_join_family's anti section broadcasts the 1-row
    # avg-balance scalar the same way before its anti join
    # doc_distinctive_terms attaches the 1-row corpus token total to the
    # ≤vocab-size LM table (operators/lm.py train_unigram_lm) — again a
    # single-row broadcast build side
    # corpus_prep_pipeline's LM stage attaches the same 1-row token
    # total (operators/lm.py train_unigram_lm)
    # language_report's domain section attaches the 1-row corpus token
    # total (operators/web.py domain_report); sampling_methods' dsir
    # section attaches the 1-row LM floors and the histogram-cutoff
    # scalar (operators/dsir.py); term_heavy_hitters' colloc section
    # attaches the 1-row corpus token total to the min_count-floored
    # candidate bigrams (operators/text.py collocation_lift) — all via
    # operators.attach_scalar, whose docstring records why the 1-row
    # BNLJ is the honest plan
    allowed_bnlj = {"embedding_topk_bruteforce",
                    "term_heavy_hitters",
                    "validate_required_keys_valid",
                    "table_incremental_cdc",
                    "bm25_topical_ranking",
                    "relational_join_family",
                    "doc_distinctive_terms",
                    "corpus_prep_pipeline",
                    "language_report",
                    "sampling_methods"}
    offenders = {}
    for name, fn in Q.all_queries().items():
        plan = plan_of(fn(spark, SF))
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in allowed_bnlj:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders
