"""PII detection/redaction (operators/pii.py) and the new relational join
family: behavior at row level, plan shape at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from marmaray_spark import queries as Q
from marmaray_spark.operators import pii

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_counts_and_redaction(spark):
    rows = [
        ("a", "mail me at jo.doe+x@corp.example.org thanks"),
        ("b", "call +1-555-0199 or 44-123-4567 now"),
        ("c", "server 192.168.0.1 and 10.0.255.3 are up"),
        ("d", "clean text with no identifiers at all"),
        ("e", "combo j@x.io +1-555-0100 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r for r in df.select(
        "id",
        *[c.alias(k) for k, c in pii.pii_counts("text").items()],
        pii.redact("text").alias("red")).collect()}
    assert (got["a"]["email"], got["a"]["phone"], got["a"]["ipv4"]) == (1, 0, 0)
    assert (got["b"]["email"], got["b"]["phone"], got["b"]["ipv4"]) == (0, 2, 0)
    assert (got["c"]["email"], got["c"]["phone"], got["c"]["ipv4"]) == (0, 0, 2)
    assert (got["d"]["email"], got["d"]["phone"], got["d"]["ipv4"]) == (0, 0, 0)
    assert (got["e"]["email"], got["e"]["phone"], got["e"]["ipv4"]) == (1, 1, 1)
    assert got["a"]["red"] == "mail me at <EMAIL> thanks"
    assert got["e"]["red"] == "combo <EMAIL> <PHONE> <IP>"
    assert got["d"]["red"] == rows[3][1]  # clean text untouched


def test_pii_redaction_idempotent_and_audit_zero(spark):
    """Redacting twice is a no-op, and the report's self-audit counts no
    residual matches after one pass."""
    df = spark.createDataFrame(
        [("g1", "x a@b.co +1-555-0100 1.2.3.4"), ("g1", "nothing here")],
        "grp string, text string")
    once = df.select("grp", pii.redact("text").alias("text"))
    twice = once.select("grp", pii.redact("text").alias("text"))
    assert once.collect() == twice.collect()
    rep = pii.redaction_report(df, "text", "grp").collect()[0]
    assert rep["docs"] == 2
    assert rep["email_matches"] == 1
    assert rep["docs_with_pii"] == 1
    assert rep["residual_hits"] == 0


def test_pii_report_plan_is_single_agg_no_join(spark):
    """One projection + one partial-aggregated group-by: no joins, no
    Python eval in the plan."""
    plan = _plan(Q.all_queries()["pii_redaction_report"](spark, SF))
    assert "Join" not in plan
    assert "Python" not in plan  # stays whole-stage codegen / JVM regex
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_semi_and_anti_joins_planned(spark):
    semi = _plan(Q.order_priority_semi_join(spark, SF))
    assert "LeftSemi" in semi
    anti = _plan(Q.inactive_high_balance_customers(spark, SF))
    assert "LeftAnti" in anti


def test_cube_expands_grouping_sets_one_scan(spark):
    """CUBE compiles to Expand + aggregate over ONE scan of orders —
    not four separate scans unioned."""
    df = Q.cube_revenue(spark, SF)
    plan = _plan(df)
    assert "Expand" in plan
    assert plan.count("orders.parquet") <= 1 or plan.count("FileScan") <= 3
    # all four grouping sets materialize: (n,p), (n), (p), ()
    rows = df.collect()
    assert any(r["nation_name"] is None and r["priority"] is None for r in rows)
    assert any(r["nation_name"] is not None and r["priority"] is None for r in rows)
    assert any(r["nation_name"] is None and r["priority"] is not None for r in rows)
    grand = [r for r in rows
             if r["nation_name"] is None and r["priority"] is None]
    assert len(grand) == 1
    total = sum(r["n_orders"] for r in rows
                if r["nation_name"] is not None and r["priority"] is not None)
    assert grand[0]["n_orders"] == total


def test_parts_above_brand_avg_reuses_brand_exchange(spark):
    """The window and the final group-by share the p_brand key: the plan
    has exactly one shuffle (Exchange) feeding both."""
    df = Q.parts_above_brand_avg(spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning(p_brand") <= 1
    rows = {r["p_brand"]: r for r in df.collect()}
    # sanity: excess over the brand average is strictly positive
    assert rows and all(r["avg_excess"] > 0 for r in rows.values())


def test_top_supplier_revenue_broadcasts_scalar_max(spark):
    plan = _plan(Q.top_supplier_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_corpus_hygiene_streaming_matches_batch(spark, tmp_path):
    """The SAME corpus_hygiene transform runs on a batch frame and a
    Structured Streaming frame (pure projection, no state): streaming
    micro-batch output must equal the batch answer row-for-row, with
    zero residual PII in the sunk text."""
    import re

    from pyspark.sql import types as T

    from marmaray_spark.streaming.incremental import (read_parquet_stream,
                                                      run_available_now)

    rows = [
        (1, "reach me a@b.co or +1-555-0100 thanks for reading this"),
        (2, "short 1.2.3.4"),
        (3, "a perfectly clean document with more than five words here"),
    ]
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    src = tmp_path / "docs_in"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src / "batch0"))

    batch = pii.corpus_hygiene(
        spark.read.schema(schema).parquet(str(src / "batch*")))
    expected = {r["doc_id"]: r.asDict() for r in batch.collect()}

    out = tmp_path / "docs_out"
    stream = pii.corpus_hygiene(
        read_parquet_stream(spark, f"{src}/batch*", schema))
    writer = (stream.writeStream.format("parquet")
              .option("path", str(out))
              .option("checkpointLocation", str(tmp_path / "ckpt")))
    run_available_now(writer)

    got = {r["doc_id"]: r.asDict()
           for r in spark.read.parquet(str(out)).collect()}
    assert got == expected
    assert got[1]["pii_found"] == 2 and "<EMAIL>" in got[1]["text"]
    assert got[2]["too_short"] is True
    assert got[3]["pii_found"] == 0 and got[3]["too_short"] is False
    for r in got.values():  # nothing PII-shaped survives in the sink
        for p in pii.PII_PATTERNS.values():
            assert not re.search(p, r["text"])
