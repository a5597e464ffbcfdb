"""Ranked retrieval (TF-IDF / BM25) and Bloom-pruned joins."""

import math

import pytest
from pyspark.sql import functions as F

from marmaray_spark.operators.bloomjoin import (bloom_prune,
                                                bloom_pruned_join,
                                                build_key_bloom)
from marmaray_spark.operators.retrieval import (bm25_scores,
                                                document_frequencies,
                                                term_frequencies,
                                                tfidf_scores)

DOCS = [
    (1, "spark reads parquet files fast and writes parquet files"),
    (2, "spark writes tables with commits and checkpoints"),
    (3, "cooking pasta with garlic and fresh basil"),
    (4, "parquet files and more parquet files in every table"),
    (5, "a short note"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_term_frequencies_and_df(spark, docs):
    idx = term_frequencies(docs)
    row = idx.filter((F.col("doc_id") == 1)
                     & (F.col("term") == "parquet")).first()
    assert (row["tf"], row["dl"]) == (2, 9)
    dfreq = {r["term"]: r["df"] for r in
             document_frequencies(idx).filter(
                 F.col("term").isin("parquet", "spark", "garlic")).collect()}
    assert dfreq == {"parquet": 2, "spark": 2, "garlic": 1}


def _bm25_reference(query):
    """Plain-Python BM25 over DOCS — the arithmetic oracle."""
    split = {d: t.split() for d, t in DOCS}
    n = len(split)
    avgdl = sum(len(w) for w in split.values()) / n
    out = {}
    for d, ws in split.items():
        s = 0.0
        for q in sorted(set(query)):
            df = sum(1 for w in split.values() if q in w)
            if df == 0 or q not in ws:
                continue
            tf = ws.count(q)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ws) / avgdl))
        if s:
            out[d] = round(s * 1000)
    return out


def test_bm25_matches_reference_arithmetic(spark, docs):
    query = ["parquet", "files", "spark"]
    got = {r["doc_id"]: r["score_milli"]
           for r in bm25_scores(docs, query, top_k=10).collect()}
    assert got == _bm25_reference(query)


def test_bm25_rank_order_and_topk(spark, docs):
    out = bm25_scores(docs, ["parquet", "files"], top_k=2).collect()
    assert [r["rank"] for r in out] == [1, 2]
    # docs 1 and 4 have identical (tf, dl) for both terms — equal scores,
    # deterministic tie broken by doc_id
    assert [r["doc_id"] for r in out] == [1, 4]
    assert out[0]["score_milli"] == out[1]["score_milli"]


def test_tfidf_scores_query_pruned(spark, docs):
    out = {r["doc_id"]: r["score_milli"]
           for r in tfidf_scores(docs, ["garlic"], top_k=10).collect()}
    assert set(out) == {3}                     # only the matching doc scored
    assert out[3] == round(1 * math.log(5 / 1) * 1000)


def test_retrieval_rejects_empty_query(spark, docs):
    with pytest.raises(ValueError):
        bm25_scores(docs, [])
    with pytest.raises(ValueError):
        tfidf_scores(docs, [])


# -- bloom join -------------------------------------------------------------

def test_bloom_prune_no_false_negatives_and_low_fp(spark):
    big = spark.range(200_000).select(F.col("id").alias("k"))
    small = spark.range(500).select((F.col("id") * 1000).alias("k"))
    bloom = build_key_bloom(small, "k", fpp=0.01)
    kept = bloom_prune(big, "k", bloom)
    # every true key survives
    assert kept.join(small, "k", "left_semi").count() == 200   # 0..199k step 1k
    # false-positive rate well under 10x the target
    fp = kept.join(small, "k", "left_anti").count()
    assert fp / 200_000 < 0.1


def test_bloom_pruned_join_equals_plain_join(spark):
    big = spark.range(50_000).select(F.col("k") if False else F.col("id").alias("k"),
                                     (F.col("id") % 7).alias("v"))
    small = spark.range(100).select((F.col("id") * 37).alias("k"))
    expect = sorted(r["k"] for r in big.join(small, "k").collect())
    got = sorted(r["k"] for r in bloom_pruned_join(big, small, "k").collect())
    assert got == expect


def test_bloom_pruned_join_rejects_outer(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="outer|left"):
        bloom_pruned_join(df, df, "k", how="left")


def test_bloom_probe_stays_in_codegen(spark):
    big = spark.range(10_000).select(F.col("id").alias("k"))
    small = spark.range(10).select((F.col("id") * 5).alias("k"))
    bloom = build_key_bloom(small, "k")
    plan = bloom_prune(big, "k", bloom)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Filter" in plan


def test_bloom_property_no_false_negatives(spark):
    """Property over random key sets: every inserted key probes true."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from marmaray_spark.operators.bloomjoin import _geometry, _positions

    # pure-Python mirror of the build/probe arithmetic (the Spark legs
    # are exercised above; here we sweep geometries cheaply)
    import pyspark.sql.functions as F

    @given(st.lists(st.integers(min_value=-2**40, max_value=2**40),
                    min_size=1, max_size=200, unique=True),
           st.sampled_from([0.3, 0.03, 0.003]))
    @settings(max_examples=20, deadline=None)
    def check(keys, fpp):
        m, k = _geometry(len(keys), fpp)
        assert m % 64 == 0 and 1 <= k <= 8
        # tighter fpp -> never fewer bits
        m2, _ = _geometry(len(keys), fpp / 10)
        assert m2 >= m

    check()


def test_bloom_prune_filter_sits_below_the_join_exchange(spark):
    """The point of the operator: the probe filter must run BEFORE the
    join's shuffle so pruned rows never enter the exchange."""
    from marmaray_spark.operators.bloomjoin import bloom_pruned_join

    import pyspark.sql.functions as F
    big = spark.range(100_000).select(F.col("id").alias("k"),
                                      (F.col("id") % 5).alias("v"))
    small = spark.range(64).select((F.col("id") * 999).alias("k"))
    out = bloom_pruned_join(big, small, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # physical plans print top-down (children after parents): the probe
    # filter being a CHILD of the join means its line comes after the
    # join's line — i.e. rows are filtered before they reach the join
    join_pos = min(p for p in (plan.find("SortMergeJoin"),
                               plan.find("BroadcastHashJoin"),
                               plan.find("ShuffledHashJoin")) if p >= 0)
    filt_lines = [ln for ln in plan.splitlines()
                  if "Filter" in ln and "shiftleft" in ln]
    assert filt_lines, plan          # the probe predicate exists as a Filter
    filt_pos = plan.find(filt_lines[0])
    assert filt_pos > join_pos, plan  # ...and sits BELOW the join


def test_bloom_large_sketch_broadcast_probe_matches_literal(spark, monkeypatch):
    """Above the plan-literal cap the probe rides a broadcast single-row
    relation: identical survivors, word table embedded once (not k
    times), and the big side still never shuffles before the filter."""
    import marmaray_spark.operators.bloomjoin as bj

    build = spark.createDataFrame([(i * 3,) for i in range(200)], ["k"])
    probe = spark.createDataFrame([(i,) for i in range(600)], ["k"])
    bloom = bj.build_key_bloom(build, "k", expected_items=200, fpp=0.01)

    literal = {r["k"] for r in bj.bloom_prune(probe, "k", bloom).collect()}
    monkeypatch.setattr(bj, "_MAX_LITERAL_WORDS", 1)
    via_bcast_df = bj.bloom_prune(probe, "k", bloom)
    via_bcast = {r["k"] for r in via_bcast_df.collect()}
    assert via_bcast == literal
    assert set(via_bcast_df.columns) == {"k"}   # helper column dropped
    plan = via_bcast_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    # collision guard: an input already carrying the helper column errors
    clash = probe.withColumn("__bloom_words__", F.lit(1))
    with pytest.raises(ValueError):
        bj.bloom_prune(clash, "k", bloom)
