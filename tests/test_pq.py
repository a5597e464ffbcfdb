"""Product quantization (operators/pq.py): encode parity across the
expression and Arrow paths, pack/unpack round-trip, ADC top-k exactness
under full oversampling and recall under trained codebooks.

Mirrors the int8-tier test strategy (test_llm_ops.py): the coarse tier
only has to get top-k MEMBERSHIP right — order is decided by the exact
re-score — so the structural test is equality with brute force when the
oversampled frontier covers the corpus.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from marmaray_spark.operators.pq import (deterministic_pq_codebooks,
                                         pack_codes, pq_adc_topk,
                                         pq_encode, train_pq_codebooks,
                                         unpack_codes)
from marmaray_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def books(embeddings):
    return deterministic_pq_codebooks(embeddings, m=4, k=8)


def _numpy_codes(vecs, books):
    """Reference encoder: quantize to milli (half away from zero, like
    SQL round), per-subspace argmax dot, first-max tie-break."""
    m, sub = len(books), len(books[0][0])
    out = {}
    for vid, v in vecs:
        q = np.floor(np.abs(np.asarray(v, dtype=np.float64)) * 1000 + 0.5)
        q = (q * np.sign(v)).astype(np.int64)
        codes, adc = [], 0
        for s in range(m):
            dots = np.asarray(books[s], dtype=np.int64) @ q[s * sub:(s + 1) * sub]
            codes.append(int(dots.argmax()))
            adc += int(dots.max())
        out[vid] = (codes, adc)
    return out


def test_pq_encode_matches_numpy_reference(spark, embeddings, books):
    sample = embeddings.filter(F.col("vec_id") < 40)
    ref = _numpy_codes(
        [(r["vec_id"], r["embedding"]) for r in sample.collect()], books)
    got = pq_encode(sample, books, with_recon=True).collect()
    assert len(got) == len(ref)
    for r in got:
        codes, adc = ref[r["vec_id"]]
        assert list(r["codes"]) == codes, r["vec_id"]
        assert r["adc_self"] == adc, r["vec_id"]


def test_pq_encode_arrow_expression_parity(spark, embeddings, books):
    """Both physical paths are the same operator: bit-identical codes
    and reconstruction dots, including argmax tie-breaks."""
    sample = embeddings.filter(F.col("vec_id") < 60)
    expr = {r["vec_id"]: (list(r["codes"]), r["adc_self"])
            for r in pq_encode(sample, books, with_recon=True,
                               use_kernel=False).collect()}
    kern = {r["vec_id"]: (list(r["codes"]), r["adc_self"])
            for r in pq_encode(sample, books, with_recon=True,
                               use_kernel=True).collect()}
    assert expr == kern


def test_pack_unpack_codes_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [0, 7, 255, 16]), (2, [255, 0, 1, 2])],
        "id long, codes array<int>")
    out = (df.withColumn("bin", pack_codes("codes"))
           .withColumn("back", unpack_codes("bin", m=4))
           .collect())
    for r in out:
        assert len(r["bin"]) == 4          # M bytes exactly: the 64x story
        assert list(r["back"]) == list(r["codes"])


def test_pq_adc_topk_full_oversample_equals_brute_force(spark, embeddings,
                                                        books):
    q = embeddings.filter(F.col("vec_id") < 5)
    codes = pq_encode(embeddings, books)
    exact = sorted(map(tuple, brute_force_topk(q, embeddings, k=5).collect()))
    n = embeddings.count()
    got = sorted(map(tuple, pq_adc_topk(
        q, codes, embeddings, k=5, codebooks=books,
        oversample=(n // 5) + 1).collect()))
    assert got == exact


def test_pq_adc_kernel_expression_parity(spark, embeddings, books):
    """The Arrow ADC tier and the expression ADC tier are the same
    operator: identical (query, neighbor, dot, rank) sets, including
    dot-tie neighbor-id ordering, at a non-covering oversample where
    the tier-1 frontier actually decides membership."""
    q = embeddings.filter(F.col("vec_id") < 6)
    codes = pq_encode(embeddings, books)
    kern = sorted(map(tuple, pq_adc_topk(
        q, codes, embeddings, k=7, codebooks=books, oversample=2,
        use_kernel=True).collect()))
    expr = sorted(map(tuple, pq_adc_topk(
        q, codes, embeddings, k=7, codebooks=books, oversample=2,
        use_kernel=False).collect()))
    assert kern == expr and kern


def test_pq_adc_topk_trained_codebooks_recall(spark, embeddings):
    """The practical setting: per-subspace k-means codebooks (m=16
    subspaces x 16 centroids -> 16 B/vector, 16x smaller than float) +
    modest oversampling recovers most true neighbors; the exact
    re-score tier guarantees the survivors it returns are ordered at
    full precision. (This synthetic corpus is near-uniform on the
    sphere — the WORST case for PQ, which exploits subspace structure;
    measured 0.75 here vs 1.0 under full oversampling. KMeans is
    seeded, so the number is deterministic.)"""
    trained = train_pq_codebooks(embeddings, m=16, k=16, max_iter=10)
    q = embeddings.filter(F.col("vec_id") < 8)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(q, embeddings, k=5).collect()}
    codes = pq_encode(embeddings, trained)
    got = {(r["query_id"], r["neighbor_id"])
           for r in pq_adc_topk(q, codes, embeddings, k=5,
                                codebooks=trained, oversample=8).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.7, recall


def test_pq_adc_topk_empty_query_set(spark, embeddings, books):
    codes = pq_encode(embeddings, books)
    out = pq_adc_topk(embeddings.filter("vec_id < 0"), codes, embeddings,
                      k=5, codebooks=books)
    assert out.count() == 0


def test_pq_ragged_codebooks_rejected(spark, embeddings):
    with pytest.raises(ValueError):
        pq_encode(embeddings, [[[1, 2]], [[1, 2], [3, 4, 5]]])
