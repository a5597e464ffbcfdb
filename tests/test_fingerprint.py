"""Winnowing document fingerprints (operators/fingerprint.py): parity
vs a per-doc Python reference, the winnowing shared-substring
guarantee, and edge cases."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from marmaray_spark.operators.fingerprint import (
    fingerprint_candidate_pairs, winnow_fingerprints)

K, W = 5, 4


def _norm(text: str) -> str:
    return " ".join(text.lower().split())


def _brute_fp(text: str) -> list[int]:
    s = _norm(text)
    h = [int(hashlib.md5(s[i:i + K].encode()).hexdigest()[:8], 16)
         for i in range(len(s) - K + 1)]
    if not h:
        return []
    if len(h) < W:
        return [min(h)]
    return sorted({min(h[i:i + W]) for i in range(len(h) - W + 1)})


def test_winnow_matches_bruteforce(spark):
    rng = random.Random(29)
    alpha = "abcdefg "
    rows = [(i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60))))
            for i in range(60)]
    # deliberate edges: empty, shorter than k, exactly k, k..k+w-1 grams
    rows += [(100, ""), (101, "ab"), (102, "abcde"), (103, "abcdefgh"),
             (104, "  Mixed   CASE\tand   spacing  ")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (r["n_grams"], list(r["fingerprints"]))
           for r in winnow_fingerprints(df, "id", "text", K, W).collect()}
    for i, text in rows:
        s = _norm(text)
        want_n = max(len(s) - K + 1, 0)
        assert got[i] == (want_n, _brute_fp(text)), f"id={i} text={text!r}"


def test_shared_substring_guarantees_candidate_pair(spark):
    """The winnowing theorem: docs sharing a normalized substring of
    length >= k + w - 1 (= 8 here) must share a fingerprint."""
    shared = "xqzvwyku"                     # 8 chars = k + w - 1
    df = spark.createDataFrame([
        (1, f"aaa {shared} bbb"),
        (2, f"ccc ddd {shared}"),
        (3, "totally different content"),
    ], "id long, text string")
    fps = winnow_fingerprints(df, "id", "text", K, W)
    pairs = {(r["a"], r["b"]) for r in
             fingerprint_candidate_pairs(fps, "id").collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_case_and_whitespace_invariance(spark):
    df = spark.createDataFrame([
        (1, "The Quick   Brown\tFox"),
        (2, "the quick brown fox"),
    ], "id long, text string")
    got = {r["id"]: list(r["fingerprints"]) for r in
           winnow_fingerprints(df, "id", "text", K, W).collect()}
    assert got[1] == got[2] and got[1]
