"""Document fingerprinting by winnowing (Schleimer, Wilkerson & Aiken
2003, "Winnowing: Local Algorithms for Document Fingerprinting" — the
MOSS algorithm): per document, hash every k-char gram of the normalized
text with a rolling window, keep each window's MINIMUM hash, and the
distinct kept values are the document's fingerprint set. Two documents
sharing a substring of length >= k + w - 1 are GUARANTEED to share a
fingerprint (the winnowing theorem) — the plagiarism/near-copy detector
that needs no shingle explosion at compare time.

Contract detail vs the paper: the paper selects by POSITION (rightmost
minimum per window) so repeated selections dedup positionally; this
implementation keeps the distinct VALUE set, which is identical — tied
positions tie on the value, so position tie-breaks cannot change the
set — and is reproducible in ANSI SQL (the fold-in oracle re-derives
every fingerprint set byte-for-byte).

Scale shape: fingerprinting is a pure per-row projection (md5 per gram,
w-1 zip_with passes for window minima — each a single O(n) pass, never
the O(n x w) indexed-lambda form that re-evaluates the substituted
child per element, the measured round-6 HOF trap). Candidate pairing is
the LSH shape: explode (id, fingerprint), self-join per fingerprint —
O(rows x fingerprints), never all-pairs; winnowing guarantees density
~2/(w+1), so fingerprints-per-doc is ~2n/(w+1), tunable by w.

The reference (uber/marmaray) has no text surface; beyond-reference
LLM-pipeline tier per the build brief ("document fingerprinting
(rolling hash)").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(text_col: str) -> str:
    """Whitespace-collapsed lowercase: the usual pre-fingerprint
    normalization (case and spacing changes must not move grams)."""
    return f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))"


def gram_hashes(text_col: str, k: int = 5,
                normalized: bool = False) -> Column:
    """array<bigint> of 32-bit hashes, one per k-char gram of the
    normalized text (md5-prefix hashing — engine-portable, the repo's
    cross-engine determinism contract). Empty for texts shorter than
    ``k`` normalized chars.

    Pass ``normalized=True`` when ``text_col`` is ALREADY a materialized
    normalized-string column: inlining the normalization expression here
    would substitute it into the transform lambda and re-evaluate the
    full regexp per GRAM — O(chars^2) per document, the measured
    round-6 HOF-substitution trap (winnow_fingerprints measured 2.6x
    faster after materializing at ~300-char docs; the quadratic gap
    grows with document length)."""
    t = text_col if normalized else _norm(text_col)
    return F.expr(
        f"IF(length({t}) < {k}, CAST(array() AS array<bigint>), "
        f"transform(sequence(1, length({t}) - {k - 1}), "
        f"i -> cast(conv(substring(md5(substring({t}, i, {k})), 1, 8), "
        f"16, 10) as bigint)))")


def winnow(hashes_col: str, w: int = 4) -> Column:
    """Distinct window minima of ``hashes_col`` (array<bigint>), window
    width ``w``, ascending. Fewer than ``w`` hashes collapse to the
    single global minimum (one-window semantics); empty stays empty.

    The window minimum is built by ``w - 1`` chained zip_with passes
    over shifted slices — both zip_with sides are sliced to the SAME
    length so no null padding enters least()."""
    if w < 1:
        raise ValueError(f"window width must be >= 1, got {w}")
    m = hashes_col
    n = f"size({hashes_col})"
    for j in range(1, w):
        m = (f"zip_with(slice({m}, 1, {n} - {j}), "
             f"slice({hashes_col}, {j + 1}, {n} - {j}), "
             f"(a, b) -> least(a, b))")
    return F.expr(
        f"CASE WHEN size({hashes_col}) = 0 THEN CAST(array() AS array<bigint>) "
        f"WHEN size({hashes_col}) < {w} THEN array(array_min({hashes_col})) "
        f"ELSE sort_array(array_distinct({m})) END")


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str = "text",
                        k: int = 5, w: int = 4) -> DataFrame:
    """(id, n_grams, n_fingerprints, fingerprints): each document's
    winnowing fingerprint set. One projection — no shuffle, no join.
    The normalized string and the gram-hash array are materialized as
    columns (each used more than once, so CollapseProject's used-once
    guard keeps them OUT of downstream lambdas — see gram_hashes)."""
    out = (df.withColumn("__s", F.expr(_norm(text_col)))
           .withColumn("__gh", gram_hashes("__s", k, normalized=True))
           .withColumn("fingerprints", winnow("__gh", w)))
    return out.select(
        F.col(id_col),
        F.size("__gh").cast("int").alias("n_grams"),
        F.size("fingerprints").cast("int").alias("n_fingerprints"),
        "fingerprints")


def fingerprint_candidate_pairs(fps: DataFrame, id_col: str,
                                fp_col: str = "fingerprints",
                                min_shared: int = 1) -> DataFrame:
    """(a, b, shared): id pairs (a < b) sharing >= ``min_shared``
    fingerprints — the candidate generator for copy detection. The LSH
    bucket-join shape: one explode, one self-equi-join per fingerprint
    value, one pair-count agg; never all-pairs. By the winnowing
    guarantee, any two docs sharing a normalized substring of length
    >= k + w - 1 appear here.

    The (id, fingerprints) projection is persisted BEFORE the explode
    (the lsh_candidate_pairs rule): a generator input drops out of
    whole-stage codegen, and the self-join would otherwise re-derive
    the full md5-per-gram + zip_with winnowing tree INTERPRETED in both
    join branches. The persisted frame is rows x (id, ~2n/(w+1)
    bigints) — small; it stays cached for the returned plan's lifetime
    (same deliberate leak as lsh_candidate_pairs)."""
    pre = fps.select(F.col(id_col).alias("doc"),
                     F.col(fp_col).alias("__fp__")).persist()
    pre.count()
    ex = pre.select("doc", F.explode("__fp__").alias("fp"))
    left, right = ex.alias("l"), ex.alias("r")
    return (left.join(right, (F.col("l.fp") == F.col("r.fp"))
                      & (F.col("l.doc") < F.col("r.doc")))
            .groupBy(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
            .agg(F.count(F.lit(1)).cast("int").alias("shared"))
            .filter(F.col("shared") >= min_shared))
