"""PII detection and redaction for LLM training corpora.

New surface (not in the reference — BASELINE.json north star): a training
corpus cannot ship raw emails / phone numbers / IP addresses, so the
pipeline needs a detect-count-redact pass that runs at corpus scale. The
operators here are pure Catalyst expressions (``regexp_count`` /
``regexp_replace``, whole-stage codegen, no Python, no shuffle): the cost
is one projection over the corpus regardless of size, and the pass
composes freely with the quality / dedup funnels (``training_data_pipeline``).

Regex notes: every pattern is written in the common subset of Java regex
(Spark) and RE2 (DuckDB's ``regexp_*``) — character classes, bounded
repetition, and ASCII word boundaries only; no lookaround, no backrefs —
so the declared query and its SQL oracle agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Detection patterns, ordered most-specific-first so redaction of one class
# cannot destroy the match site of the next (emails contain dots that an
# unanchored IP pattern would never match, but order is still pinned for
# determinism).
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — permissive local part, 2+ letter TLD
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # +1-555-0100 style NANP-ish numbers (country code optional)
    "phone": r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}",
    # dotted-quad IPv4, word-bounded so version strings don't half-match
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}

# Replacement tokens keep the class visible to downstream filters while
# destroying the value (the common corpus convention).
PII_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def pii_counts(col: str = "text") -> dict[str, Column]:
    """Per-class match counts for one text column (one codegen projection)."""
    return {k: F.regexp_count(F.col(col), F.lit(p))
            for k, p in PII_PATTERNS.items()}


def redact(col: Column | str) -> Column:
    """Redact every PII class in order; pure nested regexp_replace."""
    out = F.col(col) if isinstance(col, str) else col
    for k, p in PII_PATTERNS.items():
        out = F.regexp_replace(out, F.lit(p), F.lit(PII_TOKENS[k]))
    return out


def redaction_report(df: DataFrame, text_col: str = "text",
                     group_col: str | None = None) -> DataFrame:
    """Detect, redact, and audit in ONE pass over the corpus.

    Returns per-group (or global) totals: documents scanned, matches per
    PII class, documents touched, and ``residual_hits`` — matches still
    present AFTER redaction, which must be 0 (the self-audit makes a
    silent regex regression impossible to miss). Plan shape: projection →
    single partial-aggregated groupBy; no joins, no second scan.
    """
    counts = pii_counts(text_col)
    any_hit = None
    for c in counts.values():
        any_hit = c if any_hit is None else any_hit + c
    redacted = redact(text_col)
    residual = None
    for p in PII_PATTERNS.values():
        r = F.regexp_count(redacted, F.lit(p))
        residual = r if residual is None else residual + r
    proj = df.select(
        *([F.col(group_col)] if group_col else []),
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        any_hit.alias("n_any"),
        residual.alias("n_residual"))
    keys = [group_col] if group_col else []
    aggd = proj.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("docs"),
        *[F.sum(f"n_{k}").alias(f"{k}_matches") for k in PII_PATTERNS],
        F.sum((F.col("n_any") > 0).cast("long")).alias("docs_with_pii"),
        F.sum("n_residual").alias("residual_hits"))
    return aggd


def corpus_hygiene(df: DataFrame, text_col: str = "text",
                   min_words: int = 5) -> DataFrame:
    """Redact PII and attach hygiene flags in one projection.

    Returns the frame with ``text_col`` replaced by its redacted form,
    plus ``pii_found`` (count before redaction) and ``too_short``
    (token-count gate). Pure Catalyst expressions, so the SAME transform
    applies to a batch DataFrame or a Structured Streaming frame — the
    streaming corpus-ingest path redacts inside each micro-batch with no
    state and no extra shuffle.
    """
    counts = pii_counts(text_col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return (df
            .withColumn("pii_found", total)
            .withColumn("too_short",
                        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
                        < min_words)
            .withColumn(text_col, redact(text_col)))
