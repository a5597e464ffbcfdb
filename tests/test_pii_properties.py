"""Cross-engine regex-flavor properties for operators/pii.py.

The pii oracle depends on Java regex (Spark executors) and RE2 (DuckDB)
producing IDENTICAL match sets for the three patterns. That assumption is
pinned two ways: hypothesis-generated adversarial strings compared
DuckDB-vs-Python-re (both cheap, no JVM in the loop), and a fixed
boundary-case corpus pushed through all THREE engines at once.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marmaray_spark.operators import pii

# the character soup PII patterns actually have to survive: word chars,
# separators, and the pattern's own metacharacters as literals
_ALPHABET = "ab1290.@-+_ %"

texts = st.text(alphabet=_ALPHABET, min_size=0, max_size=60)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _duck_counts(duck, s: str) -> tuple[int, ...]:
    row = duck.execute(
        "SELECT " + ", ".join(
            f"len(regexp_extract_all(?, '{p}'))" for p in pii.PII_PATTERNS.values()),
        [s] * len(pii.PII_PATTERNS)).fetchone()
    return tuple(row)


def _py_counts(s: str) -> tuple[int, ...]:
    return tuple(len(re.findall(p, s)) for p in pii.PII_PATTERNS.values())


@settings(max_examples=300, deadline=None)
@given(s=texts)
def test_re2_and_python_re_agree_on_counts(duck, s):
    assert _duck_counts(duck, s) == _py_counts(s)


@settings(max_examples=200, deadline=None)
@given(s=texts)
def test_redaction_fixpoint_in_re2(duck, s):
    """One redaction pass reaches the fixpoint: re-matching the redacted
    text finds nothing, in RE2 exactly as the report's self-audit claims."""
    red = s
    for p, tok in zip(pii.PII_PATTERNS.values(), pii.PII_TOKENS.values()):
        red = duck.execute("SELECT regexp_replace(?, ?, ?, 'g')",
                           [red, p, tok]).fetchone()[0]
    assert _duck_counts(duck, red) == (0,) * len(pii.PII_PATTERNS)


# boundary cases where regex flavors historically diverge: word-boundary
# adjacency, backtracking-needed suffixes, greedy quantifier cutoffs
_EDGE_CORPUS = [
    "a1.2.3.4b",          # \b inside a word run: NOT an ip match site
    "x 1.2.3.4. end",     # trailing dot after a real ip
    "a@b.co.",            # email needing end-of-domain backtrack
    "j@x.io+1-555-0100",  # adjacent matches, no separator
    "123-456-7890",       # NANP without country code, offset start
    "+1-555-0100.8.8.8.8",  # phone then ip, dot-glued
    ".-@-.",              # metacharacter soup, no matches
    "u_%+-x@d-1.org",     # full local-part character class
    "9999.9999.9.9",      # >3-digit octets: octet pattern can't span
    "a@b@c.de",           # double @: rightmost wins the domain
]


def test_three_engines_agree_on_edge_corpus(spark, duck):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(s,) for s in _EDGE_CORPUS], "text string")
    spark_rows = df.select(
        *[c.alias(k) for k, c in pii.pii_counts("text").items()]).collect()
    for s, row in zip(_EDGE_CORPUS, spark_rows):
        got = tuple(row[k] for k in pii.PII_PATTERNS)
        assert got == _py_counts(s), f"spark vs python re on {s!r}"
        assert got == _duck_counts(duck, s), f"spark vs duckdb on {s!r}"
