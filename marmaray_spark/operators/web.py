"""Web-corpus curation: URL canonicalization, registrable-domain
rollups, URL-level dedup and domain blocklist gating — the FIRST stage
of RefinedWeb/FineWeb-style pipelines (Penedo et al. 2023 §3.1 "URL
filtering" / 2024), which drop or keep whole documents by provenance
before any text is read. The reference (uber/marmaray) has no web
surface; this is beyond-reference LLM-pipeline tier.

Everything here is expression-only (regexp + array ops inside
whole-stage codegen): canonicalization is a per-row projection, the
domain report is one map-side-combined groupBy, and the blocklist gate
is a broadcast anti-join — nothing shuffles the corpus except the
domain rollup's own (tiny, domain-cardinality) aggregate.

Determinism: the regex surface is restricted to what Java regex and
RE2 (DuckDB) agree on — char classes, alternation, anchors; NO
lookaround — and tracking-parameter removal uses split/filter/rejoin
instead of delimiter-aware regex surgery, so a SQL oracle reproduces
every canonical form byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the query parameters stripped during canonicalization: pure tracking
# noise whose presence forks otherwise-identical URLs (the dominant
# cause of URL-level false uniqueness in crawl corpora)
TRACKING_PARAM_RE = "^(utm_|fbclid=|gclid=|msclkid=)"


def canonical_url(url_col: str) -> Column:
    """Canonical form of an http(s) URL, per-row projection:

    - fragment dropped;
    - scheme and host lowercased; leading ``www.`` dropped;
    - the scheme's default port dropped (``:80`` http, ``:443`` https);
    - tracking query parameters removed (split/filter/rejoin — order of
      surviving params is PRESERVED, not sorted: two URLs differing in
      genuine param order are genuinely different resources);
    - empty path normalized to ``/``, trailing slashes trimmed.

    Non-URL-shaped inputs (no ``scheme://``) pass through unchanged —
    the gate for those is upstream schema validation, not silent nulls.
    """
    base = f"regexp_replace({url_col}, '#.*', '')"
    scheme = f"lower(regexp_extract({base}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    rawhost = f"lower(regexp_extract({base}, '://([^/?#]+)', 1))"
    host = (f"regexp_replace(CASE "
            f"WHEN {scheme} = 'http' THEN regexp_replace({rawhost}, ':80$', '') "
            f"WHEN {scheme} = 'https' THEN regexp_replace({rawhost}, ':443$', '') "
            f"ELSE {rawhost} END, '^www\\\\.', '')")
    rawpath = f"regexp_extract({base}, '://[^/?#]+([^?#]*)', 1)"
    path = (f"CASE WHEN {rawpath} IN ('', '/') THEN '/' "
            f"ELSE regexp_replace({rawpath}, '/+$', '') END")
    query = f"regexp_extract({base}, '\\\\?([^#]*)', 1)"
    cleaned = (f"array_join(filter(split({query}, '&'), "
               f"p -> p != '' AND NOT p rlike '{TRACKING_PARAM_RE}'), '&')")
    return F.expr(
        f"CASE WHEN {scheme} = '' THEN {url_col} "
        f"ELSE concat({scheme}, '://', {host}, {path}, "
        f"  CASE WHEN {cleaned} = '' THEN '' ELSE concat('?', {cleaned}) END) "
        f"END")


def url_host(url_col: str) -> Column:
    """Lowercased host (port and userinfo-free; '' for non-URLs)."""
    return F.expr(
        f"regexp_replace(lower(regexp_extract({url_col}, "
        f"'://([^/?#]+)', 1)), ':[0-9]+$', '')")


def registrable_domain(host_col: str) -> Column:
    """Last two host labels — the e(ffective)TLD+1 approximation.
    A production deployment swaps in the Public Suffix List here (a
    broadcast map keyed by longest-suffix match); the two-label form is
    the deterministic, dependency-free default and exact for .com/.org-
    style suffixes. Single-label hosts pass through unchanged."""
    two = f"regexp_extract({host_col}, '([^.]+\\\\.[^.]+)$', 1)"
    return F.expr(f"CASE WHEN {two} = '' THEN {host_col} ELSE {two} END")


def domain_report(docs: DataFrame, url_col: str,
                  tokens_col: str | None = None) -> DataFrame:
    """Per-registrable-domain provenance rollup: (domain, n_docs,
    n_urls = distinct canonical URLs, dup_docs = docs sharing a
    canonical URL with another doc, token_bps = the domain's share of
    corpus tokens in basis points — integer-exact).

    One groupBy at domain cardinality; the corpus-total token count
    rides a 1-row constant-key broadcast (operators.attach_scalar), not
    a window over the corpus."""
    from marmaray_spark.operators import attach_scalar
    base = docs.select(
        registrable_domain(
            f"regexp_replace(lower(regexp_extract({url_col}, "
            f"'://([^/?#]+)', 1)), ':[0-9]+$', '')").alias("domain"),
        canonical_url(url_col).alias("__canon"),
        (F.col(tokens_col) if tokens_col is not None else F.lit(0))
        .cast("long").alias("__tok"))
    per = (base.groupBy("domain")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("__canon").alias("n_urls"),
                F.sum("__tok").alias("__toksum")))
    total = per.groupBy().agg(F.sum("__toksum").alias("__tot"))
    return (attach_scalar(per, total)
            .select("domain", "n_docs", "n_urls",
                    (F.col("n_docs") - F.col("n_urls")).alias("dup_docs"),
                    F.expr("CASE WHEN __tot = 0 THEN 0L ELSE "
                           "__toksum * 10000 div __tot END")
                    .alias("token_bps")))


def blocklist_gate(docs: DataFrame, url_col: str,
                   blocked_domains: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(kept, blocked) by registrable domain against a broadcast
    blocklist frame with a ``domain`` column — the fork-operator
    valid|error shape applied to provenance: kept = broadcast
    LEFT ANTI, blocked = broadcast LEFT SEMI; the corpus never
    shuffles."""
    tagged = docs.withColumn(
        "__dom", registrable_domain(
            f"regexp_replace(lower(regexp_extract({url_col}, "
            f"'://([^/?#]+)', 1)), ':[0-9]+$', '')"))
    bl = F.broadcast(blocked_domains.select(F.col("domain").alias("__dom")))
    kept = tagged.join(bl, "__dom", "left_anti").drop("__dom")
    blocked = tagged.join(bl, "__dom", "left_semi").drop("__dom")
    return kept, blocked
