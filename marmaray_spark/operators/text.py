"""Text-analysis operators for LLM data pipelines: tokenization, shingles,
language ID, quality scoring, token counting, document fingerprinting.

New surface (not in the reference — BASELINE.json north star): designed for
100 TB by being pure Catalyst expressions (whole-stage codegen, no Python
in the hot path) that are embarrassingly parallel per row — no shuffle, no
driver state. Every function returns a Column; determinism across engines
is guaranteed by building all hashing on md5 hex strings and all scores on
integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A hex digit whose high bit is set — the 1-bit extractor used by simhash
# and SRP-LSH (deterministic, identical in any engine with md5+strpos).
HIGH_HEX = "89abcdef"

# Small per-language stopword lists for the n-gram/stopword lang-id
# heuristic. Top function words; enough to separate the four languages.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "pour", "une"],
}


def words(col: str = "text") -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


def word_shingles(words_col: str, n: int = 3) -> Column:
    """n-word shingles: positions i..i+n-1 joined by a single space.

    Guarded for short docs (size < n -> empty array; Spark's
    ``sequence(1, 0)`` counts DOWN rather than being empty, so the guard
    is an explicit IF). Built by direct element indexing — ``slice()``
    per position allocates an array per shingle and measured ~4.5x
    slower at sf0.1. Values match the SQL
    ``list_transform(generate_series(1, len-n+1), i -> ...)`` form.
    """
    parts = ", ' ', ".join(f"{words_col}[i + {j}]" for j in range(n))
    return F.expr(
        f"IF(size({words_col}) < {n}, array(), "
        f"transform(sequence(0, size({words_col}) - {n}), "
        f"i -> concat({parts})))"
    )


def token_count(col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(words(col))


BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def subword_count(col: str = "text") -> Column:
    """BPE-ish token proxy: runs of letters, runs of digits, single
    punctuation — a cheap, deterministic token-count estimate."""
    return F.regexp_count(F.lower(F.col(col)), F.lit(BPE_ISH_PATTERN))


def punct_count(col: str = "text") -> Column:
    return F.length(F.regexp_replace(F.col(col), r"[^.!?,;:]", ""))


def stopword_hits(words_col: str, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of ``lang`` (with multiplicity)."""
    sw = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"aggregate({words_col}, 0, "
        f"(acc, w) -> acc + IF(array_contains(array({sw}), w), 1, 0))"
    )


def lang_id(words_col: str) -> Column:
    """Stopword-vote language ID: argmax of per-language stopword hits,
    'und' (undetermined) when no list scores > 0; ties broken by language
    code order (deterministic)."""
    scores = {lang: stopword_hits(words_col, lang) for lang in sorted(STOPWORDS)}
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    # reversed so earlier codes win ties (last when() wins in a fold-left chain)
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    return F.when(best_score > 0, pred).otherwise(F.lit("und"))


def quality_score(col: str = "text", words_col: str | None = None) -> Column:
    """Integer quality score in [0, 100]: rewards reasonable length,
    sentence punctuation, and stopword presence; penalizes very short or
    punctuation-free text. All-integer arithmetic => engine-exact.

      +40 if 20 <= n_tokens <= 1000 (else +10 if n_tokens >= 5)
      +20 if punct_count >= 1
      +20 if stopword_hits(en) >= 1
      +20 if avg token length in [3, 12] (scaled integer compare)
    """
    w = words_col if words_col is not None else f"split(trim(lower({col})), '\\\\s+')"
    n_tok = F.expr(f"size({w})")
    sum_len = F.expr(f"aggregate({w}, 0, (acc, x) -> acc + length(x))")
    sw = ", ".join(f"'{x}'" for x in STOPWORDS["en"])
    sw_hits = F.expr(f"aggregate({w}, 0, "
                     f"(acc, x) -> acc + IF(array_contains(array({sw}), x), 1, 0))")
    return (
        F.when((n_tok >= 20) & (n_tok <= 1000), 40)
        .otherwise(F.when(n_tok >= 5, 10).otherwise(0))
        + F.when(punct_count(col) >= 1, 20).otherwise(0)
        + F.when(sw_hits >= 1, 20).otherwise(0)
        + F.when((sum_len >= 3 * n_tok) & (sum_len <= 12 * n_tok), 20).otherwise(0)
    ).cast("int")


def fingerprint_bottom_k(shingles_col: str, k: int = 4) -> Column:
    """Bottom-k document sketch: the k lexicographically smallest md5 hex
    digests of the doc's distinct shingles, joined with '|'. Two docs share
    a fingerprint iff their shingle sets' k smallest hashes coincide — a
    compact near-dup prefilter (bottom-k minwise sketch)."""
    return F.expr(
        f"array_join(slice(array_sort(transform(array_distinct({shingles_col}), "
        f"s -> md5(s))), 1, {k}), '|')"
    )


def dup_word_bps(words_col: str) -> Column:
    """Repeated-word mass in basis points: (n_tokens - n_distinct) * 10000
    div n_tokens. The classic repetition signal from the Gopher quality
    rules (Rae et al. 2021, table A1) — high values mean the document is
    mostly the same words over and over. Integer div => engine-exact."""
    return F.expr(
        f"CAST((size({words_col}) - size(array_distinct({words_col}))) * 10000 "
        f"div greatest(size({words_col}), 1) AS INT)")


def top_ngram_bps(words_col: str, n: int = 2) -> Column:
    """Fraction (basis points) of n-gram slots taken by the single most
    frequent n-gram — Gopher's "top n-gram fraction" repetition rule.

    Expression-only (no shuffle, no Python), computed as the longest
    equal run of the SORTED shingle array: O(len log len) per row with
    the shingle array evaluated once. The obvious
    ``transform(array_distinct(sh), s -> size(filter(sh, ...)))`` form
    was rebuilt after a measured trap: higher-order functions are
    interpreted (never codegen), the inner filter() re-evaluates the
    whole shingle build per distinct element (O(distinct x len)), and
    when the words column is an alias, PushDownPredicate substitutes its
    split() into every one of those re-evaluations — a filter on this
    gate over 500 x 55-token docs measured 45s single-core vs ~1s for
    the run-length form. At real document lengths the old form is
    O(tokens²) and this one survives."""
    return _top_ngram_bps_expr(words_col, n)


def _top_ngram_bps_expr(words_col: str, n: int) -> Column:
    # shingles via zip_with over shifted slices, NOT w[i+j] indexing in a
    # lambda: indexed access re-evaluates the words expression per
    # element once an optimizer rule (CollapseProject/PushDownPredicate)
    # has substituted the alias — measured 5.3s -> ~1s on the filter
    # shape below, on top of the run-length rewrite
    L = f"greatest(size({words_col}) - {n - 1}, 0)"
    sh = f"slice({words_col}, 1, {L})"
    for i in range(2, n + 1):
        sh = (f"zip_with({sh}, slice({words_col}, {i}, {L}), "
              f"(x, y) -> concat(x, ' ', y))")
    runmax = (
        f"aggregate(array_sort({sh}), "
        f"named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0), "
        f"(a, x) -> named_struct("
        f"'prev', x, "
        f"'run', IF(x = a.prev, a.run + 1, 1), "
        f"'best', greatest(a.best, IF(x = a.prev, a.run + 1, 1))), "
        f"a -> a.best)")
    return F.expr(
        f"CAST(IF(size({sh}) = 0, 0, "
        f"{runmax} * 10000 div size({sh})) AS INT)")


def mean_word_len_x100(words_col: str) -> Column:
    """Mean token length scaled x100, integer div (Gopher bounds 3..10)."""
    return F.expr(
        f"CAST(aggregate({words_col}, 0, (acc, x) -> acc + length(x)) * 100 "
        f"div greatest(size({words_col}), 1) AS INT)")


def symbol_word_bps(col: str, words_col: str) -> Column:
    """Symbol-to-word ratio in basis points (Gopher's #/... rule
    generalized to all non-alphanumeric-non-space characters)."""
    return F.expr(
        f"CAST(length(regexp_replace({col}, '[a-z0-9 ]', '')) * 10000 "
        f"div greatest(size({words_col}), 1) AS INT)")


def dup_line_stats(lines_col: str) -> Column:
    """``struct(dup_line_bps, dup_line_char_bps)`` over an array-of-lines
    column — the remaining two Gopher repetition signals (Rae et al. 2021
    table A1): the fraction of LINES that are repeats of an earlier line,
    by count and by character mass (a doc whose one duplicated line is a
    500-char boilerplate footer scores low on count but high on chars).
    Repeat = occurrence beyond the first, so a line appearing k times
    contributes k-1. Expression-only, O(lines log lines) per row via a
    single pass over the sorted array (the count-per-distinct-line form
    is the interpreted-HOF O(distinct x lines) trap measured and fixed
    in top_ngram_bps — same cure here), no shuffle, no Python; empty
    lines are the caller's business (the quality query feeds a pre-built
    line grid)."""
    L = lines_col
    n = f"size({L})"
    dup_chars = (
        f"aggregate(array_sort({L}), "
        f"named_struct('prev', CAST(NULL AS STRING), 'dc', 0L), "
        f"(a, x) -> named_struct('prev', x, "
        f"'dc', a.dc + IF(x = a.prev, CAST(length(x) AS BIGINT), 0L)), "
        f"a -> a.dc)")
    tot_chars = f"aggregate({L}, 0L, (acc, l) -> acc + length(l))"
    return F.expr(
        f"struct("
        f"CAST(({n} - size(array_distinct({L}))) * 10000 "
        f"div greatest({n}, 1) AS INT) AS dup_line_bps, "
        f"CAST({dup_chars} * 10000 div greatest({tot_chars}, 1) AS INT) "
        f"AS dup_line_char_bps)")


def dup_ngram_char_bps(words_col: str, n: int) -> Column:
    """Duplicate n-gram character mass in basis points — the remaining
    Gopher repetition family (Rae et al. 2021 table A1 rows "duplicate
    n-gram char fraction", n = 5..10): the character mass of every
    REPEAT occurrence of an n-gram (occurrences beyond the first, chars
    of the n tokens themselves, separators excluded) over the document's
    total token character mass, clamped at 10000. Repeat occurrences of
    overlapping n-grams each count their full mass (Gopher's
    count-each-char-once refinement needs position interval merging; the
    repeat-mass form is monotone in the same signal, engine-exact, and
    one O(L log L) sorted-run walk instead of an interval pass — the
    clamp caps the pathological all-one-word doc at 100%).

    Expression-only: shingles via zip_with over shifted slices and the
    repeat mass via a single aggregate over the SORTED shingle array —
    both the interpreted-HOF O(distinct x len) trap and the
    indexed-lambda re-evaluation trap measured in top_ngram_bps apply
    here unchanged, so the same cures are load-bearing."""
    L = f"greatest(size({words_col}) - {n - 1}, 0)"
    sh = f"slice({words_col}, 1, {L})"
    for i in range(2, n + 1):
        sh = (f"zip_with({sh}, slice({words_col}, {i}, {L}), "
              f"(x, y) -> concat(x, ' ', y))")
    dup_chars = (
        f"aggregate(array_sort({sh}), "
        f"named_struct('prev', CAST(NULL AS STRING), 'dc', 0L), "
        f"(a, x) -> named_struct('prev', x, "
        f"'dc', a.dc + IF(x = a.prev, "
        f"CAST(length(x) - {n - 1} AS BIGINT), 0L)), "
        f"a -> a.dc)")
    tot = f"aggregate({words_col}, 0L, (acc, x) -> acc + length(x))"
    return F.expr(
        f"CAST(least(10000L, {dup_chars} * 10000 "
        f"div greatest({tot}, 1L)) AS INT)")


def dup_ngram_char_signals(df, id_col: str, tokens_col: str,
                           ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
                           passthrough: tuple[str, ...] = ("text",)):
    """All six Gopher duplicate-n-gram char-mass signals (n = 5..10,
    same semantics as dup_ngram_char_bps) in ONE Arrow-batched
    mapInPandas pass: (id, *passthrough, dup5_char_bps..dup10_char_bps).

    Bit-equal to the expression form (parity test). MEASURED TIE at
    sf0.1 on local[32] (0.52s vs 0.50s warm, noop-write-forced — a first
    count()-based comparison was meaningless because count() prunes
    expression columns but must still run a Python stage): the declared
    quality query therefore keeps the expression form, which stays
    inside whole-stage codegen with no Python workers in the plan. This
    kernel is the alternative for corpora whose documents run long:
    one token-interning pass per doc, int-tuple windows into a dict,
    O(1) window char mass off a prefix sum, all n sharing the interned
    tokens — no n-gram STRING construction at all, where the expression
    path builds each n-gram string through an n-deep zip_with chain.
    Tokens are built SPARK-SIDE and arrive through Arrow, so there is no
    Python-vs-engine tokenization drift; outputs are pure integers."""
    import pandas as pd
    import pyspark.sql.functions as _F

    id_type = df.schema[id_col].dataType.simpleString()
    pt = [(c, df.schema[c].dataType.simpleString()) for c in passthrough]
    out_schema = ", ".join(
        [f"{id_col} {id_type}"] + [f"{c} {t}" for c, t in pt]
        + [f"dup{n}_char_bps int" for n in ns])
    base = df.select(id_col, *passthrough, tokens_col)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sig: dict[int, list[int]] = {n: [] for n in ns}
            for toks in pdf[tokens_col]:
                toks = [] if toks is None else \
                    ["" if t is None else t for t in toks]
                interned: dict[str, int] = {}
                tl = [interned.setdefault(t, len(interned)) for t in toks]
                pref = [0]
                for t in toks:
                    pref.append(pref[-1] + len(t))
                tot = pref[-1]
                for n in ns:
                    cnt: dict[tuple, int] = {}
                    mass: dict[tuple, int] = {}
                    for i in range(len(tl) - n + 1):
                        key = tuple(tl[i:i + n])
                        c = cnt.get(key)
                        if c is None:
                            cnt[key] = 1
                            mass[key] = pref[i + n] - pref[i]
                        else:
                            cnt[key] = c + 1
                    dup = sum((c - 1) * mass[k]
                              for k, c in cnt.items() if c > 1)
                    sig[n].append(min(10000, dup * 10000 // max(tot, 1)))
            out = {id_col: pdf[id_col].to_numpy()}
            for c, _t in pt:
                out[c] = pdf[c].to_numpy()
            for n in ns:
                out[f"dup{n}_char_bps"] = pd.Series(sig[n], dtype="int32")
            yield pd.DataFrame(out)

    return base.mapInPandas(kernel, out_schema)


# Gopher/MassiveText table-A1 thresholds in basis points: top n-gram
# fraction for n=2,3,4 and duplicate n-gram char fraction for n=5..10.
MASSIVETEXT_TOP_NGRAM_BPS = {2: 2000, 3: 1800, 4: 1600}
MASSIVETEXT_DUP_NGRAM_BPS = {5: 1500, 6: 1400, 7: 1300,
                             8: 1200, 9: 1100, 10: 1000}


def massivetext_repetition_pass(words_col: str,
                                dup_words_col: str | None = None) -> Column:
    """The FULL MassiveText repetition gate (Rae et al. 2021 table A1):
    duplicate-word mass < 65%, top n-gram fraction under its per-n bound
    for n=2..4, duplicate n-gram char mass under its per-n bound for
    n=5..10. ``dup_words_col`` lets a caller run the dup-n-gram legs on a
    different (e.g. repeat-injected) token array than the top-n legs."""
    dcol = dup_words_col or words_col
    gate = dup_word_bps(words_col) < 6500
    for n, bps in MASSIVETEXT_TOP_NGRAM_BPS.items():
        gate = gate & (_top_ngram_bps_expr(words_col, n) < bps)
    for n, bps in MASSIVETEXT_DUP_NGRAM_BPS.items():
        gate = gate & (dup_ngram_char_bps(dcol, n) < bps)
    return gate


def gopher_repetition_pass(words_col: str) -> Column:
    """Boolean Gopher-style repetition gate: duplicate-word mass < 65%,
    top 2-gram < 20%, top 3-gram < 18% of their slots. Thresholds follow
    the shape (not the exact corpus-tuned constants) of Gopher table A1."""
    return ((dup_word_bps(words_col) < 6500)
            & (_top_ngram_bps_expr(words_col, 2) < 2000)
            & (_top_ngram_bps_expr(words_col, 3) < 1800))


def chunk_spans(words_col: str, chunk_size: int, overlap: int) -> Column:
    """Overlapping token-window spans: array of (chunk_idx, start, len)
    structs covering the word array with stride chunk_size - overlap.

    The chunking staple of training-data prep (long documents -> model-
    sized windows). Expression-only; explode downstream for one row per
    chunk. The last chunk may be shorter; a document shorter than one
    chunk yields exactly one span.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    # number of chunks: ceil(max(size - overlap, 1) / stride)
    n = (f"greatest(1, cast(ceil((size({words_col}) - {overlap}) "
         f"/ {stride}.0) as int))")
    return F.expr(
        f"transform(sequence(0, {n} - 1), "
        f"i -> struct(i as chunk_idx, i * {stride} + 1 as start, "
        f"least({chunk_size}, size({words_col}) - i * {stride}) as len))")


def chunk_documents(df, id_col: str, words_col: str,
                    chunk_size: int, overlap: int = 0):
    """One row per chunk: (id, chunk_idx, n_tokens, chunk_text)."""
    spans = chunk_spans(words_col, chunk_size, overlap)
    return (df.select(F.col(id_col), F.col(words_col),
                      F.explode(spans).alias("c"))
            .select(F.col(id_col),
                    F.col("c.chunk_idx").alias("chunk_idx"),
                    F.col("c.len").cast("int").alias("n_tokens"),
                    F.expr(f"concat_ws(' ', slice({words_col}, c.start, c.len))")
                    .alias("chunk_text")))


def deterministic_sample(df, id_col: str, pct: float, salt: str = "s0"):
    """Keep ~pct% of rows by md5-hash prefix of the id — deterministic
    across engines, retries and partitionings (unlike rand()/sample()).

    A row survives when the first 4 hex chars of md5('<salt>:<id>') sort
    below the pct threshold — fixed-width lowercase hex compares
    lexicographically == numerically, so any engine with md5 agrees
    row-for-row. Stratify by calling per stratum with different pct."""
    if not 0 <= pct <= 100:
        raise ValueError("pct in [0, 100]")
    if pct == 100:
        return df       # threshold would be 5 hex chars; keep-all is exact
    threshold = format(round(pct / 100 * 65536), "04x")
    prefix = F.expr(
        f"substring(md5(concat('{salt}:', cast({id_col} as string))), 1, 4)")
    return df.filter(prefix < threshold)


def stratified_sample(df, id_col: str, strata_col: str,
                      pcts: dict[str, float], default_pct: float = 100.0,
                      salt: str = "s0"):
    """Per-stratum deterministic sampling: each stratum keeps its own
    md5-threshold percentage (e.g. downsample dominant languages, keep
    all of the rare ones — the corpus-rebalancing staple). Same hash
    contract as deterministic_sample: engine/retry/partitioning-stable.
    Strata not listed keep ``default_pct``."""
    for p in list(pcts.values()) + [default_pct]:
        if not 0 <= p <= 100:
            raise ValueError("pct in [0, 100]")

    def hexthr(pct: float) -> str:
        return format(min(round(pct / 100 * 65536), 65535), "04x") \
            if pct < 100 else "ffff~"   # '~' sorts above hex: keep-all

    prefix = (f"substring(md5(concat('{salt}:', "
              f"cast({id_col} as string))), 1, 4)")
    cases = " ".join(
        f"WHEN {strata_col} = '{s}' THEN '{hexthr(p)}'"
        for s, p in sorted(pcts.items()))
    thr = f"CASE {cases} ELSE '{hexthr(default_pct)}' END"
    return df.filter(F.expr(f"{prefix} < {thr}"))


def weighted_sample(df, id_col: str, weight_col, salt: str = "s0"):
    """Per-ROW deterministic sampling: each row survives with its own
    probability from ``weight_col`` (a Column or name yielding [0, 1] —
    e.g. a quality score mapped to a keep rate, the corpus-MIXING
    primitive: sample each document at a rate driven by its source,
    quality, or dedup-cluster size).

    Same hash contract as deterministic_sample — the row's md5-derived
    16-bit uniform is compared to round(weight * 65536), integer-exact
    and engine/retry/partitioning-stable. weight <= 0 drops, >= 1 keeps."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u16 = F.conv(F.expr(
        f"substring(md5(concat('{salt}:', cast({id_col} as string))), 1, 4)"),
        16, 10).cast("long")
    thr = F.round(w * 65536).cast("long")
    return df.filter(u16 < thr)


def temperature_mix(df, id_col: str, group_col: str,
                    keep_bps: int = 2000, salt: str = "tm0"):
    """Temperature-based corpus mixing at α = 0.5: rebalance group (e.g.
    language / source) proportions toward ``share_g ∝ sqrt(n_g)`` — the
    multilingual sampling rule popularized by XLM (Conneau & Lample 2019)
    and mBERT, which upsamples rare groups relative to their raw share —
    while keeping ~``keep_bps``/10000 of the corpus overall. Returns the
    kept rows.

    Cross-engine-exact by construction (this is the hash-gate contract
    the sampling family shares): IEEE sqrt is correctly rounded in every
    engine, each group's ``sqrt(n_g)`` is quantized to an integer
    immediately (×1000, floor), and everything after — the share
    denominator, per-group acceptance rate in basis points, the 16-bit
    md5 threshold — is integer arithmetic, so no float summation order
    can flip a row. α is fixed at 0.5 because general ``pow`` is NOT
    correctly rounded across libms; other temperatures would need a
    per-group quantization table shipped from the driver.

    Scale: one tiny groupBy(group) count (map-side combined), rates
    computed on that group-count-scale frame and broadcast back; the
    corpus itself is filtered in place — no corpus shuffle."""
    if not 0 < keep_bps <= 10000:
        raise ValueError("keep_bps in (0, 10000]")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    s = counts.withColumn(
        "_s", F.expr("CAST(floor(sqrt(_n) * 1000) AS BIGINT)"))
    # totals via an unpartitioned window over the GROUP-count-scale frame
    # (single partition by construction — that frame is tiny), sparing a
    # second aggregate + broadcast-exchange job.
    # rate_bps = keep_bps * N * s_g / (S * n_g), floored — the numerator
    # reaches ~1e23 at a 100 TB corpus, past int64, so the products ride
    # DECIMAL(38,0) (the oracle's HUGEINT): exact integers either way
    from pyspark.sql.window import Window as _W
    wall = _W.partitionBy()
    rates = (s.withColumn("_stot", F.sum("_s").over(wall))
             .withColumn("_ntot", F.sum("_n").over(wall))
             .withColumn("_rate_bps", F.expr(
                 f"least(CAST(10000 AS BIGINT), "
                 f"(CAST({int(keep_bps)} AS DECIMAL(38,0)) * _ntot * _s) div "
                 f"(CAST(_stot AS DECIMAL(38,0)) * _n))"))
             .select(group_col, "_rate_bps"))
    u16 = F.conv(F.expr(
        f"substring(md5(concat('{salt}:', cast({id_col} as string))), 1, 4)"),
        16, 10).cast("long")
    # null-safe join: groupBy counts a NULL group like any other, so a
    # plain equi-join would silently DELETE every null-group row
    # (unidentified language is routine corpus reality) instead of
    # sampling it at its computed rate
    r = rates.withColumnRenamed(group_col, "__g")
    return (df.join(F.broadcast(r),
                    F.col(group_col).eqNullSafe(F.col("__g")))
            .withColumn("_u16", u16)
            .filter(F.col("_u16") < F.expr("_rate_bps * 65536 div 10000"))
            .drop("_rate_bps", "_u16", "__g"))


def unimax_allocation(df, group_col: str, tokens_col: str,
                      budget_tokens: int, epoch_cap: int = 4):
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining", Algorithm 1): spread a total token budget as UNIFORMLY
    as possible across groups (languages / sources), capping every group
    at ``epoch_cap`` epochs of its own data — the epoch cap is what stops
    low-resource groups from being repeated into memorization, the
    failure mode temperature mixing has no guard for.

    Returns the group-scale allocation frame: (group, n_tokens,
    cap_tokens, alloc_tokens, full_epochs, frac_bps) — full epochs plus a
    fractional remainder in basis points, both integer.

    The paper's allocator is a sequential loop (ascending by size: grant
    min(cap, remaining budget / groups left), recompute). That loop has a
    closed form this implementation uses so BOTH engines can mirror it
    exactly with window functions, no iteration: sorted ascending by
    (cap, group), the capped set is a prefix (cap_j * groups_from_j +
    prefix_caps <= budget, monotone in j since caps ascend), and the
    leftover R = budget - sum(capped caps) spreads over the m uncapped
    groups as q = R div m each, with the LAST R mod m groups taking q+1
    — equal to the loop because every uncapped cap exceeds R/m (else it
    would have been capped), so min(cap, .) never binds after the
    prefix. All integer arithmetic end to end; token counts at 100 TB
    (~2.5e13) keep every product within int64 (cap * n_groups and
    alloc * 10000 both < 2^63 through ~10^5 groups).

    Scale: one map-side-combined groupBy(group) sum, then windows over
    the GROUP-scale frame only (the temperature_mix pattern); the corpus
    itself is never touched — callers join the allocation back broadcast
    (unimax_fraction_sample) or explode full_epochs to materialize."""
    from pyspark.sql.window import Window as _W

    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    if epoch_cap < 1:
        raise ValueError("epoch_cap must be >= 1")
    b = int(budget_tokens)
    # coalesce: a group whose token counts are all NULL sums to NULL,
    # which would ride through cap/capped/alloc as NULL instead of 0
    g = df.groupBy(group_col).agg(
        F.coalesce(F.sum(F.col(tokens_col).cast("long")),
                   F.lit(0).cast("long")).alias("n_tokens"))
    ordw = _W.partitionBy().orderBy(F.col("cap_tokens").asc_nulls_first(),
                                    F.col(group_col).asc_nulls_first())
    wall = _W.partitionBy()
    o = (g.withColumn("cap_tokens",
                      F.col("n_tokens") * F.lit(int(epoch_cap)))
         .withColumn("_j", F.row_number().over(ordw))
         .withColumn("_pre", F.coalesce(
             F.sum("cap_tokens").over(
                 ordw.rowsBetween(_W.unboundedPreceding, -1)),
             F.lit(0).cast("long")))
         .withColumn("_k", F.count(F.lit(1)).over(wall))
         .withColumn("_capped", F.expr(
             f"cap_tokens * (_k - _j + 1) + _pre <= {b}")))
    a = (o.withColumn("_ctot", F.coalesce(
            F.sum(F.expr("IF(_capped, cap_tokens, 0L)")).over(wall),
            F.lit(0).cast("long")))
         .withColumn("_nc", F.coalesce(
             F.sum(F.expr("IF(_capped, 1L, 0L)")).over(wall),
             F.lit(0).cast("long")))
         .withColumn("alloc_tokens", F.expr(
             f"IF(_capped, cap_tokens, "
             f"({b} - _ctot) div greatest(_k - _nc, 1L) "
             f"+ IF(_j - _nc > (_k - _nc) - (({b} - _ctot) % "
             f"greatest(_k - _nc, 1L)), 1L, 0L))")))
    return a.select(
        group_col, "n_tokens", "cap_tokens", "alloc_tokens",
        F.expr("alloc_tokens div greatest(n_tokens, 1L)")
            .alias("full_epochs"),
        F.expr("(alloc_tokens % greatest(n_tokens, 1L)) * 10000 "
               "div greatest(n_tokens, 1L)").alias("frac_bps"))


def unimax_fraction_sample(df, id_col: str, group_col: str, alloc,
                           salt: str = "um0"):
    """The rows kept for the final PARTIAL epoch of a UniMax allocation:
    per-group md5-cutoff subset at frac_bps (the repo's cross-engine
    sampling idiom — same 16-bit threshold as temperature_mix). Full
    epochs are whole-group repeats and need no row choice (materialize
    with explode(sequence(1, full_epochs))); only the remainder picks
    WHICH rows, and the hash makes that pick deterministic under retries
    and repartitioning. Carries full_epochs/frac_bps through for the
    caller. Broadcast join on the group-scale allocation; null-safe on
    the group key (the temperature_mix null-group lesson)."""
    r = alloc.select(F.col(group_col).alias("__g"),
                     "full_epochs", "frac_bps")
    u16 = F.conv(F.expr(
        f"substring(md5(concat('{salt}:', cast({id_col} as string))), "
        f"1, 4)"), 16, 10).cast("long")
    return (df.join(F.broadcast(r),
                    F.col(group_col).eqNullSafe(F.col("__g")))
            .withColumn("_u16", u16)
            .filter(F.col("_u16") < F.expr("frac_bps * 65536 div 10000"))
            .drop("_u16", "__g"))


def unimax_materialize(df, id_col: str, group_col: str, alloc,
                       salt: str = "um0", epoch_col: str = "epoch"):
    """Materialize a UniMax allocation into actual training rows: every
    row repeats once per FULL epoch of its group (``epoch`` = 1..E via
    explode(sequence), no driver loop) and the md5-cutoff fractional
    subset appears once more as the final partial epoch (``epoch`` =
    full_epochs + 1). Row multiplicity is exactly alloc semantics: a
    group allocated 2.4 epochs emits 2 copies of every row plus one copy
    of the deterministic 40%-cutoff subset. One broadcast join + one
    generator projection — the corpus never shuffles; a downstream
    training-shard writer gives the epochs their global order."""
    a = alloc.select(F.col(group_col).alias("__g"),
                     "full_epochs", "frac_bps")
    u16 = F.conv(F.expr(
        f"substring(md5(concat('{salt}:', cast({id_col} as string))), "
        f"1, 4)"), 16, 10).cast("long")
    joined = df.join(F.broadcast(a),
                     F.col(group_col).eqNullSafe(F.col("__g")))
    full = (joined.filter(F.col("full_epochs") > 0)
            .withColumn(epoch_col, F.explode(
                F.expr("sequence(1L, full_epochs)"))))
    frac = (joined.withColumn("_u16", u16)
            .filter(F.col("_u16") < F.expr("frac_bps * 65536 div 10000"))
            .withColumn(epoch_col, F.col("full_epochs") + F.lit(1))
            .drop("_u16"))
    return (full.unionByName(frac)
            .drop("__g", "full_epochs", "frac_bps"))


# ---------------------------------------------------------------------------
# C4-style line-level cleaning (Raffel et al. 2020, §2.2 "Colossal Clean
# Crawled Corpus" heuristics). The reference has no text surface at all —
# this is part of the beyond-reference LLM-data-pipeline tier.
# ---------------------------------------------------------------------------

# substrings whose presence disqualifies a line (C4 drops lines with the
# word "javascript", boilerplate/policy text, and code-ish curly braces;
# "lorem ipsum" pages are dropped wholesale there — here it is a line rule
# so a single filler line doesn't nuke a whole document)
C4_BAD_MARKERS = ("javascript", "lorem ipsum", "cookie")


def c4_kept_lines(col: str = "text", min_words: int = 3) -> Column:
    """Array of the lines of ``col`` that survive the C4 line rules:

    - at least ``min_words`` whitespace words,
    - ends in terminal punctuation (. ! ? or a closing quote),
    - contains no bad marker (javascript / lorem ipsum / cookie) and no
      curly brace.

    Expression-only (split + filter + rlike inside whole-stage codegen):
    embarrassingly parallel per row, no shuffle, no Python — the shape
    that survives a 100 TB corpus unchanged."""
    markers = " AND ".join(
        f"NOT contains(lower(ln), '{m}')" for m in C4_BAD_MARKERS)
    brace = "NOT (contains(ln, '@LB@') OR contains(ln, '@RB@'))" \
        .replace("@LB@", chr(123)).replace("@RB@", chr(125))
    return F.expr(
        f"filter(split({col}, '\\n'), ln -> "
        f"size(filter(split(trim(ln), ' +'), x -> x <> '')) >= {min_words} "
        f"AND trim(ln) rlike '[.!?\"]$' AND {markers} AND {brace})")


def c4_clean(col: str = "text", min_words: int = 3) -> Column:
    """Struct(cleaned, lines_total, lines_kept): the document with only
    its C4-surviving lines (joined back with newlines) plus the line
    bookkeeping a cleaning report needs."""
    kept = c4_kept_lines(col, min_words)
    return F.struct(
        F.array_join(kept, "\n").alias("cleaned"),
        F.expr(f"size(split({col}, '\\n'))").cast("int").alias("lines_total"),
        F.size(kept).cast("int").alias("lines_kept"),
    )


def normalize_text(df, text_col: str = "text", form: str = "NFKC",
                   casefold: bool = True, strip_accents: bool = False):
    """Unicode-normalize a text column in one Arrow pass, all other
    columns passing through — the canonical PRE-DEDUP step: crawl
    variants that render identically (full-width forms, ligatures,
    composed vs decomposed accents, case) must hash identically before
    any digest, shingle, or fingerprint sees them, or every dedup tier
    silently under-merges.

    ``form`` is any unicodedata form (NFKC folds compatibility
    characters — full-width ASCII, ligatures, Roman numerals);
    ``casefold`` applies Python str.casefold (the Unicode-correct
    lowercase); ``strip_accents`` drops combining marks via NFD ->
    remove Mn -> re-normalize. Spark has no NFKC builtin, so this is a
    mapInPandas kernel (stdlib unicodedata, Arrow-batched — per-row
    Python never appears); NULLs pass through as NULLs."""
    import pyspark.sql.functions as _F  # noqa: F401  (schema symmetry)
    import unicodedata

    if text_col not in df.columns:
        raise ValueError(f"no column {text_col!r}")
    valid = {"NFC", "NFD", "NFKC", "NFKD"}
    if form not in valid:
        raise ValueError(f"form must be one of {sorted(valid)}")
    schema = df.schema

    def fix(t):
        if t is None:
            return None
        s = unicodedata.normalize(form, t)
        if strip_accents:
            s = unicodedata.normalize(
                "NFC", "".join(c for c in unicodedata.normalize("NFD", s)
                               if unicodedata.category(c) != "Mn"))
        return s.casefold() if casefold else s

    def kernel(batches):
        for pdf in batches:
            pdf[text_col] = pdf[text_col].map(fix)
            yield pdf

    return df.mapInPandas(kernel, schema)


def compression_signals(df, id_col: str, text_col: str = "text",
                        level: int = 6):
    """(id, n_bytes, zlib_bytes, ratio_bps): zlib compressibility per
    document — the quality signal several published corpus pipelines
    gate on from BOTH sides: mass-repeated boilerplate compresses far
    below natural prose (low ratio_bps = compressed/raw in basis
    points), while binary junk / encoded blobs barely compress at all
    (ratio_bps near or above 10000).

    Runs as ONE Arrow-batched mapInPandas pass (stdlib zlib; there is
    no SQL-side codec, so this operator is pytest-verified rather than
    oracle-checked). Outputs are integers; for a fixed zlib level the
    byte counts are deterministic per zlib build — treat thresholds as
    operating points, not portable constants. Empty text scores
    ratio_bps = 10000 (incompressible by convention) so downstream
    BETWEEN gates never see a divide-by-zero null."""
    import pyspark.sql.functions as _F

    # the id column keeps ITS OWN type (string doc ids are common; a
    # hardcoded `long` here turned a YAML corpus.id_col choice into a
    # mid-run Arrow conversion error)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_type}, n_bytes int, zlib_bytes int, "
                  f"ratio_bps int")
    base = df.select(_F.col(id_col), _F.col(text_col).alias("__t"))

    def kernel(batches):
        import pandas as pd
        import zlib
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw, comp, bps = [], [], []
            for t in pdf["__t"]:
                b = (t or "").encode("utf-8")
                c = len(zlib.compress(b, level)) if b else 0
                raw.append(len(b))
                comp.append(c)
                bps.append((c * 10000) // len(b) if b else 10000)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "n_bytes": raw, "zlib_bytes": comp,
                                "ratio_bps": bps})

    return base.mapInPandas(kernel, out_schema)


def adjacent_bigrams(words_col: str) -> Column:
    """Adjacent word pairs as 'a b' strings, empty tokens dropped FIRST
    so adjacency is over the real token stream (an empty split artifact
    must not break a phrase in one engine and not the other). Same
    descending-``sequence`` guard as ``word_shingles``."""
    fw = f"filter({words_col}, x -> x != '')"
    return F.expr(
        f"IF(size({fw}) < 2, array(), "
        f"transform(sequence(0, size({fw}) - 2), "
        f"i -> concat({fw}[i], ' ', {fw}[i + 1])))")


def collocation_lift(df: DataFrame, words_col: str,
                     min_count: int = 3, top_k: int = 25,
                     unigrams: DataFrame | None = None) -> DataFrame:
    """Phrase mining by integer lift: for each adjacent bigram 'a b',
    ``lift_x1000 = (c_ab * n_tok * 1000) div (c_a * c_b)`` — the
    word2phrase / PMI ranking (Mikolov et al. 2013 §4) with the floats
    removed so the oracle recomputes it bit-for-bit. ``n_tok`` is the
    total (non-empty) token count; c_a, c_b unigram counts; c_ab the
    bigram count. Top-k by (lift desc, count desc, bigram asc) — a
    total order, so the selected set is engine-exact.

    Plan: two map-side-combined counts (unigrams, bigrams) + one 1-row
    total, then two small joins keyed by the candidate bigram's words.
    The ``min_count`` floor prunes the hapax tail BEFORE the joins —
    at 100 TB that tail is most of the dictionary. Pass ``unigrams``
    (columns ``t``, ``c1``) when the caller already counted the
    dictionary — the token total then derives from it (a vocab-size
    sum, not a corpus re-explode). int64 overflow note:
    ``c_ab * n_tok * 1000`` needs c_ab * n_tok < 9.2e15; beyond that
    (corpus over ~a trillion tokens with million-count bigrams) divide
    n_tok's magnitude out first or move to decimal(38).
    """
    if unigrams is None:
        unigrams = (df.select(F.explode(F.expr(
            f"filter({words_col}, x -> x != '')")).alias("t"))
            .groupBy("t").agg(F.count(F.lit(1)).alias("c1")))
    uni = unigrams
    ntok = uni.agg(F.sum("c1").alias("n_tok"))
    bi = (df.select(F.explode(adjacent_bigrams(words_col)).alias("bg"))
          .groupBy("bg").agg(F.count(F.lit(1)).alias("c_ab"))
          .filter(F.col("c_ab") >= min_count)
          .withColumn("a", F.expr("split(bg, ' ')[0]"))
          .withColumn("b", F.expr("split(bg, ' ')[1]")))
    from marmaray_spark.operators import attach_scalar

    scored = attach_scalar(
        bi.join(uni.select(F.col("t").alias("a"),
                           F.col("c1").alias("c_a")), "a")
          .join(uni.select(F.col("t").alias("b"),
                           F.col("c1").alias("c_b")), "b"),
        ntok).select("bg", "c_ab",
                     F.expr("(c_ab * n_tok * 1000) div (c_a * c_b)")
                     .alias("lift_x1000"))
    return (scored.orderBy(F.col("lift_x1000").desc(),
                           F.col("c_ab").desc(), "bg")
            .limit(top_k))
