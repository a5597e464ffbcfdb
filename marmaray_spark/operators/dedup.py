"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

New surface for LLM data pipelines (BASELINE.json north star). 100 TB
design notes on each operator:

- Exact dedup: hash-groupBy on a content digest — one shuffle on the
  digest (uniform keys, no skew), map-side partial aggregation.
- MinHash+LSH: per-row signature computation is expression-only (no
  Python, no shuffle); candidate generation explodes rows x bands and
  shuffles on (band, bucket) — the classic shingle->minhash->band->
  bucket-join pipeline whose cost is O(rows x bands), never O(rows^2).
- SimHash: per-row 16-bit fingerprint via integer expression; near-dup
  join at scale goes through bucketing on fingerprint prefixes (here the
  pairwise form is kept for oracle checkability and small candidate sets).
- n-gram Jaccard: exact verification on candidate pairs only (integer
  intersection/union counts — engine-exact).

All hashing is md5-hex based so a SQL oracle computes bit-identical
results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_digest(col: str = "text") -> Column:
    """Canonical content hash for exact dedup (md5 of the raw text)."""
    return F.md5(F.col(col))


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per identical content; report group
    size. One hash-shuffle; AQE coalesces the post-agg partitions."""
    return (df
            .groupBy(content_digest(text_col).alias("digest"))
            .agg(F.min(F.col(id_col)).alias("keeper_id"),
                 F.count(F.lit(1)).alias("dup_count")))


def minhash_digests(shingles_col: str, n_salts: int = 2) -> Column:
    """Per-shingle digest string: ``n_salts`` salted md5s concatenated
    (64 hex chars for the default 2). One hash pass over the shingle set;
    ``minhash_signature`` then derives k hash functions by slicing —
    hashing each shingle k times (the textbook construction) measured
    ~2.5x slower at sf0.1 for identical candidate quality."""
    inner = ", ".join(f"md5(concat('{i}:', s))" for i in range(n_salts))
    # the first 8 hex chars are re-appended so ``minhash_signature``'s
    # wraparound slices are plain substrings (no per-slice concat)
    return F.expr(f"transform(transform({shingles_col}, s -> concat({inner})), "
                  f"d -> concat(d, substring(d, 1, 8)))")


def _slice_order(k: int) -> list[int]:
    """Slice indices permuted so CONSECUTIVE pairs are bit-disjoint.

    Slice i covers bits [16i, 16i+32) of the wrapped digest (4-hex-char
    stride, 8-hex-char width), so slices i and i+2 never share bits.
    Emitting each block of 4 as (i, i+2, i+1, i+3) makes every 2-row LSH
    band combine two independent 32-bit hashes — a band bucket is then
    effectively one 64-bit hash, keeping the per-band false-positive
    rate ~2^-64."""
    order: list[int] = []
    for base in range(0, k - k % 4, 4):
        order += [base, base + 2, base + 1, base + 3]
    order += list(range(k - k % 4, k))
    return order


def minhash_signature(digests_col: str, k: int = 16) -> Column:
    """k MinHash values: min over shingles of a 32-bit (8-hex-char) slice
    of the per-shingle digest (``minhash_digests``), slice i starting at
    hex offset 4i with wraparound. Lexicographic min over equal-length
    hex strings == numeric min — identical in any engine. Empty shingle
    set -> 'z' sentinel (sorts after every hex digest)."""
    sigs = [
        F.expr(f"coalesce(array_min(transform({digests_col}, "
               f"h -> substring(h, {4 * i + 1}, 8))), 'z')")
        .alias(f"mh_{i}")
        for i in _slice_order(k)
    ]
    return F.array(*sigs)


def lsh_band_buckets(signature_col: str, bands: int, rows_per_band: int) -> Column:
    """Band the signature: bucket b = md5 of the concatenated minhashes in
    band b. Returns array<string> of length ``bands``."""
    exprs = [
        F.expr(f"md5(concat_ws(',', slice({signature_col}, "
               f"{b * rows_per_band + 1}, {rows_per_band})))")
        for b in range(bands)
    ]
    return F.array(*exprs)


def lsh_candidate_pairs(df: DataFrame, id_col: str, buckets_col: str,
                        persist: bool = True,
                        max_bucket_width: int | None = None,
                        reliable_barrier: bool = False) -> DataFrame:
    """Explode (id, band, bucket), self-join per (band, bucket), emit
    distinct id pairs (a < b). The join key includes the band index so
    equal buckets in different bands don't collide.

    The (id, buckets) projection is persisted BEFORE the explode: a
    derived-column generator input drops out of whole-stage codegen, so
    without the barrier the full minhash expression tree is re-evaluated
    interpreted (measured 15x slower at sf0.1) and again in both join
    branches — the fork-persist rule (SURVEY §4) applied to an analytic
    operator. The persisted frame is tiny: rows x (id, bands x 32-char hex).

    ``max_bucket_width`` is the HOT-BUCKET fallback for boilerplate-heavy
    corpora (e.g. 30% identical docs land one bucket with W members ->
    W^2/2 candidate pairs from a single task). Buckets wider than the cap
    switch from all-pairs to STAR topology: every member pairs with the
    bucket's min-id anchor — O(W) candidates, connectivity through the
    anchor preserved, so downstream connected components still merge the
    group after verification. Recall caveat (document, don't hide): two
    docs near-dup to each other but NOT to the anchor lose their direct
    edge in hot buckets — exactly the mass-duplication case where members
    are mutually near-identical, so in practice the verified star keeps
    the component intact. Off (None) by default: the declared oracle is
    the exact all-pairs set.

    ``reliable_barrier``: on a real cluster, a persist()ed barrier is
    rebuilt from lineage when an executor holding its blocks dies — and
    rebuilding HERE means re-running the full minhash tree interpreted
    (the 15x path) on the lost partitions at the worst possible time.
    True swaps the barrier for ``checkpoint()`` to the session's
    checkpoint dir (``sc.setCheckpointDir`` on HDFS/object storage):
    lineage is truncated, recovery is a file re-read. Costs one write
    of the tiny (id, buckets) projection; keep False locally."""
    pre = df.select(F.col(id_col).alias("doc"), F.col(buckets_col).alias("__bk__"))
    if reliable_barrier:
        pre = pre.checkpoint(eager=True)
    elif persist:
        pre = pre.persist()
        pre.count()
    exploded = pre.select("doc", F.posexplode("__bk__").alias("band", "bucket"))
    if max_bucket_width is None:
        left = exploded.alias("l")
        right = exploded.alias("r")
        return (left.join(right,
                          (F.col("l.band") == F.col("r.band"))
                          & (F.col("l.bucket") == F.col("r.bucket"))
                          & (F.col("l.doc") < F.col("r.doc")))
                .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
                .distinct())

    from pyspark.sql import Window
    w = Window.partitionBy("band", "bucket")
    sized = (exploded
             .withColumn("__n__", F.count(F.lit(1)).over(w))
             .withColumn("__mn__", F.min("doc").over(w)))
    small = sized.filter(F.col("__n__") <= max_bucket_width) \
        .select("doc", "band", "bucket")
    left = small.alias("l")
    right = small.alias("r")
    pairs_small = (left.join(right,
                             (F.col("l.band") == F.col("r.band"))
                             & (F.col("l.bucket") == F.col("r.bucket"))
                             & (F.col("l.doc") < F.col("r.doc")))
                   .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b")))
    # hot buckets: star over the anchor — no join at all, one linear pass
    pairs_hot = (sized.filter((F.col("__n__") > max_bucket_width)
                              & (F.col("doc") != F.col("__mn__")))
                 .select(F.col("__mn__").alias("a"), F.col("doc").alias("b")))
    return pairs_small.unionByName(pairs_hot).distinct()


def simhash16(words_col: str) -> Column:
    """16-bit SimHash over the distinct-word set.

    Bit i (1-based hex position) is set when the sum over words of
    (+1 if the i-th hex digit of md5(word) has its high bit set else -1)
    is >= 0. Pure integer arithmetic — engine-exact.
    """
    bit_terms = []
    for i in range(1, 17):
        s = (f"aggregate(array_distinct({words_col}), 0, (acc, w) -> acc + "
             f"IF(instr('89abcdef', substring(md5(w), {i}, 1)) > 0, 1, -1))")
        bit_terms.append(f"IF(({s}) >= 0, {1 << (i - 1)}, 0)")
    return F.expr(" + ".join(bit_terms)).cast("bigint")


def simhash_near_dup_pairs(df: DataFrame, id_col: str, simhash_col: str,
                           max_hamming: int = 3) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Pairwise form (checkable): at 100 TB, prefilter by joining on
    fingerprint bytes (pigeonhole: <=3 differing bits of 16 means at least
    one identical byte half) before the bit_count filter.
    """
    left = df.select(F.col(id_col).alias("a"), F.col(simhash_col).alias("sh_a"))
    right = df.select(F.col(id_col).alias("b"), F.col(simhash_col).alias("sh_b"))
    return (left.join(right, F.col("a") < F.col("b"))
            .filter(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))) <= max_hamming)
            .select("a", "b",
                    F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
                    .alias("hamming")))


def simhash_banded_near_dup(df: DataFrame, id_col: str, simhash_col: str,
                            max_hamming: int = 3,
                            max_bucket_width: int | None = None,
                            hash_bits: int = 16,
                            n_bands: int = 4) -> DataFrame:
    """Banded Hamming near-dup at scale: pigeonhole banding instead of
    all pairs. Split the ``hash_bits``-bit fingerprint into ``n_bands``
    equal slices; two fingerprints within hamming distance < n_bands
    differ in at most n_bands - 1 slices, so they MUST share at least
    one (band_idx, slice) — equi-join candidates on that, then apply the
    exact hamming filter. O(rows x n_bands) keys, never O(rows^2); same
    recall as the pairwise form for ``max_hamming`` <= n_bands - 1
    (guaranteed by pigeonhole). Defaults are the 16-bit text SimHash;
    the 64-bit image dHash (operators/multimodal.py) reuses this with
    hash_bits=64 (four 16-bit slices). Works on the sign bit too:
    shiftright sign-extends but the slice mask truncates."""
    if hash_bits % n_bands:
        raise ValueError("n_bands must divide hash_bits")
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"pigeonhole with {n_bands} bands guarantees recall only "
            f"for max_hamming <= {n_bands - 1} over {hash_bits} bits")
    width = hash_bits // n_bands
    mask = (1 << width) - 1
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright(F.col(simhash_col), b * width)
                 .bitwiseAND(mask).alias("nibble"))
        for b in range(n_bands)
    ])
    tagged = df.select(F.col(id_col).alias("id"),
                       F.col(simhash_col).alias("sh"),
                       F.explode(bands).alias("bk"))
    if max_bucket_width is not None:
        # hot-bucket fallback (see lsh_candidate_pairs): a saturated
        # fingerprint space (boilerplate-duplicated corpus) turns one
        # (band, nibble) bucket quadratic; cap it to a star over the
        # bucket's min-id anchor. Off by default — the declared oracle
        # is the exact pairwise set.
        from pyspark.sql import Window
        w = Window.partitionBy("bk")
        sized = (tagged
                 .withColumn("__n__", F.count(F.lit(1)).over(w))
                 .withColumn("__mnrec__", F.min(F.struct("id", "sh")).over(w))
                 .withColumn("__mn__", F.col("__mnrec__.id"))
                 .withColumn("__mnsh__", F.col("__mnrec__.sh")))
        small = sized.filter(F.col("__n__") <= max_bucket_width)
        left = small.select(F.col("id").alias("a"), F.col("sh").alias("sh_a"),
                            F.col("bk").alias("bk_a"))
        right = small.select(F.col("id").alias("b"), F.col("sh").alias("sh_b"),
                             F.col("bk").alias("bk_b"))
        pairs_small = (left.join(right, (F.col("bk_a") == F.col("bk_b"))
                                 & (F.col("a") < F.col("b")))
                       .select("a", "b", F.col("sh_a"), F.col("sh_b")))
        pairs_hot = (sized.filter((F.col("__n__") > max_bucket_width)
                                  & (F.col("id") != F.col("__mn__")))
                     .select(F.col("__mn__").alias("a"), F.col("id").alias("b"),
                             F.col("__mnsh__").alias("sh_a"),
                             F.col("sh").alias("sh_b")))
        return (pairs_small.unionByName(pairs_hot)
                .select("a", "b",
                        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
                        .alias("hamming"))
                .filter(F.col("hamming") <= max_hamming)
                .distinct())
    left = tagged.select(F.col("id").alias("a"), F.col("sh").alias("sh_a"),
                         F.col("bk").alias("bk_a"))
    right = tagged.select(F.col("id").alias("b"), F.col("sh").alias("sh_b"),
                          F.col("bk").alias("bk_b"))
    return (left.join(right, (F.col("bk_a") == F.col("bk_b"))
                      & (F.col("a") < F.col("b")))
            .select("a", "b",
                    F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
                    .alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def connected_components(pairs: DataFrame, a: str = "a", b: str = "b",
                         max_iter: int = 25) -> DataFrame:
    """Duplicate GROUPS from candidate pairs: each node labeled with the
    minimum id reachable through the pair graph (connected components by
    iterative min-label propagation).

    The step no single SQL pass expresses: per iteration every node
    takes min(own label, neighbors' labels) — one join + one groupBy —
    then POINTER-JUMPS: each label is replaced by its labelee's label
    (``component' = label(component)``), so label information travels
    2^k hops after k iterations and convergence is O(log diameter), not
    O(diameter) — the difference between 4 and 30+ rounds on the long
    chains a 100 TB near-dup graph can contain. Each iteration
    ``localCheckpoint``s: persist alone caches data but the LOGICAL plan
    still compounds per iteration (planning cost grows exponentially,
    OOMs the driver around iteration ~30); checkpointing truncates
    lineage so cost per iteration is constant. Returns (node, component).
    """
    sym = (pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
           .unionByName(pairs.select(F.col(b).alias("src"),
                                     F.col(a).alias("dst"))))
    sym = sym.localCheckpoint(eager=True)
    labels = (sym.select(F.col("src").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=True))

    for _ in range(max_iter):
        neighbor_min = (sym.join(labels, sym.dst == labels.node)
                        .groupBy("src")
                        .agg(F.min("component").alias("nbr_min")))
        stepped = (labels.join(neighbor_min,
                               labels.node == neighbor_min.src, "left")
                   .select(F.col("node"),
                           F.col("component").alias("__old"),
                           F.least(F.col("component"),
                                   F.coalesce(F.col("nbr_min"),
                                              F.col("component")))
                           .alias("component")))
        # pointer jumping: component' = component's own label (labels are
        # node ids, so every component value exists as a node). Keeps the
        # min-reachable-id invariant — it only short-circuits hops.
        as_map = stepped.select(F.col("node").alias("c"),
                                F.col("component").alias("cc"))
        # the previous label rides along as __old so convergence is a
        # plain filter-count over the checkpointed partitions — no
        # per-iteration new-vs-old join/shuffle
        new_labels = (stepped.join(as_map, stepped.component == as_map.c,
                                   "left")
                      .select(F.col("node"), "__old",
                              F.least(F.col("component"),
                                      F.coalesce(F.col("cc"),
                                                 F.col("component")))
                              .alias("component"))
                      .withColumn("__chg",
                                  F.col("component") != F.col("__old"))
                      .localCheckpoint(eager=True))
        changed = new_labels.filter("__chg").count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    return labels


def jaccard_counts(shingles_a: Column, shingles_b: Column) -> tuple[Column, Column]:
    """(intersection_size, union_size) of two distinct-shingle sets as
    exact integers — compare ``union_size * threshold <= inter * 1`` style
    to avoid any float."""
    inter = F.size(F.array_intersect(F.array_distinct(shingles_a),
                                     F.array_distinct(shingles_b)))
    union = (F.size(F.array_distinct(shingles_a))
             + F.size(F.array_distinct(shingles_b)) - inter)
    return inter, union


def duplicated_window_stats(df: DataFrame, id_col: str, words_col: str,
                            window: int = 3) -> DataFrame:
    """Exact-substring duplication report (the approximation of Lee et
    al. 2022 "Deduplicating Training Data Makes Language Models Better"
    suffix-array dedup that actually distributes): slide a ``window``-token
    shingle over every document, count every window occurrence corpus-wide,
    and report per document how much of it is covered by windows that
    occur more than once anywhere in the corpus.

    Returns (id, n_windows, dup_windows, dup_bps): total window positions,
    positions whose window text is globally duplicated, and the duplicated
    share in basis points. Documents shorter than ``window`` tokens have
    no positions and emit no row (the caller can left-join if 0-rows
    matter).

    Scale: one explode, one groupBy(win) count, one join back on win —
    the join reuses the groupBy's hash partitioning (same key), so the
    corpus pays ONE shuffle on window text plus the final map-side-
    combined doc_id agg. Suffix arrays need a global sort of every byte;
    this needs a word-shingle exchange. At real scale use window≈50
    (the paper's dup threshold) and hash the shingle (md5) instead of
    shipping raw text through the exchange."""
    wins = (df.select(
        F.col(id_col),
        F.explode(F.expr(
            # sequence(1, 0) would DESCEND in Spark — guard short docs
            f"IF(size({words_col}) < {window}, array(), "
            f"transform(sequence(1, size({words_col}) - {window - 1}), "
            f"i -> concat_ws(' ', slice({words_col}, i, {window}))))"))
        .alias("win")))
    cnts = wins.groupBy("win").agg(F.count(F.lit(1)).alias("cnt"))
    return (wins.join(cnts, "win")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_windows"),
                 F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
                 .cast("int").alias("dup_windows"))
            .select(F.col(id_col), "n_windows", "dup_windows",
                    F.expr("CAST(dup_windows * 10000 div n_windows AS INT)")
                    .alias("dup_bps")))


def remove_duplicate_spans(df: DataFrame, id_col: str, words_col: str,
                           window: int = 3,
                           hash_exchange: bool = False) -> DataFrame:
    """Exact-substring dedup with span REMOVAL — the full Lee et al. 2022
    "ExactSubstr" semantics, not just the report: every token position
    covered by a ``window``-token run that occurs more than once
    corpus-wide is excised, and the document is reconstructed from the
    surviving tokens in order.

    Returns (id, n_tokens, kept_tokens, n_dup_starts, cleaned_text):
    original token count, surviving token count, how many duplicated
    window starts the doc carried, and the re-joined cleaned text
    (``''`` when the whole document was duplicated). Documents shorter
    than ``window`` tokens pass through untouched.

    Scale shape (same skeleton as duplicated_window_stats): one explode,
    one groupBy(win) count whose hash partitioning the join-back reuses,
    then ONE doc-scale groupBy collecting each doc's duplicated start
    positions, and a final broadcast-or-shuffle join back to the corpus.
    The span arithmetic is a single Catalyst ``aggregate`` over the
    SORTED start list with a merged-interval accumulator — O(tokens +
    starts) per doc. (A per-token ``exists(starts, ...)`` probe would be
    O(tokens x starts) re-evaluated interpreted — the higher-order-
    function trap measured at 46x on top_ngram_bps — so it is
    deliberately not written that way.) With ``hash_exchange=True`` the
    shuffle key is md5(window) instead of raw window text — at the
    paper's window=50 that caps exchange rows at 32 hex chars.

    Reference contract: beyond uber/marmaray (no dedup surface); paper
    semantics per Lee et al. 2022 §4.1 (suffix-array ExactSubstr),
    re-expressed as a distributable shingle-count instead of a global
    suffix sort."""
    wins = (df.select(
        F.col(id_col),
        F.explode(F.expr(
            f"IF(size({words_col}) < {window}, array(), "
            f"transform(sequence(1, size({words_col}) - {window - 1}), "
            f"i -> named_struct('i', i, 'win', "
            f"concat_ws(' ', slice({words_col}, i, {window})))))"))
        .alias("x"))
        .select(F.col(id_col), F.col("x.i").alias("i"),
                (F.expr(f"md5(x.win)") if hash_exchange
                 else F.col("x.win")).alias("win")))
    cnts = wins.groupBy("win").agg(F.count(F.lit(1)).alias("cnt"))
    starts = (wins.join(cnts, "win")
              .filter(F.col("cnt") > 1)
              .groupBy(id_col)
              .agg(F.sort_array(F.collect_list("i")).alias("__starts")))
    out = (df.join(starts, id_col, "left")
           .withColumn("__starts",
                       F.coalesce(F.col("__starts"),
                                  F.expr("CAST(array() AS array<int>)"))))
    # merged-interval sweep: prev = first position not yet consumed;
    # each duplicated start s covers [s, s+window-1], so the kept gap is
    # [prev, s-1]; overlapping/adjacent spans collapse via greatest().
    kept = (
        f"aggregate(__starts, "
        f"named_struct('prev', 1, 'acc', CAST(array() AS array<string>)), "
        f"(st, s) -> named_struct("
        f"  'prev', CAST(greatest(st.prev, s + {window}) AS INT), "
        f"  'acc', IF(s > st.prev, "
        f"            concat(st.acc, slice({words_col}, st.prev, s - st.prev)), "
        f"            st.acc)), "
        f"st -> IF(st.prev <= size({words_col}), "
        f"         concat(st.acc, slice({words_col}, st.prev, "
        f"                              size({words_col}) - st.prev + 1)), "
        f"         st.acc))")
    return (out.withColumn("__kept", F.expr(kept))
            .select(F.col(id_col),
                    F.size(words_col).cast("int").alias("n_tokens"),
                    F.size("__kept").cast("int").alias("kept_tokens"),
                    F.size("__starts").cast("int").alias("n_dup_starts"),
                    F.concat_ws(" ", F.col("__kept")).alias("cleaned_text")))


def remove_duplicate_paragraphs(df: DataFrame, id_col: str,
                                paras_col: str, sep: str = "\n") -> DataFrame:
    """Corpus-wide paragraph dedup with reconstruction: every paragraph
    keeps exactly its FIRST occurrence — smallest (doc id, position)
    across the whole corpus — and is removed everywhere else; documents
    are rebuilt from their surviving paragraphs in order. The
    paragraph-granularity pre-pass (repeated boilerplate headers,
    navigation blocks, license footers) that several published corpus
    pipelines run before any document-level dedup.

    Input: (id, array<string>) — the caller decides what a "paragraph"
    is (split on blank lines, a line grid, sentence spans). Returns
    (id, n_paras, kept_paras, cleaned_text) for every input row
    (``''`` when everything was duplicated elsewhere first).

    Scale shape: one shuffle on the paragraph DIGEST (the min-first-key
    groupBy, whose hash partitioning the occurrence join reuses), one
    doc-scale groupBy to reassemble, one join back. The first-occurrence
    key is ``min(struct(id, pos))`` — struct MIN compares fields
    lexicographically, so it is one map-side-combinable aggregate with
    NO packing arithmetic (an earlier ``id * 2^20 + pos`` form silently
    overflowed 64-bit hashed doc ids and int32 ids >= 2^43/2^11 in
    non-ANSI mode, picking a non-first keeper). Works for any numeric
    or string id type and any paragraph count. A boilerplate
    paragraph shared by half the corpus is a hot join key; both join
    children are plain scan->shuffle stages, exactly the shape AQE's
    OptimizeSkewedJoin splits (the measured smj_hot_key case in
    tools/stress_skew.py).

    Reference contract: beyond uber/marmaray (no text surface); the
    Lee et al. 2022 dedup family at paragraph granularity, complementing
    remove_duplicate_spans (token windows) above."""
    ex = (df.select(F.col(id_col),
                    F.posexplode(F.col(paras_col)).alias("__p0", "para"))
          .select(F.col(id_col), (F.col("__p0") + 1).alias("pos"), "para"))
    keyed = ex.withColumn("__pd", F.md5("para"))
    first = keyed.groupBy("__pd").agg(
        F.min(F.struct(F.col(id_col).alias("fid"),
                       F.col("pos").alias("fpos"))).alias("__f"))
    kept = (keyed.join(first, "__pd")
            .filter((F.col(id_col) == F.col("__f.fid"))
                    & (F.col("pos") == F.col("__f.fpos"))))
    rec = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("__kept_n"),
        F.concat_ws(sep, F.expr(
            "transform(sort_array(collect_list(struct(pos, para))), "
            "x -> x.para)")).alias("__txt"))
    return (df.join(rec, id_col, "left")
            .select(F.col(id_col),
                    F.size(paras_col).cast("int").alias("n_paras"),
                    F.coalesce(F.col("__kept_n"), F.lit(0)).cast("int")
                    .alias("kept_paras"),
                    F.coalesce(F.col("__txt"), F.lit(""))
                    .alias("cleaned_text")))


def leakage_safe_splits(df: DataFrame, component_col: str = "component",
                        val_bps: int = 500, test_bps: int = 500,
                        salt: str = "split0",
                        out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment keyed on the NEAR-DUP
    GROUP, not the document: every member of a connected component gets
    the same split, so a near-duplicate (or exact duplicate) of a
    validation document can never leak into train — the contamination
    mode Lee et al. 2022 measure for eval sets, applied at split
    construction time. Hashing the document id instead (the naive split)
    puts ~(1 - s)^(k-1) of k-member dup groups across split boundaries.

    The hash is the repo's cross-engine idiom: first 4 md5 hex chars of
    ``salt:component`` as a 16-bit uniform, compared against integer
    cutoffs ``bps * 65536 // 10000`` — engine/retry/partitioning-stable
    and integer-exact, so a DuckDB oracle mirrors it bit-for-bit.

    100 TB posture: one codegen projection over the already-labeled
    frame — no shuffle, no new join; the component labels come from the
    connected-components pass the dedup pipeline already ran.

    Reference contract: beyond uber/marmaray (no text surface); the
    split-leakage concern is the GPT-3 appendix-C / Lee et al. 2022
    dedup-before-split practice."""
    if not (0 <= val_bps and 0 <= test_bps and val_bps + test_bps <= 10000):
        raise ValueError("val_bps/test_bps must be >= 0 and sum <= 10000")
    u = F.conv(F.expr(
        f"substring(md5(concat('{salt}:', cast({component_col} as string))), "
        f"1, 4)"), 16, 10).cast("long")
    vcut = (val_bps * 65536) // 10000
    tcut = ((val_bps + test_bps) * 65536) // 10000
    return df.withColumn(out_col,
                         F.when(u < vcut, F.lit("val"))
                          .when(u < tcut, F.lit("test"))
                          .otherwise(F.lit("train")))
