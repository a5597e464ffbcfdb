"""Similarity search over embedding columns: exact brute-force top-k and
a sign-random-projection (SRP) LSH bucketed scale path.

New surface for LLM data pipelines (BASELINE.json north star).

Determinism strategy: embeddings are quantized to integer milli-units
(round(x * 1000) as BIGINT) and similarity is the exact integer dot
product of quantized vectors. For L2-normalized embeddings (the test
corpus is) this preserves cosine ordering to ~1e-3 while making every
score engine-exact — no float summation-order hazards in the oracle
compare. SRP hyperplanes are derived from md5, so both engines build the
same planes without shipping any state.

100 TB notes: brute-force is O(Q x N) with the query side broadcast —
right for small Q or as a re-rank stage. The SRP path buckets the corpus
once (expression-only, no shuffle beyond the bucket groupBy) and probes
only matching buckets, the standard LSH/IVF-style recall-for-cost trade.
A true IVF with learned centroids plugs into the same probe shape via
pyspark.ml KMeans when approximate recall targets require it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

QUANT_SCALE = 1000


def quantize(col: str = "embedding") -> Column:
    """array<float> -> array<bigint> of milli-units (engine-exact)."""
    return F.expr(
        f"transform({col}, x -> cast(round(cast(x as double) * {QUANT_SCALE}) as bigint))")


def int_dot(a: Column | str, b: Column | str) -> Column:
    """Exact integer dot product of two quantized vectors."""
    a_name = a if isinstance(a, str) else None
    if a_name is None:
        raise ValueError("int_dot takes column NAMES (used inside expr)")
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")


def _local_topk(scored: DataFrame, k: int) -> DataFrame:
    """Arrow-batched per-batch top-k prefilter (tree top-k, phase 1).

    A global-per-query top-k element is top-k within every subset that
    contains it, so keeping k rows per query per Arrow batch loses
    nothing — and shrinks the rank window's shuffle input from N x Q
    scored rows to (batches x Q x k). At 100 TB that converts the
    dominant shuffle into a constant-size merge.
    """
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            yield (pdf.sort_values(["query_id", "dot_q", "neighbor_id"],
                                   ascending=[True, False, True])
                   .groupby("query_id", sort=False).head(k))

    return scored.mapInPandas(
        kernel, schema="query_id long, neighbor_id long, dot_q long")


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     local_prefilter: bool = True) -> DataFrame:
    """Exact top-k neighbors per query by quantized dot product.

    Output: (query_id, neighbor_id, dot_q, rank). Self-matches excluded.
    The query side is broadcast — no shuffle of the corpus.

    ``local_prefilter`` (the DEFAULT — the scale plan is the declared
    plan): the tree top-k prefilter caps the rank window's shuffle input
    at batches x Q x k rows for one Arrow pass, instead of shuffling all
    N x Q scored rows. Results are identical to the plain plan (asserted
    in tests); turn it off only to A/B the physical plans. For corpora
    where even one full scan per query set is too much, use the SRP/IVF
    probe paths instead.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       quantize(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      quantize(vec_col).alias("cv"))
    scored = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
              .withColumn("dot_q", int_dot("qv", "cv"))
              .select("query_id", "neighbor_id", "dot_q"))
    if local_prefilter:
        scored = _local_topk(scored, k)
    w = W.partitionBy("query_id").orderBy(F.col("dot_q").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dot_q", "rank"))


def near_dup_pairs(df: DataFrame, threshold_milli: int,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs (a < b) whose quantized dot >= threshold.

    ``threshold_milli`` is in (milli)^2 units: cosine t ~ t * 1e6 for
    normalized vectors. BASELINE ONLY — an all-pairs non-equi join that
    exists to measure ``srp_banded_near_dup_pairs``'s recall on bounded
    samples; the banded form is the declared/scale path.
    """
    left = df.select(F.col(id_col).alias("a"), quantize(vec_col).alias("va"))
    right = df.select(F.col(id_col).alias("b"), quantize(vec_col).alias("vb"))
    return (left.join(right, F.col("a") < F.col("b"))
            .withColumn("dot_q", int_dot("va", "vb"))
            .filter(F.col("dot_q") >= threshold_milli)
            .select("a", "b", "dot_q"))


def srp_band_buckets(qvec_col: str, bands: int = 4, planes_per_band: int = 4,
                     dim: int = 64) -> Column:
    """Array of ``bands`` SRP bucket ids; band b uses hyperplanes
    b*planes_per_band .. (b+1)*planes_per_band - 1 (same md5 plane
    derivation as ``srp_bucket``, so both engines agree bit-for-bit).

    Banding is to SRP what LSH bands are to MinHash: two vectors at
    cosine ~0.9 collide in ONE 16-plane bucket with p~0.29, but in AT
    LEAST ONE of 4 4-plane bands with p~0.95 — recall without all-pairs.
    """
    planes = _srp_planes(bands * planes_per_band, dim)
    cols = []
    for b_i in range(bands):
        terms = [
            f"IF(({_plane_dot(qvec_col, planes[b_i * planes_per_band + j])})"
            f" >= 0, {1 << j}, 0)"
            for j in range(planes_per_band)
        ]
        cols.append(F.expr(" + ".join(terms)).cast("bigint"))
    return F.array(*cols)


def srp_banded_near_dup_pairs(df: DataFrame, threshold_milli: int,
                              bands: int = 4, planes_per_band: int = 4,
                              id_col: str = "vec_id", vec_col: str = "embedding",
                              dim: int = 64,
                              max_bucket_width: int | None = None) -> DataFrame:
    """Embedding near-dup at scale: banded-SRP candidates -> exact
    quantized-dot verification. Output (a, b, dot_q), a < b.

    The declared/scale plan: candidate generation is O(rows x bands)
    bucket equi-joins (never O(rows^2)); the exact dot runs only on the
    sparse candidate set. The (id, v, buckets) projection is persisted
    before the explode for the same interpreted-re-eval reason as
    lsh_candidate_pairs (fork-persist rule).

    ``max_bucket_width``: hot-bucket star fallback (see
    dedup.lsh_candidate_pairs) for corpora with mass-replicated vectors —
    a bucket wider than the cap emits only (min-id anchor, member)
    candidates, O(W) instead of O(W^2); dot verification still runs, so
    only true near-dups of the anchor survive. Off by default (declared
    oracle = exact candidate set)."""
    base = (df.select(F.col(id_col).alias("id"), quantize(vec_col).alias("v"))
            .withColumn("bks", srp_band_buckets("v", bands, planes_per_band, dim))
            .persist())
    base.count()
    tagged = base.select("id", F.posexplode("bks").alias("band", "bucket"))
    if max_bucket_width is None:
        left = tagged.select(F.col("id").alias("a"), "band", "bucket")
        right = tagged.select(F.col("id").alias("b"), "band", "bucket")
        cand = (left.join(right, ["band", "bucket"])
                .filter(F.col("a") < F.col("b"))
                .select("a", "b").distinct())
    else:
        from pyspark.sql import Window
        w = Window.partitionBy("band", "bucket")
        sized = (tagged
                 .withColumn("__n__", F.count(F.lit(1)).over(w))
                 .withColumn("__mn__", F.min("id").over(w)))
        small = sized.filter(F.col("__n__") <= max_bucket_width) \
            .select("id", "band", "bucket")
        left = small.select(F.col("id").alias("a"), "band", "bucket")
        right = small.select(F.col("id").alias("b"), "band", "bucket")
        pairs_small = (left.join(right, ["band", "bucket"])
                       .filter(F.col("a") < F.col("b"))
                       .select("a", "b"))
        pairs_hot = (sized.filter((F.col("__n__") > max_bucket_width)
                                  & (F.col("id") != F.col("__mn__")))
                     .select(F.col("__mn__").alias("a"), F.col("id").alias("b")))
        cand = pairs_small.unionByName(pairs_hot).distinct()
    withv = (cand
             .join(base.select(F.col("id").alias("a"), F.col("v").alias("va")), "a")
             .join(base.select(F.col("id").alias("b"), F.col("v").alias("vb")), "b"))
    return (withv.withColumn("dot_q", int_dot("va", "vb"))
            .filter(F.col("dot_q") >= threshold_milli)
            .select("a", "b", "dot_q"))


def _srp_planes(n_planes: int, dim: int) -> list[list[int]]:
    """The +/-1 hyperplanes: plane p's component i (1-based) is +1 when
    the first hex digit of md5('<p>:<i>') has its high bit set, else -1.
    Computed ONCE driver-side — the same derivation an oracle engine
    runs in SQL, so both agree bit-for-bit, but the Spark plan carries
    the resolved +/-1 literals instead of re-hashing n_planes x dim
    md5('<p>:<i>') constants per ROW inside the aggregate lambdas
    (Catalyst does not constant-fold under a lambda). Measured at
    sf0.1: ~18% warm win on the banded near-dup query, ~15% cold win
    on srp top-k; the bigger point is the per-row work no longer
    scales with a hash call per (plane, component)."""
    import hashlib
    return [[1 if hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0]
             in "89abcdef" else -1
             for i in range(1, dim + 1)]
            for p in range(n_planes)]


def _plane_dot(qvec_col: str, plane: list[int]) -> str:
    # slice: vectors longer than dim project on their first dim
    # components (as the element_at form did), instead of zip_with
    # null-padding the literal side and nulling the whole dot
    lits = ", ".join(f"{x}L" for x in plane)
    return (f"aggregate(zip_with(slice({qvec_col}, 1, {len(plane)}), "
            f"array({lits}), (x, y) -> x * y), 0L, (acc, t) -> acc + t)")


def srp_bucket(qvec_col: str, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection bucket id in [0, 2^n_planes).

    Planes derive from md5 (see ``_srp_planes``) — both engines build
    identical planes from nothing but md5; the Spark side embeds them
    as +/-1 literals, one zip_with dot per plane.
    """
    terms = [f"IF(({_plane_dot(qvec_col, plane)}) >= 0, {1 << p}, 0)"
             for p, plane in enumerate(_srp_planes(n_planes, dim))]
    return F.expr(" + ".join(terms)).cast("bigint")


def _dots_expr(vec_col: str, centroids: list[list[int]]) -> str:
    """SQL array of exact integer dots against centroid literal vectors."""
    dots = ", ".join(
        "aggregate(zip_with({v}, array({c}), (x, y) -> x * y), 0L, "
        "(acc, t) -> acc + t)".format(
            v=vec_col, c=", ".join(f"{x}L" for x in cv))
        for cv in centroids)
    return f"array({dots})"


def ivf_cell(vec_col: str, centroids: list[list[int]]) -> Column:
    """0-based index of the nearest centroid (max dot; first-max wins, so
    ties break toward the lowest index).

    The centroids ride in the plan as literals — an IVF coarse quantizer
    is tiny metadata (k x dim ints), so cell assignment is a pure
    projection: NO shuffle, no join, scales to any corpus size. Learned
    (pyspark.ml KMeans) or deterministic centroids plug in identically —
    only the literal values differ."""
    d = _dots_expr(vec_col, centroids)
    return F.expr(
        f"cast(array_position({d}, array_max({d})) - 1 as bigint)")


# Expression-path bound: the literal plan embeds k x dim centroid ints
# and builds a k-element CreateArray of aggregate() trees evaluated per
# row — measured fine at 16x64, but a 100 TB coarse quantizer is
# k ~ sqrt(N) (tens of thousands of cells) and the plan/codegen size
# grows with k x dim exactly like the bloom array-literal trap
# (operators/bloomjoin.py). Above this bound, cell assignment switches
# to an Arrow kernel: one BLAS matmul (batch x dim) @ (dim x k) per
# batch, centroids riding in the task closure — still a pure
# projection (no shuffle, no join), and faster than k codegen'd
# aggregate trees long before the bound is hit.
_IVF_EXPR_MAX_LITERALS = 8192


def _ivf_cells_arrow(df: DataFrame, cents: list[list[int]],
                     cids: list[int], id_name: str, vec_name: str,
                     nprobe: int) -> DataFrame:
    """Arrow-kernel cell assignment: ``nprobe`` nearest cells per row.

    Emits one row per (input row, probed cell): (id, quantized vec,
    cell), ordered ties-to-lowest-centroid-index exactly like the
    expression path (np.argmax / stable argsort both take the FIRST
    max), so both paths are interchangeable bit-for-bit (pinned in
    tests/test_llm_ops.py)."""
    import numpy as np

    C = np.asarray(cents, dtype=np.int64)
    cid_arr = np.asarray(cids, dtype=np.int64)
    out_schema = f"{id_name} long, {vec_name} array<bigint>, cell long"

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.int64)
                          for v in pdf[vec_name]])
            dots = X @ C.T
            if nprobe == 1:
                out = pdf[[id_name, vec_name]].copy()
                out["cell"] = cid_arr[dots.argmax(axis=1)]
            else:
                order = np.argsort(-dots, axis=1, kind="stable")[:, :nprobe]
                out = pdf[[id_name, vec_name]].iloc[
                    np.repeat(np.arange(len(pdf)), order.shape[1])].copy()
                out["cell"] = cid_arr[order].ravel()
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def ivf_cells(base: DataFrame, cents: list[list[int]], cids: list[int],
              id_name: str, vec_name: str, nprobe: int = 1,
              use_kernel: bool | None = None) -> DataFrame:
    """``nprobe`` nearest centroid cells per row of an already-quantized
    (id, vec) frame — the ONE cell-assignment entry point shared by the
    probe path, the corpus path, and the maintained index
    (operators/annindex.py), so the expression/kernel auto-switch and
    the tie-break contract live in exactly one place. ``use_kernel``
    None auto-switches at ``_IVF_EXPR_MAX_LITERALS`` (large coarse
    quantizers as plan literals are the bloom array-literal codegen
    trap); both paths are bit-identical (pinned in tests)."""
    dim = len(cents[0]) if cents else 0
    if use_kernel is None:
        use_kernel = len(cents) * dim > _IVF_EXPR_MAX_LITERALS
    if use_kernel:
        return _ivf_cells_arrow(base, [list(c) for c in cents], cids,
                                id_name, vec_name, nprobe)
    cid_lit = F.array(*[F.lit(c) for c in cids])
    if nprobe == 1:
        # dots materialized ONCE as a column: inlining them inside both
        # array_position and array_max doubles the madd tree and blows
        # up codegen (measured ~40% slower warm, 6x cold at sf0.1)
        return (base
                .withColumn("__d", F.expr(_dots_expr(vec_name, cents)))
                .withColumn("cell", F.element_at(
                    cid_lit,
                    F.expr("cast(array_position(__d, array_max(__d)) "
                           "as int)")))
                .drop("__d"))
    return (base.select(id_name, vec_name,
                        F.posexplode(F.expr(_dots_expr(vec_name, cents)))
                        .alias("cell_idx", "dot_c"))
            .withColumn("__pr", F.row_number().over(
                W.partitionBy(id_name)
                .orderBy(F.col("dot_c").desc(), F.col("cell_idx"))))
            .filter(F.col("__pr") <= nprobe)
            .select(id_name, vec_name,
                    F.element_at(cid_lit, F.col("cell_idx").cast("int") + 1)
                    .alias("cell")))


def _rank_probe_join(c: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    """Shared tail of every IVF probe: broadcast the (tiny) probe list
    onto the cell-assigned corpus, exact quantized dot, per-query
    rank-k. Tie-break (dot desc, neighbor_id) is the contract both the
    direct and the maintained-index probes pin."""
    scored = (c.join(F.broadcast(probes), "cell")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("dot_q", int_dot("qv", "cv")))
    w = W.partitionBy("query_id").orderBy(F.col("dot_q").desc(),
                                          F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dot_q", "rank"))


def train_ivf_centroids(corpus: DataFrame, n_centroids: int,
                        vec_col: str = "embedding", seed: int = 7,
                        max_iter: int = 20) -> list[list[int]]:
    """Learn IVF centroids with pyspark.ml KMeans, returned quantized so
    they plug straight into ``ivf_probe_topk(centroids=...)``. Training
    is the offline index-build step: run once, persist the (tiny) list,
    reuse across query workloads."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    return [[int(round(float(x) * QUANT_SCALE)) for x in c]
            for c in model.clusterCenters()]


def save_ivf_index(metadata, centroids: list[list[int]],
                   name: str = "ivf") -> None:
    """Persist trained centroids through a MetadataManager (durable with
    the caller's save_changes, like any checkpoint): the index-build step
    runs once, query sessions load the tiny list and get the identical
    expression-only probe plan — no vector data is stored, only the
    centroid literals."""
    import json as _json
    metadata.set(f"ivf_index.{name}", _json.dumps(centroids))


def load_ivf_index(metadata, name: str = "ivf") -> list[list[int]]:
    import json as _json
    raw = metadata.get(f"ivf_index.{name}")
    if raw is None:
        raise KeyError(f"no IVF index {name!r} in metadata")
    return [[int(x) for x in c] for c in _json.loads(raw)]


def ivf_probe_topk(queries: DataFrame, corpus: DataFrame, k: int,
                   n_centroids: int = 16, nprobe: int = 2,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   centroids: list[list[int]] | None = None,
                   use_kernel: bool | None = None) -> DataFrame:
    """IVF approximate top-k: assign every corpus vector to its nearest
    centroid cell, probe each query's ``nprobe`` closest cells, rank by
    exact quantized dot within them.

    Default centroid "training" is deterministic — the ``n_centroids``
    lowest-id corpus vectors — so a SQL oracle reproduces the index
    bit-for-bit; pass ``centroids`` (e.g. from ``train_ivf_centroids``'s
    KMeans) for learned recall with the IDENTICAL probe plan. Cells
    partition the corpus, so the ``nprobe`` probed cells never yield
    duplicate neighbors — and probing all cells is exactly brute force.

    Cell assignment has two interchangeable physical paths (same
    results, pinned in tests): expression-only with centroid literals
    for small quantizers, and an Arrow matmul kernel once k x dim
    passes ``_IVF_EXPR_MAX_LITERALS`` (a large coarse quantizer as plan
    literals is the bloom array-literal codegen trap). ``use_kernel``
    forces a path for A/B; None = auto.

    100 TB: corpus side is scan + projection (either path — the kernel
    is mapInPandas, no shuffle) + one equi-join on cell id against the
    broadcast (tiny) probe list; only the query side (small by
    definition) pays a window."""
    if centroids is not None:
        cids = list(range(len(centroids)))
        cents = [list(c) for c in centroids]
    else:
        cent_rows = (corpus.filter(F.col(id_col) < n_centroids)
                     .select(F.col(id_col).alias("cid"),
                             quantize(vec_col).alias("cv"))
                     .orderBy("cid").collect())   # k x dim ints: driver metadata
        cids = [r["cid"] for r in cent_rows]
        cents = [r["cv"] for r in cent_rows]
    dim = len(cents[0]) if cents else 0
    if use_kernel is None:
        use_kernel = len(cents) * dim > _IVF_EXPR_MAX_LITERALS

    base_c = corpus.select(F.col(id_col).alias("neighbor_id"),
                           quantize(vec_col).alias("cv"))
    base_q = queries.select(F.col(id_col).alias("query_id"),
                            quantize(vec_col).alias("qv"))
    c = ivf_cells(base_c, cents, cids, "neighbor_id", "cv", 1, use_kernel)
    probes = ivf_cells(base_q, cents, cids, "query_id", "qv", nprobe,
                       use_kernel)
    return _rank_probe_join(c, probes, k)


def srp_projections(qvec_col: str, n_planes: int = 8, dim: int = 64) -> Column:
    """Array of the ``n_planes`` signed hyperplane projections (exact
    integer dots against the md5-derived +/-1 planes of ``srp_bucket``).
    Materialize this ONCE as a column; bucket and probe sets derive from
    it without recomputing the dots. Planes are resolved +/-1 literals
    (``_srp_planes``), not per-row md5 lambdas."""
    projs = [_plane_dot(qvec_col, plane)
             for plane in _srp_planes(n_planes, dim)]
    return F.expr(f"array({', '.join(projs)})")


def srp_bucket_from_projections(proj_col: str, n_planes: int = 8) -> Column:
    """Bucket id from a materialized projection array (sign bits)."""
    return F.expr(" + ".join(
        f"IF({proj_col}[{p}] >= 0, {1 << p}, 0)" for p in range(n_planes)
    )).cast("bigint")


def srp_multiprobe_buckets(proj_col: str, n_planes: int = 8,
                           extra_probes: int = 2) -> Column:
    """Multi-probe bucket set: the vector's own bucket plus the buckets
    reached by flipping each of its ``extra_probes`` weakest-margin
    planes (smallest |projection| — the planes most likely to have put a
    true neighbor on the other side). Ties break by plane index. The
    classic multi-probe LSH recall lift (Lv et al., VLDB'07): probe cost
    grows linearly, no extra tables, buckets stay disjoint."""
    if not 0 <= extra_probes <= n_planes:
        raise ValueError("0 <= extra_probes <= n_planes")
    own = " + ".join(f"IF({proj_col}[{p}] >= 0, {1 << p}, 0)"
                     for p in range(n_planes))
    ordered = (f"array_sort(transform(sequence(0, {n_planes - 1}), "
               f"p -> struct(abs({proj_col}[p]) as a, p as p)))")
    flips = (f"transform(slice({ordered}, 1, {extra_probes}), "
             f"s -> cast(({own}) ^ shiftleft(1L, s.p) as bigint))")
    return F.expr(f"concat(array(cast(({own}) as bigint)), {flips})")


def srp_multiprobe_topk(queries: DataFrame, corpus: DataFrame, k: int,
                        n_planes: int = 8, dim: int = 64,
                        extra_probes: int = 2,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k with multi-probe recall lift: corpus bucketed
    once (single bucket per vector, unchanged index); each query probes
    its own bucket PLUS ``extra_probes`` weakest-margin flips. Probed
    buckets are disjoint, so no dedup step is needed.

    100 TB: identical shape to ``srp_probe_topk`` — the corpus side is
    scan + bucket projection + ONE equi-join against the broadcast
    (queries x probes) list; only the probe list grows (1 + extra_probes
    rows per query)."""
    c = (corpus.select(F.col(id_col).alias("neighbor_id"),
                       quantize(vec_col).alias("cv"))
         .withColumn("bucket", srp_bucket("cv", n_planes, dim)))
    q = (queries.select(F.col(id_col).alias("query_id"),
                        quantize(vec_col).alias("qv"))
         .withColumn("__pr", srp_projections("qv", n_planes, dim))
         .withColumn("bucket", F.explode(
             srp_multiprobe_buckets("__pr", n_planes, extra_probes)))
         .drop("__pr"))
    scored = (c.join(F.broadcast(q), "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("dot_q", int_dot("qv", "cv")))
    w = W.partitionBy("query_id").orderBy(F.col("dot_q").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dot_q", "rank"))


def srp_probe_topk(queries: DataFrame, corpus: DataFrame, k: int,
                   n_planes: int = 8, dim: int = 64,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: probe only the query's own SRP bucket.

    The LSH/IVF probe shape: bucket the corpus once, equi-join queries to
    their bucket, rank within. Recall < 1 by construction; multi-probe
    (flipping weak-margin planes) raises it at proportional cost.
    """
    c = (corpus.select(F.col(id_col).alias("neighbor_id"),
                       quantize(vec_col).alias("cv"))
         .withColumn("bucket", srp_bucket("cv", n_planes, dim)))
    q = (queries.select(F.col(id_col).alias("query_id"),
                        quantize(vec_col).alias("qv"))
         .withColumn("bucket", srp_bucket("qv", n_planes, dim)))
    scored = (c.join(F.broadcast(q), "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("dot_q", int_dot("qv", "cv")))
    w = W.partitionBy("query_id").orderBy(F.col("dot_q").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dot_q", "rank"))


# ---------------------------------------------------------------------------
# int8-packed embeddings: the storage/bandwidth scale path
# ---------------------------------------------------------------------------
#
# At 100 TB the embedding column dominates bytes: array<float> is 4 B per
# component plus Parquet list overhead, and the quantized array<bigint>
# working form is 8 B. For L2-normalized embeddings, int8 at scale 127
# keeps cosine ORDER almost intact, and packing the 8-bit lanes into ONE
# BinaryType value (dim bytes, no per-element list overhead) makes the
# stored corpus ~8x smaller than the bigint working form — which is also
# 8x less shuffle, 8x less scan, 8x more vectors per executor-GiB. Coarse
# ranking runs on the packed bytes (np.frombuffer -> int32 BLAS matmul in
# an Arrow kernel — bytes never leave the executor, no shuffle); the
# top-(k*oversample) survivors are re-scored EXACTLY on the full-precision
# corpus, so the int8 leg only has to get membership right, not order.

INT8_SCALE = 127


def pack_int8(vec_col: str = "embedding") -> Column:
    """array<float> -> dim-byte binary of round(x * 127) int8 lanes.

    Expression-only (no Python): each component becomes exactly one
    byte — two's-complement via pmod 256, then hex/unhex (char() would
    UTF-8-encode codepoints >= 128 into two bytes). Write-side
    companion of ``int8_topk``'s kernel."""
    return F.expr(
        "unhex(concat_ws('', transform({v}, x -> "
        "lpad(hex(pmod(greatest(-{s}, least({s}, "
        "cast(round(cast(x as double) * {s}) as int))), 256)), "
        "2, '0'))))".format(v=vec_col, s=INT8_SCALE))


def compress_embeddings(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(id, emb8: binary) — the compact corpus representation to persist.

    Store THIS for the retrieval tier and keep the float corpus for the
    exact re-score tier; the two tiers join on ``id_col`` only for the
    tiny survivor set."""
    return df.select(F.col(id_col).alias("vec_id"),
                     pack_int8(vec_col).alias("emb8"))


def int8_topk(queries: DataFrame, corpus8: DataFrame, corpus: DataFrame,
              k: int, oversample: int = 4,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Two-tier exactness-preserving top-k over the int8-packed corpus.

    Tier 1 (coarse, on ``corpus8`` = ``compress_embeddings`` output):
    an Arrow kernel unpacks each dim-byte binary with np.frombuffer and
    scores ALL queries per batch in one int32 BLAS matmul, keeping the
    per-batch top-(k*oversample) per query — the tree-top-k shape of
    ``brute_force_topk``, on 1/8 the bytes. Tier 2 (exact): the
    surviving candidate ids (Q x k x oversample rows — driver-scale)
    join back to the FULL-precision corpus and re-rank by the exact
    quantized dot, so int8 only has to get top-k MEMBERSHIP right;
    order is decided at full precision. ``oversample`` is the recall
    knob: survivors beyond rank k*oversample in int8 order are the only
    possible misses, and for L2-normalized corpora the int8/milli rank
    disagreement is localized to near-ties.

    Output matches ``brute_force_topk``: (query_id, neighbor_id, dot_q,
    rank) — equal results whenever the oversampled frontier covers the
    true top-k (pinned in tests; oversample >= N/k makes it exact by
    construction).
    """
    import numpy as np

    m = k * oversample
    qrows = (queries.select(F.col(id_col).alias("query_id"),
                            quantize(vec_col).alias("qv"))
             .orderBy("query_id").collect())        # Q is small by contract
    spark = queries.sparkSession
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, dot_q long, rank int")
    qids = np.asarray([r["query_id"] for r in qrows], dtype=np.int64)
    Q = np.asarray([r["qv"] for r in qrows], dtype=np.int64)  # milli units

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # int32 accumulation only when the FULL dot-product bound
            # fits: |dot| <= 127 * max|q| * dim (max over abs covers
            # negative components; dim covers accumulation)
            dim = Q.shape[1] if Q.ndim == 2 else 0
            q_abs = np.abs(Q).max(initial=0)
            acc32_ok = 127 * int(q_abs) * max(dim, 1) < 2**31
            acc_t = np.int32 if acc32_ok else np.int64
            X = np.stack([np.frombuffer(b, dtype=np.int8)
                          for b in pdf["emb8"]]).astype(acc_t)
            # Q is milli-scale; ordering per query is scale-invariant
            dots = X @ Q.T.astype(acc_t)
            ids = pdf["vec_id"].to_numpy()
            out = []
            top = min(m + 1, len(ids))     # +1 absorbs a self-match
            for qi in range(len(qids)):
                col = dots[:, qi]
                part = np.argpartition(-col, top - 1)[:top] \
                    if top < len(col) else np.arange(len(col))
                for row in part:
                    out.append((int(qids[qi]), int(ids[row]), int(col[row])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id",
                                             "coarse_dot"])

    cand = (corpus8.mapInPandas(
                kernel, schema="query_id long, neighbor_id long, coarse_dot long")
            .filter(F.col("query_id") != F.col("neighbor_id")))
    wc = W.partitionBy("query_id").orderBy(F.col("coarse_dot").desc(),
                                           F.col("neighbor_id"))
    survivors = (cand.withColumn("__r", F.row_number().over(wc))
                 .filter(F.col("__r") <= m)
                 .select("query_id", "neighbor_id"))

    # tier 2: exact re-score of the tiny survivor set at full precision
    qv = queries.select(F.col(id_col).alias("query_id"),
                        quantize(vec_col).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       quantize(vec_col).alias("cv"))
    rescored = (survivors.join(F.broadcast(qv), "query_id")
                .join(cv, "neighbor_id")
                .withColumn("dot_q", int_dot("qv", "cv")))
    w = W.partitionBy("query_id").orderBy(F.col("dot_q").desc(),
                                          F.col("neighbor_id"))
    return (rescored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dot_q", "rank"))


def semantic_dedup(corpus: DataFrame, centroids: list[list[int]],
                   threshold_q: int, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   max_cluster: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): assign every embedding to
    its nearest k-means centroid, then deduplicate WITHIN each cluster by
    exact pairwise similarity — the trick that turns an O(N^2) corpus
    dedup into sum(c_i^2) bounded by the cluster sizes the quantizer
    chose.

    Output: (id, cell, keeper_id, is_keeper) — one row per input vector;
    ``keeper_id`` is the min-id representative of the vector's
    similarity component inside its cluster (a vector with no >=
    ``threshold_q`` neighbor keeps itself). ``threshold_q`` is a
    quantized dot (cosine t ~ t * 1e6 for normalized vectors), matching
    near_dup_pairs.

    Scale: cell assignment is a pure projection (expression literals
    below _IVF_EXPR_MAX_LITERALS, Arrow matmul above); the dedup is one
    shuffle on cell + a per-cluster numpy gram matrix. Cluster-size skew
    is the real risk at 100 TB — ``max_cluster`` hash-splits oversized
    cells into sub-cells (trading cross-sub-cell dup recall for a hard
    memory/compute bound, the same cap-vs-recall dial as the LSH
    hot-bucket cap)."""
    import numpy as np

    cents = [list(map(int, cv)) for cv in centroids]
    cids = list(range(len(cents)))
    q = corpus.select(F.col(id_col).cast("long").alias("__id__"),
                      quantize(vec_col).alias("__qv__"))
    if len(cents) * max(len(c) for c in cents) <= _IVF_EXPR_MAX_LITERALS:
        assigned = q.withColumn("cell", ivf_cell("__qv__", cents))
    else:
        assigned = _ivf_cells_arrow(q, cents, cids, "__id__", "__qv__",
                                    nprobe=1)
    if max_cluster is not None:
        # deterministic hash-split of hot cells: sub-cell = (cell, salt)
        salt = F.expr(f"abs(hash(__id__)) % {max_cluster}") \
            .cast("long")
        assigned = assigned.withColumn(
            "cell", F.col("cell") * F.lit(1 << 20) + salt)

    out_schema = (f"{id_col} long, cell long, keeper_id long, "
                  f"is_keeper boolean")

    def dedup_cell(key, pdf):
        import pandas as pd
        n = len(pdf)
        ids = pdf["__id__"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.stack([np.asarray(v, dtype=np.int64)
                      for v in pdf["__qv__"].iloc[order]])
        # exact integer gram matrix: d<=4096 dims x |v|<=~1000 milli
        # stays far inside int64
        sims = V @ V.T
        keeper = ids.copy()
        # union-find over >= threshold edges, min-id representative
        parent = np.arange(n)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        ai, bi = np.nonzero(np.triu(sims >= threshold_q, k=1))
        for i, j in zip(ai, bi):
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)   # ids sorted: min idx = min id
        for i in range(n):
            keeper[i] = ids[find(i)]
        return pd.DataFrame({
            id_col: ids, "cell": key[0],
            "keeper_id": keeper, "is_keeper": keeper == ids})

    return assigned.groupBy("cell").applyInPandas(dedup_cell, out_schema)


def cluster_quota_sample(corpus: DataFrame, centroids: list[list[int]],
                         quota: int, id_col: str = "vec_id",
                         vec_col: str = "embedding", salt: str = "cq0",
                         use_kernel: bool | None = None) -> DataFrame:
    """Diversity (cluster-balanced) subsampling: assign every vector to
    its k-means cell and keep AT MOST ``quota`` per cell — the
    topic-rebalancing step that stops one dominant mode (boilerplate,
    one language, one template) from owning a subsample the way it owns
    the corpus. Selection within a cell is by md5(salt:id) order:
    deterministic across runs, engines, and partitionings (the
    deterministic_sample contract).

    Returns (id, cell, keep) for every vector; filter ``keep`` for the
    sample, keep the full frame for the report.

    Scale shape — EXACT quota without a per-cell global sort: a
    row_number window per cell puts a 40%-hot boilerplate cell on one
    straggler partition, so the quota rides the exact-histogram-cutoff
    pattern (lm.surprisal_buckets / dsir_select) instead:
      1. one map-side-combined (cell, hex4-prefix) count — the
         histogram is bounded by cells x 65536, never corpus size;
      2. a per-cell cumulative on the HISTOGRAM frame finds the cutoff
         bucket where the quota lands;
      3. rows strictly below the cutoff bucket keep outright; ONLY the
         cutoff bucket itself (expected cell_size/65536 rows) pays a
         row_number window for the exact remainder.
    Cell assignment shares ``ivf_cells`` (Arrow auto-switch, tie-breaks
    — one entry point with the probe/index paths)."""
    from pyspark.sql.window import Window as W2

    if quota < 0:
        raise ValueError("quota must be >= 0")
    cids = list(range(len(centroids)))
    base = corpus.select(F.col(id_col), quantize(vec_col).alias("__v"))
    # persist barrier: the cell assignment (a per-row dot against every
    # centroid, or a full Arrow kernel pass) feeds THREE consumers —
    # the histogram, the below-cutoff branch, and the cutoff-bucket
    # branch; without the barrier Spark re-runs the assignment per
    # consumer (the annindex/semantic_dedup persist-assigned
    # convention). The frame is rows x (id, cell, 4 hex chars).
    cells = ivf_cells(base, [list(c) for c in centroids], cids,
                      id_col, "__v", 1, use_kernel) \
        .select(id_col, "cell",
                F.expr(f"substring(md5(concat('{salt}:', "
                       f"cast({id_col} as string))), 1, 4)").alias("__hx")) \
        .persist()
    hist = cells.groupBy("cell", "__hx").agg(
        F.count(F.lit(1)).alias("__c"))
    wcum = (W2.partitionBy("cell").orderBy("__hx")
            .rowsBetween(W2.unboundedPreceding, W2.currentRow))
    cum = hist.withColumn("__cum", F.sum("__c").over(wcum))
    # cutoff = first bucket whose cumulative reaches the quota; cells
    # smaller than the quota have none (every row keeps outright).
    # min_by carries the cutoff bucket's own (cum, count) along, so the
    # in-bucket remainder is quota - (rows strictly below the bucket)
    # = quota - (__cutcum - __cutc).
    cut = (cum.filter(F.col("__cum") >= quota)
           .groupBy("cell")
           .agg(F.min("__hx").alias("__cut"),
                F.min_by(F.col("__cum"), F.col("__hx")).alias("__cutcum"),
                F.min_by(F.col("__c"), F.col("__hx")).alias("__cutc")))
    tagged = cells.join(F.broadcast(cut), "cell", "left")
    no_cut = F.col("__cut").isNull()
    rest = (tagged.filter(no_cut | (F.col("__hx") != F.col("__cut")))
            .select(id_col, "cell",
                    (no_cut | (F.col("__hx") < F.col("__cut")))
                    .alias("keep")))
    # only the cutoff bucket (expected cell_size/65536 rows) pays a
    # window for the exact remainder; order matches the global contract
    # (md5 then id — the same order full per-cell ranking would use)
    win = W2.partitionBy("cell").orderBy(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        F.col(id_col))
    at_cut = (tagged.filter(F.col("__hx") == F.col("__cut"))
              .withColumn("__rn", F.row_number().over(win))
              .select(id_col, "cell",
                      (F.col("__rn") <= F.lit(quota)
                       - (F.col("__cutcum") - F.col("__cutc")))
                      .alias("keep")))
    return rest.unionByName(at_cut)
