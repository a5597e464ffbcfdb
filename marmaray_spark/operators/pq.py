"""Product quantization (PQ) for embedding columns: the compressed ANN
tier between int8 packing (8x) and nothing — M bytes per vector
(Jégou, Douze & Schmid 2011, "Product Quantization for Nearest Neighbor
Search"). New surface for LLM data pipelines (BASELINE.json north star);
the reference (uber/marmaray) has no vector surface.

Shape: split the D-dim vector into M subspaces of D/M dims; per subspace
learn (or derive) K centroids; a vector's code is its nearest centroid
index in each subspace — M small ints, packed into M bytes when K <= 256.
Query-time ADC (asymmetric distance computation) never decodes the
corpus: each query precomputes a (M x K) lookup table of exact
subspace dots, and a corpus vector's approximate dot is M table lookups.

100 TB story: a 64-dim float corpus is 256 B/vector + list overhead;
PQ at M=4/K=8 is 4 B (64x smaller; M=8/K=256 of a 768-dim corpus is
8 B, 384x). The retrieval tier scans ONLY codes — 64x less I/O, 64x
more vectors per executor-GiB — and, as with the int8 tier
(operators/similarity.py int8_topk), the coarse scan only has to get
top-k MEMBERSHIP right: survivors re-rank on the full-precision corpus,
so quantization error costs recall (tunable via ``oversample``), never
result correctness of the final ordering.

Determinism contract (shared with the IVF path): centroids are
quantized milli-int literals; subspace assignment is argmax of exact
integer dots with ties to the LOWEST centroid index; every ADC score is
an exact int64 sum — a SQL oracle reproduces codes and scores
bit-for-bit from the same centroid table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from marmaray_spark.operators.similarity import (
    _IVF_EXPR_MAX_LITERALS, _dots_expr, _local_topk, int_dot, quantize)

Codebooks = "list[list[list[int]]]"  # [subspace][centroid][component]


def _check(codebooks) -> tuple[int, int, int]:
    m = len(codebooks)
    k = len(codebooks[0])
    sub = len(codebooks[0][0])
    for cb in codebooks:
        if len(cb) != k or any(len(c) != sub for c in cb):
            raise ValueError("ragged codebooks: every subspace needs the "
                             "same K and sub-dimension")
    return m, k, sub


def deterministic_pq_codebooks(corpus: DataFrame, m: int, k: int,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> list:
    """Oracle-reproducible codebooks: subspace s's centroid c is the
    s-th slice of the c-th lowest-id corpus vector (quantized) — the
    same stand-in-for-trained-k-means pattern as the IVF oracle
    (similarity.ivf_probe_topk default centroids). k x dim ints of
    driver metadata."""
    rows = (corpus.filter(F.col(id_col) < k)
            .select(F.col(id_col).alias("cid"), quantize(vec_col).alias("v"))
            .orderBy("cid").collect())
    if len(rows) < k:
        raise ValueError(f"need {k} seed vectors, corpus has {len(rows)}")
    dim = len(rows[0]["v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [[list(r["v"][s * sub:(s + 1) * sub]) for r in rows]
            for s in range(m)]


def train_pq_codebooks(corpus: DataFrame, m: int, k: int,
                       vec_col: str = "embedding", seed: int = 7,
                       max_iter: int = 20) -> list:
    """Learned codebooks: one pyspark.ml KMeans per subspace over the
    corpus's subvector projection (M independent small fits — the
    offline index build; each model is K x D/M floats, driver
    metadata). Returned quantized so they plug into the identical
    encode/ADC plans as the deterministic codebooks."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from marmaray_spark.operators.similarity import QUANT_SCALE

    dim_row = corpus.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    out = []
    for s in range(m):
        feats = corpus.select(array_to_vector(
            F.expr(f"cast(slice({vec_col}, {s * sub + 1}, {sub}) "
                   f"as array<double>)")).alias("features"))
        model = KMeans(k=k, seed=seed + s, maxIter=max_iter).fit(feats)
        out.append([[int(round(float(x) * QUANT_SCALE)) for x in c]
                    for c in model.clusterCenters()])
    return out


def pack_codes(codes_col: str = "codes") -> Column:
    """array<int> codes -> M-byte binary (requires K <= 256): the
    storage form — one fixed-width value, no per-element list overhead,
    the PQ bandwidth win made physical (write-side companion of the
    int8 tier's pack_int8)."""
    return F.expr(
        f"unhex(concat_ws('', transform({codes_col}, "
        f"c -> lpad(hex(c), 2, '0'))))")


def unpack_codes(bin_col: str = "codes_bin", m: int = 4) -> Column:
    """M-byte binary -> array<int> codes (hex-pair decode, exact
    inverse of pack_codes)."""
    return F.expr(
        f"transform(sequence(0, {m - 1}), "
        f"i -> cast(conv(substring(hex({bin_col}), i * 2 + 1, 2), 16, 10) "
        f"as int))")


def pq_encode(df: DataFrame, codebooks: list, id_col: str = "vec_id",
              vec_col: str = "embedding", with_recon: bool = False,
              use_kernel: bool | None = None) -> DataFrame:
    """(id, codes: array<int>[, adc_self: bigint]) — each vector's PQ
    code; ``adc_self`` is the exact sum of winning subspace dots (the
    vector's projection onto its own reconstruction — the quantization-
    health diagnostic the 'pq' report section exposes).

    Two interchangeable physical paths (both pure projections — no
    shuffle, no join; pinned equal in tests): expression-only with
    centroid literals, switching to an Arrow matmul kernel when
    M x K x D/M literals pass the IVF/bloom codegen bound."""
    m, k, sub = _check(codebooks)
    if use_kernel is None:
        use_kernel = m * k * sub > _IVF_EXPR_MAX_LITERALS
    if use_kernel:
        return _pq_encode_arrow(df, codebooks, id_col, vec_col, with_recon)
    out = df.select(F.col(id_col), quantize(vec_col).alias("__v"))
    code_cols, best_cols = [], []
    for s in range(m):
        d = _dots_expr(f"slice(__v, {s * sub + 1}, {sub})", codebooks[s])
        out = out.withColumn(f"__d{s}", F.expr(d))
        code_cols.append(
            F.expr(f"cast(array_position(__d{s}, array_max(__d{s})) - 1 "
                   f"as int)"))
        best_cols.append(F.expr(f"array_max(__d{s})"))
    out = out.withColumn("codes", F.array(*code_cols))
    if with_recon:
        total = best_cols[0]
        for b in best_cols[1:]:
            total = total + b
        out = out.withColumn("adc_self", total.cast("long"))
    keep = [id_col, "codes"] + (["adc_self"] if with_recon else [])
    return out.select(*keep)


def _pq_encode_arrow(df: DataFrame, codebooks: list, id_col: str,
                     vec_col: str, with_recon: bool) -> DataFrame:
    """Kernel path: per subspace one (batch x sub) @ (sub x K) int64
    matmul; argmax takes the FIRST max (np semantics == the expression
    path's array_position tie-break). Quantization happens in the SAME
    Spark expression as the literal path BEFORE the kernel — np.round
    is half-to-even, SQL round is half-away-from-zero, and re-rounding
    in numpy would fork the two paths on .0005 boundaries."""
    import numpy as np

    m, k, sub = _check(codebooks)
    C = [np.asarray(cb, dtype=np.int64) for cb in codebooks]
    fields = f"{id_col} long, codes array<int>"
    if with_recon:
        fields += ", adc_self long"
    df = df.select(F.col(id_col), quantize(vec_col).alias("__v"))

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.int64)
                          for v in pdf["__v"]])
            codes = np.empty((len(pdf), m), dtype=np.int32)
            best = np.zeros(len(pdf), dtype=np.int64)
            for s in range(m):
                dots = X[:, s * sub:(s + 1) * sub] @ C[s].T
                codes[:, s] = dots.argmax(axis=1)
                best += dots.max(axis=1)
            out = pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "codes": list(codes)})
            if with_recon:
                out["adc_self"] = best
            yield out

    return df.mapInPandas(kernel, schema=fields)


def pq_adc_topk(queries: DataFrame, codes: DataFrame, corpus: DataFrame,
                k: int, codebooks: list, oversample: int = 4,
                id_col: str = "vec_id", vec_col: str = "embedding",
                use_kernel: bool = True) -> DataFrame:
    """Two-tier top-k over the PQ-coded corpus, exact final ordering.

    Tier 1 (ADC, on ``codes`` = pq_encode output): each query's (M x K)
    LUT of exact subspace dots rides a broadcast join as an
    array<array<bigint>> literal column; a corpus vector's approximate
    dot is ``aggregate(zip_with(codes, lut, ...))`` — M element_at
    lookups per row, NEVER touching the float corpus. The
    per-Arrow-batch tree-top-k prefilter (similarity._local_topk) caps
    the rank shuffle at batches x Q x k*oversample rows. Tier 2:
    survivors join back to the full-precision corpus and re-rank by the
    exact quantized dot — identical contract to int8_topk: (query_id,
    neighbor_id, dot_q, rank), equal to brute_force_topk whenever the
    oversampled ADC frontier covers the true top-k (oversample >= N/k
    makes that structural).

    ``use_kernel`` (default True): tier 1 runs as an Arrow kernel — per
    batch, M numpy LUT gathers + one lexsort top-mcap per query. The
    expression form (False) exists for the SQL-parity tests, but
    higher-order functions (zip_with/aggregate) NEVER reach whole-stage
    codegen, so the expression ADC evaluates interpreted per (row x
    query) — measured warm 5.0s expression vs 3.0s kernel over the
    56k-vector skew corpus x 8 queries (the gap widens with Q: the
    expression pays the broadcast join fan-out Q times per row, the
    kernel scores all queries in one gather pass). Both paths are
    pinned bit-equal in pytest (all arithmetic is exact int64; ties
    break to the lowest neighbor id in both)."""
    m, kk, sub = _check(codebooks)
    qrows = (queries.select(F.col(id_col).alias("query_id"),
                            quantize(vec_col).alias("qv"))
             .orderBy("query_id").collect())      # Q small by contract
    spark = queries.sparkSession
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, dot_q long, rank int")
    lut_rows = []
    for r in qrows:
        qv = r["qv"]
        lut = [[sum(int(qv[s * sub + i]) * int(c[i]) for i in range(sub))
                for c in codebooks[s]] for s in range(m)]
        lut_rows.append((int(r["query_id"]), lut))
    mcap = k * oversample
    if use_kernel:
        import numpy as np

        qids = np.array([q for q, _ in lut_rows], dtype=np.int64)
        LUTS = np.asarray([l for _, l in lut_rows],
                          dtype=np.int64)          # Q x M x K

        def kernel(batches):
            import pandas as pd
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                C = np.stack([np.asarray(c, dtype=np.int64)
                              for c in pdf["codes"]])       # B x M
                ids = pdf[id_col].to_numpy(dtype=np.int64)
                scores = np.zeros((len(qids), len(ids)), dtype=np.int64)
                for s in range(m):
                    # per-subspace gather: LUT_s[:, code] is Q x B
                    scores += LUTS[:, s, :][:, C[:, s]]
                out = []
                for qi in range(len(qids)):
                    mask = ids != qids[qi]         # self-match excluded
                    sc, nb = scores[qi][mask], ids[mask]
                    if len(nb) == 0:
                        continue
                    take = min(mcap, len(nb))
                    # lexsort's primary key is the LAST array: order by
                    # dot desc, then neighbor id asc — the expression
                    # path's exact tie-break
                    order = np.lexsort((nb, -sc))[:take]
                    out.append(pd.DataFrame(
                        {"query_id": np.full(take, qids[qi],
                                             dtype=np.int64),
                         "neighbor_id": nb[order], "dot_q": sc[order]}))
                if out:
                    yield pd.concat(out, ignore_index=True)

        pre = codes.select(F.col(id_col), "codes").mapInPandas(
            kernel, "query_id long, neighbor_id long, dot_q long")
    else:
        luts = spark.createDataFrame(
            lut_rows, "query_id long, lut array<array<bigint>>")
        scored = (codes.crossJoin(F.broadcast(luts))
                  .filter(F.col("query_id") != F.col(id_col))
                  .select("query_id",
                          F.col(id_col).alias("neighbor_id"),
                          F.expr("aggregate(zip_with(codes, lut, "
                                 "(c, row) -> element_at(row, c + 1)), 0L, "
                                 "(acc, v) -> acc + v)").alias("dot_q")))
        pre = _local_topk(scored, mcap)
    wc = W.partitionBy("query_id").orderBy(F.col("dot_q").desc(),
                                           F.col("neighbor_id"))
    survivors = (pre.withColumn("__r", F.row_number().over(wc))
                 .filter(F.col("__r") <= mcap)
                 .select("query_id", "neighbor_id"))

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
