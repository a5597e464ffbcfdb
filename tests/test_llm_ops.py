"""LLM-pipeline operator tests: text analysis, dedup family, similarity
search, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from marmaray_spark.operators.dedup import (
    exact_dedup,
    lsh_band_buckets,
    lsh_candidate_pairs,
    minhash_digests,
    minhash_signature,
    simhash16,
    simhash_near_dup_pairs,
)
from marmaray_spark.operators.multimodal import (
    extract_image_features,
    resize_images,
    sample_frames,
    synth_media_from_text,
)
from marmaray_spark.operators.similarity import brute_force_topk, srp_probe_topk
from marmaray_spark.operators.text import lang_id, quality_score, words, word_shingles


@pytest.fixture(scope="module")
def multiling(spark):
    rows = [
        (1, "the cat sat on the mat and it was happy for a while"),
        (2, "el perro corre por la calle y se va del parque"),
        (3, "der hund ist von den kindern und das ist nicht schlecht"),
        (4, "le chat est dans les jardins et il mange pour une heure"),
        (5, "zzz qqq xxx"),
    ]
    return spark.createDataFrame(rows, ["id", "text"]).withColumn("w", words("text"))


def test_lang_id_discriminates(spark, multiling):
    got = {r["id"]: r["pred"] for r in
           multiling.select("id", lang_id("w").alias("pred")).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "und"}


def test_quality_score_range_and_signal(spark, multiling):
    scores = {r["id"]: r["q"] for r in
              multiling.select("id", quality_score("text", "w").alias("q")).collect()}
    assert all(0 <= s <= 100 for s in scores.values())
    assert scores[1] > scores[5]  # real sentence beats garbage


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c d")], ["id", "text"]) \
        .withColumn("w", words("text"))
    got = {r["id"]: r["s"] for r in
           df.select("id", word_shingles("w", 3).alias("s")).collect()}
    assert got[1] == []
    assert got[2] == ["a b c", "b c d"]


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], ["id", "text"])
    out = {r["keeper_id"]: r["dup_count"]
           for r in exact_dedup(df, "id", "text").collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_lsh_finds_near_duplicate(spark):
    base = "spark engine reads parquet files and writes tables with commits " * 3
    near = base.replace("writes", "stores")  # one-word change
    far = "completely different words about cooking pasta at home tonight"
    df = (spark.createDataFrame([(1, base), (2, near), (3, far)], ["id", "text"])
          .withColumn("w", words("text"))
          .withColumn("sh", word_shingles("w", 3))
          .withColumn("hh", minhash_digests("sh"))
          .withColumn("sig", minhash_signature("hh", 16))
          .withColumn("buckets", lsh_band_buckets("sig", 8, 2)))
    pairs = {(r["a"], r["b"]) for r in lsh_candidate_pairs(df, "id", "buckets").collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_lsh_reliable_barrier_same_pairs(spark, tmp_path):
    """reliable_barrier=True (checkpoint to the session's checkpoint
    dir — the executor-loss-safe barrier on a real cluster) yields the
    identical candidate set as the default persist barrier."""
    base = "spark engine reads parquet files and writes tables with commits " * 3
    rows = [(1, base), (2, base.replace("writes", "stores")),
            (3, "completely different words about cooking pasta at home")]
    df = (spark.createDataFrame(rows, ["id", "text"])
          .withColumn("w", words("text"))
          .withColumn("sh", word_shingles("w", 3))
          .withColumn("hh", minhash_digests("sh"))
          .withColumn("sig", minhash_signature("hh", 16))
          .withColumn("buckets", lsh_band_buckets("sig", 8, 2)))
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    want = {(r["a"], r["b"])
            for r in lsh_candidate_pairs(df, "id", "buckets").collect()}
    got = {(r["a"], r["b"])
           for r in lsh_candidate_pairs(df, "id", "buckets",
                                        reliable_barrier=True).collect()}
    assert got == want and (1, 2) in got


def test_minhash_identical_docs_always_candidates(spark):
    df = (spark.createDataFrame([(1, "a b c d e f g"), (2, "a b c d e f g")],
                                ["id", "text"])
          .withColumn("w", words("text"))
          .withColumn("sh", word_shingles("w", 3))
          .withColumn("hh", minhash_digests("sh"))
          .withColumn("sig", minhash_signature("hh", 16))
          .withColumn("buckets", lsh_band_buckets("sig", 8, 2)))
    assert lsh_candidate_pairs(df, "id", "buckets").count() == 1


def test_simhash_near_dup(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),   # one word differs
            (3, "totally unrelated vocabulary here now")]
    df = (spark.createDataFrame(rows, ["id", "text"])
          .withColumn("w", words("text"))
          .select("id", simhash16("w").alias("sh")))
    hashes = {r["id"]: r["sh"] for r in df.collect()}
    assert all(0 <= h < 2 ** 16 for h in hashes.values())
    pairs = simhash_near_dup_pairs(df, "id", "sh", max_hamming=4)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (1, 2) in got


def test_brute_force_topk_exact(spark):
    rows = [(i, [1.0 if j == i else 0.0 for j in range(4)]) for i in range(4)]
    rows.append((4, [0.9, 0.1, 0.0, 0.0]))  # closest to vec 0
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = brute_force_topk(df.filter(F.col("vec_id") == 0), df, k=1)
    row = out.first()
    assert row["neighbor_id"] == 4 and row["rank"] == 1
    # self-match excluded
    assert out.filter(F.col("neighbor_id") == 0).count() == 0


def test_srp_probe_subset_of_bruteforce_scores(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 5)
    brute = brute_force_topk(queries, embeddings, k=50)
    probe = srp_probe_topk(queries, embeddings, k=5)
    brute_scores = {(r["query_id"], r["neighbor_id"]): r["dot_q"]
                    for r in brute.collect()}
    for r in probe.collect():
        key = (r["query_id"], r["neighbor_id"])
        # any probed neighbor's score matches the exact score
        if key in brute_scores:
            assert brute_scores[key] == r["dot_q"]


def test_multimodal_pipeline(spark, documents):
    media = synth_media_from_text(documents.limit(20), "doc_id", "text")
    assert media.schema["meta"].dataType.fieldNames() == ["source", "byte_len", "head_hex"]
    feats = extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(r["channels"] == 3 and r["width"] >= 16 for r in rows)
    assert all(r["aspect_milli"] == r["width"] * 1000 // r["height"] for r in rows)

    resized = resize_images(media, 224, 224)
    assert resized.filter((F.col("width") != 224) | (F.col("height") != 224)).count() == 0
    # payload round-trips through Arrow unchanged
    orig = {r["media_id"]: r["payload"] for r in media.select("media_id", "payload").collect()}
    back = {r["media_id"]: r["payload"] for r in resized.collect()}
    assert orig == back


def test_frame_sampling_fanout(spark, documents):
    media = synth_media_from_text(documents.limit(5), "doc_id", "text", media_type="video")
    frames = sample_frames(media, every_n_bytes=64)
    per_doc = {r["media_id"]: r["n"] for r in
               frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    lens = {r["media_id"]: r["meta"]["byte_len"] for r in media.collect()}
    for mid, n in per_doc.items():
        assert n == (lens[mid] + 63) // 64


def test_image_decode_stub_raises_on_empty(spark):
    from marmaray_spark.operators.multimodal import _decode_image
    with pytest.raises(NotImplementedError):
        _decode_image(b"")


def test_ivf_probe_finds_identical_vector(spark):
    import math

    from marmaray_spark.operators.similarity import ivf_probe_topk

    # 20 unit vectors in 4-d; vec 17 duplicates vec 3 exactly
    def unit(seed):
        vals = [math.sin(seed * 7 + i) for i in range(4)]
        n = math.sqrt(sum(v * v for v in vals))
        return [v / n for v in vals]

    rows = [(i, unit(i)) for i in range(17)] + [(17, unit(3)), (18, unit(5)), (19, unit(8))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = ivf_probe_topk(df.filter("vec_id = 3"), df, k=1,
                         n_centroids=4, nprobe=2, vec_col="embedding")
    got = out.collect()
    assert len(got) == 1
    # the exact duplicate must rank first within the probed cells
    assert got[0]["neighbor_id"] == 17
    assert got[0]["rank"] == 1


def test_brute_force_topk_tree_prefilter_identical(spark):
    """The Arrow local-top-k prefilter must not change results — same
    rows, same ranks, deterministic tiebreaks."""
    import math

    from marmaray_spark.operators.similarity import brute_force_topk

    def unit(seed):
        vals = [math.cos(seed * 3 + i) for i in range(8)]
        n = math.sqrt(sum(v * v for v in vals))
        return [v / n for v in vals]

    df = spark.createDataFrame([(i, unit(i)) for i in range(60)],
                               ["vec_id", "embedding"]).repartition(6)
    q = df.filter("vec_id < 4")
    plain = sorted(map(tuple, brute_force_topk(
        q, df, k=5, local_prefilter=False).collect()))
    tree = sorted(map(tuple, brute_force_topk(
        q, df, k=5, local_prefilter=True).collect()))
    assert plain == tree
    assert len(plain) == 4 * 5


def test_chunk_documents_overlap_and_short_docs(spark):
    from marmaray_spark.operators.text import chunk_documents, words

    df = (spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))),   # 10 words, 2 chunks
         (2, "a b c")],                                # shorter than one chunk
        ["id", "text"]).withColumn("w", words("text")))
    out = chunk_documents(df, "id", "w", chunk_size=6, overlap=2)
    got = {(r["id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
           for r in out.collect()}
    # doc 1: stride 4 -> chunks [w0..w5], [w4..w9]
    assert got[(1, 0)] == (6, "w0 w1 w2 w3 w4 w5")
    assert got[(1, 1)] == (6, "w4 w5 w6 w7 w8 w9")
    # doc 2: single short chunk
    assert got[(2, 0)] == (3, "a b c")
    assert len(got) == 3
    # every token of doc 1 appears in some chunk (coverage)
    text1 = " ".join(t for (i, _), (_, t) in sorted(got.items()) if i == 1)
    assert all(f"w{j}" in text1.split() for j in range(10))


def test_deterministic_sample_stable_and_bounded(spark):
    from marmaray_spark.operators.text import deterministic_sample

    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    a = {r["id"] for r in deterministic_sample(df, "id", 10).collect()}
    b = {r["id"] for r in deterministic_sample(df.repartition(7), "id", 10).collect()}
    assert a == b                      # partitioning-independent
    assert 100 < len(a) < 320          # ~10% of 2000, binomial slack
    full = deterministic_sample(df, "id", 100).count()
    assert full == 2000
    assert deterministic_sample(df, "id", 0).count() == 0


def test_bucketed_range_join_matches_naive_and_avoids_nested_loop(spark):
    from marmaray_spark.operators.rangejoin import bucketed_range_join

    points = spark.createDataFrame([(i, i * 7 % 100) for i in range(200)],
                                   ["pid", "v"])
    intervals = spark.createDataFrame(
        [(1, 10, 25), (2, 20, 22), (3, 90, 99), (4, 0, 100)],
        ["iid", "lo", "hi"])

    got = bucketed_range_join(points, intervals, "v", "lo", "hi",
                              bucket_width=10)
    naive = points.join(intervals,
                        (intervals.lo <= points.v) & (points.v <= intervals.hi))
    assert sorted(map(tuple, got.select("pid", "iid").collect())) == \
        sorted(map(tuple, naive.select("pid", "iid").collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan   # the whole point
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert ("NestedLoop" in naive_plan or "CartesianProduct" in naive_plan)  # unaided plan

    import pytest
    with pytest.raises(ValueError, match="overlapping"):
        bucketed_range_join(points.withColumnRenamed("pid", "iid"),
                            intervals, "v", "lo", "hi", 10)


def test_ivf_learned_centroids_full_probe_equals_brute_force(spark):
    """KMeans-trained centroids through the same probe plan; probing ALL
    cells partitions-then-scans the whole corpus, so results must equal
    exact brute force — validates the learned-index path end to end."""
    import math

    from marmaray_spark.operators.similarity import (
        brute_force_topk,
        ivf_probe_topk,
        train_ivf_centroids,
    )

    def unit(seed):
        vals = [math.sin(seed * 5 + i * 0.7) for i in range(8)]
        n = math.sqrt(sum(v * v for v in vals))
        return [v / n for v in vals]

    df = spark.createDataFrame([(i, unit(i)) for i in range(80)],
                               ["vec_id", "embedding"])
    cents = train_ivf_centroids(df, n_centroids=4, seed=11)
    assert len(cents) == 4 and len(cents[0]) == 8

    q = df.filter("vec_id < 3")
    ivf = sorted(map(tuple, ivf_probe_topk(
        q, df, k=4, nprobe=4, centroids=cents).collect()))
    exact = sorted(map(tuple, brute_force_topk(q, df, k=4).collect()))
    assert ivf == exact


def test_ivf_kernel_path_equals_expression_path(spark):
    """The Arrow-matmul cell-assignment kernel (the large-quantizer
    path — centroid literals above _IVF_EXPR_MAX_LITERALS are the bloom
    array-literal codegen trap) returns bit-for-bit the expression
    path's results, including lowest-centroid-index tie-breaks on both
    the corpus argmax and the query top-nprobe sides."""
    import math

    from marmaray_spark.operators.similarity import ivf_probe_topk

    def unit(seed):
        vals = [math.sin(seed * 3 + i * 0.9) for i in range(8)]
        n = math.sqrt(sum(v * v for v in vals))
        return [v / n for v in vals]

    # duplicated vectors force dot-product ties across centroids
    df = spark.createDataFrame(
        [(i, unit(i % 40)) for i in range(90)], ["vec_id", "embedding"])
    q = df.filter("vec_id < 6")
    for nprobe in (1, 3):
        expr_path = sorted(map(tuple, ivf_probe_topk(
            q, df, k=4, n_centroids=8, nprobe=nprobe,
            use_kernel=False).collect()))
        kern_path = sorted(map(tuple, ivf_probe_topk(
            q, df, k=4, n_centroids=8, nprobe=nprobe,
            use_kernel=True).collect()))
        assert expr_path == kern_path and expr_path


def test_simhash_banded_equals_pairwise(spark):
    from marmaray_spark.operators.dedup import (
        simhash16,
        simhash_banded_near_dup,
        simhash_near_dup_pairs,
    )
    from marmaray_spark.operators.text import words

    texts = [(i, f"common words everywhere plus token{i % 5} and token{i % 7}")
             for i in range(40)]
    sh = (spark.createDataFrame(texts, ["id", "text"])
          .withColumn("w", words("text"))
          .select("id", simhash16("w").alias("sh")))
    banded = sorted(map(tuple, simhash_banded_near_dup(
        sh, "id", "sh", max_hamming=3).collect()))
    pairwise = sorted(map(tuple, simhash_near_dup_pairs(
        sh, "id", "sh", max_hamming=3).collect()))
    assert banded == pairwise and len(banded) > 0

    import pytest
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_banded_near_dup(sh, "id", "sh", max_hamming=4)


def test_connected_components_labels_groups(spark):
    from marmaray_spark.operators.dedup import connected_components

    # two chains and one isolated pair: {1,2,3,4}, {10,11}, {20,21}
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11), (21, 20)], ["a", "b"])
    got = {r["node"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    from marmaray_spark.operators.dedup import connected_components

    chain = spark.createDataFrame([(i, i + 1) for i in range(30)], ["a", "b"])
    got = {r["node"]: r["component"]
           for r in connected_components(chain, max_iter=40).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 31


def test_profile_table_metrics(spark):
    from marmaray_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b"), (4, "a")], ["id", "tag"])
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["id"]["n_rows"] == 5
    assert prof["id"]["n_nulls"] == 0
    assert prof["id"]["n_distinct"] == 4
    assert prof["id"]["top_freq"] == 2        # id=4 twice
    assert prof["tag"]["n_nulls"] == 1
    assert prof["tag"]["n_distinct"] == 2
    assert prof["tag"]["top_freq"] == 3       # 'a' three times


def test_srp_banded_near_dup_subset_of_pairwise(spark):
    """Banded-SRP near-dup emits a SUBSET of the exact pairwise result
    (precision 1.0 by construction: exact dot verification on candidates),
    with high recall — near-identical vectors agree on every hyperplane,
    so every such pair shares all 4 band buckets."""
    from marmaray_spark.operators.similarity import (
        near_dup_pairs,
        srp_banded_near_dup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .filter(F.col("vec_id") < 200)
    exact = {(r["a"], r["b"]): r["dot_q"]
             for r in near_dup_pairs(emb, threshold_milli=900000).collect()}
    banded = {(r["a"], r["b"]): r["dot_q"]
              for r in srp_banded_near_dup_pairs(emb, threshold_milli=900000).collect()}
    assert set(banded).issubset(set(exact))        # no false positives
    for k, v in banded.items():
        assert v == exact[k]                       # identical exact dots
    if exact:                                      # recall on the test corpus
        assert len(banded) / len(exact) >= 0.8


def test_gopher_repetition_signals(spark):
    """Repetitive docs fail the gate; varied prose passes; integer basis
    points behave at the edges (empty/one-word docs)."""
    from marmaray_spark.operators.text import (dup_word_bps,
                                               gopher_repetition_pass,
                                               mean_word_len_x100,
                                               top_ngram_bps)

    rows = [
        (1, "spam spam spam spam spam spam spam spam"),          # one word
        (2, "buy now buy now buy now buy now buy now buy now"),  # one 2-gram
        (3, "the quick brown fox jumps over the lazy dog while "
            "seven wizards brew strong coffee at dawn"),         # varied
        (4, ""),                                                 # empty
        (5, "word"),                                             # single token
    ]
    df = (spark.createDataFrame(rows, ["doc_id", "text"])
          .withColumn("w", F.split(F.trim(F.lower("text")), r"\s+")))
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        dup_word_bps("w").alias("dup"),
        top_ngram_bps("w", 2).alias("top2"),
        mean_word_len_x100("w").alias("mwl"),
        gopher_repetition_pass("w").alias("ok")).collect()}

    assert got[1]["dup"] == 8750 and not got[1]["ok"]     # 7/8 repeats
    assert got[2]["top2"] > 4000 and not got[2]["ok"]     # "buy now" dominates
    assert got[3]["dup"] == 588 and got[3]["ok"]          # 1 repeat / 17
    assert got[4]["dup"] == 0                             # no div-by-zero
    assert got[5]["dup"] == 0 and got[5]["top2"] == 0 and got[5]["mwl"] == 400


def test_dup_ngram_char_bps_matches_brute_force(spark):
    """The duplicate-n-gram char-mass signal (the Gopher table-A1 rows the
    round-8 gate completes) equals a naive per-doc Python oracle on a
    seeded corpus whose small vocabularies force real repeats, and the
    clamp caps the one-word pathological doc at 10000."""
    import random

    from marmaray_spark.operators.text import dup_ngram_char_bps

    rng = random.Random(8)
    vocab = ["alpha", "be", "gamma", "dd", "epsilon", "zeta", "eta", "x"]
    rows = [(i, " ".join(rng.choice(vocab[: 2 + i % 7])
                         for _ in range(rng.randrange(0, 40))))
            for i in range(60)]
    rows += [(100, "spam " * 30), (101, ""), (102, "one two three")]
    df = (spark.createDataFrame(rows, ["doc_id", "text"])
          .withColumn("w", F.split(F.trim(F.lower("text")), r"\s+")))

    def brute(text: str, n: int) -> int:
        w = text.strip().lower().split() if text.strip() else [""]
        if text == "":
            w = [""]
        shingles = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        from collections import Counter
        dup = sum((c - 1) * (len(s) - (n - 1))
                  for s, c in Counter(shingles).items() if c > 1)
        tot = sum(len(x) for x in w)
        return min(10000, dup * 10000 // max(tot, 1))

    for n in (5, 7, 10):
        got = {r["doc_id"]: r["bps"] for r in df.select(
            "doc_id", dup_ngram_char_bps("w", n).alias("bps")).collect()}
        for doc_id, text in rows:
            assert got[doc_id] == brute(text, n), (doc_id, n, text)
    # the all-one-word doc overlaps every 5-gram with itself: clamp binds
    assert df.filter(F.col("doc_id") == 100).select(
        dup_ngram_char_bps("w", 5).alias("b")).first()["b"] == 10000


def test_dup_ngram_kernel_equals_expression_path(spark):
    """The Arrow-kernel family pass (the hot path the quality query uses)
    is bit-equal to the expression form for every n, including empty and
    null-element token arrays."""
    import random

    from marmaray_spark.operators.text import (dup_ngram_char_bps,
                                               dup_ngram_char_signals)

    rng = random.Random(88)
    vocab = ["a", "bb", "ccc", "dddd", "ee", "f"]
    rows = [(i, "t", [rng.choice(vocab[: 2 + i % 5])
                      for _ in range(rng.randrange(0, 30))])
            for i in range(40)]
    rows += [(100, "t", []), (101, "t", ["solo"]), (102, "t", ["x"] * 25)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "wr"])
    got = {r["doc_id"]: r for r in
           dup_ngram_char_signals(df, "doc_id", "wr").collect()}
    want = {r["doc_id"]: r for r in df.select(
        "doc_id", *[dup_ngram_char_bps("wr", n).alias(f"dup{n}_char_bps")
                    for n in range(5, 11)]).collect()}
    assert set(got) == set(want)
    for doc_id, w in want.items():
        for n in range(5, 11):
            col = f"dup{n}_char_bps"
            assert got[doc_id][col] == w[col], (doc_id, col)


def test_massivetext_pass_gates_repetitive_docs(spark):
    from marmaray_spark.operators.text import massivetext_repetition_pass

    rows = [
        (1, " ".join(["the quick brown fox jumps over one lazy dog and "
                      "seven wizards brew strong coffee at dawn today"])),
        (2, "copy paste boiler plate " * 12),   # dup 5..10-grams dominate
    ]
    df = (spark.createDataFrame(rows, ["doc_id", "text"])
          .withColumn("w", F.split(F.trim(F.lower("text")), r"\s+")))
    got = {r["doc_id"]: r["ok"] for r in df.select(
        "doc_id", massivetext_repetition_pass("w").alias("ok")).collect()}
    assert got[1] is True and got[2] is False


def test_decontaminate_flags_overlap_and_broadcasts(spark):
    from marmaray_spark.operators.decontam import decontaminate

    mk = lambda rows: (spark.createDataFrame(rows, ["doc_id", "text"])  # noqa: E731
                       .withColumn("w", F.split(F.trim(F.lower("text")), r"\s+")))
    test_set = mk([(100, "alpha beta gamma delta epsilon zeta")])
    corpus = mk([
        (1, "alpha beta gamma delta epsilon zeta eta theta"),   # contains eval
        (2, "one two three four five six seven eight nine"),    # clean
        (3, "x y alpha beta gamma delta epsilon pad pad2 pad3 "
            "pad4 pad5 pad6 pad7 pad8 pad9 pad10 pad11"),       # partial
    ])
    out = decontaminate(corpus, test_set, n=5, contaminated_bps=2000)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 2 not in rows                       # zero-overlap docs omitted
    assert rows[1]["contaminated"]             # 2 of 4 grams shared
    assert rows[1]["n_overlap"] == 2 and rows[1]["n_grams"] == 4
    assert not rows[3]["contaminated"]         # 1 of 14 grams -> 714 bps
    assert rows[3]["overlap_bps"] == 714
    # eval side must be the broadcast side; corpus side never nested-loops
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "NestedLoop" not in plan


def test_decontaminate_many_reports_per_eval_set(spark):
    """Multi-benchmark sweep: one report row per (doc, overlapping
    set), sets that don't overlap a doc absent, single broadcast."""
    from marmaray_spark.operators.decontam import decontaminate_many

    mk = lambda rows: (spark.createDataFrame(rows, ["doc_id", "text"])  # noqa: E731
                       .withColumn("w", F.split(F.trim(F.lower("text")), r"\s+")))
    seta = mk([(100, "alpha beta gamma delta epsilon zeta")])
    setb = mk([(200, "one two three four five six")])
    corpus = mk([
        (1, "alpha beta gamma delta epsilon zeta eta theta"),   # A only
        (2, "one two three four five six seven eight"),         # B only
        (3, "quiet words that overlap nothing at all here"),    # clean
    ])
    out = decontaminate_many(corpus, {"A": seta, "B": setb},
                             n=5, contaminated_bps=2000)
    rows = {(r["doc_id"], r["eval_set"]): r for r in out.collect()}
    assert set(rows) == {(1, "A"), (2, "B")}
    assert rows[(1, "A")]["contaminated"] and rows[(2, "B")]["contaminated"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "NestedLoop" not in plan

    import pytest as _pytest
    with _pytest.raises(ValueError):
        decontaminate_many(corpus, {})


def test_approx_percentile_within_sketch_error_of_exact(spark):
    """The 100 TB twin of event_value_percentiles: approx_percentile's
    rank error is bounded by 1/accuracy — verify the sketch lands within
    the equivalent value window of the exact answer."""
    import random

    rng = random.Random(7)
    vals = [(rng.gauss(50.0, 15.0),) for _ in range(20000)]
    df = spark.createDataFrame(vals, ["v"])
    acc = 1000      # rank error <= n/acc = 20 rows
    row = df.select(
        F.expr("percentile(v, array(0.5, 0.9, 0.99))").alias("exact"),
        F.expr(f"approx_percentile(v, array(0.5, 0.9, 0.99), {acc})").alias("approx"),
        F.expr("sort_array(collect_list(v))").alias("sorted_v")).collect()[0]
    n = len(row["sorted_v"])
    for q, exact, approx in zip([0.5, 0.9, 0.99], row["exact"], row["approx"]):
        rank = int(q * (n - 1))
        lo = row["sorted_v"][max(0, rank - n // acc - 1)]
        hi = row["sorted_v"][min(n - 1, rank + n // acc + 1)]
        assert lo <= approx <= hi, (q, exact, approx, lo, hi)


def test_pack_sequences_deterministic_chunking(spark):
    from marmaray_spark.operators.packing import pack_sequences, packing_stats

    rows = [(i, 100) for i in range(10)]             # 10 docs x 100 tokens
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = pack_sequences(df, id_col="doc_id", tokens_col="n_tokens",
                            seq_len=256, n_buckets=1).collect()
    by_doc = {r["doc_id"]: r["bin_id"] for r in packed}
    # stream: doc i starts at i*100; bin = (i*100) div 256
    assert by_doc == {i: (i * 100) // 256 for i in range(10)}

    stats = packing_stats(df, id_col="doc_id", tokens_col="n_tokens",
                          seq_len=256, n_buckets=1).collect()
    assert sum(r["n_docs"] for r in stats) == 10
    assert sum(r["sum_tokens"] for r in stats) == 1000
    # a doc longer than seq_len overflows its bin: fill > 10000 bps
    big = spark.createDataFrame([(1, 600)], ["doc_id", "n_tokens"])
    (over,) = packing_stats(big, id_col="doc_id", tokens_col="n_tokens",
                            seq_len=256, n_buckets=1).collect()
    assert over["fill_bps"] > 10000

    import pytest
    with pytest.raises(ValueError):
        pack_sequences(df, id_col="doc_id", tokens_col="n_tokens", seq_len=0)


def test_stratified_sample_quotas_and_stability(spark):
    from marmaray_spark.operators.text import (deterministic_sample,
                                               stratified_sample)

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_sample(df, "doc_id", "lang", {"en": 10.0},
                            default_pct=50.0)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 120 <= counts["en"] <= 280        # ~10% of 2000
    assert 850 <= counts["de"] <= 1150       # ~50% of 2000
    # same hash contract as the unstratified sampler: en slice == plain 10%
    en_plain = {r["doc_id"] for r in
                deterministic_sample(df.filter(F.col("lang") == "en"),
                                     "doc_id", 10.0).collect()}
    en_strat = {r["doc_id"] for r in out.filter(F.col("lang") == "en").collect()}
    assert en_plain == en_strat
    # default_pct=100 keeps every unlisted stratum
    keep_all = stratified_sample(df, "doc_id", "lang", {"en": 0.0},
                                 default_pct=100.0)
    assert keep_all.filter(F.col("lang") == "de").count() == 2000
    assert keep_all.filter(F.col("lang") == "en").count() == 0


def test_srp_multiprobe_recall_lift(spark, embeddings):
    """Multi-probe SRP: extra_probes=0 equals single-probe exactly; with
    probes the candidate set is a superset (disjoint buckets, no dupes)
    and brute-force recall never decreases."""
    from marmaray_spark.operators.similarity import (brute_force_topk,
                                                     srp_multiprobe_topk,
                                                     srp_probe_topk)

    q = embeddings.filter(F.col("vec_id") < 10)
    BIG = 10 ** 6   # no top-k truncation: compare full candidate sets

    single = {(r["query_id"], r["neighbor_id"])
              for r in srp_probe_topk(q, embeddings, k=BIG).collect()}
    zero = {(r["query_id"], r["neighbor_id"])
            for r in srp_multiprobe_topk(q, embeddings, k=BIG,
                                         extra_probes=0).collect()}
    assert zero == single

    multi = srp_multiprobe_topk(q, embeddings, k=BIG, extra_probes=2)
    rows = multi.collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))        # disjoint buckets: no dupes
    assert single <= set(pairs)                 # superset of single-probe
    assert len(pairs) > len(single)             # probes actually add candidates

    truth = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(q, embeddings, k=10).collect()}
    r_single = len(truth & single) / len(truth)
    r_multi = len(truth & set(pairs)) / len(truth)
    assert r_multi >= r_single

    import pytest
    with pytest.raises(ValueError):
        srp_multiprobe_topk(q, embeddings, k=5, extra_probes=9)


def test_resample_locf_gapfill_and_edges(spark):
    from marmaray_spark.operators.timeseries import resample_locf

    NS = 1_000_000_000
    rows = [  # key a: buckets 0, 3 (gap 1-2); key b: single bucket
        ("a", 5 * NS, 100), ("a", 8 * NS, 200),       # bucket 0: avg 150
        ("a", 35 * NS, 400),                          # bucket 3
        ("b", 70 * NS, 7),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {(r["k"], r["bucket_start_s"]): (r["n_events"], r["value_filled"])
           for r in resample_locf(df, key_col="k", ts_ns_col="ts",
                                  value_col="v", every_s=10).collect()}
    assert out[("a", 0)] == (2, 150.0)
    assert out[("a", 10)] == (0, 150.0)      # gap: count 0, value carried
    assert out[("a", 20)] == (0, 150.0)
    assert out[("a", 30)] == (1, 400.0)
    assert out[("b", 70)] == (1, 7.0)
    assert len(out) == 5                     # dense spine, nothing beyond

    import pytest
    with pytest.raises(ValueError):
        resample_locf(df, key_col="k", ts_ns_col="ts", value_col="v",
                      every_s=0)


def test_real_bmp_decode_resize_roundtrip(spark):
    """BMP payloads decode for real: exact header dims, nearest-neighbor
    resize re-encodes decodable pixels, corrupt headers raise."""
    import numpy as np
    import pytest

    from marmaray_spark.functions.media_codec import (MediaCodecError,
                                                      decode_bmp, encode_bmp)
    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     extract_image_features,
                                                     resize_images)

    def gradient(h, w):
        px = np.zeros((h, w, 3), np.uint8)
        px[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :] * 3
        px[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 5
        px[:, :, 2] = 7
        return px

    # codec round-trip is exact (incl. non-multiple-of-4 row padding)
    px = gradient(33, 21)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)

    rows = [(1, "image", bytearray(encode_bmp(gradient(40, 60)))),
            (2, "image", bytearray(encode_bmp(gradient(8, 8))))]
    media = attach_media_metadata(
        spark.createDataFrame(rows, "media_id long, media_type string, payload binary"))
    feats = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (60, 40)   # real dims
    assert (feats[2]["width"], feats[2]["height"]) == (8, 8)
    assert feats[1]["aspect_milli"] == 1500

    resized = {r["media_id"]: r for r in resize_images(media, 16, 16).collect()}
    out_px = decode_bmp(bytes(resized[1]["payload"]))
    assert out_px.shape == (16, 16, 3)                # really re-encoded
    assert np.array_equal(out_px, decode_bmp(bytes(resized[1]["payload"])))

    with pytest.raises(MediaCodecError):
        decode_bmp(b"BM" + b"\x00" * 60)              # truncated/invalid


def test_real_wav_decode_and_features(spark):
    """WAV payloads decode for real: rate/duration from the header, RMS
    from the samples; non-WAV audio takes the stub path (rms -1)."""
    import math

    import numpy as np

    from marmaray_spark.functions.media_codec import encode_wav_pcm16
    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     extract_audio_features)

    rate = 8000
    t = np.arange(rate)                     # 1 second
    sine = (np.sin(2 * math.pi * 440 * t / rate) * 16384).astype(np.int16)
    silence = np.zeros(rate // 2, np.int16)  # 0.5 s
    rows = [(1, "audio", bytearray(encode_wav_pcm16(sine, rate))),
            (2, "audio", bytearray(encode_wav_pcm16(silence, rate))),
            (3, "audio", bytearray(b"not-a-wav-payload"))]
    media = attach_media_metadata(
        spark.createDataFrame(rows, "media_id long, media_type string, payload binary"))
    got = {r["media_id"]: r for r in extract_audio_features(media).collect()}

    assert got[1]["sample_rate"] == rate and got[1]["duration_ms"] == 1000
    # sine RMS = amplitude/sqrt(2) = 16384/32768/1.414 ~ 0.354
    assert 350 <= got[1]["rms_milli"] <= 358
    assert got[2]["rms_milli"] == 0 and got[2]["duration_ms"] == 500
    assert got[3]["rms_milli"] == -1          # stub path flagged


def test_ivf_recall_monotone_in_nprobe(spark, embeddings):
    """IVF: recall vs brute force is non-decreasing as nprobe grows, and
    probing every cell IS brute force (cells partition the corpus)."""
    from marmaray_spark.operators.similarity import (brute_force_topk,
                                                     ivf_probe_topk)

    q = embeddings.filter(F.col("vec_id") < 8)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(q, embeddings, k=5).collect()}

    last = -1.0
    for nprobe in (1, 2, 4, 16):
        got = {(r["query_id"], r["neighbor_id"])
               for r in ivf_probe_topk(q, embeddings, k=5, n_centroids=16,
                                       nprobe=nprobe).collect()}
        recall = len(truth & got) / len(truth)
        assert recall >= last, (nprobe, recall, last)
        last = recall
    assert last == 1.0          # nprobe == n_centroids: exact


def test_lsh_hot_bucket_cap_bounds_pairs_and_keeps_components(spark):
    """30% boilerplate duplication: the capped candidate set is O(W) per
    hot bucket instead of O(W^2), every anchor edge survives exact
    verification (members are identical), and connected components over
    the capped pairs equal components over the full pairs."""
    from marmaray_spark.operators.dedup import connected_components
    from marmaray_spark.operators.text import words as words_fn

    boiler = "terms of service apply to all users of this website " * 2
    uniq = [f"unique document number {i} about topic {i * 7} today" for i in range(20)]
    rows = [(i, boiler) for i in range(100)] + \
           [(100 + i, t) for i, t in enumerate(uniq)]
    df = (spark.createDataFrame(rows, ["id", "text"])
          .withColumn("w", words_fn("text"))
          .withColumn("sh", word_shingles("w", 3))
          .withColumn("hh", minhash_digests("sh"))
          .withColumn("sig", minhash_signature("hh", 16))
          .withColumn("buckets", lsh_band_buckets("sig", 8, 2)))

    full = lsh_candidate_pairs(df, "id", "buckets", persist=False)
    capped = lsh_candidate_pairs(df, "id", "buckets", persist=False,
                                 max_bucket_width=16)
    n_full, n_capped = full.count(), capped.count()
    # 100 identical docs -> C(100,2) = 4950 uncapped pairs; star caps at 99
    assert n_full >= 4950
    assert n_capped <= 99 + 50        # anchors + slack for small buckets
    # capped pairs are a subset of real candidates
    fullset = {(r["a"], r["b"]) for r in full.collect()}
    assert {(r["a"], r["b"]) for r in capped.collect()} <= fullset

    comp_full = {(r["node"], r["component"])
                 for r in connected_components(full).collect()}
    comp_capped = {(r["node"], r["component"])
                   for r in connected_components(capped).collect()}
    assert comp_capped == comp_full


def test_simhash_hot_bucket_cap_matches_on_duplicated_corpus(spark):
    """Identical docs share a fingerprint: the capped star keeps every
    member within hamming 0 of the anchor, so the component set (what
    dedup consumes) is unchanged while the pair count collapses."""
    from marmaray_spark.operators.dedup import (connected_components,
                                                simhash16,
                                                simhash_banded_near_dup)
    from marmaray_spark.operators.text import words as words_fn

    rows = [(i, "legal boilerplate footer text repeated everywhere")
            for i in range(60)]
    rows += [(100 + i, f"distinct content {i} with words {i * 3} {i * 5}")
             for i in range(10)]
    sh = (spark.createDataFrame(rows, ["id", "text"])
          .withColumn("w", words_fn("text"))
          .select("id", simhash16("w").alias("sh")))
    full = simhash_banded_near_dup(sh, "id", "sh", max_hamming=3)
    capped = simhash_banded_near_dup(sh, "id", "sh", max_hamming=3,
                                     max_bucket_width=16)
    assert capped.count() < full.count()
    comp_full = {(r["node"], r["component"])
                 for r in connected_components(full).collect()}
    comp_capped = {(r["node"], r["component"])
                   for r in connected_components(capped).collect()}
    assert comp_capped == comp_full


def test_real_png_decode_resize_roundtrip(spark):
    """PNG payloads decode for REAL — stdlib zlib inflate + all five
    scanline filters — through the same multimodal kernels as BMP."""
    import numpy as np
    import pytest
    import struct
    import zlib

    from marmaray_spark.functions.media_codec import (MediaCodecError,
                                                      decode_png, encode_png)
    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     extract_image_features,
                                                     resize_images)

    def gradient(h, w):
        px = np.zeros((h, w, 3), np.uint8)
        px[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :] * 3
        px[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 5
        px[:, :, 2] = 11
        return px

    # round-trip through DEFLATE is exact
    px = gradient(29, 17)
    assert np.array_equal(decode_png(encode_png(px)), px)

    # every scanline filter type unfilters correctly: hand-build a PNG
    # whose rows use filters 0..4 over known pixels
    h, w = 5, 4
    ref = gradient(h, w)
    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = ref[y].reshape(-1).astype(np.int16)
        prev = ref[y - 1].reshape(-1).astype(np.int16) if y else np.zeros(w * 3, np.int16)
        filt = np.zeros(w * 3, np.int16)
        for x in range(w * 3):
            a = line[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1}.get(ftype)
            if pred is None:            # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (line[x] - pred) & 0xFF
        raw += bytes([ftype]) + bytes(filt.astype(np.uint8))
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (sig + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), ref)

    # through the Spark kernels: real dims + real resize re-encode
    rows = [(1, "image", bytearray(encode_png(gradient(40, 60)))),
            (2, "image", bytearray(encode_png(gradient(8, 8))))]
    media = attach_media_metadata(
        spark.createDataFrame(rows, "media_id long, media_type string, payload binary"))
    feats = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (60, 40)
    assert feats[1]["aspect_milli"] == 1500
    resized = {r["media_id"]: r for r in resize_images(media, 16, 16).collect()}
    assert decode_png(bytes(resized[1]["payload"])).shape == (16, 16, 3)

    with pytest.raises(MediaCodecError):
        decode_png(sig + b"\x00" * 20)                 # missing chunks
    with pytest.raises(MediaCodecError):
        decode_png(b"\x89PNH" + b"\x00" * 30)          # bad signature
    bad = (sig + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", b"not-deflate") + chunk(b"IEND", b""))
    with pytest.raises(MediaCodecError):
        decode_png(bad)                                # inflate failure


def test_weighted_sample_rates_and_determinism(spark):
    """Per-row keep probability: observed rates track the weights, weight
    0 drops all / 1 keeps all, and the decision is stable across reruns
    and partitionings."""
    from marmaray_spark.operators.text import weighted_sample

    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 4 == 0, 0.0)
         .when(F.col("id") % 4 == 1, 0.25)
         .when(F.col("id") % 4 == 2, 0.75)
         .otherwise(1.0).alias("w"))
    kept = weighted_sample(df, "id", "w")
    by_w = {r["w"]: r["n"] for r in
            kept.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0.0 not in by_w                      # weight 0 -> dropped
    assert by_w[1.0] == 1000                    # weight 1 -> all kept
    assert 180 <= by_w[0.25] <= 320             # ~250
    assert 660 <= by_w[0.75] <= 840             # ~750

    ids1 = sorted(r["id"] for r in kept.collect())
    ids2 = sorted(r["id"] for r in
                  weighted_sample(df.repartition(13), "id", "w").collect())
    assert ids1 == ids2                         # partitioning-independent


def test_approx_heavy_hitters_contains_exact_top(spark, documents):
    """The constant-memory heavy-hitters path for 100 TB: DataFrame
    freqItems (a merged frequent-items sketch) must contain every term
    the exact groupBy ranks in the top 10 — the sketch's containment
    guarantee for support above the threshold."""
    from marmaray_spark.operators.text import words as words_fn

    terms = (documents.select(F.explode(words_fn("text")).alias("t"))
             .filter(F.col("t") != ""))
    exact_top = [r["t"] for r in
                 terms.groupBy("t").count()
                 .orderBy(F.col("count").desc(), "t").limit(10).collect()]
    n = terms.count()
    # support 0.5%: anything in the exact top-10 is far above it here
    approx = set(terms.stat.freqItems(["t"], 0.005).collect()[0][0])
    assert set(exact_top) <= approx
    # and the sketch is bounded: at most ~1/support entries
    assert len(approx) <= 1 / 0.005 + 1


def test_ivf_index_persists_across_sessions(spark, embeddings, tmp_path):
    """Index-build-once: KMeans centroids trained, persisted via a
    durable MetadataManager, reloaded by a FRESH manager (a later query
    session), and the probe results are identical to using the in-memory
    centroids."""
    from marmaray_spark.metadata import FileSystemMetadataManager
    from marmaray_spark.operators.similarity import (ivf_probe_topk,
                                                     load_ivf_index,
                                                     save_ivf_index,
                                                     train_ivf_centroids)

    cents = train_ivf_centroids(embeddings, n_centroids=4)
    meta = FileSystemMetadataManager(tmp_path / "idx")
    save_ivf_index(meta, cents, name="emb64")
    meta.save_changes()

    meta2 = FileSystemMetadataManager(tmp_path / "idx")
    loaded = load_ivf_index(meta2, name="emb64")
    assert loaded == [[int(x) for x in c] for c in cents]

    q = embeddings.filter(F.col("vec_id") < 5)
    direct = {(r["query_id"], r["neighbor_id"]) for r in
              ivf_probe_topk(q, embeddings, k=3, n_centroids=4,
                             centroids=cents).collect()}
    via_store = {(r["query_id"], r["neighbor_id"]) for r in
                 ivf_probe_topk(q, embeddings, k=3, n_centroids=4,
                                centroids=loaded).collect()}
    assert via_store == direct

    import pytest
    with pytest.raises(KeyError, match="no IVF index"):
        load_ivf_index(meta2, name="missing")


def test_compressed_format_sniffers():
    from marmaray_spark.functions.media_codec import (looks_like_jpeg,
                                                      looks_like_mp3)

    assert looks_like_jpeg(b"\xff\xd8\xff\xe0rest")
    assert not looks_like_jpeg(b"\x89PNG\r\n\x1a\n")
    assert looks_like_mp3(b"ID3\x04rest")
    assert looks_like_mp3(b"\xff\xfb\x90aa")        # bare MPEG frame sync
    assert not looks_like_mp3(b"RIFFxxxx")


def test_unknown_format_stub_fallback(spark):
    """A payload in a format NO codec handles takes the deterministic
    stub leg — the pipeline keeps its shape and the features stay
    byte-deterministic. (JPEG no longer stubs anywhere: the pure-numpy
    baseline decoder in functions/jpeg_codec.py is always available;
    see test_real_jpeg_decode_numpy.)"""
    from marmaray_spark.functions.media_codec import pil_available
    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     extract_image_features)

    if pil_available():
        pytest.skip("PIL present: it may claim arbitrary formats")
    payload = b"II*\x00" + b"t" * 96               # TIFF-ish, no codec
    df = attach_media_metadata(spark.createDataFrame(
        [(1, "image", payload)], ["media_id", "media_type", "payload"]))
    row = extract_image_features(df).first()
    assert (row["width"], row["height"]) == (16 + (100 % 240),
                                             16 + (payload[0] % 240))
    assert row["channels"] == 3


def test_real_jpeg_decode_numpy(spark):
    """The dominant real-corpus image format decodes FOR REAL in this
    environment: a baseline JPEG produced by the numpy encoder flows
    through the SAME Spark kernel and yields its true dimensions — no
    PIL required (r5 verdict item 4)."""
    import numpy as np

    from marmaray_spark.functions.jpeg_codec import encode_jpeg
    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     extract_image_features)

    yy, xx = np.mgrid[0:33, 0:47]
    img = np.stack([xx * 5 % 256, yy * 7 % 256,
                    (xx + yy) % 256], axis=2).astype(np.uint8)
    payload = encode_jpeg(img, quality=85, subsampling="420")
    df = attach_media_metadata(spark.createDataFrame(
        [(1, "image", payload)], ["media_id", "media_type", "payload"]))
    row = extract_image_features(df).first()
    assert (row["width"], row["height"], row["channels"]) == (47, 33, 3)


def test_real_jpeg_decode_with_pil(spark):
    """When PIL IS importable the same kernels decode/resize JPEG for
    real — the import-try seam activates without any code change."""
    import numpy as np
    import pytest

    from marmaray_spark.functions.media_codec import (decode_image_pil,
                                                      encode_jpeg_pil,
                                                      pil_available)
    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     extract_image_features,
                                                     resize_images)

    if not pil_available():
        pytest.skip("PIL not in this container")
    px = np.zeros((24, 32, 3), dtype=np.uint8)
    px[:, :, 0] = 200
    payload = encode_jpeg_pil(px)
    assert decode_image_pil(payload).shape == (24, 32, 3)

    df = attach_media_metadata(spark.createDataFrame(
        [(1, "image", payload)], ["media_id", "media_type", "payload"]))
    row = extract_image_features(df).first()
    assert (row["width"], row["height"], row["channels"]) == (32, 24, 3)
    out = resize_images(df, 8, 8).first()
    assert decode_image_pil(bytes(out["payload"])).shape[:2] == (8, 8)


def test_real_mp3_decode_with_soundfile(spark):
    """soundfile leg of the audio seam (skips in codec-less containers)."""
    import pytest

    from marmaray_spark.functions.media_codec import soundfile_available

    if not soundfile_available():
        pytest.skip("soundfile not in this container")
    import io

    import numpy as np
    import soundfile as sf

    from marmaray_spark.operators.multimodal import (attach_media_metadata,
                                                     extract_audio_features)
    buf = io.BytesIO()
    samples = (np.sin(np.linspace(0, 440 * 2 * np.pi, 8000)) * 20000)
    sf.write(buf, samples.astype(np.int16), 8000, format="MP3")
    df = attach_media_metadata(spark.createDataFrame(
        [(1, "audio", buf.getvalue())], ["media_id", "media_type", "payload"]))
    row = extract_audio_features(df).first()
    assert row["sample_rate"] == 8000
    assert abs(row["n_samples"] - 8000) < 2500   # mp3 pads frames


def test_connected_components_long_chain_converges(spark):
    """A 200-node path graph needs 200 rounds under 1-hop propagation —
    far past max_iter — but pointer jumping closes it in O(log n): every
    node must land in component 0, within the default iteration budget."""
    from marmaray_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([(i, i + 1) for i in range(200)],
                                  ["a", "b"])
    out = connected_components(pairs)
    assert {r["component"] for r in out.collect()} == {0}
    assert out.count() == 201


def test_pack_int8_roundtrip_and_size(spark):
    """pack_int8 emits EXACTLY dim bytes per vector (two's-complement
    lanes — char() would UTF-8-inflate high bytes), and np.frombuffer
    recovers round(x*127) with saturation at +/-127."""
    import numpy as np

    from marmaray_spark.operators.similarity import compress_embeddings

    rows = [(1, [0.5, -0.5, 1.0, -1.0]), (2, [0.0, 0.999, -0.008, 2.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: bytes(r["emb8"])
           for r in compress_embeddings(df).collect()}
    assert all(len(b) == 4 for b in got.values())
    assert np.frombuffer(got[1], dtype=np.int8).tolist() == [64, -64, 127, -127]
    assert np.frombuffer(got[2], dtype=np.int8).tolist() == [0, 127, -1, 127]


def test_int8_topk_full_oversample_equals_brute_force(spark, embeddings):
    """With the oversampled frontier covering the corpus, the int8
    coarse tier cannot miss a true neighbor, and the exact re-score
    tier restores full-precision order — result == brute_force_topk."""
    from marmaray_spark.operators.similarity import (brute_force_topk,
                                                     compress_embeddings,
                                                     int8_topk)

    q = embeddings.filter(F.col("vec_id") < 5)
    corpus8 = compress_embeddings(embeddings)
    exact = sorted(map(tuple, brute_force_topk(q, embeddings, k=5).collect()))
    n = embeddings.count()
    got = sorted(map(tuple, int8_topk(
        q, corpus8, embeddings, k=5, oversample=(n // 5) + 1).collect()))
    assert got == exact


def test_int8_topk_modest_oversample_high_recall(spark, embeddings):
    """The practical setting: oversample=4 must recover nearly all true
    neighbors (int8 rank disagreement is localized to near-ties)."""
    from marmaray_spark.operators.similarity import (brute_force_topk,
                                                     compress_embeddings,
                                                     int8_topk)

    q = embeddings.filter(F.col("vec_id") < 8)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(q, embeddings, k=5).collect()}
    got = {(r["query_id"], r["neighbor_id"])
           for r in int8_topk(q, compress_embeddings(embeddings),
                              embeddings, k=5, oversample=4).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.95, recall


def test_int8_topk_empty_query_set(spark, embeddings):
    from marmaray_spark.operators.similarity import (compress_embeddings,
                                                     int8_topk)
    out = int8_topk(embeddings.filter("vec_id < 0"),
                    compress_embeddings(embeddings), embeddings, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "dot_q", "rank"]


def test_int8_topk_negative_query_components_no_int32_wrap(spark):
    """Accumulator-width guard regression: a query whose components are
    LARGE AND NEGATIVE has a small max() but a huge |min|; the old
    ``Q.max() < 2**22`` gate picked int32 and the coarse matmul could
    silently wrap, corrupting survivor membership. The full bound
    (127 * max|q| * dim) must force int64 here and keep the result
    identical to brute force."""
    from marmaray_spark.operators.similarity import (brute_force_topk,
                                                     compress_embeddings,
                                                     int8_topk)

    dim = 8
    rng = __import__("random").Random(7)
    rows = [(i, [rng.uniform(-1.0, 1.0) for _ in range(dim)])
            for i in range(20)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # all-negative, large-magnitude query: milli-units ~ -5e6 each, so
    # |dot| can reach 127 * 5e6 * 8 ≈ 5.1e9 > 2^31
    q = spark.createDataFrame([(100, [-5000.0] * dim)],
                              "vec_id long, embedding array<double>")
    exact = sorted(map(tuple, brute_force_topk(q, corpus, k=5).collect()))
    got = sorted(map(tuple, int8_topk(
        q, compress_embeddings(corpus), corpus, k=5,
        oversample=5).collect()))
    assert got == exact


# ---------------------------------------------------------------------------
# C4 line cleaning / unigram-LM scoring / exact-substring duplication (r6)
# ---------------------------------------------------------------------------

def test_c4_clean_line_rules(spark):
    from marmaray_spark.operators.text import c4_clean

    doc = "\n".join([
        "this line is a proper sentence.",       # kept
        "too short.",                            # < 3 words
        "no terminal punctuation here",          # no . ! ? "
        "enable javascript to view this page.",  # bad marker
        "please accept our Cookie policy now.",  # bad marker, case-folded
        "function() { return 1; }",              # brace
        'he said "this is quoted."',             # kept (quote terminal is .)
        "lorem ipsum dolor sit amet.",           # bad marker
        "final sentence stays in!",              # kept
    ])
    row = (spark.createDataFrame([(1, doc)], ["id", "text"])
           .select(c4_clean("text").alias("c")).collect()[0]["c"])
    assert row["lines_total"] == 9
    assert row["lines_kept"] == 3
    kept = row["cleaned"].split("\n")
    assert kept == ["this line is a proper sentence.",
                    'he said "this is quoted."',
                    "final sentence stays in!"]


def test_c4_clean_empty_when_nothing_survives(spark):
    from marmaray_spark.operators.text import c4_clean

    row = (spark.createDataFrame([(1, "word salad without punct")],
                                 ["id", "text"])
           .select(c4_clean("text").alias("c")).collect()[0]["c"])
    assert row["lines_kept"] == 0 and row["cleaned"] == ""


def test_unigram_lm_train_and_score(spark):
    from marmaray_spark.operators.lm import lm_score, train_unigram_lm
    from marmaray_spark.operators.text import words

    docs = spark.createDataFrame(
        [(1, "the the the cat"), (2, "the cat"), (3, "zebra xylophone")],
        ["id", "text"]).withColumn("w", words("text"))
    lm = train_unigram_lm(docs, "w")
    model = {r["term"]: (r["cnt"], r["logp_milli"]) for r in lm.collect()}
    # corpus: the*4 cat*2 zebra*1 xylophone*1 -> total 8
    assert model["the"][0] == 4 and model["cat"][0] == 2
    import math
    assert model["the"][1] == round(math.log(4 / 8) * 1000)
    assert model["zebra"][1] == round(math.log(1 / 8) * 1000)

    scored = {r["id"]: r["lm_logp_milli"]
              for r in lm_score(docs, "id", "w", lm).collect()}
    # doc 1 (common words) scores higher than doc 3 (rare words)
    assert scored[1] > scored[3]
    # exact integer contract: doc 2 = (logp(the) + logp(cat)) div 2,
    # `div` truncating toward zero (lp is negative)
    lp = model["the"][1] + model["cat"][1]
    assert scored[2] == -((-lp) // 2)


def test_surprisal_buckets_thirds_and_ties(spark):
    """Head/middle/tail split per group: exact thirds on distinct
    scores, tie rows straddling a boundary share the better bucket, and
    tiny groups degrade gracefully (1 row -> head)."""
    from marmaray_spark.operators.lm import surprisal_buckets

    rows = ([("en", i, -i * 100) for i in range(9)]          # distinct
            + [("de", 100 + i, -5000) for i in range(4)]     # all tied
            + [("fr", 200, -1)])                             # singleton
    df = spark.createDataFrame(rows, "lang string, doc_id long, "
                                     "lm_logp_milli long")
    out = {r["doc_id"]: r["ppl_bucket"]
           for r in surprisal_buckets(df, "lang").collect()}
    # en: 9 distinct scores -> exactly 3/3/3, best scores = head
    assert [out[i] for i in range(9)] == (["head"] * 3 + ["middle"] * 3
                                          + ["tail"] * 3)
    # de: every row tied -> higher=0 for all -> all head
    assert all(out[100 + i] == "head" for i in range(4))
    assert out[200] == "head"


def test_unigram_lm_vocab_trim_and_oov(spark):
    from marmaray_spark.operators.lm import lm_score, train_unigram_lm
    from marmaray_spark.operators.text import words

    docs = spark.createDataFrame(
        [(1, "a a a a b b c d")], ["id", "text"]).withColumn("w", words("text"))
    lm = train_unigram_lm(docs, "w", vocab_size=2)
    terms = {r["term"] for r in lm.collect()}
    assert terms == {"a", "b"}          # top-2 by count
    # c and d fall to the OOV penalty; score still covers all 8 tokens
    out = lm_score(docs, "id", "w", lm, oov_logp_milli=-9999).collect()[0]
    assert out["n_tokens"] == 8


def test_duplicated_window_stats(spark):
    from marmaray_spark.operators.dedup import duplicated_window_stats
    from marmaray_spark.operators.text import words

    docs = spark.createDataFrame([
        (1, "alpha beta gamma delta"),      # windows: abg, bgd'
        (2, "alpha beta gamma epsilon"),    # shares 'alpha beta gamma'
        (3, "zeta eta theta"),              # unique single window
        (4, "x y"),                         # shorter than window -> no row
    ], ["id", "text"]).withColumn("w", words("text"))
    got = {r["id"]: r for r in
           duplicated_window_stats(docs, "id", "w", window=3).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_windows"] == 2 and got[1]["dup_windows"] == 1
    assert got[2]["n_windows"] == 2 and got[2]["dup_windows"] == 1
    assert got[3]["n_windows"] == 1 and got[3]["dup_windows"] == 0
    assert got[1]["dup_bps"] == 5000 and got[3]["dup_bps"] == 0


def test_duplicated_window_counts_within_doc_repeats(spark):
    from marmaray_spark.operators.dedup import duplicated_window_stats
    from marmaray_spark.operators.text import words

    docs = spark.createDataFrame(
        [(1, "a b a b a b")], ["id", "text"]).withColumn("w", words("text"))
    got = duplicated_window_stats(docs, "id", "w", window=2).collect()[0]
    # windows: ab ba ab ba ab -> every position's text occurs > once
    assert got["n_windows"] == 5 and got["dup_windows"] == 5
    assert got["dup_bps"] == 10000


def test_normalize_text_unifies_render_identical_variants(spark):
    """Full-width forms, ligatures, composed/decomposed accents, and
    case collapse to one digest after normalization — the pre-dedup
    contract; other columns and NULLs pass through."""
    from marmaray_spark.operators.dedup import content_digest
    from marmaray_spark.operators.text import normalize_text

    rows = [
        (1, "caf\u00e9 office", 7),          # composed e-acute
        (2, "cafe\u0301 OFFICE", 7),         # decomposed e + combining mark
        (3, "\uff43\uff41\uff46\u00e9 o\ufb03ce", 7),  # full-width + ffi ligature
        (4, None, 9),
    ]
    df = spark.createDataFrame(rows, "id long, text string, keep int")
    out = normalize_text(df, "text")
    got = {r["id"]: r for r in
           out.withColumn("d", content_digest("text")).collect()}
    assert got[1]["text"] == got[2]["text"] == got[3]["text"] \
        == "caf\u00e9 office"
    assert got[1]["d"] == got[2]["d"] == got[3]["d"]
    assert got[4]["text"] is None and got[4]["keep"] == 9

    stripped = {r["id"]: r["text"] for r in
                normalize_text(df, "text", strip_accents=True).collect()}
    assert stripped[1] == "cafe office"

    import pytest as _pt
    with _pt.raises(ValueError):
        normalize_text(df, "text", form="NFX")
    with _pt.raises(ValueError):
        normalize_text(df, "nope")


def test_cluster_quota_sample_matches_bruteforce(spark):
    """Exact per-cell quota via the histogram cutoff == the per-cell
    (md5, id)-order top-quota a global sort would pick; small cells
    keep everything; quota 0 keeps nothing."""
    import hashlib

    import numpy as np

    from marmaray_spark.operators.similarity import (QUANT_SCALE,
                                                     cluster_quota_sample,
                                                     ivf_cells, quantize)

    rng = np.random.default_rng(17)
    rows = [(int(i), [float(x) for x in rng.normal(size=8)])
            for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[int(round(float(x) * QUANT_SCALE)) for x in rng.normal(size=8)]
             for _ in range(3)]

    got = {r["vec_id"]: (r["cell"], r["keep"]) for r in
           cluster_quota_sample(df, cents, quota=20).collect()}
    assert len(got) == 300

    # brute force: same cell assignment, md5-order top-20 per cell
    base = df.select("vec_id", quantize("embedding").alias("__v"))
    cells = {r["vec_id"]: r["cell"] for r in
             ivf_cells(base, cents, [0, 1, 2], "vec_id", "__v").collect()}
    by_cell = {}
    for vid, cell in cells.items():
        key = (hashlib.md5(f"cq0:{vid}".encode()).hexdigest(), vid)
        by_cell.setdefault(cell, []).append((key, vid))
    want_keep = set()
    for cell, members in by_cell.items():
        for _, vid in sorted(members)[:20]:
            want_keep.add(vid)

    assert {v for v, (_, k) in got.items() if k} == want_keep
    assert all(got[v][0] == cells[v] for v in cells)
    # per-cell count == min(cell size, quota)
    from collections import Counter
    kept_per_cell = Counter(got[v][0] for v in got if got[v][1])
    for cell, members in by_cell.items():
        assert kept_per_cell[cell] == min(len(members), 20)

    zero = cluster_quota_sample(df, cents, quota=0).filter("keep").count()
    assert zero == 0


def test_compression_signals_orders_boilerplate_below_prose(spark):
    import zlib

    from marmaray_spark.operators.text import compression_signals

    rep = "spam ham " * 200
    prose = ("the committee reviewed seventeen distinct proposals before "
             "adjourning; none addressed the estuary's silt problem, and "
             "four contradicted the previous year's findings outright.")
    docs = spark.createDataFrame(
        [(1, rep), (2, prose), (3, "")], ["id", "text"])
    got = {r["id"]: r for r in
           compression_signals(docs, "id", "text").collect()}
    assert got[1]["n_bytes"] == len(rep.encode())
    assert got[1]["zlib_bytes"] == len(zlib.compress(rep.encode(), 6))
    # mass repetition compresses far below natural prose
    assert got[1]["ratio_bps"] < 1000 < got[2]["ratio_bps"]
    assert got[3]["ratio_bps"] == 10000 and got[3]["n_bytes"] == 0


def test_compression_signals_keeps_id_column_type(spark):
    """Regression: the output schema hardcoded `{id_col} long`, so a
    string doc id (a legal YAML corpus.id_col choice) died mid-run in
    Arrow conversion. The id column must pass through with its own
    type."""
    from marmaray_spark.operators.text import compression_signals

    docs = spark.createDataFrame(
        [("doc-a", "alpha beta gamma alpha beta gamma"), ("doc-b", "")],
        "id string, text string")
    out = compression_signals(docs, "id", "text")
    assert out.schema["id"].dataType.simpleString() == "string"
    got = {r["id"]: r["ratio_bps"] for r in out.collect()}
    assert set(got) == {"doc-a", "doc-b"} and got["doc-b"] == 10000


def _brute_remove_spans(corpus: dict, window: int) -> dict:
    """Per-token-coverage reference: position p is removed iff some
    start s with s <= p <= s+window-1 begins a globally-duplicated
    window."""
    from collections import Counter
    wins = Counter()
    for toks in corpus.values():
        for i in range(len(toks) - window + 1):
            wins[" ".join(toks[i:i + window])] += 1
    out = {}
    for doc, toks in corpus.items():
        covered = set()
        for i in range(len(toks) - window + 1):
            if wins[" ".join(toks[i:i + window])] > 1:
                covered.update(range(i, i + window))
        out[doc] = " ".join(t for p, t in enumerate(toks)
                            if p not in covered)
    return out


def test_remove_duplicate_spans_excises_shared_run(spark):
    from marmaray_spark.operators.dedup import remove_duplicate_spans
    from marmaray_spark.operators.text import words

    docs = spark.createDataFrame([
        (1, "intro one two three four five outro"),   # shares the run
        (2, "start one two three four five end"),     # shares the run
        (3, "totally unrelated content here"),        # untouched
        (4, "x y"),                                   # shorter than window
    ], ["id", "text"]).withColumn("w", words("text"))
    got = {r["id"]: r for r in
           remove_duplicate_spans(docs, "id", "w", window=3).collect()}
    assert got[1]["cleaned_text"] == "intro outro"
    assert got[2]["cleaned_text"] == "start end"
    assert got[3]["cleaned_text"] == "totally unrelated content here"
    assert got[4]["cleaned_text"] == "x y"            # passthrough
    assert got[1]["n_tokens"] == 7 and got[1]["kept_tokens"] == 2
    assert got[3]["n_dup_starts"] == 0 and got[4]["n_dup_starts"] == 0


def test_remove_duplicate_spans_whole_dup_doc_empties(spark):
    from marmaray_spark.operators.dedup import remove_duplicate_spans
    from marmaray_spark.operators.text import words

    docs = spark.createDataFrame([
        (1, "a b c d e"), (2, "a b c d e"),
    ], ["id", "text"]).withColumn("w", words("text"))
    got = {r["id"]: r for r in
           remove_duplicate_spans(docs, "id", "w", window=3).collect()}
    assert got[1]["cleaned_text"] == "" and got[2]["cleaned_text"] == ""
    assert got[1]["kept_tokens"] == 0


def test_remove_duplicate_spans_hypothesis_parity(spark):
    """Hypothesis-driven corpora (tiny vocab forces collisions; shrinks
    to minimal counterexamples) against the per-token-coverage
    reference — one Spark job per example is too slow, so examples are
    BATCHED: hypothesis generates a corpus list, one job checks it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from marmaray_spark.operators.dedup import remove_duplicate_spans
    from marmaray_spark.operators.text import words

    corpus_st = st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]),
                 min_size=0, max_size=14),
        min_size=1, max_size=8)

    @settings(max_examples=15, deadline=None)
    @given(toks=corpus_st)
    def run(toks):
        corpus = {i: t for i, t in enumerate(toks)}
        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in corpus.items()],
            "id long, text string").withColumn("w", words("text"))
        got = {r["id"]: r["cleaned_text"] for r in
               remove_duplicate_spans(df, "id", "w", window=2).collect()}
        # words() drops empty docs to [] -> cleaned ''
        want = _brute_remove_spans(
            {i: ([] if not " ".join(t).strip() else
                 " ".join(t).split()) for i, t in corpus.items()}, 2)
        assert got == want

    run()


def test_winnow_fingerprints_hypothesis_parity(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from test_fingerprint import _brute_fp, K, W
    from marmaray_spark.operators.fingerprint import winnow_fingerprints

    @settings(max_examples=15, deadline=None)
    @given(texts=st.lists(st.text(alphabet="ab ", max_size=30),
                          min_size=1, max_size=6))
    def run(texts):
        df = spark.createDataFrame(list(enumerate(texts)),
                                   "id long, text string")
        got = {r["id"]: list(r["fingerprints"]) for r in
               winnow_fingerprints(df, "id", "text", K, W).collect()}
        assert got == {i: _brute_fp(t) for i, t in enumerate(texts)}

    run()


def test_remove_duplicate_paragraphs_first_occurrence_wins(spark):
    from marmaray_spark.operators.dedup import remove_duplicate_paragraphs

    docs = spark.createDataFrame([
        (1, ["header", "unique one", "footer"]),
        (2, ["header", "unique two", "footer"]),   # header/footer removed
        (3, ["header", "header"]),                 # fully duplicated
        (4, []),                                   # empty doc
    ], "id long, paras array<string>")
    got = {r["id"]: r for r in
           remove_duplicate_paragraphs(docs, "id", "paras").collect()}
    assert got[1]["cleaned_text"] == "header\nunique one\nfooter"
    assert got[2]["cleaned_text"] == "unique two"
    assert got[3]["cleaned_text"] == ""            # doc 1 owns 'header'
    assert got[4]["cleaned_text"] == "" and got[4]["n_paras"] == 0
    assert (got[2]["n_paras"], got[2]["kept_paras"]) == (3, 1)


def test_remove_duplicate_paragraphs_within_doc_repeat(spark):
    """A paragraph repeated INSIDE one doc keeps only its first
    position; order is preserved in the rebuilt text."""
    from marmaray_spark.operators.dedup import remove_duplicate_paragraphs

    docs = spark.createDataFrame(
        [(7, ["a", "b", "a", "c", "b", "d"])], "id long, paras array<string>")
    got = remove_duplicate_paragraphs(docs, "id", "paras").collect()[0]
    assert got["cleaned_text"] == "a\nb\nc\nd"
    assert got["n_paras"] == 6 and got["kept_paras"] == 4


def test_remove_duplicate_paragraphs_matches_bruteforce(spark):
    import random

    from marmaray_spark.operators.dedup import remove_duplicate_paragraphs

    rng = random.Random(41)
    vocab = [f"p{i}" for i in range(9)]
    corpus = {d: [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
              for d in range(30)}
    docs = spark.createDataFrame(
        [(d, p) for d, p in corpus.items()], "id long, paras array<string>")
    first = {}
    for d in sorted(corpus):
        for i, p in enumerate(corpus[d]):
            first.setdefault(p, (d, i))
    want = {d: "\n".join(p for i, p in enumerate(ps)
                         if first[p] == (d, i))
            for d, ps in corpus.items()}
    got = {r["id"]: r["cleaned_text"] for r in
           remove_duplicate_paragraphs(docs, "id", "paras").collect()}
    assert got == want


def test_remove_duplicate_paragraphs_64bit_ids_no_overflow(spark):
    """Regression: the original first-occurrence key packed as
    id * 2^20 + pos, which silently overflows int64 for 64-bit hashed
    doc ids (xxhash64 output is the COMMON id in dedup pipelines) and
    then keeps a non-first occurrence. The struct-min key must pick the
    true lexicographic (id, pos) minimum at any magnitude."""
    from marmaray_spark.operators.dedup import remove_duplicate_paragraphs

    big = 1 << 60          # old packing: big * 2^20 wraps negative
    docs = spark.createDataFrame([
        (big + 7, ["shared para", "only in huge doc"]),
        (big + 1, ["shared para", "only in other huge doc"]),
        (3, ["small doc first", "shared para"]),
    ], "id long, paras array<string>")
    got = {r["id"]: r["cleaned_text"] for r in
           remove_duplicate_paragraphs(docs, "id", "paras").collect()}
    # true first occurrence of "shared para" is (3, pos 2)
    assert got[3] == "small doc first\nshared para"
    assert got[big + 1] == "only in other huge doc"
    assert got[big + 7] == "only in huge doc"


def test_remove_duplicate_paragraphs_string_ids(spark):
    """The struct-min key imposes no numeric-id requirement; string ids
    order lexicographically (ties on the paragraph go to the smaller
    id, then smaller position — same contract, different domain)."""
    from marmaray_spark.operators.dedup import remove_duplicate_paragraphs

    docs = spark.createDataFrame([
        ("b-doc", ["common", "b only"]),
        ("a-doc", ["a only", "common"]),
    ], "id string, paras array<string>")
    got = {r["id"]: r["cleaned_text"] for r in
           remove_duplicate_paragraphs(docs, "id", "paras").collect()}
    assert got["a-doc"] == "a only\ncommon"
    assert got["b-doc"] == "b only"


def test_remove_duplicate_spans_matches_bruteforce(spark):
    """Randomized parity vs the per-token-coverage reference, including
    overlapping and adjacent spans, within-doc repeats, and the
    hash_exchange variant."""
    import random

    from marmaray_spark.operators.dedup import remove_duplicate_spans
    from marmaray_spark.operators.text import words

    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(12)]       # small vocab -> collisions
    corpus = {d: [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
              for d in range(40)}
    docs = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in corpus.items()],
        ["id", "text"]).withColumn("w", words("text"))
    want = _brute_remove_spans(corpus, window=3)
    for hx in (False, True):
        got = {r["id"]: r["cleaned_text"] for r in
               remove_duplicate_spans(docs, "id", "w", window=3,
                                      hash_exchange=hx).collect()}
        assert got == want, f"hash_exchange={hx}"


# ---------------------------------------------------------------------------
# BPE tokenizer training (r6)
# ---------------------------------------------------------------------------

def test_bpe_train_learns_frequent_pairs():
    from marmaray_spark.operators.bpe import END, train_bpe

    # 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3 — the Sennrich
    # worked example shape: 'es'/'est' merges dominate
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(wf, 4)
    assert merges[0] == ("e", "s")          # 9 occurrences
    assert merges[1] == ("es", "t")         # 9
    assert merges[2] == ("est", END)        # 9
    assert ("l", "o") in merges             # 7


def test_bpe_segment_applies_merges_greedily():
    from marmaray_spark.operators.bpe import END, bpe_segment, train_bpe

    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(wf, 8)
    got = bpe_segment("lowest", merges)
    # 'lowest' was never seen whole, but learned subwords cover it
    assert "".join(got) == "lowest" + END
    assert "est" + END in got or "est" in got
    # unseen characters stay as singletons
    assert bpe_segment("zq", merges)[-1] == END


def test_bpe_determinism_ties_break_lexicographically():
    from marmaray_spark.operators.bpe import train_bpe

    # 'ab' and 'cd' both appear twice; ('a','b') < ('c','d')
    merges = train_bpe([("ab", 2), ("cd", 2)], 1)
    assert merges[0] == ("a", "b")


def test_bpe_end_to_end_spark(spark):
    from marmaray_spark.operators.bpe import (tokenize_bpe, train_bpe,
                                              word_frequencies)
    from marmaray_spark.operators.text import words

    docs = spark.createDataFrame(
        [(1, "new newest newest lowest low low"),
         (2, "wide widest newest low")],
        ["id", "text"]).withColumn("w", words("text"))
    wf = word_frequencies(docs, "w", max_words=100)
    assert wf[0] == ("low", 4) or wf[0][1] >= wf[-1][1]
    merges = train_bpe(wf, 6)
    out = {r["id"]: r for r in
           tokenize_bpe(docs, "id", "w", merges).collect()}
    # every document reconstructs exactly from its tokens
    src = {1: "new newest newest lowest low low", 2: "wide widest newest low"}
    from marmaray_spark.operators.bpe import END
    for i, row in out.items():
        rebuilt = "".join(row["tokens"]).replace(END, " ").strip()
        assert rebuilt == src[i]
        assert row["n_bpe_tokens"] == len(row["tokens"])


def test_bpe_tokenizer_aware_packing_and_sharding(spark):
    """The training-output path composes on REAL tokenizer counts: train
    BPE on the corpus, tokenize (n_bpe_tokens), then pack sequences and
    assign token-budget shards on the BPE counts — budgets are respected
    in tokenizer tokens, not whitespace tokens (the number a trainer
    actually consumes)."""
    import random

    from marmaray_spark.operators.bpe import (tokenize_bpe, train_bpe,
                                              word_frequencies)
    from marmaray_spark.operators.packing import pack_sequences
    from marmaray_spark.operators.shard import shard_assignments
    from marmaray_spark.operators.text import words

    rng = random.Random(11)
    vocab = ["newest", "lowest", "wide", "widening", "renewal", "slow"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(5, 25))))
            for i in range(40)]
    docs = spark.createDataFrame(rows, ["id", "text"]) \
        .withColumn("w", words("text"))
    merges = train_bpe(word_frequencies(docs, "w", max_words=500), 12)
    toked = tokenize_bpe(docs, "id", "w", merges)
    counts = {r["id"]: r["n_bpe_tokens"] for r in toked.collect()}
    assert any(counts[i] > len(rows[i][1].split()) for i, _ in rows)

    packed = {r["id"]: (r["bucket"], r["bin_id"]) for r in pack_sequences(
        toked, id_col="id", tokens_col="n_bpe_tokens",
        seq_len=64, n_buckets=2).collect()}
    cursors = {}
    for i, _text in rows:                 # the python packing model
        b = i % 2
        start = cursors.get(b, 0)
        assert packed[i] == (b, start // 64), i
        cursors[b] = start + counts[i]

    shards = shard_assignments(toked, "id", "n_bpe_tokens",
                               budget_tokens=300, salt="bp0")
    per_shard: dict = {}
    for r in shards.collect():
        per_shard.setdefault(r["shard"], 0)
        per_shard[r["shard"]] += counts[r["id"]]
    # every shard respects the BPE budget up to one straddling doc
    assert all(tot < 300 + max(counts.values())
               for tot in per_shard.values())
    assert len(per_shard) == (sum(counts.values()) // 300) + 1


# ---------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic deduplication (r6)
# ---------------------------------------------------------------------------

def _unit(v):
    import numpy as np
    a = np.asarray(v, dtype=float)
    return (a / np.linalg.norm(a)).tolist()


def test_semantic_dedup_keeps_one_per_near_dup_group(spark):
    from marmaray_spark.operators.similarity import semantic_dedup

    # two clusters on orthogonal axes; ids 1/2 are near-identical, 3 is
    # distinct in the same cluster, 10/11 near-identical in the other
    rows = [
        (1, _unit([1.0, 0.02, 0.0, 0.0])),
        (2, _unit([1.0, 0.03, 0.0, 0.0])),      # ~dup of 1
        (3, _unit([0.8, 0.6, 0.0, 0.0])),       # same cell, not a dup
        (10, _unit([0.0, 0.0, 1.0, 0.01])),
        (11, _unit([0.0, 0.0, 1.0, 0.02])),     # ~dup of 10
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1000, 0, 0, 0], [0, 0, 1000, 0]]
    got = {r["vec_id"]: r for r in
           semantic_dedup(df, cents, threshold_q=990_000).collect()}
    assert got[1]["keeper_id"] == 1 and got[1]["is_keeper"]
    assert got[2]["keeper_id"] == 1 and not got[2]["is_keeper"]
    assert got[3]["keeper_id"] == 3 and got[3]["is_keeper"]
    assert got[10]["keeper_id"] == 10 and got[11]["keeper_id"] == 10
    # cluster assignment separated the two axes
    assert got[1]["cell"] != got[10]["cell"]


def test_semantic_dedup_transitive_chains_share_keeper(spark):
    from marmaray_spark.operators.similarity import semantic_dedup

    # a ~ b, b ~ c but a !~ c: SemDeDup components are transitive
    rows = [(1, _unit([1.0, 0.00, 0, 0])),
            (2, _unit([1.0, 0.045, 0, 0])),
            (3, _unit([1.0, 0.09, 0, 0]))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r["keeper_id"] for r in
           semantic_dedup(df, [[1000, 0, 0, 0]],
                          threshold_q=998_000).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_semantic_dedup_on_real_embeddings_deterministic(spark, embeddings):
    from marmaray_spark.operators.similarity import (semantic_dedup,
                                                     train_ivf_centroids)

    corpus = embeddings.limit(300)
    cents = train_ivf_centroids(corpus, 4)
    a = sorted(map(tuple, semantic_dedup(corpus, cents, 900_000).collect()))
    b = sorted(map(tuple, semantic_dedup(corpus, cents, 900_000).collect()))
    assert a == b and len(a) == corpus.count()
    # every keeper_id points at a row marked is_keeper
    keepers = {t[0] for t in a if t[3]}
    assert all(t[2] in keepers for t in a)


def test_semantic_dedup_max_cluster_caps_cell_width(spark):
    from marmaray_spark.operators.similarity import semantic_dedup

    rows = [(i, _unit([1.0, i * 1e-6, 0, 0])) for i in range(64)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(df, [[1000, 0, 0, 0]], threshold_q=999_000,
                         max_cluster=8)
    cells = out.groupBy("cell").count().collect()
    # hash-split: no sub-cell wider than the original single cell
    assert len(cells) > 1
    assert out.count() == 64


def test_multimodal_corrupt_payloads_fork_not_crash(spark):
    """Decode-or-error across ALL multimodal kernels: a corrupt payload
    behind a valid magic (truncated BMP/PNG/WAV/GIF) marks its own row
    instead of killing the Spark task — the engine-wide per-record
    contract (AbstractDataConverter.java:102-171 semantics)."""
    from marmaray_spark.operators.multimodal import (extract_audio_features,
                                                     extract_image_features,
                                                     resize_images,
                                                     sample_frames)

    img_rows = [(1, "image", b"BM" + b"\x00" * 20),       # truncated BMP
                (2, "image", b"\x89PNG\r\n\x1a\n" + b"junk"),
                (3, "image", b"plain stub bytes here")]   # stub path: fine
    img = spark.createDataFrame(img_rows, ["media_id", "media_type", "payload"])
    feats = {r["media_id"]: r for r in extract_image_features(img).collect()}
    assert not feats[1]["ok"] and feats[1]["width"] == -1
    assert not feats[2]["ok"]
    assert feats[3]["ok"] and feats[3]["width"] > 0

    rs = {r["media_id"]: r for r in resize_images(img, 32, 32).collect()}
    assert not rs[1]["ok"] and bytes(rs[1]["payload"]) == img_rows[0][2]
    assert rs[3]["ok"]

    aud = spark.createDataFrame(
        [(1, "audio", b"RIFF\x00\x00\x00\x00WAVEjunk"),
         (2, "audio", b"fLaCbroken"),
         (3, "audio", b"stub audio payload")],
        ["media_id", "media_type", "payload"])
    af = {r["media_id"]: r for r in extract_audio_features(aud).collect()}
    assert not af[1]["ok"] and not af[2]["ok"] and af[3]["ok"]

    vid = spark.createDataFrame(
        [(1, "video", b"RIFF\x10\x00\x00\x00AVI LIST"),   # truncated AVI
         (2, "video", b"GIF89a\x01"),                     # truncated GIF
         (3, "video", b"stub video bytes " * 8)],
        ["media_id", "media_type", "payload"])
    fr = sample_frames(vid, every_n_bytes=64).collect()
    by_id = {}
    for r in fr:
        by_id.setdefault(r["media_id"], []).append(r)
    # corrupt containers yield the single frame_idx=-1 marker row
    for mid in (1, 2):
        if mid in by_id:
            assert [r["frame_idx"] for r in by_id[mid]] == [-1]
    assert all(r["frame_idx"] >= 0 for r in by_id[3])


def test_semantic_dedup_arrow_and_expression_paths_agree(spark, monkeypatch):
    """Above the literal-plan bound, cell assignment switches to the
    Arrow matmul kernel — forced here by shrinking the bound — and the
    dedup output must be bit-identical to the expression path."""
    import marmaray_spark.operators.similarity as sim

    rows = [(i, _unit([1.0 + (i % 7) * 0.01, (i % 3) * 0.2,
                       (i % 5) * 0.1, 0.3])) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1000, 0, 0, 0], [0, 1000, 0, 0], [0, 0, 1000, 0]]
    expr_path = sorted(map(tuple,
                           sim.semantic_dedup(df, cents, 980_000).collect()))
    monkeypatch.setattr(sim, "_IVF_EXPR_MAX_LITERALS", 1)
    arrow_path = sorted(map(tuple,
                            sim.semantic_dedup(df, cents, 980_000).collect()))
    assert arrow_path == expr_path


def test_term_drift_kl_contributions(spark):
    """Corpus drift (operators/drift.py): integer-quantized per-term KL
    contributions with add-one smoothing. Exact values pinned from the
    closed-form (single-engine determinism; the cross-engine oracle
    covers the integer count core — see language_report's docstring for
    why ln() can't be hash-compared across engines)."""
    import math

    from marmaray_spark.operators.drift import term_drift
    from marmaray_spark.operators.text import words

    a = spark.createDataFrame(
        [(1, "cat cat cat dog")], ["id", "text"]).withColumn("w", words("text"))
    b = spark.createDataFrame(
        [(2, "cat dog dog bird")], ["id", "text"]).withColumn("w", words("text"))
    got = {r["term"]: r for r in term_drift(a, b, "w").collect()}
    assert set(got) == {"cat", "dog", "bird"}
    assert (got["cat"]["cnt_a"], got["cat"]["cnt_b"]) == (3, 1)
    assert (got["bird"]["cnt_a"], got["bird"]["cnt_b"]) == (0, 1)

    def contrib(ca, cb, tot_a=4, tot_b=4, v=3):
        pa = (ca + 1) / (tot_a + v)
        pb = (cb + 1) / (tot_b + v)
        return round(pa * math.log(pa / pb) * 1e6)

    for t in got:
        assert got[t]["contrib_micro"] == contrib(got[t]["cnt_a"],
                                                  got[t]["cnt_b"]), t
    # over-represented in A -> positive; missing from A -> negative
    assert got["cat"]["contrib_micro"] > 0 > got["bird"]["contrib_micro"]


def test_term_drift_identical_snapshots_zero(spark):
    from marmaray_spark.operators.drift import term_drift
    from marmaray_spark.operators.text import words

    d = spark.createDataFrame(
        [(1, "x y z x")], ["id", "text"]).withColumn("w", words("text"))
    out = term_drift(d, d, "w").collect()
    assert all(r["contrib_micro"] == 0 for r in out)


# ---------------------------------------------------------------- splits

def test_leakage_safe_splits_component_constant(spark):
    """Every member of a near-dup component lands in the SAME split —
    the whole point of hashing the component, not the doc (a doc-keyed
    split scatters multi-member dup groups across boundaries, leaking
    near-copies of val docs into train)."""
    from marmaray_spark.operators.dedup import leakage_safe_splits

    # 600 docs in 200 components of 3 members each
    df = spark.range(600).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 200).alias("component"))
    out = leakage_safe_splits(df, "component").collect()
    by_comp: dict = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values())
    # deterministic + partitioning-proof
    again = {r["doc_id"]: r["split"] for r in leakage_safe_splits(
        df.repartition(7), "component").collect()}
    assert again == {r["doc_id"]: r["split"] for r in out}
    # with 200 components at 5%/5% the minority splits are populated
    splits = {r["split"] for r in out}
    assert splits == {"train", "val", "test"}
    # fractions land near the bps (16-bit hash, 200 draws: loose bounds)
    n_val = sum(1 for r in out if r["split"] == "val")
    assert 0 < n_val < 600 * 0.2

    # a DOC-keyed split on the same data demonstrably breaks groups —
    # the failure mode this operator exists to prevent
    naive = {r["doc_id"]: r["split"] for r in leakage_safe_splits(
        df, "doc_id").collect()}
    broken = sum(
        1 for comp in range(200)
        if len({naive[d] for d in range(600) if d % 200 == comp}) > 1)
    assert broken > 0


def test_leakage_safe_splits_bps_validation_and_edges(spark):
    from marmaray_spark.operators.dedup import leakage_safe_splits

    df = spark.range(50).select(F.col("id").alias("doc_id"),
                                F.col("id").alias("component"))
    # val_bps=0 => nothing lands in val
    out = leakage_safe_splits(df, "component", val_bps=0,
                              test_bps=2000).collect()
    assert {r["split"] for r in out} <= {"train", "test"}
    with pytest.raises(ValueError):
        leakage_safe_splits(df, "component", val_bps=6000, test_bps=6000)


# ---------------------------------------------------------------------------
# count-min sketch (operators/cms.py)
# ---------------------------------------------------------------------------

def _cms_cell_mirror(term: str, row: int, width: int) -> int:
    import hashlib
    h = hashlib.md5(f"cms{row}:{term}".encode()).hexdigest()
    return int(h[:8], 16) % width


def test_cms_never_underestimates_and_matches_mirror(spark):
    from marmaray_spark.operators.cms import cms_build, cms_lookup

    rows = [(f"t{i % 23}",) for i in range(500)] + [("rare",)] * 3
    df = spark.createDataFrame(rows, "t string")
    exact = {}
    for (t,) in rows:
        exact[t] = exact.get(t, 0) + 1
    sketch = cms_build(df, "t", depth=4, width=64)  # narrow => collisions
    # the sketch itself matches a serial mirror cell-for-cell
    mirror_cells = {}
    for t, c in exact.items():
        for j in range(4):
            key = (j, _cms_cell_mirror(t, j, 64))
            mirror_cells[key] = mirror_cells.get(key, 0) + c
    got_cells = {(r["row"], r["cell"]): r["cnt"] for r in sketch.collect()}
    assert got_cells == mirror_cells
    cand = spark.createDataFrame([(t,) for t in exact], "t string")
    est = {r["t"]: r["cms_est"]
           for r in cms_lookup(sketch, cand, "t", depth=4, width=64)
           .collect()}
    for t, c in exact.items():
        assert est[t] >= c, (t, est[t], c)
        assert est[t] == min(got_cells[(j, _cms_cell_mirror(t, j, 64))]
                             for j in range(4))


def test_cms_merge_equals_build_on_union(spark):
    from marmaray_spark.operators.cms import cms_build, cms_merge

    a = spark.createDataFrame([(f"w{i % 7}",) for i in range(80)],
                              "t string")
    b = spark.createDataFrame([(f"w{i % 11}",) for i in range(90)],
                              "t string")
    merged = {(r["row"], r["cell"]): r["cnt"]
              for r in cms_merge(cms_build(a, "t"), cms_build(b, "t"))
              .collect()}
    union = {(r["row"], r["cell"]): r["cnt"]
             for r in cms_build(a.unionByName(b), "t").collect()}
    assert merged == union


def test_cms_unseen_term_estimates_zero_with_headroom(spark):
    from marmaray_spark.operators.cms import cms_build, cms_lookup

    df = spark.createDataFrame([("alpha",), ("beta",)], "t string")
    sketch = cms_build(df, "t", depth=4, width=1024)
    cand = spark.createDataFrame([("never-seen-term-xyz",)], "t string")
    est = cms_lookup(sketch, cand, "t", depth=4, width=1024).collect()
    # 2 terms in 4x1024 cells: all 4 probed cells of a foreign term
    # colliding is (2/1024)^4-improbable AND deterministic — pinned
    assert est[0]["cms_est"] == 0


# ---------------------------------------------------------------------------
# collocation lift (operators/text.py collocation_lift)
# ---------------------------------------------------------------------------

def test_collocation_lift_matches_bruteforce(spark):
    from marmaray_spark.operators.text import collocation_lift

    texts = [
        "new york is a big city",
        "new york has new ideas and new york wins",
        "the city is big and the city is loud",
        "big city big city big city",
        "  spaced   out  tokens new york  ",
    ]
    df = (spark.createDataFrame([(t,) for t in texts], "text string")
          .select(F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                  .alias("w")))
    got = [(r["bg"], r["c_ab"], r["lift_x1000"])
           for r in collocation_lift(df, "w", min_count=2, top_k=5)
           .collect()]

    toks, bgs = [], []
    for t in texts:
        ws = [x for x in t.strip().lower().split() if x]
        toks += ws
        bgs += [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    uni = {t: toks.count(t) for t in set(toks)}
    cab = {b: bgs.count(b) for b in set(bgs)}
    n = len(toks)
    want = sorted(
        ((bg, c, (c * n * 1000) // (uni[a] * uni[b]))
         for bg, c in cab.items() if c >= 2
         for a, b in [bg.split(" ")]),
        key=lambda r: (-r[2], -r[1], r[0]))[:5]
    assert got == want
    # the signature phrase is found and ranks by lift, not raw count
    assert any(bg == "new york" for bg, _, _ in got)


# ---------------------------------------------------------------------------
# maintained term sketch (operators/cms.py maintain_term_sketch): the
# linear maintainer — cell increments/decrements keep the sketch EXACTLY
# cms_build(current corpus) across inserts, updates, and overwrite-drops,
# with no base rescan
# ---------------------------------------------------------------------------

def _cms_docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _cms_full(base_df):
    from marmaray_spark.operators.cms import cms_build
    # NB: F.split takes the regex verbatim; an expr() string literal
    # would eat the backslash ('\s+' parses to 's+')
    toks = (base_df.select(F.explode(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t"))
        .filter(F.col("t") != ""))
    return {(r["row"], r["cell"]): r["cnt"]
            for r in cms_build(toks, "t", depth=4, width=64).collect()}


def _cms_cells(sketch):
    return {(r["row"], r["cell"]): r["cnt"]
            for r in sketch.read().collect() if r["cnt"] != 0}


def test_maintained_sketch_tracks_insert_update_and_overwrite(
        spark, tmp_path):
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.cms import maintain_term_sketch
    from marmaray_spark.sinks.table import TableSink, WriteOp

    base = TableSink(spark, tmp_path / "base", "doc_id")
    sketch = TableSink(spark, tmp_path / "sk", "cell_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))

    base.write(_cms_docs(spark, [(1, "alpha beta beta"),
                                 (2, "gamma delta")]), WriteOp.INSERT)
    assert maintain_term_sketch(base, sketch, md, depth=4, width=64) > 0
    assert _cms_cells(sketch) == _cms_full(base.read())

    # update doc 1 (old terms must decrement, new increment); add doc 3
    base.write(_cms_docs(spark, [(1, "epsilon zeta")]), WriteOp.UPSERT)
    base.write(_cms_docs(spark, [(3, "alpha alpha eta")]), WriteOp.INSERT)
    maintain_term_sketch(base, sketch, md, depth=4, width=64)
    assert _cms_cells(sketch) == _cms_full(base.read())

    # overwrite drops doc 2 entirely: its terms must leave the sketch
    keep = base.read().filter(F.col("doc_id") != 2) \
        .select("doc_id", "text")
    base.write(keep, WriteOp.INSERT_OVERWRITE)
    maintain_term_sketch(base, sketch, md, depth=4, width=64)
    assert _cms_cells(sketch) == _cms_full(base.read())
    # nothing new -> no-op
    assert maintain_term_sketch(base, sketch, md, depth=4, width=64) == 0


def test_maintained_sketch_crash_replay_does_not_double_count(
        spark, tmp_path):
    """The += maintainer's replay fence: sketch commit lands, the
    consumer checkpoint does NOT (crash between) — the next run must
    fast-forward past the stamped consumed_through commit instead of
    folding the same delta twice."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.cms import maintain_term_sketch
    from marmaray_spark.sinks.table import TableSink, WriteOp

    base = TableSink(spark, tmp_path / "base", "doc_id")
    sketch = TableSink(spark, tmp_path / "sk", "cell_key")
    md_dir = str(tmp_path / "md")

    class CrashyMd(FileSystemMetadataManager):
        def save_changes(self):
            raise RuntimeError("simulated crash before checkpoint")

    base.write(_cms_docs(spark, [(1, "alpha beta")]), WriteOp.INSERT)
    maintain_term_sketch(base, sketch,
                         FileSystemMetadataManager(md_dir),
                         depth=4, width=64)

    base.write(_cms_docs(spark, [(2, "beta gamma")]), WriteOp.INSERT)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated crash"):
        maintain_term_sketch(base, sketch, CrashyMd(md_dir),
                             depth=4, width=64)
    # sketch already holds batch 2; checkpoint says it doesn't
    assert _cms_cells(sketch) == _cms_full(base.read())

    # recovery run with a fresh manager: must NOT re-add batch 2
    maintain_term_sketch(base, sketch, FileSystemMetadataManager(md_dir),
                         depth=4, width=64)
    assert _cms_cells(sketch) == _cms_full(base.read())

    # and new work still flows after the fence
    base.write(_cms_docs(spark, [(3, "delta")]), WriteOp.INSERT)
    maintain_term_sketch(base, sketch, FileSystemMetadataManager(md_dir),
                         depth=4, width=64)
    assert _cms_cells(sketch) == _cms_full(base.read())


def test_maintained_sketch_vacuumed_preimage_leaves_checkpoint_clean(
        spark, tmp_path):
    """ADVICE r9 (medium): consume_changes advances the checkpoint in
    the SHARED in-memory manager before the vacuumed-pre-image check can
    raise; the raise must roll it back to the pre-drain value, or a
    later save_changes() by the caller (the work-unit loop's post-commit
    save) persists a checkpoint for commits whose deltas were never
    folded — and the sketch silently diverges forever after."""
    import shutil

    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.cms import maintain_term_sketch
    from marmaray_spark.sinks.table import TableSink, WriteOp

    base = TableSink(spark, tmp_path / "base", "doc_id")
    sketch = TableSink(spark, tmp_path / "sk", "cell_key")
    md_dir = str(tmp_path / "md")
    md = FileSystemMetadataManager(md_dir)

    base.write(_cms_docs(spark, [(1, "alpha beta")]), WriteOp.INSERT)
    maintain_term_sketch(base, sketch, md, depth=4, width=64)
    good = md.get("term_sketch.last_commit")

    # an upsert whose pre-image we then delete (simulated early vacuum)
    base.write(_cms_docs(spark, [(1, "gamma")]), WriteOp.UPSERT)
    for s in base.log.commits()[-1].removes:
        p = base.table_path / s
        shutil.rmtree(p) if p.is_dir() else p.unlink()

    with pytest.raises(FileNotFoundError, match="pre-image vacuumed"):
        maintain_term_sketch(base, sketch, md, depth=4, width=64)
    # the shared manager holds the PRE-drain checkpoint again...
    assert md.get("term_sketch.last_commit") == good
    # ...so a caller's save_changes() persists the clean value
    md.save_changes()
    assert FileSystemMetadataManager(md_dir).get(
        "term_sketch.last_commit") == good


def test_maintained_sketch_refuses_geometry_drift_and_probes(
        spark, tmp_path):
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.cms import (maintain_term_sketch,
                                              sketch_estimates)
    from marmaray_spark.sinks.table import TableSink, WriteOp

    base = TableSink(spark, tmp_path / "base", "doc_id")
    sketch = TableSink(spark, tmp_path / "sk", "cell_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    base.write(_cms_docs(spark, [(1, "alpha beta beta gamma")]),
               WriteOp.INSERT)
    maintain_term_sketch(base, sketch, md, depth=4, width=64)

    base.write(_cms_docs(spark, [(2, "x")]), WriteOp.INSERT)
    with pytest.raises(ValueError, match="refusing to fold"):
        maintain_term_sketch(base, sketch, md, depth=4, width=128)

    cand = spark.createDataFrame([("beta",), ("nope",)], "t string")
    est = {r["t"]: r["cms_est"] for r in
           sketch_estimates(sketch, cand, "t").collect()}
    assert est["beta"] >= 2 and est["nope"] == 0
    with pytest.raises(ValueError, match="probe width"):
        sketch_estimates(sketch, cand, "t", width=128)


def test_maintained_sketch_refuses_after_base_restore(spark, tmp_path):
    """A restore rolls base content back with NO change records — the
    linear maintainer cannot subtract what it cannot see, so it must
    refuse loudly instead of serving stale counts."""
    from marmaray_spark.metadata.manager import FileSystemMetadataManager
    from marmaray_spark.operators.cms import maintain_term_sketch
    from marmaray_spark.sinks.table import TableSink, WriteOp

    base = TableSink(spark, tmp_path / "base", "doc_id")
    sketch = TableSink(spark, tmp_path / "sk", "cell_key")
    md = FileSystemMetadataManager(str(tmp_path / "md"))
    base.write(_cms_docs(spark, [(1, "alpha")]), WriteOp.INSERT)
    first = base.log.commits()[-1].commit_id
    maintain_term_sketch(base, sketch, md, depth=4, width=64)
    base.write(_cms_docs(spark, [(2, "beta")]), WriteOp.INSERT)
    maintain_term_sketch(base, sketch, md, depth=4, width=64)
    base.restore(first)
    with pytest.raises(ValueError, match="restored"):
        maintain_term_sketch(base, sketch, md, depth=4, width=64)
