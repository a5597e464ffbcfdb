"""Byte-pair-encoding tokenizer training and application (Sennrich et
al. 2016, the subword staple of LLM data pipelines). The reference
(uber/marmaray) has no text surface; this belongs to the
beyond-reference LLM-data-pipeline tier.

Scale design — the shape real tokenizer trainers use (HuggingFace
``tokenizers``, SentencePiece): the CORPUS is only ever touched by one
distributed word-count (explode + map-side-combined groupBy), which
collapses 100 TB of text into a ≤``max_words`` word-frequency dictionary.
The merge loop then runs on that bounded dictionary driver-side (pair
counts over a 100k-entry dict are microseconds per iteration), and the
learned merge list — a few hundred string pairs — broadcasts back into an
Arrow-batched ``mapInPandas`` tokenizer. Corpus passes: exactly one for
training, one for tokenizing. No per-iteration corpus scans, no driver
materialization of anything unbounded.

Determinism: ties in pair frequency break lexicographically, so the same
corpus always learns the same merges on any cluster layout.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"        # end-of-word sentinel (the classic BPE formulation)


def word_frequencies(docs: DataFrame, words_col: str,
                     max_words: int = 100_000) -> list[tuple[str, int]]:
    """The ONE distributed pass: corpus -> bounded (word, count) dict,
    most frequent first (ties by word so the dict is deterministic)."""
    rows = (docs.select(F.explode(F.col(words_col)).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "word")       # TakeOrdered
            .limit(max_words)
            .collect())
    return [(r["word"], r["cnt"]) for r in rows]


def train_bpe(word_freqs: list[tuple[str, int]],
              num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a word-frequency dict
    (driver-side: the dict is bounded, the corpus is not)."""
    vocab = [([*w] + [END], c) for w, c in word_freqs]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, ties broken lexicographically -> deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab = []
        for syms, c in vocab:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, c))
        vocab = new_vocab
    return merges


def bpe_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges to one word (greedy by merge priority)."""
    syms = [*word] + [END]
    rank = {m: i for i, m in enumerate(merges)}
    while len(syms) > 1:
        ranked = [(rank.get((a, b)), i)
                  for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        ranked = [(r, i) for r, i in ranked if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
    return syms


def tokenize_bpe(docs: DataFrame, id_col: str, words_col: str,
                 merges: list[tuple[str, str]]) -> DataFrame:
    """(id, tokens array<string>, n_bpe_tokens) per document — merges ride
    the closure (a few hundred pairs), segmentation is Arrow-batched
    ``mapInPandas`` with a per-task memo cache (Zipf makes the cache hit
    rate extreme: one segmentation per DISTINCT word per task)."""
    out_schema = T.StructType([
        T.StructField("__id__", docs.schema[id_col].dataType),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("n_bpe_tokens", T.IntegerType()),
    ])
    frozen = list(merges)

    def kernel(batches):
        import pandas as pd
        memo: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            hit = memo.get(word)
            if hit is None:
                hit = memo[word] = bpe_segment(word, frozen)
            return hit

        for pdf in batches:
            toks = [
                [t for w in ws for t in seg(w)] if ws is not None else []
                for ws in pdf[words_col]
            ]
            yield pd.DataFrame({
                "__id__": pdf[id_col],
                "tokens": toks,
                "n_bpe_tokens": [len(t) for t in toks],
            })

    return (docs.select(id_col, words_col)
            .mapInPandas(kernel, out_schema)
            .withColumnRenamed("__id__", id_col))
