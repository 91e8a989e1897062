"""Byte-pair-encoding tokenizer: distributed training statistics +
map-only encoding — the canonical LLM-pipeline tokenization operator
(Sennrich et al. 2016, arXiv:1508.07909; GPT-2-style word-internal
merges without an end-of-word marker).

Scale decomposition (the part that matters at 100 TB):

- `word_counts` is the CORPUS-scale stage: one explode + one
  hash-aggregate shuffle whose output is bounded by |vocabulary|, not
  corpus size — the same shape as a distributed word count.  Partial
  aggregation collapses the token blow-up map-side.
- The merge-training loop then iterates over the *word-count table*,
  which is |vocab|-bounded (a few million entries even for web-scale
  corpora) — it is collected once and trained driver-side.  This is
  the standard production design (HF tokenizers, SentencePiece train
  from word counts the same way); a per-merge distributed pair-count
  would pay 2 shuffles x num_merges for data that fits in one
  executor's memory.
- `bpe_encode` broadcasts the merge ranks and encodes in one Arrow
  mapInPandas pass with per-word memoization (Zipf's law makes the
  cache hit rate ~99% on natural text) — map-only, no shuffle.

Reference capability evidence: the reference's bulk-operator extension
surface (mapred/qexec/BulkProcessingOperator.java:57-65) is the
analogous "arbitrary per-tuple computation" hook; tokenization is the
training-data pipeline's flagship instance of it.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct words with occurrence counts — the corpus-scale
    sufficient statistic for BPE training.  One shuffle, |vocab| output
    rows."""
    return (
        df.select(F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe_from_counts(
    counts: dict[str, int], num_merges: int = 100, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Learn BPE merges from word counts.  Deterministic: ties on pair
    frequency break lexicographically, so the same counts always yield
    the same merge list on any machine."""
    vocab: dict[tuple[str, ...], int] = {tuple(w): c for w, c in counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count; lexicographically smallest pair on ties
        best, best_n = None, 0
        for p, n in pairs.items():
            if n > best_n or (n == best_n and (best is None or p < best)):
                best, best_n = p, n
        if best_n < min_freq:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_freq: int = 2,
    word_min_freq: int = 2,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge training (see
    module docstring for why the split lands there).

    The driver collect is BOUNDED (r4): hapax-and-below words
    (cnt < word_min_freq) are filtered distributed-side, and a
    deterministic top-`max_vocab` cap (cnt desc, word asc — a
    TakeOrdered, no full sort) covers the web-scale long tail of
    typos/URLs/hashes that would otherwise stream the entire distinct-
    word domain to the driver.  On natural corpora this does not change
    trained merges in practice: each sub-threshold word contributes at
    most cnt < word_min_freq to any pair, and merge choices are decided
    by the head of the Zipf curve, orders of magnitude above the tail's
    aggregate (unchanged-merges pinned on the test corpus in
    tests/test_llm_ops.py).  Pass word_min_freq=1, max_vocab=None to
    reproduce the exact unfiltered statistics on a small corpus."""
    counts = word_counts(df, text_col)
    if word_min_freq > 1:
        counts = counts.filter(F.col("cnt") >= word_min_freq)
    if max_vocab is not None:
        counts = counts.orderBy(F.desc("cnt"), F.asc("word")).limit(max_vocab)
    rows = counts.collect()
    return train_bpe_from_counts({r["word"]: r["cnt"] for r in rows}, num_merges, min_freq)


def _encode_word(word: str, ranks: dict[tuple[str, str], int], cache: dict) -> list[str]:
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    cache[word] = syms
    return syms


BPE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("n_bpe_tokens", T.IntegerType()),
        T.StructField("tokens_head", T.ArrayType(T.StringType())),
    ]
)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    head: int = 8,
) -> DataFrame:
    """Encode documents with learned merges: per doc the word count,
    BPE token count, and the first `head` tokens (audit column).
    Merge ranks ride the closure (broadcast by Spark's task
    serialization); the per-partition word cache makes throughput
    ~O(distinct words), not O(tokens)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = str(text).lower().split()
                toks: list[str] = []
                n_tok = 0
                for w in words:
                    enc = _encode_word(w, ranks, cache)
                    n_tok += len(enc)
                    if len(toks) < head:
                        toks.extend(enc[: head - len(toks)])
                out.append((int(did), len(words), n_tok, toks))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_words", "n_bpe_tokens", "tokens_head"]
            )

    return df.select(id_col, text_col).mapInPandas(_encode, BPE_SCHEMA)
