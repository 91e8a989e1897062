"""Corpus-curation operators for training-data pipelines: PII
redaction, repetition (boilerplate) statistics, benchmark
decontamination, epoch-weighted domain mixing, and sequence packing.

No reference counterpart (rimarin/dbt-lab is a pure query engine —
SURVEY.md §2); these fill the same training-pipeline gap as
llm/dedup.py and llm/sampling.py, and follow the same design rules:

- Pure JVM Column expressions wherever possible — no Python UDFs in
  the hot path; everything is a narrow map stage until the final
  aggregate, so each operator costs one scan at 100 TB.
- Content-deterministic decisions (md5-hash thresholds from
  llm/sampling.py), never RNG — reproducible across runs, engines,
  partitionings and data growth.
- Engine-portable semantics: every function here is mirrored
  term-for-term by a DuckDB oracle in workload_beyond.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_lab_spark.llm.sampling import hash_bucket, hash_threshold

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Conservative patterns chosen to behave identically under Java regex
# (Spark) and RE2 (DuckDB): character classes + bounded quantifiers
# only, no backreferences or lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"

_REDACTIONS: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
]


def redact_pii(text: str | Column) -> Column:
    """Replace every email / phone match with a typed placeholder.
    Chained regexp_replace — single codegen'd projection, no shuffle.
    """
    out = F.col(text) if isinstance(text, str) else text
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: str | Column) -> dict[str, Column]:
    """Per-row match counts for audit aggregates (how much PII a
    source contains — the go/no-go signal before a source enters the
    training mix)."""
    t = F.col(text) if isinstance(text, str) else text
    return {
        "n_emails": F.regexp_count(t, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(t, F.lit(PHONE_RE)),
    }


# ---------------------------------------------------------------------------
# Repetition / boilerplate statistics (Gopher-style filters)
# ---------------------------------------------------------------------------


def max_multiplicity(arr: Column) -> Column:
    """Count of the most frequent element in an array column — the
    per-document 'top token' numerator of Gopher's repetition filters
    — computed as the longest equal-run of the sorted array in ONE
    aggregate() pass (no explode, no shuffle: stays a narrow map
    stage per document, which is what makes the corpus-level
    repetition scan a single pass at 100 TB).

    Pass a materialized column, not a raw expression: the fold lambda
    references its accumulator/element arguments only, so there is no
    captured-expression re-evaluation (see functions/text.py
    shingles() for the gotcha).  Empty arrays yield 0."""
    s = F.array_sort(arr)
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, t: Column) -> Column:
        run = F.when(t.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            t.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(s, zero, step, lambda acc: acc["best"])


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def decontamination_pairs(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Find training documents that overlap an evaluation/benchmark
    set: any distinct k-token shingle shared between a train doc and
    an eval doc is a contamination hit (the standard n-gram-overlap
    decontamination used for pretraining corpora; k=8..13 typical).

    Returns (train_id, eval_id, n_shared) for pairs sharing at least
    `min_shared` distinct shingles.  Plan: shingle -> array_distinct
    -> explode -> equi-join on a 16-hex md5 shingle key -> count.
    The join key is a hash, not the raw shingle string, so the
    shuffle carries 16 bytes per gram instead of the gram text; both
    engines compute the same md5 so the DuckDB oracle matches
    exactly.  The eval side is small in practice — Catalyst broadcasts
    it (AQE) and the scan of the train side stays shuffle-free."""
    from dbt_lab_spark.functions.text import shingles

    def exploded(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("__g"),
        ).select(out_id, F.substring(F.md5(F.encode(F.col("__g"), "UTF-8")), 1, 16).alias("__gh"))

    tr = exploded(train, "train_id")
    ev = exploded(eval_set, "eval_id")
    pairs = (
        tr.join(ev, "__gh")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return pairs.filter(F.col("n_shared") >= min_shared)


def _bloom_build(hashes, fpp: float):
    """Build a Bloom bitset over uint64 hash keys: (bits bytes, mask,
    n_hash) with m rounded up to a power of two so probing is a mask,
    not a modulo.  Kirsch-Mitzenmacher double hashing (h1 + i*h2)
    gives the k index streams from one 64-bit key."""
    import numpy as np

    n = max(1, len(hashes))
    m_exact = -n * math.log(fpp) / (math.log(2) ** 2)
    m = 1 << max(10, int(math.ceil(math.log2(m_exact))))
    n_hash = max(1, round(m / n * math.log(2)))
    h1 = np.asarray(hashes, dtype=np.uint64)
    # splitmix64 finalizer as the second stream; force odd so strides
    # hit every slot of the power-of-two table
    h2 = h1 * np.uint64(0x9E3779B97F4A7C15)
    h2 ^= h2 >> np.uint64(31)
    h2 |= np.uint64(1)
    bits = np.zeros(m >> 3, dtype=np.uint8)
    mask = np.uint64(m - 1)
    for i in range(n_hash):
        idx = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(
            bits, idx >> np.uint64(3), (1 << (idx & np.uint64(7))).astype(np.uint8)
        )
    return bits.tobytes(), int(mask), n_hash


def bloom_decontamination_pairs(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_shared: int = 1,
    fpp: float = 0.01,
    max_eval_grams: int = 5_000_000,
) -> DataFrame:
    """`decontamination_pairs` with a Bloom-filter pre-pass: the eval
    set's k-gram keys are folded into a compact bitset (~1.2 MB per
    million grams at fpp=0.01), broadcast, and probed in a map-only
    Arrow stage over the train grams; only probable hits reach the
    exact md5-key verify join.  Blooms have no false negatives, so the
    RESULT is bit-identical to the exact path — the filter only prunes
    — which is why this variant carries the same full oracle.

    100 TB posture: the broadcast payload is the bitset, not the gram
    set — a 100M-gram eval suite costs ~120 MB per executor where a
    broadcast hash join's table would not fit, and the train-side gram
    explosion is reduced to ~fpp of itself BEFORE the only shuffle.
    The one driver-side collect is the eval gram hashes (the sketch
    input, capped by `max_eval_grams`), never anything train-sized.
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    from dbt_lab_spark.functions.text import shingles

    def exploded(df: DataFrame, out_id: str, with_probe: bool) -> DataFrame:
        g = df.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("__g"),
        )
        cols = [
            F.col(out_id),
            F.substring(F.md5(F.encode(F.col("__g"), "UTF-8")), 1, 16).alias("__gh"),
        ]
        if with_probe:
            cols.append(F.xxhash64("__g").alias("__h"))
        return g.select(*cols)

    ev = exploded(eval_set, "eval_id", with_probe=True)
    eval_hashes = [r[0] for r in ev.select("__h").distinct().limit(max_eval_grams + 1).collect()]
    if len(eval_hashes) > max_eval_grams:
        raise ValueError(
            f"eval gram count exceeds max_eval_grams={max_eval_grams}; "
            "raise the cap or shard the eval set"
        )
    tr = exploded(train, "train_id", with_probe=True)
    if not eval_hashes:
        return (
            tr.join(ev.select("eval_id", "__gh"), "__gh")
            .groupBy("train_id", "eval_id")
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
        )
    bits_bytes, mask, n_hash = _bloom_build(
        [h & 0xFFFFFFFFFFFFFFFF for h in eval_hashes], fpp
    )
    bc = train.sparkSession.sparkContext.broadcast((bits_bytes, mask, n_hash))

    id_field = next(f for f in tr.schema.fields if f.name == "train_id")
    out_schema = f"train_id {id_field.dataType.simpleString()}, __gh string"

    def _probe(batches):
        import numpy as np

        bb, msk, nh = bc.value
        bits = np.frombuffer(bb, dtype=np.uint8)
        msk = np.uint64(msk)
        for pdf in batches:
            if pdf.empty:
                continue
            h1 = pdf["__h"].to_numpy(dtype=np.int64).astype(np.uint64)
            h2 = h1 * np.uint64(0x9E3779B97F4A7C15)
            h2 ^= h2 >> np.uint64(31)
            h2 |= np.uint64(1)
            keep = np.ones(len(pdf), dtype=bool)
            for i in range(nh):
                idx = (h1 + np.uint64(i) * h2) & msk
                bit = (bits[idx >> np.uint64(3)] >> (idx & np.uint64(7)).astype(np.uint8)) & 1
                keep &= bit.astype(bool)
            yield pdf.loc[keep, ["train_id", "__gh"]]

    survivors = tr.mapInPandas(_probe, out_schema)
    return (
        survivors.join(ev.select("eval_id", "__gh"), "__gh")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Epoch-weighted domain mixing
# ---------------------------------------------------------------------------


def mix_epochs(
    df: DataFrame,
    key: Column | str,
    stratum: Column | str,
    epochs: dict[str, float],
    salt: str = "mix",
    out_col: str = "epoch",
) -> DataFrame:
    """Materialize a target domain mixture as row repetition: a
    stratum with epochs=2.5 contributes every document twice plus a
    deterministic half of them a third time (the Pile/Dolma
    'sampling weight as epoch count' convention).

    floor(epochs) full copies for every row; the fractional part is
    an md5-threshold draw (llm/sampling.py) so the extra-copy set is
    reproducible and stable as data grows.  Unlisted strata get 0
    epochs (dropped).  Implementation is filter + explode(sequence)
    — a narrow map stage, no shuffle, no RNG.  The explicit
    `n_copies >= 1` filter matters: Spark's sequence(1, 0) would
    generate a DESCENDING [1, 0] rather than an empty array."""
    key = F.col(key) if isinstance(key, str) else key
    stratum = F.col(stratum) if isinstance(stratum, str) else stratum

    n_full: Column = F.lit(0)
    thresh: Column = F.lit(hash_threshold(0.0))
    for value, e in sorted(epochs.items()):
        if e < 0:
            raise ValueError(f"epochs must be >= 0, got {e} for {value!r}")
        n_full = F.when(stratum == value, F.lit(int(math.floor(e)))).otherwise(n_full)
        thresh = F.when(
            stratum == value, F.lit(hash_threshold(e - math.floor(e)))
        ).otherwise(thresh)

    extra = F.when(hash_bucket(key, salt) < thresh, 1).otherwise(0)
    n_copies = (n_full + extra).alias("__n_copies")
    return (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") >= 1)
        .withColumn(out_col, F.explode(F.sequence(F.lit(1), F.col("__n_copies"))))
        .drop("__n_copies")
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
    out_col: str = "pack_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences:
    pack_id = floor(running_token_count_before_this_doc / budget)
    within each partition's deterministic order.  A document belongs
    to the pack in which it STARTS (documents may straddle a pack
    boundary — the concatenate-then-chunk convention used by GPT-style
    pretraining loaders, which is what keeps the assignment a pure
    prefix-sum instead of a sequential first-fit bin-pack).

    One window (= one shuffle on partition_col); integer-exact bin
    arithmetic `(c - c % B) / B` — never floor(c / B) through double
    division, which can be off by one ulp at exact boundaries."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    pack = ((cum_before - cum_before % budget) / budget).cast("long")
    return df.withColumn(out_col, pack)


# ---------------------------------------------------------------------------
# unigram LM quality score (perplexity proxy) + token-distribution drift
# ---------------------------------------------------------------------------


def _tokens(df: DataFrame, text_col: str, *extra_cols: str) -> DataFrame:
    """Explode whitespace tokens (lowercased, trimmed); empty docs emit
    no rows.  The word-count shape: narrow explode, everything after it
    aggregates on the token key."""
    return df.select(
        *extra_cols,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")


def lm_quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-proxy quality score: mean log-probability of each
    document's tokens under a corpus-trained add-one-smoothed unigram
    LM.  The cheap stand-in for 'score with a small LM and drop the
    tail' (CCNet / Gopher-style corpus filtering) that stays entirely
    JVM-side.

    ln P(tok) = ln((count(tok) + 1) / (total_tokens + vocab_size));
    score(doc) = ROUND(AVG over its tokens, 4).  Higher = more typical
    text; gibberish and rare-token soup score low.

    Scale shape: token frequency is one word-count aggregate; scoring
    joins the exploded tokens back to frequencies on the token key —
    both shuffles are on well-distributed keys, and the (N, V) totals
    travel as a broadcast single row.  No Python, no collect.
    """
    toks = _tokens(df, text_col, id_col)
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__c"))
    totals = freq.agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    probs = freq.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.log((F.col("__c") + F.lit(1.0)) / (F.col("__n") + F.col("__v"))).alias("__lnp"),
    )
    return (
        toks.join(probs, on="tok")
        .groupBy(id_col)
        .agg(
            F.round(F.avg("__lnp"), 4).alias("lm_score"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def token_kl_drift(
    df: DataFrame,
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """Token-distribution drift per slice: KL(P_slice || P_corpus) with
    add-one smoothing over the corpus vocabulary, summed over tokens
    present in the slice.  The standard data-quality check that a
    source/domain hasn't drifted from the mixture it was sampled into
    (and the per-domain divergence used to debug mixing weights).

    p = (c_slice + 1) / (n_slice + V);  q = (c_corpus + 1) / (N + V);
    kl = ROUND(SUM(p * ln(p / q)), 4) over the slice's tokens.

    Scale shape: two token-key aggregates (per-slice and global) joined
    on the token key, then one small per-slice sum — word-count
    economics throughout; slice/corpus totals broadcast as single rows.
    """
    toks = _tokens(df, text_col, by)
    slice_counts = toks.groupBy(by, "tok").agg(F.count(F.lit(1)).alias("__cs"))
    slice_totals = slice_counts.groupBy(by).agg(F.sum("__cs").alias("__ns"))
    corpus_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__cc"))
    corpus_totals = corpus_counts.agg(
        F.sum("__cc").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    joined = (
        slice_counts.join(slice_totals, on=by)
        .join(corpus_counts, on="tok")
        .crossJoin(F.broadcast(corpus_totals))
    )
    p = (F.col("__cs") + F.lit(1.0)) / (F.col("__ns") + F.col("__v"))
    q = (F.col("__cc") + F.lit(1.0)) / (F.col("__n") + F.col("__v"))
    return (
        joined.groupBy(by)
        .agg(
            F.round(F.sum(p * F.log(p / q)), 4).alias("kl_drift"),
            F.max("__ns").alias("n_tokens"),
        )
    )


def trigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l3: float = 0.5,
    l2: float = 0.3,
    l1: float = 0.2,
) -> DataFrame:
    """Interpolated trigram-LM quality score — the higher-order upgrade
    of lm_quality_score, one rung below 'score with a 5-gram KenLM'
    (CCNet, arXiv:1911.00359):

      P(w3 | w1 w2) = l3 * c(w1w2w3)/c(w1w2)
                    + l2 * c(w2w3)/c(w2)
                    + l1 * (c(w3)+1)/(N+V)      (add-one floor)

    score(doc) = ROUND(AVG ln P over the doc's trigrams, 4); docs with
    fewer than 3 tokens emit no row (no trigram evidence).  The
    conditional ML terms can be zero-free by construction (every
    observed trigram's prefix was observed), so only the unigram floor
    needs smoothing.

    Scale shape: three n-gram count tables, each a word-count-shaped
    aggregate bounded by corpus n-gram vocabulary; scoring joins the
    exploded trigram stream to them on n-gram keys (well-distributed
    equi-joins), and the (N, V) totals broadcast.  No Python anywhere.
    """
    from dbt_lab_spark.functions.text import shingles
    from dbt_lab_spark.operators.scan import fan_out_if_small

    # The five n-gram pipelines below each re-tokenize `df` (recompute
    # beats materializing a corpus-sized token stream at scale), so a
    # single-row-group scan serializes ALL of them on one core.
    # Fan-out is size-gated: a table big enough to split natively is
    # left untouched (guide §2.4).
    df = fan_out_if_small(df)
    toks = _tokens(df, text_col, id_col)
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__cu"))
    totals = uni.agg(F.sum("__cu").alias("__n"), F.count(F.lit(1)).alias("__v"))
    # bigrams via shingles(2) so every n-gram level shares ONE
    # tokenization (trimmed, whitespace-split) and the stream's context
    # keys join exactly
    bi = (
        df.select(F.explode(shingles(text_col, 2)).alias("bg"))
        .filter(F.size(F.split(F.col("bg"), " ")) == 2)
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("__cb"))
    )
    tri = (
        df.select(F.explode(shingles(text_col, 3)).alias("tg"))
        .filter(F.size(F.split(F.col("tg"), " ")) == 3)  # drop short-doc fallback shingle
        .groupBy("tg")
        .agg(F.count(F.lit(1)).alias("__ct"))
    )
    # per-doc trigram stream with its four context keys
    stream = (
        df.select(F.col(id_col), F.explode(shingles(text_col, 3)).alias("tg"))
        .filter(F.size(F.split(F.col("tg"), " ")) == 3)
        .select(
            id_col,
            "tg",
            F.concat_ws(" ", F.slice(F.split(F.col("tg"), " "), 1, 2)).alias("bg_ctx"),
            F.concat_ws(" ", F.slice(F.split(F.col("tg"), " "), 2, 2)).alias("bg"),
            F.element_at(F.split(F.col("tg"), " "), 2).alias("uni_ctx"),
            F.element_at(F.split(F.col("tg"), " "), 3).alias("tok"),
        )
    )
    bi_ctx = bi.select(F.col("bg").alias("bg_ctx"), F.col("__cb").alias("__cbctx"))
    uni_ctx = uni.select(F.col("tok").alias("uni_ctx"), F.col("__cu").alias("__cuctx"))
    scored = (
        stream.join(tri, on="tg")
        .join(bi_ctx, on="bg_ctx")
        .join(bi, on="bg")
        .join(uni_ctx, on="uni_ctx")
        .join(uni, on="tok")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            F.log(
                F.lit(l3) * F.col("__ct") / F.col("__cbctx")
                + F.lit(l2) * F.col("__cb") / F.col("__cuctx")
                + F.lit(l1) * (F.col("__cu") + F.lit(1.0)) / (F.col("__n") + F.col("__v"))
            ).alias("__lnp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("__lnp"), 4).alias("trigram_lm_score"),
        F.count(F.lit(1)).alias("n_trigrams"),
    )


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
) -> DataFrame:
    """Unicode + whitespace normalization — the cleanup stage every
    web-text pipeline runs before tokenization/dedup (mojibake-adjacent
    NFC canonicalization, control-char strip, whitespace collapse):

      1. NFC normalize (UAX #15 canonical composition)
      2. drop control chars except tab/newline
      3. collapse runs of spaces/tabs to one space
      4. trim leading/trailing whitespace

    NFC has no Spark JVM builtin, so the stage is one Arrow mapInPandas
    (Python at the edge, per the multimodal-decode pattern); steps 2-4
    are plain regexes replicated term-for-term by the DuckDB oracle
    (nfc_normalize + regexp_replace), which makes the whole stage
    oracle-checkable despite the Python hop."""
    import re as _re

    from pyspark.sql import types as T

    schema = T.StructType(list(docs.schema) + [T.StructField(out_col, T.StringType())])
    ctrl = _re.compile(r"[\x00-\x08\x0B-\x1F\x7F]")
    runs = _re.compile(r"[ \t]+")

    def _norm(batches):
        import unicodedata

        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for t in pdf[text_col]:
                if t is None:
                    out.append(None)
                    continue
                s = unicodedata.normalize("NFC", str(t))
                s = ctrl.sub("", s)
                s = runs.sub(" ", s)
                # explicit char set: python str.strip() would also eat
                # unicode spaces, which SQL trim() does not
                out.append(s.strip(" \t\n"))
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return docs.mapInPandas(_norm, schema)


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "compress_ratio",
    level: int = 6,
) -> DataFrame:
    """Gzip-compressibility quality signal (the Dolma/RefinedWeb
    heuristic): repetitive or templated text compresses far below
    natural prose, so ratio = deflate(text)/raw flags boilerplate,
    keyboard-mash and scraped navigation chrome that n-gram filters
    miss.  One stateless Arrow stage (zlib is C-speed per batch);
    deterministic for a fixed zlib level.  Empty/null text gets ratio
    1.0 (nothing to judge)."""
    from pyspark.sql import types as T

    schema = T.StructType(list(docs.schema) + [T.StructField(out_col, T.DoubleType())])

    def _ratio(batches):
        import zlib

        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for t in pdf[text_col]:
                if t is None or not str(t):
                    out.append(1.0)
                    continue
                raw = str(t).encode("utf-8")
                comp = zlib.compress(raw, level)
                out.append(len(comp) / len(raw))
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return docs.mapInPandas(_ratio, schema)


# ---------------------------------------------------------------------------
# URL canonicalization (crawl dedup prep)
# ---------------------------------------------------------------------------


def canonicalize_url(url: str | Column) -> Column:
    """Canonical form of an http(s) URL for crawl-level dedup: two
    raw variants of the same page must collapse to one key before
    any content fetch/dedup stage sees them.

    Rules (the industry-standard safe subset — each is a pure string
    rewrite, no network, no suffix lists):
      - scheme and host lowercased; https normalized to http (scheme
        variants of one page are one page for dedup purposes)
      - default ports dropped (:80, :443)
      - fragment dropped
      - tracking params dropped (utm_*, fbclid, gclid, ref)
      - remaining query params sorted bytewise for order-independence
      - trailing slash on a non-root path dropped

    Pure JVM: regexp rewrites + split/array_sort/concat_ws — one
    narrow map stage, no shuffle, no Python.  Mirrored term-for-term
    by the DuckDB oracle (list_sort + regexp_replace).
    """
    u = F.col(url) if isinstance(url, str) else url
    # lowercase scheme+host (the part before the first path slash)
    head = F.lower(F.regexp_extract(u, r"^([^/]*//[^/?#]*)", 1))
    head = F.regexp_replace(head, r"^https:", "http:")
    head = F.regexp_replace(head, r":(80|443)$", "")
    rest = F.regexp_replace(u, r"^[^/]*//[^/?#]*", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"(.)/$", "$1")  # trailing slash, keep root "/"
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        head,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )


def url_host(url: str | Column) -> Column:
    """Lowercased host (no port) of an http(s) URL."""
    u = F.col(url) if isinstance(url, str) else url
    h = F.lower(F.regexp_extract(u, r"^[^/]*//([^/?#:]*)", 1))
    return h


def registered_domain(host: Column) -> Column:
    """Last two labels of the host — the registrable domain under
    generic TLDs (the public-suffix-list refinement for ccTLD pairs
    like .co.uk is a lookup-table extension, not a structural change)."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


# ---------------------------------------------------------------------------
# k-anonymity audit (governance gate before release/training)
# ---------------------------------------------------------------------------


def k_anonymity_classes(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """Equivalence classes over the quasi-identifier columns with their
    sizes and a per-class safety flag: a dataset is k-anonymous iff
    every class has >= k rows; rows in smaller classes re-identify
    individuals and must be suppressed or generalized before release.

    One hash-aggregate on the quasi-identifier tuple (map-side partial
    aggregation collapses classes early) — the word-count scale shape.
    Returns one row per class: quasi cols, n_rows, is_safe.

    With `sensitive_col`/`l`, also enforces distinct l-diversity: a
    k-anonymous class still leaks when every member shares one
    sensitive value (the homogeneity attack), so each class must carry
    >= l distinct sensitive values too; output gains n_sensitive and
    is_safe becomes the conjunction.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
    ]
    safe = F.count(F.lit(1)) >= k
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"))
        safe = safe & (F.countDistinct(F.col(sensitive_col)) >= l)
    return df.groupBy(*quasi_cols).agg(*aggs, safe.alias("is_safe"))
