"""Deterministic sampling for training-data pipelines.

No reference counterpart (rimarin/dbt-lab has no sampling operators —
SURVEY.md §2); this fills the training-pipeline gap the same way the
dedup/similarity modules do.

All sampling here is CONTENT-DETERMINISTIC, not RNG-based: a row's
membership depends only on md5(key || salt), so
  - the sample is reproducible across runs, engines, partitionings and
    cluster sizes (Spark's `df.sample` is none of these — it is seeded
    per-partition, so a repartition changes the sample);
  - adding data never flips membership of existing rows (stable
    incremental pipelines at 100 TB);
  - independent draws come from different salts.

Everything is built-in JVM expressions (md5 / substring / string
compare) — no UDFs, no shuffle: sampling is a pure narrow filter that
Catalyst pushes to the scan, so at any scale it costs one pass.

The hex-threshold trick: the first 15 hex chars of md5 are uniform in
[0, 16^15); for equal-length lowercase hex strings, lexicographic
comparison == numeric comparison, so `prefix < hex(p * 16^15)` keeps
a p-fraction — and the same literal works verbatim in any SQL engine
with md5() (the DuckDB oracles use it term-for-term).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_LEN = 15  # 60 bits: exact in a long, far below FP issues
_SPACE = 16**_PREFIX_LEN


def hash_threshold(fraction: float) -> str:
    """Hex-string threshold t such that P(md5-prefix < t) == fraction.
    'g' sorts above every hex digit (fraction 1.0); '0'*15 admits
    nothing (fraction 0.0)."""
    if fraction <= 0.0:
        return "0" * _PREFIX_LEN
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * _SPACE), f"0{_PREFIX_LEN}x")


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """The 15-hex-char md5 prefix of (key || salt) — the uniform draw
    every operator below compares against."""
    key = F.col(key) if isinstance(key, str) else key
    tagged = F.concat(key.cast("string"), F.lit(salt)) if salt else key.cast("string")
    return F.substring(F.md5(F.encode(tagged, "UTF-8")), 1, _PREFIX_LEN)


def hash_sample(
    df: DataFrame, key: Column | str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic `fraction` of rows by key hash."""
    return df.filter(hash_bucket(key, salt) < F.lit(hash_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    key: Column | str,
    stratum: Column | str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones).  The per-stratum threshold is a
    literal CASE — still a narrow pushed-down filter, no shuffle."""
    stratum = F.col(stratum) if isinstance(stratum, str) else stratum
    thresh: Column = F.lit(hash_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(stratum == value, F.lit(hash_threshold(frac))).otherwise(thresh)
    return df.filter(hash_bucket(key, salt) < thresh)


def train_test_split(
    df: DataFrame,
    key: Column | str,
    test_fraction: float = 0.1,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/test assignment: rows whose draw falls below
    `test_fraction` are 'test', the rest 'train'.  Stable under data
    growth — a document keeps its split forever."""
    is_test = hash_bucket(key, salt) < F.lit(hash_threshold(test_fraction))
    return df.withColumn(out_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train")))


def kfold_assign(
    df: DataFrame,
    key: Column | str,
    k: int = 5,
    salt: str = "fold",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment by content hash: fold i collects
    the rows whose uniform draw lands in [i/k, (i+1)/k).

    Same machinery as hash_sample — the fold is the count of interior
    thresholds at or below the row's hex draw, i.e. k-1 string
    comparisons, no shuffle, partition-independent, stable as data
    grows (a row keeps its fold forever).  Cross-validation and
    sharded-eval primitive."""
    fold = F.lit(0)
    for j in range(1, k):
        fold = fold + F.when(
            hash_bucket(key, salt) >= F.lit(hash_threshold(j / k)), 1
        ).otherwise(0)
    return df.withColumn(out_col, fold)


def temperature_mix(
    df: DataFrame,
    key: Column | str,
    source_col: str = "source",
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-reweighted source mixing (the T5/PaLM mixture rule):
    sampling probability per source p_s ∝ n_s^alpha — alpha < 1 lifts
    rare sources, alpha = 1 is natural proportions — scaled so the
    expected kept volume is `target_fraction` of the corpus, with
    per-source keep rate capped at 1 (no upsampling here; pair with
    mix_epochs for >1 epochs of rare sources).

    Keep decisions are content-deterministic md5 draws against a
    COMPUTED per-source threshold: the rate column is rendered to the
    15-hex-char space with format_string('%015x', floor(rate * 16^15))
    — all JVM expressions, the rate table is a broadcast join, and
    every step is replicated term-for-term by the DuckDB oracle.

    Returns df filtered, with a `mix_rate` column attached."""
    key = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(source_col).agg(F.count("*").cast("double").alias("n_s"))
    tot = counts.agg(
        F.sum(F.pow(F.col("n_s"), F.lit(alpha))).alias("z"),
        F.sum("n_s").alias("n"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(target_fraction)
            * F.col("n")
            * F.pow(F.col("n_s"), F.lit(alpha))
            / F.col("z")
            / F.col("n_s"),
        ).alias("mix_rate"),
    )
    thresh = F.format_string(
        "%015x", F.floor(F.col("mix_rate") * F.lit(float(_SPACE))).cast("long")
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter((F.col("mix_rate") >= 1.0) | (hash_bucket(key, salt) < thresh))
    )


def contrastive_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 4,
    anchor_id: str = "anchor_id",
    corpus_id: str = "vec_id",
    exclude: DataFrame | None = None,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for each anchor, the k corpus items with the smallest
    md5(anchor || '|' || item || salt) draw, minus anchor itself and
    any (anchor, positive) pairs in `exclude` — the hard requirement
    is REPRODUCIBILITY (same negatives every epoch build, stable as
    the corpus grows at the margins), which RNG sampling cannot give.

    Plan: broadcast the anchor list over the corpus (|anchors| is the
    small training-batch side), one window top-k per anchor on the
    hash draw.  Returns (anchor_id, negative_id, neg_rank).  The draw
    is the same 15-hex md5 plane as every sampler here, so a SQL
    oracle replays it term-for-term."""
    from pyspark.sql.window import Window

    a = anchors.select(F.col(anchor_id).alias("anchor_id"))
    c = corpus.select(F.col(corpus_id).alias("negative_id"))
    cand = c.crossJoin(F.broadcast(a)).filter(F.col("anchor_id") != F.col("negative_id"))
    if exclude is not None:
        cand = cand.join(exclude, ["anchor_id", "negative_id"], "left_anti")
    draw = hash_bucket(
        F.concat_ws("|", F.col("anchor_id").cast("string"), F.col("negative_id").cast("string")),
        salt,
    )
    w = Window.partitionBy("anchor_id").orderBy(draw.asc(), F.col("negative_id").asc())
    return (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("anchor_id", "negative_id", "neg_rank")
    )
