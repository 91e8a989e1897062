"""Model-evaluation and inference statistics — the metrics layer a
training-data pipeline runs after scoring/labeling stages: ROC-AUC,
calibration bins, inter-annotator agreement (Cohen's kappa),
chi-square independence, and a two-arm Welch t-test.

No reference counterpart (rimarin/dbt-lab is a pure query engine);
same design rules as llm/curation.py: pure Column expressions, no
Python in the hot path, every operator mirrored term-for-term by a
DuckDB oracle in workload_beyond.py.

Scale notes baked into the shapes:
- AUC avoids the global sort entirely: the Mann-Whitney U statistic
  only needs per-DISTINCT-score positive/negative counts plus a
  cumulative sum over those (tiny) groups — one hash aggregate on the
  score value, one window over |distinct scores| rows, never a
  row-level rank.  With integer-valued half-steps the U sum is exact
  in double, so the result is bit-identical across engines and
  summation orders.
- kappa / chi-square reduce to contingency marginals first (hash
  aggregates with map-side combine); the cell-level math runs on
  frames bounded by category cardinality, not row count.
- Welch t is two grouped moment aggregates and a scalar formula.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """ROC-AUC of `score_col` against boolean/0-1 `label_col` with the
    standard tie convention (ties count 1/2): one row
    (auc, n_pos, n_neg).  AUC = U / (n_pos * n_neg) where
    U = sum over distinct scores s of  n_pos(s) * (N_neg(<s) + n_neg(s)/2).
    NULL when either class is empty."""
    lab = F.col(label_col).cast("int")
    per_score = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(lab).alias("__np"), F.sum(1 - lab).alias("__nn")
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    with_cum = per_score.withColumn(
        "__cum_neg", F.coalesce(F.sum("__nn").over(w), F.lit(0))
    )
    return with_cum.agg(
        F.sum(
            F.col("__np") * (F.col("__cum_neg") + F.col("__nn") / F.lit(2.0))
        ).alias("__u"),
        F.sum("__np").alias("n_pos"),
        F.sum("__nn").alias("n_neg"),
    ).select(
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("__u") / (F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )


def calibration_bins(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability-diagram bins: score decile -> (n, mean_score,
    pos_rate).  The drift check between a scorer's confidence and the
    observed label rate."""
    lab = F.col(label_col).cast("int")
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.select(b.alias("bin"), F.col(score_col).alias("__s"), lab.alias("__l"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__s").alias("mean_score"),
            F.avg("__l").alias("pos_rate"),
        )
    )


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two labelers: one row (kappa, po, pe, n).
    po = observed agreement rate; pe = sum_k p_a(k) * p_b(k).
    Contingency-marginal shape: two tiny grouped frames joined on the
    category — nothing row-scale past the first aggregates."""
    n = df.count()
    if n == 0:
        raise ValueError("cohens_kappa: empty input")
    agree = df.select(
        (F.sum(F.when(F.col(a_col) == F.col(b_col), 1).otherwise(0)) / F.lit(n)).alias(
            "po"
        )
    )
    ma = df.groupBy(F.col(a_col).alias("__k")).agg(
        (F.count(F.lit(1)) / F.lit(n)).alias("__pa")
    )
    mb = df.groupBy(F.col(b_col).alias("__k")).agg(
        (F.count(F.lit(1)) / F.lit(n)).alias("__pb")
    )
    pe = ma.join(mb, "__k").agg(F.sum(F.col("__pa") * F.col("__pb")).alias("pe"))
    return agree.crossJoin(pe).select(
        ((F.col("po") - F.col("pe")) / (F.lit(1.0) - F.col("pe"))).alias("kappa"),
        "po",
        "pe",
        F.lit(n).alias("n"),
    )


def chi_square_independence(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns: one row (chi2, dof, n).  The full contingency grid
    (marginal cross join, zero-filled observed counts) so empty cells
    contribute their expected mass — category cardinality bounds every
    frame after the first aggregates."""
    obs = df.groupBy(F.col(a_col).alias("__a"), F.col(b_col).alias("__b")).agg(
        F.count(F.lit(1)).alias("__o")
    )
    ra = df.groupBy(F.col(a_col).alias("__a")).agg(F.count(F.lit(1)).alias("__ra"))
    cb = df.groupBy(F.col(b_col).alias("__b")).agg(F.count(F.lit(1)).alias("__cb"))
    tot = df.count()
    if tot == 0:
        raise ValueError("chi_square_independence: empty input")
    grid = (
        ra.crossJoin(cb)
        .join(obs, ["__a", "__b"], "left")
        .select(
            "__a",
            "__b",
            F.coalesce(F.col("__o"), F.lit(0)).alias("__o"),
            (F.col("__ra") * F.col("__cb") / F.lit(float(tot))).alias("__e"),
        )
    )
    cells = grid.agg(
        F.sum((F.col("__o") - F.col("__e")) * (F.col("__o") - F.col("__e")) / F.col("__e")).alias(
            "chi2"
        )
    )
    dof = (ra.count() - 1) * (cb.count() - 1)
    return cells.select("chi2", F.lit(dof).alias("dof"), F.lit(tot).alias("n"))


def welch_t(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Welch's unequal-variance t statistic between exactly two arms:
    one row (t_stat, df_welch, mean_a, mean_b, n_a, n_b), arms ordered
    by group key.  Two grouped moment aggregates and a scalar formula
    — the A/B-test primitive."""
    g = (
        df.groupBy(F.col(group_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.avg(F.col(value_col).cast("double")).alias("__m"),
            F.var_samp(F.col(value_col).cast("double")).alias("__v"),
        )
        .orderBy("__g")
    )
    rows = g.limit(2).collect()
    if len(rows) < 2:
        raise ValueError("welch_t: need two non-empty arms")
    a, b = rows
    se2 = a["__v"] / a["__n"] + b["__v"] / b["__n"]
    t_stat = (a["__m"] - b["__m"]) / (se2**0.5)
    dfw = se2**2 / (
        (a["__v"] / a["__n"]) ** 2 / (a["__n"] - 1)
        + (b["__v"] / b["__n"]) ** 2 / (b["__n"] - 1)
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                float(t_stat),
                float(dfw),
                float(a["__m"]),
                float(b["__m"]),
                int(a["__n"]),
                int(b["__n"]),
            )
        ],
        "t_stat double, df_welch double, mean_a double, mean_b double, n_a bigint, n_b bigint",
    )
