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

from dbt_lab_spark.localrel import local_df

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
    # kappa is undefined at pe == 1 (both labelers constant on one
    # category): chance agreement saturates and the correction divides
    # by zero — return NULL, not an ANSI arithmetic error
    return agree.crossJoin(pe).select(
        F.when(
            F.col("pe") < 1.0,
            (F.col("po") - F.col("pe")) / (F.lit(1.0) - F.col("pe")),
        ).alias("kappa"),
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
    return local_df(spark, 
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


def kaplan_meier(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Kaplan-Meier survival curve from per-subject (duration, event)
    rows (event=1 observed, 0 right-censored): one row per distinct
    EVENT time with (t, n_risk, n_events, survival).

    Sort-free at subject scale: subjects collapse to per-duration
    (deaths, total) counts first (hash aggregate), the at-risk set is
    N minus a cumulative count over those (tiny) groups, and the
    product estimator runs as exp(cumsum(ln(1 - d/n))) over the
    ordered event times — a deterministic sequential window, so the
    curve is reproducible bit-for-bit across engines."""
    ev = F.col(event_col).cast("int")
    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(ev).alias("n_events"), F.count(F.lit(1)).alias("__total")
    )
    n = df.count()
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.withColumn(
        "n_risk", F.lit(n) - F.coalesce(F.sum("__total").over(w_prev), F.lit(0))
    )
    steps = risk.filter(F.col("n_events") > 0)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # the final step can kill everyone at risk (factor exactly 0):
    # ln() is undefined there, but the curve is legitimately 0 from
    # that step on — sum only positive factors and zero the output
    # wherever a zero factor has occurred in the prefix.
    factor = F.lit(1.0) - F.col("n_events") / F.col("n_risk").cast("double")
    return steps.select(
        "t",
        "n_risk",
        "n_events",
        F.when(
            F.min(factor).over(w_cum) <= 0.0, F.lit(0.0)
        ).otherwise(
            F.exp(F.sum(F.log(factor)).over(w_cum))
        ).alias("survival"),
    )


def seasonal_decompose(
    df: DataFrame,
    t_col: str,
    value_col: str,
    period: int = 24,
    half_window: int = 12,
) -> DataFrame:
    """Classical additive seasonal decomposition of a regular series
    (t is a dense integer index): trend = centered moving average over
    ±half_window rows (edge-truncated), seasonal = per-phase mean of
    the detrended series re-centered to sum zero, residual = the rest.
    Output per t: (t, value, trend, seasonal, residual).

    Two windows and two tiny broadcast joins — series length bounds
    everything after the first aggregate, so the shape holds for any
    upstream volume that rolls up into the series."""
    base = df.select(
        F.col(t_col).alias("t"), F.col(value_col).cast("double").alias("value")
    )
    w_ma = Window.orderBy("t").rowsBetween(-half_window, half_window)
    trended = base.withColumn("trend", F.avg("value").over(w_ma)).withColumn(
        "__detr", F.col("value") - F.col("trend")
    )
    phase = trended.withColumn("__ph", F.col("t") % period)
    raw_seasonal = phase.groupBy("__ph").agg(F.avg("__detr").alias("__s_raw"))
    grand = raw_seasonal.agg(F.avg("__s_raw").alias("__s_mean"))
    seasonal = raw_seasonal.crossJoin(F.broadcast(grand)).select(
        "__ph", (F.col("__s_raw") - F.col("__s_mean")).alias("seasonal")
    )
    return (
        phase.join(F.broadcast(seasonal), "__ph")
        .select(
            "t",
            "value",
            "trend",
            "seasonal",
            (F.col("__detr") - F.col("seasonal")).alias("residual"),
        )
    )


def anova_oneway(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """One-way ANOVA F statistic across k groups: one row
    (f_stat, df_between, df_within, n).  Everything derives from group
    sums/counts and the global mean — two hash aggregates and a scalar
    formula; SSW computed as SST - SSB so no second data pass."""
    v = F.col(value_col).cast("double")
    g = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__ss"),
    )
    tot = g.agg(
        F.sum("__n").alias("n"),
        F.sum("__s").alias("s"),
        F.sum("__ss").alias("ss"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("__s") * F.col("__s") / F.col("__n")).alias("sb"),
    )
    return tot.select(
        (
            ((F.col("sb") - F.col("s") * F.col("s") / F.col("n")) / (F.col("k") - 1))
            / (
                (F.col("ss") - F.col("sb"))
                / (F.col("n") - F.col("k"))
            )
        ).alias("f_stat"),
        (F.col("k") - 1).cast("int").alias("df_between"),
        (F.col("n") - F.col("k")).cast("bigint").alias("df_within"),
        F.col("n").cast("bigint").alias("n"),
    )


def spearman_corr(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman rank correlation: average ranks for ties on both
    variables (row_number averaged within equal values), then the
    Pearson formula on the ranks from exact sums.  One row
    (spearman, n).  The rank windows order by value only — ties share
    the mean of their row_number range, so the statistic is
    deterministic and engine-portable."""
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    w_x = Window.orderBy(x_col)
    w_y = Window.orderBy(y_col)
    ranked = df.select(
        F.avg(F.row_number().over(w_x)).over(Window.partitionBy(x_col)).alias("rx"),
        F.avg(F.row_number().over(w_y)).over(Window.partitionBy(y_col)).alias("ry"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return agg.select(
        F.when(den > 0, num / den).alias("spearman"), F.col("n").cast("bigint").alias("n")
    )
