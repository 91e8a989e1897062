"""Hand-computed pins for functions/stats.py — each metric checked
against the closed-form definition on small frames (no scipy/sklearn
in the container; references computed by the formulas directly)."""

from __future__ import annotations

import numpy as np
import pytest

from dbt_lab_spark.functions.stats import (
    auc,
    calibration_bins,
    chi_square_independence,
    cohens_kappa,
    welch_t,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_auc_perfect_and_reversed_and_ties(spark):
    perfect = _df(spark, [(0.1, 0), (0.2, 0), (0.3, 1), (0.4, 1)], "s double, y int")
    r = auc(perfect, "s", "y").collect()[0]
    assert r["auc"] == 1.0 and r["n_pos"] == 2 and r["n_neg"] == 2

    reverse = _df(spark, [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)], "s double, y int")
    assert auc(reverse, "s", "y").collect()[0]["auc"] == 0.0

    all_tied = _df(spark, [(0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1)], "s double, y int")
    assert auc(all_tied, "s", "y").collect()[0]["auc"] == 0.5


def test_auc_hand_case_with_partial_ties(spark):
    # scores: pos {3, 2, 2}, neg {2, 1}; pairs = 6:
    #   (3,2)=1 (3,1)=1 (2,2)=.5 (2,1)=1 (2,2)=.5 (2,1)=1  -> U=5, AUC=5/6
    rows = [(3.0, 1), (2.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)]
    r = auc(_df(spark, rows, "s double, y int"), "s", "y").collect()[0]
    assert abs(r["auc"] - 5.0 / 6.0) < 1e-12


def test_auc_degenerate_single_class(spark):
    one_class = _df(spark, [(0.1, 1), (0.2, 1)], "s double, y int")
    assert auc(one_class, "s", "y").collect()[0]["auc"] is None


def test_calibration_bins_counts_and_rates(spark):
    rows = [(0.05, 0), (0.08, 1), (0.95, 1), (0.99, 1), (1.0, 1)]
    out = {
        r["bin"]: (r["n"], r["pos_rate"])
        for r in calibration_bins(_df(spark, rows, "s double, y int"), "s", "y").collect()
    }
    # 1.0 lands in the capped top bin with 0.95/0.99
    assert out[0] == (2, 0.5)
    assert out[9] == (3, 1.0)


def test_cohens_kappa_hand_case(spark):
    # classic 2-rater yes/no: a=yes,b=yes 20 | yes,no 5 | no,yes 10 | no,no 15
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    r = cohens_kappa(_df(spark, rows, "a string, b string"), "a", "b").collect()[0]
    po = 35 / 50
    pe = (25 / 50) * (30 / 50) + (25 / 50) * (20 / 50)
    assert abs(r["po"] - po) < 1e-12
    assert abs(r["pe"] - pe) < 1e-12
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-12


def test_chi2_hand_case_and_zero_cell(spark):
    # 2x2 with a zero observed cell: a1b1=10, a1b2=0, a2b1=5, a2b2=5
    rows = [("a1", "b1")] * 10 + [("a2", "b1")] * 5 + [("a2", "b2")] * 5
    r = chi_square_independence(
        _df(spark, rows, "x string, y string"), "x", "y"
    ).collect()[0]
    n = 20
    exp = {("a1", "b1"): 10 * 15 / n, ("a1", "b2"): 10 * 5 / n,
           ("a2", "b1"): 10 * 15 / n, ("a2", "b2"): 10 * 5 / n}
    obs = {("a1", "b1"): 10, ("a1", "b2"): 0, ("a2", "b1"): 5, ("a2", "b2"): 5}
    chi2 = sum((obs[k] - e) ** 2 / e for k, e in exp.items())
    assert abs(r["chi2"] - chi2) < 1e-10
    assert r["dof"] == 1 and r["n"] == 20


def test_welch_t_matches_numpy(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(10.0, 2.0, 40)
    b = rng.normal(10.5, 3.0, 55)
    rows = [(0, float(v)) for v in a] + [(1, float(v)) for v in b]
    r = welch_t(_df(spark, rows, "arm int, v double"), "arm", "v").collect()[0]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / 40 + vb / 55
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    dfw = se2**2 / ((va / 40) ** 2 / 39 + (vb / 55) ** 2 / 54)
    assert abs(r["t_stat"] - t) < 1e-9
    assert abs(r["df_welch"] - dfw) < 1e-6
    assert (r["n_a"], r["n_b"]) == (40, 55)


def test_welch_t_refuses_single_arm(spark):
    df = _df(spark, [(0, 1.0), (0, 2.0)], "arm int, v double")
    with pytest.raises(ValueError, match="two non-empty arms"):
        welch_t(df, "arm", "v")


def test_kappa_refuses_empty(spark):
    df = spark.createDataFrame([], "a string, b string")
    with pytest.raises(ValueError, match="empty"):
        cohens_kappa(df, "a", "b")


def test_kaplan_meier_textbook_case(spark):
    """Durations (event): 1(1), 2(1), 2(0), 3(1), 4(0) — classic KM:
    S(1)=4/5, S(2)=4/5*(1-1/4)=3/5, S(3)=3/5*(1-1/2)=3/10."""
    from dbt_lab_spark.functions.stats import kaplan_meier

    rows = [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0)]
    out = {
        r["t"]: (r["n_risk"], r["n_events"], r["survival"])
        for r in kaplan_meier(_df(spark, rows, "d int, e int"), "d", "e").collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1][:2] == (5, 1) and abs(out[1][2] - 0.8) < 1e-12
    assert out[2][:2] == (4, 1) and abs(out[2][2] - 0.6) < 1e-12
    assert out[3][:2] == (2, 1) and abs(out[3][2] - 0.3) < 1e-12


def test_kaplan_meier_reaches_zero_without_log_error(spark):
    from dbt_lab_spark.functions.stats import kaplan_meier

    rows = [(1, 1), (2, 1)]  # the last step kills everyone at risk
    out = sorted(
        (r["t"], r["survival"])
        for r in kaplan_meier(_df(spark, rows, "d int, e int"), "d", "e").collect()
    )
    assert abs(out[0][1] - 0.5) < 1e-12
    assert out[1][1] == 0.0


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """value = 100 + planted 24-period square wave; flat trend ->
    seasonal estimate matches the wave, residuals ~0 away from edges."""
    from dbt_lab_spark.functions.stats import seasonal_decompose

    wave = [5.0 if (t % 24) < 12 else -5.0 for t in range(120)]
    rows = [(t, 100.0 + wave[t]) for t in range(120)]
    out = {
        r["t"]: r
        for r in seasonal_decompose(
            _df(spark, rows, "t long, v double"), "t", "v"
        ).collect()
    }
    assert len(out) == 120
    interior = [out[t] for t in range(24, 96)]
    for r in interior:
        assert abs(r["trend"] - 100.0) < 0.5
        assert abs(r["seasonal"] - wave[r["t"]]) < 0.75
        assert abs(r["residual"]) < 1.0


# ---------------------------------------------------------------------------
# properties (hypothesis): the identities each metric must satisfy by
# definition, independent of the data
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# scores on an exact-binary grid (k/8, |s| <= 100): the affine
# transform in the invariance property must stay injective in float
# arithmetic — hypothesis found that a subnormal (1.2e-38) collapses
# into its neighbor under *3+7, which is a property-premise failure,
# not a metric bug
_scored_rows = st.lists(
    st.tuples(
        st.integers(min_value=-800, max_value=800).map(lambda k: k / 8.0),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=4,
    max_size=30,
).filter(lambda rows: len({y for _, y in rows}) == 2)


@settings(max_examples=15, deadline=None)
@given(rows=_scored_rows)
def test_auc_monotone_invariance_and_reversal(spark, rows):
    """AUC is invariant under strictly-increasing score transforms and
    complements under score negation (half-tie convention keeps both
    exact)."""
    df = _df(spark, [(float(s), y) for s, y in rows], "s double, y int")
    base = auc(df, "s", "y").collect()[0]["auc"]
    from pyspark.sql import functions as F

    mono = df.select((F.col("s") * 3 + 7).alias("s"), "y")
    assert abs(auc(mono, "s", "y").collect()[0]["auc"] - base) < 1e-12
    neg = df.select((-F.col("s")).alias("s"), "y")
    assert abs(auc(neg, "s", "y").collect()[0]["auc"] - (1.0 - base)) < 1e-12


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from("xyz"), st.sampled_from("xyz")),
        min_size=2,
        max_size=40,
    )
)
def test_kappa_symmetry_and_perfect_agreement(spark, rows):
    df = _df(spark, rows, "a string, b string")
    ab = cohens_kappa(df, "a", "b").collect()[0]
    ba = cohens_kappa(df, "b", "a").collect()[0]
    if ab["kappa"] is not None and ba["kappa"] is not None:
        assert abs(ab["kappa"] - ba["kappa"]) < 1e-12
    same = _df(spark, [(a, a) for a, _ in rows], "a string, b string")
    r = cohens_kappa(same, "a", "b").collect()[0]
    assert r["po"] == 1.0
    if r["pe"] < 1.0 - 1e-12:  # kappa undefined at pe == 1 (single category)
        assert abs(r["kappa"] - 1.0) < 1e-12


@settings(max_examples=10, deadline=None)
@given(
    durs=st.lists(st.integers(min_value=0, max_value=10), min_size=2, max_size=25)
)
def test_kaplan_meier_equals_ecdf_without_censoring(spark, durs):
    """With every subject observed (no censoring), KM collapses to the
    empirical survival function: S(t) = #(dur > t) / n, exactly."""
    from dbt_lab_spark.functions.stats import kaplan_meier

    df = _df(spark, [(d, 1) for d in durs], "d int, e int")
    n = len(durs)
    for r in kaplan_meier(df, "d", "e").collect():
        want = sum(1 for d in durs if d > r["t"]) / n
        assert abs(r["survival"] - want) < 1e-12, (r, want)


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        min_size=30,
        max_size=80,
    )
)
def test_seasonal_decompose_identity(spark, vals):
    """value == trend + seasonal + residual at every point, by
    construction — the additive-decomposition contract."""
    from dbt_lab_spark.functions.stats import seasonal_decompose

    rows = [(t, float(v)) for t, v in enumerate(vals)]
    out = seasonal_decompose(
        _df(spark, rows, "t long, v double"), "t", "v", period=7, half_window=3
    ).collect()
    assert len(out) == len(vals)
    for r in out:
        assert abs(r["value"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-9


def test_anova_matches_numpy_formula(spark):
    from dbt_lab_spark.functions.stats import anova_oneway

    rng = np.random.default_rng(11)
    groups = {"a": rng.normal(5, 1, 30), "b": rng.normal(6, 1, 25), "c": rng.normal(5.5, 1, 40)}
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    r = anova_oneway(_df(spark, rows, "g string, v double"), "g", "v").collect()[0]
    all_v = np.concatenate(list(groups.values()))
    grand = all_v.mean()
    ssb = sum(len(v) * (v.mean() - grand) ** 2 for v in groups.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
    f = (ssb / 2) / (ssw / (len(all_v) - 3))
    assert abs(r["f_stat"] - f) < 1e-6
    assert r["df_between"] == 2 and r["df_within"] == len(all_v) - 3


def test_spearman_monotone_and_ties(spark):
    from dbt_lab_spark.functions.stats import spearman_corr

    mono = _df(spark, [(float(i), float(i * i)) for i in range(1, 20)], "x double, y double")
    assert abs(spearman_corr(mono, "x", "y").collect()[0]["spearman"] - 1.0) < 1e-12
    anti = _df(spark, [(float(i), float(-i)) for i in range(1, 20)], "x double, y double")
    assert abs(spearman_corr(anti, "x", "y").collect()[0]["spearman"] + 1.0) < 1e-12
    # hand case with ties: x = 1,2,2,3 ; y = 10,20,20,30 -> rho 1 (avg ranks equal)
    tied = _df(spark, [(1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 30.0)], "x double, y double")
    assert abs(spearman_corr(tied, "x", "y").collect()[0]["spearman"] - 1.0) < 1e-12
