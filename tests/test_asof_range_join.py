"""As-of join and banded range join — correctness vs independent
implementations (pandas.merge_asof; brute-force python range match)
plus the plan-shape guarantees that make them scale-safe.

The reference has neither operator (SURVEY.md §2.3 — equi/θ joins
only); these are the time-series capability upgrades, so the test
model is planted-data + property-random, mirroring the reference's
randomized operator tests (TestPhysicalOperatorsIIIStudents)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

from dbt_lab_spark.operators.joins import asof_join, range_join

_T0 = datetime(2024, 3, 1, 0, 0, 0)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _rand_frames(seed, n_left=120, n_right=90, n_keys=7):
    rng = random.Random(seed)
    left = [
        (k, _T0 + timedelta(seconds=rng.randrange(0, 5000)), i)
        for i, k in enumerate(rng.choices(range(n_keys), k=n_left))
    ]
    right = [
        (k, _T0 + timedelta(seconds=rng.randrange(0, 5000)), float(i))
        for i, k in enumerate(rng.choices(range(n_keys), k=n_right))
    ]
    # unique (key, ts) on the right so the matched value is deterministic
    seen, uniq = set(), []
    for k, t, v in right:
        if (k, t) not in seen:
            seen.add((k, t))
            uniq.append((k, t, v))
    return left, uniq


def _pandas_asof(left, right, direction, tolerance_ms=None):
    lp = pd.DataFrame(left, columns=["k", "ts", "lid"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right, columns=["k", "rts", "val"]).sort_values("rts", kind="stable")
    tol = pd.Timedelta(milliseconds=tolerance_ms) if tolerance_ms is not None else None
    m = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k", direction=direction, tolerance=tol
    )
    return {
        int(r.lid): (None if pd.isna(r.rts) else (r.rts.to_pydatetime(), r.val))
        for r in m.itertuples()
    }


def _spark_asof(spark, left, right, direction, tolerance_ms=None):
    ldf = _mk(spark, left, ["k", "ts", "lid"])
    rdf = _mk(spark, right, ["k", "rts", "val"])
    out = asof_join(
        ldf, rdf, "k", "ts", "rts", direction=direction, tolerance_ms=tolerance_ms
    ).collect()
    return {
        int(r["lid"]): (None if r["rts"] is None else (r["rts"], r["val"])) for r in out
    }


def test_asof_backward_matches_pandas(spark):
    for seed in (1, 2, 3):
        left, right = _rand_frames(seed)
        assert _spark_asof(spark, left, right, "backward") == _pandas_asof(
            left, right, "backward"
        ), f"seed {seed}"


def test_asof_forward_matches_pandas(spark):
    for seed in (4, 5):
        left, right = _rand_frames(seed)
        assert _spark_asof(spark, left, right, "forward") == _pandas_asof(
            left, right, "forward"
        ), f"seed {seed}"


def test_asof_tolerance_matches_pandas(spark):
    left, right = _rand_frames(6)
    tol = 300_000  # 5 min — planted spread is 5000s, so this genuinely prunes
    assert _spark_asof(spark, left, right, "backward", tol) == _pandas_asof(
        left, right, "backward", tol
    )


def test_asof_inclusive_tie_and_missing_key(spark):
    left = [(1, _T0, 0), (2, _T0, 1)]  # key 2 has no right rows
    right = [(1, _T0, 7.0)]  # exactly equal ts → must match (inclusive)
    got = _spark_asof(spark, left, right, "backward")
    assert got == {0: (_T0, 7.0), 1: None}


def test_asof_plans_single_window_no_join(spark):
    ldf = _mk(spark, [(1, _T0, 0)], ["k", "ts", "lid"])
    rdf = _mk(spark, [(1, _T0, 1.0)], ["k", "rts", "val"])
    plan = asof_join(ldf, rdf, "k", "ts", "rts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan  # union + window, never a join
    assert "Window" in plan, plan


def _python_range(left, right, lo_ms, hi_ms):
    out = set()
    for k, lt, lid in left:
        for rk, rt, v in right:
            if rk == k and lo_ms <= (rt - lt).total_seconds() * 1000 <= hi_ms:
                out.add((lid, v))
    return out


def test_range_join_matches_bruteforce(spark):
    for seed, lo, hi in ((7, 0, 600_000), (8, -300_000, 300_000), (9, 1000, 3_600_000)):
        left, right = _rand_frames(seed)
        ldf = _mk(spark, left, ["k", "ts", "lid"])
        rdf = _mk(spark, right, ["k", "rts", "val"])
        got = {
            (int(r["lid"]), r["val"])
            for r in range_join(ldf, rdf, "k", "ts", "rts", lo, hi).collect()
        }
        assert got == _python_range(left, right, lo, hi), f"seed {seed} band ({lo},{hi})"


def test_range_join_boundary_exact(spark):
    """Rows at exactly lower/upper bound are included; one ms outside is
    not — guards the integer-bin arithmetic against off-by-one."""
    hi = 3_600_000
    left = [(1, _T0, 0)]
    right = [
        (1, _T0, 1.0),  # delta 0 → in
        (1, _T0 + timedelta(milliseconds=hi), 2.0),  # delta == upper → in
        (1, _T0 + timedelta(milliseconds=hi + 1), 3.0),  # just outside
        (1, _T0 - timedelta(milliseconds=1), 4.0),  # before lower
    ]
    ldf = _mk(spark, left, ["k", "ts", "lid"])
    rdf = _mk(spark, right, ["k", "rts", "val"])
    got = {r["val"] for r in range_join(ldf, rdf, "k", "ts", "rts", 0, hi).collect()}
    assert got == {1.0, 2.0}


def test_range_join_no_cartesian(spark):
    ldf = _mk(spark, [(1, _T0, 0)], ["k", "ts", "lid"])
    rdf = _mk(spark, [(1, _T0, 1.0)], ["k", "rts", "val"])
    plan = (
        range_join(ldf, rdf, "k", "ts", "rts", 0, 1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
