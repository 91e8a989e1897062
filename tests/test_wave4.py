"""Pin tests for the wave-4 operators (PR curve, Theil-Sen, ridge,
Poisson bootstrap, Z-order, Arrow IPC) against independent Python
references — the oracle-parity gate proves Spark==DuckDB; these prove
both match the textbook formula / library behavior."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.workload_extras import (
    _POIS_CDF,
    _PR_THRESHOLDS,
    _RIDGE_LAMBDA,
    _Z_BITS,
    _q_pr_curve,
    _q_ridge,
    _q_theil_sen,
    _q_zorder,
)


def test_pr_curve_counts_consistent(spark, sf_medium):
    """tp+fn is threshold-invariant (= total positives) and precision/
    recall/f1 follow from the counts exactly."""
    rows = _q_pr_curve(spark, sf_medium).collect()
    assert len(rows) == len(_PR_THRESHOLDS)
    positives = {r["tp"] + r["fn"] for r in rows}
    assert len(positives) == 1  # total positives invariant
    for r in rows:
        if r["tp"] + r["fp"] > 0:
            assert r["prec"] == pytest.approx(r["tp"] / (r["tp"] + r["fp"]), abs=1e-6)
        if r["tp"] + r["fn"] > 0:
            assert r["rec"] == pytest.approx(r["tp"] / (r["tp"] + r["fn"]), abs=1e-6)
        denom = 2 * r["tp"] + r["fp"] + r["fn"]
        if denom > 0:
            assert r["f1"] == pytest.approx(2 * r["tp"] / denom, abs=1e-6)
    # recall is monotone non-increasing in the threshold
    recs = [r["rec"] for r in sorted(rows, key=lambda r: r["t"])]
    assert all(a >= b for a, b in zip(recs, recs[1:]))


def test_theil_sen_matches_numpy_reference(spark, sf_small):
    """Recompute the hourly rollup + all-pairs median slope in NumPy
    from the same parquet and compare."""
    import duckdb

    con = duckdb.connect()
    hourly = con.execute(
        f"""SELECT CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
            FROM parquet_scan('{sf_small}/events.parquet') GROUP BY 1 ORDER BY 1"""
    ).fetchnumpy()
    h, y = hourly["h"].astype(np.int64), hourly["y"]
    slopes = []
    for i in range(len(h)):
        dy = y[i + 1 :] - y[i]
        dh = h[i + 1 :] - h[i]
        slopes.extend(dy / dh)
    slopes = np.sort(np.array(slopes))
    k = (len(slopes) + 1) // 2
    expected_slope = slopes[k - 1]
    row = _q_theil_sen(spark, sf_small).collect()[0]
    assert row["n_pairs"] == len(slopes)
    assert row["slope"] == pytest.approx(expected_slope, abs=1e-5)
    resid = np.sort(y - expected_slope * h)
    assert row["intercept"] == pytest.approx(resid[(len(resid) + 1) // 2 - 1], abs=1e-3)


def test_ridge_matches_numpy_solve(spark, sf_small):
    """Closed-form Cramer solve == numpy.linalg.solve on the same
    normal equations."""
    import duckdb

    con = duckdb.connect()
    x1, x2, yv = con.execute(
        f"""SELECT l.x1, CAST(l.x2 AS DOUBLE), CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
            FROM parquet_scan('{sf_small}/orders.parquet') o JOIN (
              SELECT l_orderkey, COUNT(*) AS x1,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS x2
              FROM parquet_scan('{sf_small}/lineitem.parquet') GROUP BY 1
            ) l ON l.l_orderkey = o.o_orderkey"""
    ).fetchnumpy().values()
    X = np.column_stack([np.ones_like(x1, dtype=float), x1, x2])
    A = X.T @ X + _RIDGE_LAMBDA * np.diag([0.0, 1.0, 1.0])
    beta = np.linalg.solve(A, X.T @ yv)
    row = _q_ridge(spark, sf_small).collect()[0]
    assert row["beta0"] == pytest.approx(beta[0], rel=1e-4)
    assert row["beta1"] == pytest.approx(beta[1], rel=1e-4)
    assert row["beta2"] == pytest.approx(beta[2], rel=1e-4)
    # sanity: more lines / more quantity => higher predicted total
    assert row["beta1"] > 0 or row["beta2"] > 0


def test_poisson_cdf_constants():
    """The embedded inverse-CDF thresholds ARE the Poisson(1) CDF."""
    from math import exp, factorial

    cum = 0.0
    for k, c in enumerate(_POIS_CDF):
        cum += exp(-1) / factorial(k)
        assert c == pytest.approx(cum, abs=1e-12)


def test_bootstrap_ci_brackets_mean(spark, sf_small):
    from dbt_lab_spark.workload_extras import _q_bootstrap_ci

    row = _q_bootstrap_ci(spark, sf_small).collect()[0]
    assert row["ci_lo"] <= row["mean_hat"] <= row["ci_hi"]
    # CI of the mean over n>=1500 orders should be within a few percent
    spread = (row["ci_hi"] - row["ci_lo"]) / row["mean_hat"]
    assert 0 < spread < 0.2


def _morton_ref(d: int, p: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((d >> i) & 1) << (2 * i)
        z |= ((p >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_buckets_match_python_reference(spark, sf_small):
    """Spark's generated bit-interleave == the python reference, and
    z-bucketing keeps per-bucket bboxes small vs the global domain."""
    import duckdb

    con = duckdb.connect()
    dims = con.execute(
        f"""SELECT least(greatest(datediff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE)), 0), {(1 << _Z_BITS) - 1}) AS d,
                   least(CAST(floor(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                                    / 20000.0) AS BIGINT), {(1 << _Z_BITS) - 1}) AS p
            FROM parquet_scan('{sf_small}/orders.parquet')"""
    ).fetchall()
    from collections import defaultdict

    ref = defaultdict(lambda: [0, 1 << 30, -1, 1 << 30, -1])
    for d, p in dims:
        zb = _morton_ref(int(d), int(p), _Z_BITS) >> 18
        e = ref[zb]
        e[0] += 1
        e[1], e[2] = min(e[1], d), max(e[2], d)
        e[3], e[4] = min(e[3], p), max(e[4], p)
    rows = {r["zbucket"]: r for r in _q_zorder(spark, sf_small).collect()}
    assert set(rows) == set(ref)
    for zb, (n, mind, maxd, minp, maxp) in ref.items():
        r = rows[zb]
        assert (r["n"], r["min_day"], r["max_day"], r["min_pb"], r["max_pb"]) == (
            n, mind, maxd, minp, maxp,
        )


def test_arrow_ipc_roundtrip_exact(spark):
    """Pack -> unpack returns exactly the input vectors (float32)."""
    from dbt_lab_spark.sources import build_arrow_ipc_shards, read_arrow_ipc_vectors

    data = [(i, [float(i) + 0.25, float(i) * 0.5, -float(i)]) for i in range(50)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    back = read_arrow_ipc_vectors(build_arrow_ipc_shards(df, n_shards=4))
    got = {r["vec_id"]: r["embedding"] for r in back.collect()}
    assert len(got) == 50
    for i, vec in data:
        assert got[i] == pytest.approx(vec, abs=1e-6)


def test_arrow_ipc_blob_is_valid_arrow_stream(spark):
    """The blobs are readable by plain pyarrow — interop contract."""
    import pyarrow as pa

    from dbt_lab_spark.sources import build_arrow_ipc_shards

    df = spark.createDataFrame(
        [(i, [0.5 * i, 1.5 * i]) for i in range(8)], "vec_id long, embedding array<float>"
    )
    blobs = build_arrow_ipc_shards(df, n_shards=2).select("blob").collect()
    total = 0
    for (blob,) in blobs:
        t = pa.ipc.open_stream(pa.BufferReader(bytes(blob))).read_all()
        assert t.schema.names == ["ids", "embeddings"]
        total += t.num_rows
    assert total == 8
