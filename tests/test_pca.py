"""Pins for llm/pca.py: distributed sufficient-stats PCA vs exact
NumPy PCA on the same data."""

import numpy as np
import pytest

from dbt_lab_spark.llm.pca import pca_fit, pca_project


def _vectors(spark, n=300, d=8, seed=4):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: two dominant directions
    basis = rng.normal(size=(d, d))
    scales = np.array([10, 5, 1, 1, 0.5, 0.5, 0.1, 0.1])
    x = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d) * 3
    rows = [(i, [float(v) for v in x[i]], int(i % 3)) for i in range(n)]
    return x, spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _np_pca(x, k):
    x = x.astype(np.float64)
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, eigvals[order]


def test_pca_fit_matches_numpy(spark):
    x, df = _vectors(spark)
    # the DataFrame carries float32 embeddings — compare against numpy
    # PCA of the same float32-rounded data
    x32 = x.astype(np.float32).astype(np.float64)
    model = pca_fit(df, k=4)
    mean, comps, ev = _np_pca(x32, 4)
    assert model["n"] == 300
    assert np.allclose(model["mean"], mean, rtol=1e-9, atol=1e-9)
    assert np.allclose(model["explained_variance"], ev, rtol=1e-7)
    assert np.allclose(model["components"], comps, rtol=1e-6, atol=1e-8)


def test_pca_projection_variance_equals_eigenvalues(spark):
    x, df = _vectors(spark, seed=9)
    model = pca_fit(df, k=3)
    proj = np.stack(
        [np.array(r["proj"]) for r in pca_project(df, model).orderBy("vec_id").collect()]
    )
    var = proj.var(axis=0, ddof=1)
    assert np.allclose(var, model["explained_variance"], rtol=1e-6)
    # components are orthonormal
    g = model["components"] @ model["components"].T
    assert np.allclose(g, np.eye(3), atol=1e-10)


def test_pca_deterministic_under_repartition(spark):
    _, df = _vectors(spark, n=150, seed=12)
    m1 = pca_fit(df, k=2)
    m2 = pca_fit(df.repartition(11), k=2)
    assert np.allclose(m1["components"], m2["components"], rtol=1e-9, atol=1e-12)
    assert np.allclose(m1["mean"], m2["mean"], rtol=1e-12)


def test_pca_power_component_matches_numpy_iterate(spark):
    """pca_power_component is the exact iters-step unnormalized power
    iterate: replicate it in NumPy from the same covariance and compare
    bit-tight; on this anisotropic cloud (eigengap 10x vs 5x) 12 steps
    also converge to the eigh dominant component."""
    from dbt_lab_spark.llm.pca import pca_power_component

    x, df = _vectors(spark)
    x32 = x.astype(np.float32).astype(np.float64)
    model = pca_power_component(df, iters=12)
    mean = x32.mean(axis=0)
    cov = np.cov(x32, rowvar=False, ddof=1)
    v = np.ones(cov.shape[0])
    for _ in range(12):
        v = cov @ v
    v = v / np.linalg.norm(v)
    j = int(np.argmax(np.abs(v)))
    if v[j] < 0:
        v = -v
    assert np.allclose(model["component"], v, rtol=1e-9, atol=1e-12)
    assert np.allclose(model["mean"], mean, rtol=1e-9)
    # converged on this spectrum: agrees with the exact dominant eigvec
    _, comps, ev = _np_pca(x32, 1)
    assert abs(float(np.dot(model["component"], comps[0]))) > 0.9999
    assert np.isclose(model["eigval_estimate"], ev[0], rtol=1e-4)


def test_pca_empty_and_degenerate(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty)
    one = spark.createDataFrame([(0, [1.0, 2.0], 0)], "vec_id long, embedding array<float>, label int")
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(one)
