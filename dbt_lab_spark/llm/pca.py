"""Distributed PCA for embedding columns.

The whitening/reduction step an embedding pipeline runs before
quantization, clustering, or index build (e.g. OPQ/IVF preprocessing):
fit on the full corpus in ONE map-only pass, project map-only.

Spark posture (the Lloyd/logreg sufficient-stats pattern):
  pca_fit      every partition emits (n, sum_x, X^T X) — d + d*d floats,
               independent of row count — and the driver reduces
               partitions-many partials and runs a d x d eigh.  d is the
               embedding width (O(100s)), so the driver work is
               microscopic next to the scan; nothing driver-side scales
               with corpus size.
  pca_project  Arrow-batched (X - mean) @ W^T matmul in mapInPandas —
               the vectorized path, never per-element higher-order
               lambdas (see llm/similarity.py ivf_assign for the
               measured ~10x gap).

Deterministic: np.linalg.eigh on the exact reduced covariance; each
component's sign is canonicalized (largest-|coordinate| entry made
positive), so refits agree to float reduction order.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 4) -> dict:
    """Fit PCA: returns {'mean': (d,), 'components': (k, d),
    'explained_variance': (k,), 'n': int} — components are rows,
    eigenvalue-descending."""
    mean, cov, n = pca_cov(df, vec_col)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T  # (k, d)
    # canonical sign: the largest-|x| coordinate of each component > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": eigvals[order],
        "n": n,
    }


def pca_cov(df: DataFrame, vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray, int]:
    """The sufficient-stats pass shared by pca_fit and
    pca_power_component: one map-only job emitting (n, sum_x, X^T X)
    per partition, reduced on the driver.  Returns (mean (d,),
    cov (d, d) with n-1 denominator, n)."""

    def _partials(batches):
        import pandas as pd

        acc = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0)
            xtx = x.T @ x
            if acc is None:
                acc = (s, xtx)
            else:
                acc = (acc[0] + s, acc[1] + xtx)
        if acc is not None:
            payload = np.concatenate([[n], acc[0], acc[1].ravel()])
            yield pd.DataFrame({"stat": [payload.tobytes()]})

    rows = df.select(vec_col).mapInPandas(_partials, "stat binary").collect()
    if not rows:
        raise ValueError("pca_cov: empty input")
    total = None
    for r in rows:
        p = np.frombuffer(r["stat"], dtype=np.float64)
        total = p if total is None else total + p
    d = int((-1 + np.sqrt(1 + 4 * (len(total) - 1))) / 2)
    n = int(total[0])
    if n < 2:
        raise ValueError("pca_cov: need at least 2 vectors")
    s = total[1 : 1 + d]
    xtx = total[1 + d :].reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    return mean, cov, n


def pca_power_component(
    df: DataFrame, vec_col: str = "embedding", iters: int = 12
) -> dict:
    """Dominant principal component by UNNORMALIZED power iteration —
    the oracle-checkable fit: exactly `iters` applications of the
    covariance to the deterministic all-ones start vector, normalized
    and sign-canonicalized ONCE at the end.

    Skipping per-step normalization changes nothing mathematically
    (scale factors out of the final normalize) and keeps every step a
    pure linear map a SQL engine can replay as `iters` chained
    join+aggregate CTEs; doubles stay in range as long as
    lambda_1^iters does (|lambda_1| in [1e-25, 1e25] at iters=12).
    The result is the exact `iters`-step iterate — convergence to the
    true eigenvector is a separate question tuned by `iters`; the
    contract is determinism of the iterate itself.  Sign convention
    matches pca_fit: the largest-|coordinate| entry is positive
    (ties to the lowest index, like np.argmax)."""
    mean, cov, n = pca_cov(df, vec_col)
    v = np.ones(cov.shape[0], dtype=np.float64)
    for _ in range(iters):
        v = cov @ v
    nrm = np.linalg.norm(v)
    if nrm == 0.0:
        raise ValueError("pca_power_component: zero iterate (degenerate covariance)")
    v = v / nrm
    j = int(np.argmax(np.abs(v)))
    if v[j] < 0:
        v = -v
    lam = float(v @ cov @ v)
    return {"mean": mean, "component": v, "eigval_estimate": lam, "n": n}


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("vec_id",),
    out_col: str = "proj",
) -> DataFrame:
    """Project vectors onto the fitted components: map-only Arrow
    batches, one NumPy matmul per batch.  Output keeps `keep_cols`
    plus `out_col` (array<double>, length k)."""
    mean = model["mean"]
    comps = model["components"]

    schema = T.StructType(
        [df.schema[c] for c in keep_cols]
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def _project(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = (x - mean) @ comps.T
            out = {c: pdf[c] for c in keep_cols}
            out[out_col] = list(proj)
            yield pd.DataFrame(out)

    return df.select(*keep_cols, vec_col).mapInPandas(_project, schema)
