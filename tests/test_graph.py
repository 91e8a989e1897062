"""Pins for functions/graph.py (PageRank power iteration)."""

import numpy as np
import pytest

from dbt_lab_spark.functions.graph import pagerank


def _np_pagerank(edges, n_nodes, iters, d=0.85, weights=None):
    """Dense NumPy reference of the identical recurrence."""
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for k, (u, v) in enumerate(edges):
        w[idx[u], idx[v]] += weights[k] if weights else 1.0
    out = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = r[out == 0].sum()
        inflow = np.zeros(n)
        for i in range(n):
            if out[i] > 0:
                inflow += r[i] * w[i] / out[i]
        r = (1 - d) / n + d * (inflow + dm / n)
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_numpy_reference(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=8).collect()}
    want = _np_pagerank(edges, 4, 8)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_weighted_edges(spark):
    edges = [(1, 2, 3.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=10, weight="w").collect()}
    want = _np_pagerank([(u, v) for u, v, _ in edges], 3, 10, weights=[w for *_, w in edges])
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    # node 2 gets 3x the flow of node 3 from node 1
    assert got[2] > got[3]


def test_pagerank_dangling_mass_conserved(spark):
    # node 3 has no out-edges: its rank teleports uniformly
    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(df, iters=12).collect()
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-12)
    want = _np_pagerank(edges, 3, 12)
    for r in rows:
        assert r["rank"] == pytest.approx(want[r["node"]], rel=1e-12)


def test_pagerank_deterministic_under_repartition(spark):
    edges = [(i, (i * 7) % 11) for i in range(11)] + [(3, 5), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank"] for r in pagerank(df, iters=6).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(df.repartition(9), iters=6).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12)


def test_pagerank_empty_edges_raises(spark):
    df = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty"):
        pagerank(df, iters=1)
