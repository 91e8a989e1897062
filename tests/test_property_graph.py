"""Property tests: the distributed graph primitives against
brute-force pure-Python references on random graphs (the same
oracle-by-different-algorithm discipline the SQL oracles apply,
but for the operators whose declared-query graphs are small)."""

from __future__ import annotations

import random
from collections import deque

from dbt_lab_spark.functions.graph import bfs_hops, triangle_count


def _py_bfs(edges: list[tuple[int, int]], source: int) -> dict[int, int]:
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    hops = {source: 0}
    q = deque([source])
    while q:
        n = q.popleft()
        for m in adj.get(n, []):
            if m not in hops:
                hops[m] = hops[n] + 1
                q.append(m)
    return hops


def _py_triangles(edges: list[tuple[int, int]]) -> dict[int, int]:
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in und for n in e}
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    counts: dict[int, int] = {}
    seen = set()
    for a, b in und:
        for c in adj[a] & adj[b]:
            tri = tuple(sorted((a, b, c)))
            if tri in seen:
                continue
            seen.add(tri)
            for n in tri:
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_bfs_matches_python_on_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(5):
        n = rng.randint(5, 25)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 3 * n))
        ]
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.hops for r in bfs_hops(e, 0, max_hops=30).collect()}
        want = _py_bfs(edges, 0)
        assert got == want, f"trial {trial}: {sorted(got.items())} != {sorted(want.items())}"


def test_triangles_match_python_on_random_graphs(spark):
    rng = random.Random(13)
    for trial in range(5):
        n = rng.randint(4, 20)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 4 * n))
        ]
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.n_tri for r in triangle_count(e).collect()}
        want = _py_triangles(edges)
        assert got == want, f"trial {trial}: {sorted(got.items())} != {sorted(want.items())}"


def test_dataset_diff_matches_python_reference(spark):
    from dbt_lab_spark.operators.dml import dataset_diff

    rng = random.Random(17)
    old_rows = {i: (rng.choice(["a", "b", None]), rng.randint(0, 5)) for i in range(40)}
    new_rows = {}
    for i in range(50):
        if i in old_rows and rng.random() < 0.5:
            new_rows[i] = old_rows[i]  # unchanged
        elif rng.random() < 0.8:
            new_rows[i] = (rng.choice(["a", "b", "c", None]), rng.randint(0, 5))
    old = spark.createDataFrame(
        [(k, s, v) for k, (s, v) in old_rows.items()], "k long, s string, v long"
    )
    new = spark.createDataFrame(
        [(k, s, v) for k, (s, v) in new_rows.items()], "k long, s string, v long"
    )
    got = {r.k: r.change for r in dataset_diff(old, new, keys=["k"]).collect()}
    for k in set(old_rows) | set(new_rows):
        if k not in old_rows:
            want = "added"
        elif k not in new_rows:
            want = "removed"
        elif old_rows[k] != new_rows[k]:
            want = "changed"
        else:
            want = "unchanged"
        assert got[k] == want, f"key {k}: {got[k]} != {want}"
