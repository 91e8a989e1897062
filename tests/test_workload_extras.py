"""Pin tests for the r3-session extras: BFS, triangle counting, and
the derived workload queries (oracle parity for these runs in
test_oracle_parity / scripts/parity_sweep.py; here we pin the graph
primitives on hand-built graphs where the answer is checkable by
eye)."""

from __future__ import annotations

from dbt_lab_spark.functions.graph import bfs_hops, triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


class TestBfsHops:
    def test_path_with_branch_and_unreachable(self, spark):
        # 0->1->2->3 chain, branch 1->4, isolated 9->10 (unreachable)
        e = _edges(spark, [(0, 1), (1, 2), (2, 3), (1, 4), (9, 10)])
        got = {r.node: r.hops for r in bfs_hops(e, 0).collect()}
        assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2}

    def test_cycle_takes_min_hops(self, spark):
        # two routes to 3: 0->1->2->3 (3 hops) and 0->3 (1 hop)
        e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3), (3, 0)])
        got = {r.node: r.hops for r in bfs_hops(e, 0).collect()}
        assert got == {0: 0, 1: 1, 2: 2, 3: 1}

    def test_max_hops_truncates(self, spark):
        e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
        got = {r.node: r.hops for r in bfs_hops(e, 0, max_hops=2).collect()}
        assert got == {0: 0, 1: 1, 2: 2}

    def test_source_only(self, spark):
        e = _edges(spark, [(5, 6)])
        got = {r.node: r.hops for r in bfs_hops(e, 0).collect()}
        assert got == {0: 0}


class TestTriangleCount:
    def test_k4_every_node_in_three(self, spark):
        # complete graph on 4 nodes: C(3,2)=3 triangles per node
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        got = {r.node: r.n_tri for r in triangle_count(_edges(spark, k4)).collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_triangle_plus_tail(self, spark):
        # one triangle 0-1-2; tail 2-3 contributes nothing
        e = _edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
        got = {r.node: r.n_tri for r in triangle_count(e).collect()}
        assert got == {0: 1, 1: 1, 2: 1}

    def test_reverse_and_duplicate_edges_collapse(self, spark):
        # same triangle declared with mixed directions and repeats
        e = _edges(spark, [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (0, 1)])
        got = {r.node: r.n_tri for r in triangle_count(e).collect()}
        assert got == {0: 1, 1: 1, 2: 1}

    def test_self_loops_ignored(self, spark):
        e = _edges(spark, [(0, 0), (0, 1), (1, 2), (2, 0), (1, 1)])
        got = {r.node: r.n_tri for r in triangle_count(e).collect()}
        assert got == {0: 1, 1: 1, 2: 1}

    def test_square_has_no_triangles(self, spark):
        e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
        assert triangle_count(e).count() == 0


class TestDatasetDiff:
    def test_classifies_all_four_changes(self, spark):
        from dbt_lab_spark.operators.dml import dataset_diff

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 20), (4, "d", 40)], "k long, s string, v long"
        )
        rows = {r.k: r for r in dataset_diff(old, new, keys=["k"]).collect()}
        assert rows[1].change == "unchanged"
        assert rows[2].change == "changed" and rows[2].s_changed and not rows[2].v_changed
        assert rows[3].change == "removed"
        assert rows[4].change == "added"

    def test_null_safe_compare(self, spark):
        from dbt_lab_spark.operators.dml import dataset_diff

        old = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
        new = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
        rows = {r.k: r for r in dataset_diff(old, new, keys=["k"]).collect()}
        assert rows[1].change == "unchanged"  # null == null under eqNullSafe
        assert rows[2].change == "changed" and rows[2].s_changed

    def test_schema_mismatch_raises(self, spark):
        import pytest as _pytest

        from dbt_lab_spark.operators.dml import dataset_diff

        old = spark.createDataFrame([(1, "a")], "k long, s string")
        new = spark.createDataFrame([(1, 2)], "k long, v long")
        with _pytest.raises(ValueError, match="schema mismatch"):
            dataset_diff(old, new, keys=["k"])


class TestHllSketch:
    def test_estimate_within_expected_error(self, spark, sf_medium):
        """m=256 HLL has ~6.5% standard error; a symmetric formula bug
        (which the identical-oracle can't catch) would blow way past
        25% against the exact NDV carried in the same row."""
        from dbt_lab_spark.workload_extras import _q_hll_sketch

        row = _q_hll_sketch(spark, sf_medium).collect()[0]
        assert row.exact_ndv > 0
        assert row.rel_err < 0.25


class TestSkyline:
    def test_skyline_no_dominated_points(self, spark, sf_medium):
        from dbt_lab_spark.workload_extras import _q_skyline

        pts = [(r.price, r.size) for r in _q_skyline(spark, sf_medium).collect()]
        assert pts, "skyline empty"
        for i, (p1, s1) in enumerate(pts):
            for j, (p2, s2) in enumerate(pts):
                if i != j:
                    dominated = p2 <= p1 and s2 >= s1 and (p2 < p1 or s2 > s1)
                    assert not dominated, f"{(p1, s1)} dominated by {(p2, s2)}"


class TestPpjoin:
    def test_ppjoin_equals_exact_on_skewed_corpus(self, spark):
        """Prefix filtering must lose nothing: a shared boilerplate
        header (the hot-shingle worst case) plus planted near-dup
        pairs; results must be bit-identical to the plain inverted
        index."""
        from dbt_lab_spark.llm.dedup import (
            ngram_jaccard_all_pairs,
            ngram_jaccard_ppjoin,
        )

        header = "common header words repeated across many documents"
        rows = [(i, f"{header} unique tail {i} alpha beta {i * 7}") for i in range(80)]
        rows += [
            (1000 + i, f"planted near duplicate pair body {i // 2} same text words")
            for i in range(12)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        exact = sorted(map(tuple, ngram_jaccard_all_pairs(docs).collect()))
        pp = sorted(map(tuple, ngram_jaccard_ppjoin(docs).collect()))
        assert pp == exact
        assert len(exact) > 0

    def test_ppjoin_short_docs_edge(self, spark):
        from dbt_lab_spark.llm.dedup import ngram_jaccard_ppjoin

        docs = spark.createDataFrame(
            [(1, "one two"), (2, "one two"), (3, "different words entirely")],
            "doc_id long, text string",
        )
        got = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_ppjoin(docs).collect()}
        assert got == {(1, 2): 1.0}
