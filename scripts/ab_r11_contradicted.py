#!/usr/bin/env python
"""Round-11 quiet-machine A/B for the four measurements VERDICT r10
flagged as contradicted (Next-round item #1).

Interleaved same-process, same-epoch medians: for each query we run
variant A (HEAD) and variant B (candidate fix) alternating A,B,A,B,...
after one warm-up each, so an epoch-level machine slowdown hits both
variants equally.  Variants:

  q_bfs_hops        A = lazy visited union (HEAD, r10 Wave D edit)
                    B = per-hop checkpoint of visited (r9 shape)
  q_assortativity   A = eager localCheckpoint of _trade_edges_topk (HEAD)
                    B = lazy localCheckpoint
  q_merge_upsert    A = HEAD (no candidate edit: code path untouched in
                    r10 — measured isolated to settle noise-vs-real)
  q_knn_ivf_seeded  A = HEAD (same: profile-only)

Usage: python scripts/ab_r11_contradicted.py [reps=5]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import functions as F

from dbt_lab_spark.session import get_spark
from dbt_lab_spark.workload import all_queries

SF_DIR = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.perf_counter()
    noop(fn())
    return time.perf_counter() - t0


def bfs_hops_checkpointed(edges, source, max_hops=8, checkpoint_dir=None,
                          src="src", dst="dst"):
    """r9 shape: checkpoint the visited union every hop."""
    from dbt_lab_spark.llm.dedup import _checkpointer

    ckpt = _checkpointer(edges, checkpoint_dir)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    visited = ckpt(
        e.sparkSession.range(1).select(
            F.lit(source).alias("node"), F.lit(0).alias("hops")
        )
    )
    frontier = visited
    try:
        for hop in range(1, max_hops + 1):
            nxt = (
                frontier.join(e, frontier.node == e.src)
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .withColumn("hops", F.lit(hop))
            )
            frontier = ckpt(nxt)
            if frontier.limit(1).count() == 0:
                break
            visited = ckpt(visited.unionByName(frontier))
    finally:
        e.unpersist()
    return visited


def main():
    spark = get_spark(app_name="ab-r11",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    builders = {q.name: q.build for q in all_queries()}

    import dbt_lab_spark.functions.graph as graph_mod
    import dbt_lab_spark.workload_extras as wx

    orig_bfs = graph_mod.bfs_hops
    orig_edges = wx._trade_edges_topk

    # Variant hooks -----------------------------------------------------
    def set_bfs(variant):
        graph_mod.bfs_hops = orig_bfs if variant == "A" else bfs_hops_checkpointed

    from dbt_lab_spark.catalog import Catalog
    from dbt_lab_spark.operators.scan import scan as scan_fn
    from pyspark.sql.window import Window

    def trade_edges_variant(eager):
        def _fn(spark, sf_dir):
            cat = Catalog(sf_dir)
            li = scan_fn(spark, cat, "lineitem", ["l_orderkey", "l_suppkey"])
            orders = scan_fn(spark, cat, "orders", ["o_orderkey", "o_custkey"])
            cust = scan_fn(spark, cat, "customer", ["c_custkey", "c_nationkey"])
            supp = scan_fn(spark, cat, "supplier", ["s_suppkey", "s_nationkey"])
            weighted = (
                li.join(orders, li.l_orderkey == orders.o_orderkey)
                .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
                .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
                .filter(F.col("c_nationkey") != F.col("s_nationkey"))
                .groupBy(F.col("c_nationkey").alias("src"),
                         F.col("s_nationkey").alias("dst"))
                .agg(F.count("*").alias("w"))
            )
            w = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
            return (
                weighted.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= wx._TOP_OUT_EDGES)
                .select("src", "dst")
                .localCheckpoint(eager=eager)
            )
        return _fn

    def set_edges(variant):
        wx._trade_edges_topk = (
            trade_edges_variant(True) if variant == "A" else trade_edges_variant(False)
        )

    plans = [
        ("q_bfs_hops", set_bfs),
        ("q_assortativity", set_edges),
        ("q_merge_upsert", None),
        ("q_knn_ivf_seeded", None),
    ]

    for name, hook in plans:
        build = builders[name]
        res = {"A": [], "B": []}
        variants = ["A", "B"] if hook else ["A"]
        # warm-up each variant once
        for v in variants:
            if hook:
                hook(v)
            noop(build(spark, SF_DIR))
        for _ in range(REPS):
            for v in variants:
                if hook:
                    hook(v)
                res[v].append(timed(lambda: build(spark, SF_DIR)))
        if hook:
            hook("A")  # restore
        out = {v: round(statistics.median(r), 3) for v, r in res.items() if r}
        detail = {v: [round(x, 3) for x in r] for v, r in res.items() if r}
        print(f"{name}: medians={out} runs={detail}", flush=True)

    graph_mod.bfs_hops = orig_bfs
    wx._trade_edges_topk = orig_edges


if __name__ == "__main__":
    main()
