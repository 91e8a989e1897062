"""Distributed graph algorithms over edge DataFrames.

Connected components (pointer-jumping) lives in llm/dedup.py where the
dedup pipeline uses it; this module holds the rank-propagation side:
PageRank by power iteration, the canonical quality-weighting step for
web-crawl curation (a page's rank feeds the keep/drop decision and the
sampling temperature of web-scale training corpora).

Spark posture: each iteration is `edges JOIN ranks` shuffled on the
edge key + one aggregate — the same plan a billion-node web graph
needs; nothing driver-side scales with node count except one 1-row
dangling-mass scalar per iteration (an aggregate pull, same class as
the Lloyd centroid reduce in llm/similarity.py).  Lineage is truncated
every iteration (localCheckpoint, or reliable checkpoint under
`checkpoint_dir=` — the executor-loss contract matches
llm/dedup.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted PageRank over (src, dst[, weight]) edges.

    Standard formulation: rank' = (1-d)/N + d * (in-flow + dangling/N),
    where in-flow distributes each node's rank over its out-edges
    proportionally to weight, and the rank mass of dangling nodes
    (no out-edges) teleports uniformly.  Deterministic: fixed
    iteration count, no sampling.

    Returns (node, rank); ranks sum to 1 at every iteration.
    """
    from dbt_lab_spark.llm.dedup import _checkpointer

    ckpt = _checkpointer(edges, checkpoint_dir)
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    # Truncate the upstream edge extraction ONCE (r10 opt): nodes,
    # out_w/norm_e and dangling all derive from `e`, and without this
    # each of their materializations re-executed whatever join/aggregate
    # pipeline produced the edges (for the trade graph, a fact-fact
    # join) — three full passes where one suffices.  Cost is O(edges)
    # blocks, the same order the norm_e persist below already holds.
    e = ckpt(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    ).persist()
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge set")
    # per-src normalized edge weight (the column a web graph would
    # precompute once and reuse every iteration)
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm_e = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    ).persist()
    norm_e.count()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    dangling = nodes.join(
        norm_e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).persist()
    # one upfront check saves a whole aggregate job per iteration on
    # graphs where every node has out-edges
    has_dangling = dangling.limit(1).count() > 0
    # Checkpoint INTERVAL (r10 opt): on a dangling-free graph no
    # per-iteration action is needed, so truncating lineage every
    # iteration just pays one materialization job + one AQE planning
    # round per iteration (measured: 2.2 s of a 3.5 s q_pagerank wall
    # was driver-side gaps between ~4 jobs/iteration).  Checkpointing
    # every 3rd iteration keeps the lazy chain's plan depth bounded at
    # <= 3 rounds over already-materialized inputs while cutting the
    # action count ~3x.  With dangling nodes the per-iteration dm
    # aggregate forces one action per iteration anyway, so each
    # iteration is checkpointed there (the lazy tail would otherwise be
    # recomputed by the dm action of every later iteration).
    ckpt_every = 1 if has_dangling else 3
    try:
        for it in range(iters):
            if has_dangling:
                dm_row = dangling.join(ranks, "node").agg(F.sum("rank")).first()
                dm = float(dm_row[0] or 0.0)
            else:
                dm = 0.0
            inflow = (
                norm_e.join(ranks, norm_e.src == ranks.node)
                .select("dst", (F.col("p") * F.col("rank")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("inflow"))
            )
            new_ranks = nodes.join(
                inflow, nodes.node == inflow.dst, "left"
            ).select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dm / n_nodes))
                ).alias("rank"),
            )
            # localCheckpoint(eager=True) both truncates lineage and
            # materializes the blocks — no extra persist/count needed
            if it % ckpt_every == ckpt_every - 1:
                ranks = ckpt(new_ranks)
            else:
                ranks = new_ranks
    finally:
        nodes.unpersist()
        norm_e.unpersist()
        dangling.unpersist()
    return ranks


def bfs_hops(
    edges: DataFrame,
    source,
    max_hops: int = 8,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Single-source BFS: minimum hop count from `source` to every
    reachable node, by iterative frontier expansion.

    Each round joins the current frontier against the edge list
    (shuffle on the edge key) and anti-joins the visited set — the
    Pregel-style plan that scales to billion-edge graphs because per
    round only frontier×out-degree rows move.  The loop stops as soon
    as a frontier comes back empty (graph-diameter rounds, bounded by
    `max_hops`), and lineage is truncated every round exactly like
    `pagerank` above (localCheckpoint, or reliable checkpoint under
    `checkpoint_dir=` with the same executor-loss contract).

    Returns (node, hops) with hops = 0 for the source; unreachable
    nodes are absent.  Deterministic: hop counts are a min over paths,
    independent of visit order.
    """
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
            # the union of already-checkpointed frontiers needs no
            # checkpoint of its own (r10 opt): every leg is materialized
            # blocks, so keeping it lazy saves one job per hop while the
            # anti-join above still reads only materialized data
            visited = visited.unionByName(frontier)
    finally:
        e.unpersist()
    return visited


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the undirected version of the
    edge list (self-loops and duplicate/reverse edges collapse first).

    Scale posture: edges are oriented from the lower-(degree, id)
    endpoint to the higher one before the wedge join, the classic
    orientation that bounds wedge generation by O(m^1.5) even on
    power-law degree distributions (every wedge is generated at its
    lowest-degree corner).  The plan is two shuffled equi-joins on
    node keys — no driver-side state, no all-pairs blowup.

    Returns (node, n_tri); nodes in no triangle are absent.  The
    triangle SET is orientation-independent, so results match a plain
    a<b SQL formulation exactly.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orientation key: (degree, id) total order, packed as a struct so
    # the comparison is a single JVM-side tuple compare
    da = deg.select(
        F.col("node").alias("a"), F.struct(F.col("deg"), F.col("node")).alias("ka")
    )
    db = deg.select(
        F.col("node").alias("b"), F.struct(F.col("deg"), F.col("node")).alias("kb")
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("hi"),
            F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("khi"),
        )
    )
    e1 = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("khi").alias("kv")
    )
    e2 = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("khi").alias("kw")
    )
    # wedges at the lowest corner u, ordered v<w in orientation key so
    # each triangle is produced exactly once
    wedges = e1.join(e2, "u").filter(F.col("kv") < F.col("kw"))
    closing = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tris = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    corners = (
        tris.select(F.col("u").alias("node"))
        .unionByName(tris.select(F.col("v").alias("node")))
        .unionByName(tris.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_tri"))
