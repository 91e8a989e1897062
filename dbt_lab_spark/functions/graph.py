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
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
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
    try:
        for _ in range(iters):
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
            ranks = ckpt(new_ranks)
    finally:
        nodes.unpersist()
        norm_e.unpersist()
        dangling.unpersist()
    return ranks
