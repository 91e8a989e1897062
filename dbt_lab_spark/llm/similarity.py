"""Similarity search over an embedding column (array<float>).

  brute_force_knn  exact top-k cosine — the correctness baseline.
                   Query set is broadcast (it's small by construction);
                   the corpus is never shuffled: score map-side, then
                   per-query top-k via window.  At 100 TB of corpus this
                   is one pass, no cross-shuffle.
  lsh_knn          random-hyperplane LSH variant: queries only compare
                   against same-bucket (or neighboring-bucket) corpus
                   rows — the scale path when the query set is large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_lab_spark.functions.vectors import cosine_similarity, to_double_array


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `queries` must have columns (query_id_col, vec_col); it is broadcast,
    so each corpus partition scores all queries locally (a map-side
    nested loop — the optimal exact plan when |queries| << |corpus|).
    Ranking ties break by neighbor id for determinism.
    Returns (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), to_double_array(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("__cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane_bucket(v: Column, dim: int, num_planes: int, seed: int) -> Column:
    """Sign-bit bucket key from deterministic pseudo-random projections
    (same construction as llm.dedup.embedding_dedup_pairs)."""

    def plane_dot(j: int) -> Column:
        return F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x
                * ((F.xxhash64(F.lit(seed), F.lit(j), i) % 20001).cast("double") / 10000.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.concat_ws(
        "",
        *[F.when(plane_dot(j) >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(num_planes)],
    )


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    num_planes: int = 8,
    num_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    Each of `num_tables` independent hash tables buckets both sides;
    a query compares only against corpus rows sharing a bucket in any
    table.  Equi-join on (table, bucket) — shuffle keys are short and
    uniform, so this survives arbitrary corpus scale; recall is tuned by
    (num_planes down / num_tables up).  Returns the same schema as
    brute_force_knn.
    """

    def with_buckets(df: DataFrame, idc: str, out_id: str, vout: str) -> DataFrame:
        v = to_double_array(vec_col)
        return df.select(
            F.col(idc).alias(out_id),
            v.alias(vout),
            F.posexplode(
                F.array(
                    *[
                        _hyperplane_bucket(v, dim, num_planes, seed=1000 + t)
                        for t in range(num_tables)
                    ]
                )
            ).alias("table", "bucket"),
        )

    cb = with_buckets(corpus, id_col, "neighbor_id", "__cv")
    qb = with_buckets(queries, query_id_col, "query_id", "__qv")
    cand = (
        cb.join(qb, on=["table", "bucket"])
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
