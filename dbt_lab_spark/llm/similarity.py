"""Similarity search over an embedding column (array<float>).

  brute_force_knn  exact top-k cosine — the correctness baseline.
                   Query set is broadcast (it's small by construction);
                   the corpus is never shuffled: score map-side, then
                   per-query top-k via window.  At 100 TB of corpus this
                   is one pass, no cross-shuffle.
  lsh_knn          random-hyperplane LSH variant: queries only compare
                   against same-bucket (or neighboring-bucket) corpus
                   rows — the scale path when the query set is large.
  ivf_centroids /  inverted-file (IVF) variant: k-means coarse quantizer
  ivf_knn          trained with distributed Lloyd iterations (centroids
                   are driver-held metadata, C×dim floats — the same
                   footprint as a broadcast dimension); queries probe
                   only the nprobe nearest clusters.
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
    scored = _score_pairs_vectorized(cand)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _sim_to_centroid(v: Column, centroid: list[float]) -> Column:
    """Cosine numerator against a constant centroid (both sides get
    normalized once outside, so dot == cosine).  Constant folding keeps
    the per-centroid literals JVM-side."""
    return F.aggregate(
        F.zip_with(v, F.array(*[F.lit(float(x)) for x in centroid]), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _score_pairs_vectorized(cand: DataFrame) -> DataFrame:
    """Score candidate pairs (query_id, neighbor_id, __qv, __cv) ->
    (query_id, neighbor_id, cosine) with one NumPy einsum per Arrow
    batch.  Row-at-a-time zip_with/aggregate cosines are interpreted
    (no codegen for lambda bodies) — ~10x slower on wide candidate
    sets.  Used by the rows-only ANN paths; the oracle-checked exact
    query keeps the expression form whose float fold order DuckDB
    mirrors bit-for-bit."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array(pdf["__qv"].tolist(), dtype=np.float64)
            b = np.array(pdf["__cv"].tolist(), dtype=np.float64)
            na = np.linalg.norm(a, axis=1)
            nb = np.linalg.norm(b, axis=1)
            na[na == 0.0] = 1.0
            nb[nb == 0.0] = 1.0
            cos = np.einsum("ij,ij->i", a, b) / (na * nb)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].astype("int64"),
                    "neighbor_id": pdf["neighbor_id"].astype("int64"),
                    "cosine": cos,
                }
            )

    return cand.select("query_id", "neighbor_id", "__qv", "__cv").mapInPandas(_score, schema)


def _normalized(vec_col: str) -> Column:
    """Unit-normalize an embedding.  The norm is threaded through
    array_repeat as a zip_with ARGUMENT, not captured in the lambda:
    a lambda closing over the norm re-evaluates the O(d) aggregate per
    element (O(d^2)/row — codegen CSE does not reach lambda bodies)."""
    v = to_double_array(vec_col)
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.zip_with(v, F.array_repeat(norm, F.size(v)), lambda x, nrm: x / nrm)


def ivf_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    checkpoint_dir: str | None = None,
) -> list[list[float]]:
    """Train the IVF coarse quantizer: spherical k-means via distributed
    Lloyd iterations.

    Deterministic init (cluster = id % C means) — no RNG, so results are
    reproducible run-to-run.  Each Lloyd iteration is ONE map-only job:
    an Arrow batch computes the argmax assignment (NumPy matmul, same
    math as ivf_assign) AND the per-cluster partial sums/counts for its
    batch, so only num_partitions x C x dim floats travel to the driver,
    which does the final reduce + spherical re-normalization.  No
    shuffle at all in the training loop — the canonical distributed
    k-means shape (map-side sufficient statistics, tiny driver reduce).

    Executor-loss contract: the loop state (centroids) is driver-side,
    so iterations themselves survive executor loss; the exposure is the
    persisted (id, vec) projection — lost cached blocks are recomputed
    through the corpus's full lineage, which can be arbitrarily
    expensive for a derived frame.  Pass `checkpoint_dir=` to replace
    the cache with a RELIABLE checkpoint (one durable materialization
    of the projection; every iteration and any recovery reads those
    files instead of recomputing upstream).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # One persisted copy of (id, vec) feeds every Lloyd iteration —
    # without it each iteration re-scans the source.  At cluster scale
    # this is the difference between one corpus read and iters of them.
    persisted = checkpoint_dir is None
    if persisted:
        src = corpus.select(id_col, vec_col).persist()
    else:
        corpus.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        src = corpus.select(id_col, vec_col).checkpoint(eager=True)

    partial_schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
        ]
    )

    def sufficient_stats(cents: np.ndarray | None) -> list[list[float]]:
        """One pass: assign each batch (argmax vs cents; id % C when
        cents is None) and emit per-cluster (count, sum-vector)
        partials; reduce on the driver and re-normalize."""

        def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # accumulate across ALL batches of the partition and emit
            # one partial per cluster: the driver reduce is bounded by
            # num_partitions x C x dim, not num_batches x C x dim.
            # (For C x dim large enough that even that bound hurts,
            # switch the reduce to a treeAggregate-style two-level agg.)
            psums = np.zeros((num_centroids, dim), dtype=np.float64)
            pcounts = np.zeros(num_centroids, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                norms = np.linalg.norm(m, axis=1)
                norms[norms == 0.0] = 1.0
                mn = m / norms[:, None]
                if cents is None:
                    cl = (pdf[id_col].to_numpy() % num_centroids).astype("int64")
                else:
                    cl = np.argmax(mn @ cents.T, axis=1)
                np.add.at(psums, cl, mn)
                np.add.at(pcounts, cl, 1)
            hit = np.nonzero(pcounts)[0]
            if len(hit):
                yield pd.DataFrame(
                    {
                        "cluster": hit.astype("int32"),
                        "n": pcounts[hit],
                        "s": [psums[c].tolist() for c in hit],
                    }
                )

        rows = src.mapInPandas(_stats, partial_schema).collect()
        sums = np.zeros((num_centroids, dim), dtype=np.float64)
        counts = np.zeros(num_centroids, dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["s"])
            counts[r["cluster"]] += r["n"]
        counts[counts == 0] = 1
        means = sums / counts[:, None]
        nrm = np.linalg.norm(means, axis=1)
        nrm[nrm == 0.0] = 1.0
        return (means / nrm[:, None]).tolist()

    try:
        centroids = sufficient_stats(None)
        for _ in range(iters):
            centroids = sufficient_stats(np.asarray(centroids, dtype=np.float64))
    finally:
        if persisted:
            src.unpersist()
    return centroids


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    with_vec: bool = True,
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid — the inverted
    file.  Map-only (no shuffle); persist/bucket the result by `cluster`
    so probes prune at the storage layer.

    Implementation: Arrow-batched mapInPandas doing one NumPy matmul
    (batch x dim) @ (dim x C) per batch.  The Column-expression
    alternative (an array of per-centroid zip_with/aggregate dots) is
    interpreted — higher-order lambdas never enter whole-stage codegen —
    and its expression tree grows with C, so it stops being viable
    around C~100 and is ~10x slower even at C=8.  The matmul path is
    C-speed per batch and C-independent in plan size: the shape that
    holds at 4096 clusters on 100 TB.  Ties argmax to the first maximal
    cluster, deterministically.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cents = np.asarray(centroids, dtype=np.float64)  # (C, dim), unit-norm
    # `with_vec=False` drops the normalized-vector payload column for
    # consumers that only need (id, cluster) — e.g. the jvm-scorer knn
    # path and silhouette, which re-join raw vectors anyway.  Skipping
    # `__cv` avoids materializing + Arrow-shipping dim doubles per row
    # out of the Python worker (r11 opt, guide §4: pass only the
    # columns the consumer needs across the boundary).
    fields = [
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("__cv", T.ArrayType(T.DoubleType())),
        T.StructField("cluster", T.IntegerType()),
    ]
    out_schema = T.StructType(fields if with_vec else [fields[0], fields[2]])

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = 1.0
            mn = m / norms[:, None]
            cl = np.argmax(mn @ cents.T, axis=1).astype("int32")
            cols = {"neighbor_id": pdf[id_col].astype("int64")}
            if with_vec:
                cols["__cv"] = [row.tolist() for row in mn]
            cols["cluster"] = cl
            yield pd.DataFrame(cols)

    return corpus.select(id_col, vec_col).mapInPandas(_assign, out_schema)


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    scorer: str = "numpy",
    probes: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVF probing: each query searches only the
    `nprobe` clusters whose centroids are most similar.

    The probe list explodes queries to nprobe rows; the equi-join on
    `cluster` hits only those inverted lists — with the corpus bucketed
    by cluster this is a partition-pruned scan of nprobe/C of the data.
    Returns the same schema as brute_force_knn.

    ``scorer``: 'numpy' (default) scores candidates with the Arrow-
    batched matmul — the throughput path.  'jvm' re-joins the RAW
    vectors and scores with the sequential-fold cosine expression, so
    every output double is bit-identical to an oracle computing
    dot/(|a||b|) with the same left-to-right fold (the q_knn_bruteforce
    contract) — used by the seeded-IVF full-oracle query.

    ``probes``: optional precomputed (query_id, cluster) probe pairs.
    Default (None) builds them from the C-sized ranked-centroid
    EXPRESSION — fine at the seeded-oracle C=8, but the expression tree
    grows with C and stops being viable around C~100.  The snapshot-ANN
    knn passes the Arrow-matmul probes from plans/ann.probe_clusters
    (one plan node at any C), which also guarantees its file pruning
    and this scorer share ONE probe set — no ulp-level tie divergence
    between two independent computations.
    """
    # the jvm scorer re-joins RAW vectors, so the inverted file only
    # needs (id, cluster) — skip the normalized-vector payload column
    inv = ivf_assign(corpus, centroids, vec_col, id_col, with_vec=(scorer != "jvm"))
    qv = _normalized(vec_col)
    if probes is not None:
        # probes carries literal (query_id, cluster) columns
        # (plans/ann.probe_clusters' output schema)
        qb = probes.select("query_id", "cluster").join(
            queries.select(
                F.col(query_id_col).alias("query_id"), qv.alias("__qv")
            ),
            on="query_id",
        )
    else:
        qsims = F.array(*[_sim_to_centroid(qv, c) for c in centroids])
        # top-nprobe clusters per query: sort (sim, cluster) descending
        ranked_clusters = F.slice(
            F.reverse(
                F.array_sort(
                    F.transform(
                        qsims,
                        lambda s, i: F.struct(s.alias("sim"), i.cast("int").alias("cluster")),
                    )
                )
            ),
            1,
            nprobe,
        )
        qb = queries.select(
            F.col(query_id_col).alias("query_id"),
            qv.alias("__qv"),
            F.explode(F.transform(ranked_clusters, lambda x: x["cluster"])).alias("cluster"),
        )
    if scorer == "jvm":
        from dbt_lab_spark.functions.vectors import dot, l2_norm

        cand = inv.join(F.broadcast(qb), on="cluster").select("query_id", "neighbor_id")
        craw = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            to_double_array(vec_col).alias("__craw"),
            l2_norm(to_double_array(vec_col)).alias("__cnrm"),
        )
        qraw = queries.select(
            F.col(query_id_col).alias("query_id"),
            to_double_array(vec_col).alias("__qraw"),
            l2_norm(to_double_array(vec_col)).alias("__qnrm"),
        )
        scored = (
            cand.join(craw, on="neighbor_id")
            .join(F.broadcast(qraw), on="query_id")
            .withColumn(
                "cosine",
                # try_divide (the repo's ANSI-safe fallible-arithmetic
                # convention, SURVEY §8.2): a zero-norm vector — e.g. a
                # deferred-training table whose first real batch holds
                # an all-zero embedding — yields cosine NULL (ranked
                # last by desc ordering) instead of DIVIDE_BY_ZERO
                # killing the job (r9 review #2, test_wave41).
                F.try_divide(
                    dot(F.col("__qraw"), F.col("__craw")),
                    F.col("__qnrm") * F.col("__cnrm"),
                ),
            )
        )
    else:
        scored = _score_pairs_vectorized(
            inv.join(F.broadcast(qb), on="cluster").select(
                "query_id", "neighbor_id", "__qv", "__cv"
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
