"""Snapshot-maintained IVF ANN index (VERDICT r7 #7): the incremental
counterpart of llm/similarity.py's ivf_knn.

`SnapshotTable(ann_col=...)` keeps an inverted-file index as TABLE
METADATA, the same manifest posture as `stat_cols`/`bloom_cols`:

- the coarse quantizer (IVF centroids) is trained once — on the first
  commit, or supplied explicitly (`ann_centroids=`, the pre-trained
  production posture) — and recorded in the log;
- every commit/append CLUSTERS the incoming batch by its assigned
  centroid before writing (one map-only Arrow assignment + one range
  shuffle), so each data file covers a contiguous centroid range;
- a per-file {file: [cluster ids]} manifest (plus a mean assignment
  similarity, the drift signal) is recorded from one executor-side
  pass over the new directory into the directory's parquet manifest
  SIDECAR (VERDICT r8 #2 — never the log), like the bloom manifests;
- `knn(queries, k, nprobe)` resolves the probe set, PRUNES the scan to
  files whose recorded clusters intersect it, and delegates scoring to
  the same audited `ivf_knn` path — today every ANN query re-derives
  its index from the full corpus; here appends maintain it.

Files with no manifest entry (directories written by CoW merge/delete
or compact, which do not re-cluster) are conservatively read, so
correctness never depends on manifest coverage — only pruning does.

100 TB posture: assignment is an Arrow matmul per batch (no shuffle),
the clustering write is ONE range shuffle of the batch (not the
table), the manifest is O(#files) JSON, and a probe-pruned knn reads
nprobe/C of the files instead of the corpus.

Assignment math is IDENTICAL to llm/similarity.ivf_assign (unit
normalize, argmax of mn @ cents.T, ties to the lowest cluster) — the
incremental-assignment == full-re-encode pin in tests/test_wave38.py
holds by determinism of that shared formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _assign_np(pdf_vecs, cents):
    """np.argmax assignment of a batch (list-of-list vectors) against
    the (C, dim) unit-norm centroid matrix — one matmul per batch, the
    exact ivf_assign formula (llm/similarity.py:352)."""
    import numpy as np

    m = np.array(pdf_vecs.tolist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0.0] = 1.0
    mn = m / norms[:, None]
    return np.argmax(mn @ cents.T, axis=1).astype("int32")


def cluster_order(
    df: DataFrame, centroids: list[list[float]], vec_col: str, n_files: int
) -> DataFrame:
    """Assign every row to its nearest centroid (map-only Arrow stage)
    and range-cluster the batch so each output file owns a contiguous
    centroid range — what makes the per-file cluster manifest PRUNE
    instead of listing every cluster in every file.  The helper column
    never reaches the written schema."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cents = np.asarray(centroids, dtype=np.float64)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("__ann_cluster", T.IntegerType())]
    )

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            pdf["__ann_cluster"] = _assign_np(pdf[vec_col], cents)
            yield pdf

    return (
        df.mapInPandas(_assign, out_schema)
        .repartitionByRange(n_files, "__ann_cluster")
        .sortWithinPartitions("__ann_cluster")
        .drop("__ann_cluster")
    )


def file_cluster_stats(
    spark: SparkSession,
    d: str,
    centroids: list[list[float]],
    vec_col: str,
    norm_file_col,
) -> dict[str, dict]:
    """Per-file cluster membership + assignment quality for the newly
    written directory: one applyInPandas group per data file re-derives
    the (deterministic) assignment and emits the file's DISTINCT
    cluster ids plus its MEAN max-cosine similarity to the assigned
    centroids — only O(#files x C) integers and one float per file
    reach the driver, and the result lands in the directory's manifest
    sidecar (never the log).  The mean similarity is the drift signal
    ann_staleness() reads (VERDICT r8 #4): rows from a distribution
    the quantizer was never trained on assign FARTHER from every
    centroid, so a falling mean flags a stale index without any
    rescan."""
    from collections.abc import Iterator  # noqa: F401  (parity with peers)

    import numpy as np
    import pandas as pd

    from collections.abc import Iterator as _Iter

    cents = np.asarray(centroids, dtype=np.float64)
    from dbt_lab_spark.plans.snapshots import _read_pq

    src = _read_pq(spark, [d]).select(
        norm_file_col(F.col("_metadata.file_path")).alias("__f"), vec_col
    )

    # Map-side PARTIAL aggregation, no shuffle (r10 opt): rows for one
    # file arrive contiguously from the vectorized reader, so a
    # per-batch groupby emits one tiny partial (cluster-id set,
    # sum-of-best-cosine, row count) per file per Arrow batch; the
    # driver folds the partials.  The previous groupBy(__f)
    # .applyInPandas forced a hash Exchange of every vector — the only
    # shuffle in the manifest-build path.  Cluster sets are exact
    # either way (per-row integer argmax); mean_sim differs only in
    # float summation order, and its consumers (ann_staleness
    # thresholds) compare against margins orders of magnitude wider.
    def per_batch(batches: _Iter["pd.DataFrame"]) -> _Iter["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for f, g in pdf.groupby("__f", sort=False):
                m = np.array(g[vec_col].tolist(), dtype=np.float64)
                norms = np.linalg.norm(m, axis=1)
                norms[norms == 0.0] = 1.0
                sims = (m / norms[:, None]) @ cents.T
                best = np.max(sims, axis=1)
                cl = np.unique(np.argmax(sims, axis=1))
                rows.append(
                    {
                        "f": f,
                        "cs": cl.astype("int32").tolist(),
                        "bs": float(best.sum()),
                        "n": len(g),
                    }
                )
            yield pd.DataFrame(rows)

    acc: dict[str, dict] = {}
    for r in src.mapInPandas(
        per_batch, "f string, cs array<int>, bs double, n long"
    ).collect():
        e = acc.setdefault(r["f"], {"cs": set(), "bs": 0.0, "n": 0})
        e["cs"].update(int(c) for c in r["cs"])
        e["bs"] += float(r["bs"])
        e["n"] += int(r["n"])
    return {
        f: {"clusters": sorted(e["cs"]), "mean_sim": e["bs"] / e["n"]}
        for f, e in acc.items()
    }


def file_clusters(
    spark: SparkSession,
    d: str,
    centroids: list[list[float]],
    vec_col: str,
    norm_file_col,
) -> dict[str, list[int]]:
    """Per-file cluster membership only — the audit/pin view of
    file_cluster_stats (tests compare it against the maintained
    manifest)."""
    return {
        f: e["clusters"]
        for f, e in file_cluster_stats(
            spark, d, centroids, vec_col, norm_file_col
        ).items()
    }


def probe_clusters(
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """(query_id, cluster) probe pairs via one Arrow matmul per batch.

    Semantics are EXACTLY ivf_knn's ranked-centroid expression
    (llm/similarity.py:400 — sims descending, ties toward the HIGHER
    cluster id, Spark's reverse(array_sort(struct(sim, cluster)))),
    so file pruning never disagrees with the scorer's candidate set —
    but the PLAN is C-independent: the Column-expression form builds C
    zip_with/aggregate folds and stops being viable around C~100
    (the ivf_assign lesson), while this stays one matmul at C=4096."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cents = np.asarray(centroids, dtype=np.float64)
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cluster", T.IntegerType()),
        ]
    )

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = 1.0
            sims = (m / norms[:, None]) @ cents.T  # (nq, C)
            qids, cls = [], []
            for qi, qid in enumerate(pdf[query_id_col].astype("int64")):
                # sims desc, ties toward the higher cluster — the exact
                # order of reverse(array_sort(struct(sim, cluster)))
                order = sorted(
                    range(len(cents)),
                    key=lambda c: (sims[qi, c], c),
                    reverse=True,
                )[:nprobe]
                qids.extend([qid] * len(order))
                cls.extend(order)
            yield pd.DataFrame(
                {"query_id": qids, "cluster": np.array(cls, dtype="int32")}
            )

    return queries.select(query_id_col, vec_col).mapInPandas(
        _probe, out_schema
    )


# file pruning against the probe union lives in
# SnapshotTable._ann_prune (plans/snapshots.py): since VERDICT r8 #2
# the per-file cluster sets are manifest-sidecar rows, not log
# entries, so the pruner reads them through the table's cached
# sidecar loader.
