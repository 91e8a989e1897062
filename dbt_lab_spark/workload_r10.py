"""Round-10 workload additions.

Closes the r9 verdict list's correctness-bearing gaps under the DuckDB
oracle: the OCC rebase-revalidation fix (a CHECK constraint added
between a commit's validation and its publish must re-check the data,
not get stamped onto rows it never saw — VERDICT r9 "What's wrong" #1)
and the typed-stat-cols pruning fix (timestamp zone maps must actually
prune — #3), each with closed-form flags the driver gate can regress
on; plus the r10 features: the streaming change-feed source over the
segmented snapshot log (stream == batch change_feed, exactly-once
under replay) and partial ANN retrain (only drifted directories are
rewritten, per-generation codebooks keep pruning exact).

Every query follows the repo conventions: DataFrame-first plans,
DuckDB oracle with identical aliases, determinism per tests/oracle.py
canonicalization, temp tables torn down in finally blocks.
"""

from __future__ import annotations

from dbt_lab_spark.localrel import local_df

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.operators.scan import scan
from dbt_lab_spark.workload import QueryDef


# ---------------------------------------------------------------------------
# OCC rebase revalidation (VERDICT r9 #1a / #2)
# ---------------------------------------------------------------------------


def _q_constraint_race(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A CHECK constraint added by a concurrent writer between this
    commit's validation and its publish must be re-checked against the
    commit's rows on the rebase (plans/snapshots.py commit(): the
    constraint-set diff before every publish attempt).  Deterministic
    interleaving: the concurrent add_constraint fires from a hook in
    the commit's manifest write — the canonical
    validated-but-not-yet-published window (the q_concurrent_appends
    pattern with a pinned schedule instead of a thread race).  Output:
    the surviving table's aggregate (recomputed by the oracle straight
    from orders) plus closed-form flags — the violating commit was
    REFUSED with the constraint named, the constraint survived, and
    the aborted commit left no orphan directory."""
    import os
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    cat = Catalog(sf_dir)
    base = scan(spark, cat, "orders", ["o_orderkey", "o_totalprice"]).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="snap_crace_")
    try:
        t = SnapshotTable(root)
        t.commit(base)
        bad = local_df(spark, [(-1, -5)], "k long, cents long")
        orig = t._write_manifest
        fired: dict = {}

        def hooked(spark_, d, ann=None):
            if not fired:
                fired["v"] = SnapshotTable(root).add_constraint(
                    spark, "cents_pos", "cents >= 0"
                )
            return orig(spark_, d, ann)

        t._write_manifest = hooked
        refused = False
        try:
            t.commit(bad)
        except ValueError as e:
            refused = "cents_pos" in str(e)
        t2 = SnapshotTable(root)
        kept_constraint = (
            t2._log()[-1].get("constraints") == {"cents_pos": "cents >= 0"}
        )
        orphans = [
            e
            for e in os.listdir(root)
            if e.startswith("v")
            and "full" in e
            and os.path.isdir(os.path.join(root, e))
        ]
        agg = (
            t2.read(spark)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(
                "n_rows",
                "sum_cents",
                F.lit(refused).alias("refused_named"),
                F.lit(kept_constraint).alias("constraint_kept"),
                F.lit(len(orphans) == 1).alias("no_orphans"),
            )
        )
        rows = agg.collect()
        return local_df(spark, rows, agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SQL_CONSTRAINT_RACE = """
SELECT COUNT(*) AS n_rows,
       SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
         AS sum_cents,
       TRUE AS refused_named,
       TRUE AS constraint_kept,
       TRUE AS no_orphans
FROM orders
"""


# ---------------------------------------------------------------------------
# Timestamp zone-map pruning (VERDICT r9 #3 / #2)
# ---------------------------------------------------------------------------

# fixed instants inside the events generator's Jan-2024 window — the
# same literals on both sides, so the oracle recomputes the row slice
_TS_CUT1 = _dt.datetime(2024, 1, 11)
_TS_CUT2 = _dt.datetime(2024, 1, 21)
_TS_LO = _dt.datetime(2024, 1, 12)
_TS_HI = _dt.datetime(2024, 1, 19)


def _q_ts_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-typed stat_cols must PRUNE, not silently no-op
    (VERDICT r9 'What's wrong' #3: tz-aware footer stats vs naive
    probes TypeError'd into keep-everything; INT96 footers carry no
    stats at all).  Three appends of `events` split on fixed instants
    — each one file with a disjoint ts range — then a between= probe
    strictly inside the middle range: exactly 1 of 3 files survives
    pruning (closed-form flag), and the pruned read's aggregate equals
    the oracle's recomputation straight from events."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    cat = Catalog(sf_dir)
    ev = cat.table(spark, "events").select("event_id", "ts", "value")
    root = tempfile.mkdtemp(prefix="snap_tsprune_")
    try:
        t = SnapshotTable(root, stat_cols=["ts"])
        t.append(ev.filter(F.col("ts") < F.lit(_TS_CUT1)).coalesce(1))
        t.append(
            ev.filter(
                (F.col("ts") >= F.lit(_TS_CUT1))
                & (F.col("ts") < F.lit(_TS_CUT2))
            ).coalesce(1)
        )
        t.append(ev.filter(F.col("ts") >= F.lit(_TS_CUT2)).coalesce(1))
        kept, total = t.pruned_file_count(None, ("ts", _TS_LO, _TS_HI))
        agg = (
            t.read(spark, between=("ts", _TS_LO, _TS_HI))
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("sum_value"),
            )
            .select(
                "n_rows",
                "sum_value",
                F.lit(kept).cast("long").alias("kept_files"),
                F.lit(total).cast("long").alias("total_files"),
            )
        )
        rows = agg.collect()
        return local_df(spark, rows, agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SQL_TS_PRUNE = f"""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(1 AS BIGINT) AS kept_files,
       CAST(3 AS BIGINT) AS total_files
FROM events
WHERE ts BETWEEN TIMESTAMP '{_TS_LO:%Y-%m-%d %H:%M:%S}'
             AND TIMESTAMP '{_TS_HI:%Y-%m-%d %H:%M:%S}'
"""


# ---------------------------------------------------------------------------
# Streaming change-feed source (VERDICT r9 #4)
# ---------------------------------------------------------------------------


def _q_stream_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """change_stream() tails the segmented log one commit at a time
    and the batch-id machinery makes consumption exactly-once: build a
    source table over four commits (full commit, append, DV delete of
    v0 rows, append), consume every `(version, frame)` micro-batch
    into a sink via append_stream_batch(batch_id=version), then REPLAY
    the whole stream — every replayed batch must be a recorded no-op.
    Output: the sink's per-_change aggregate (recomputed by the oracle
    straight from orders arithmetic) plus closed-form flags — the
    replay was all no-ops, and the streamed union equals the BATCH
    change_feed plus v0's inserts (stream == batch)."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    cat = Catalog(sf_dir)
    base = scan(spark, cat, "orders", ["o_orderkey", "o_totalprice"]).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="snap_cstream_")
    try:
        src = SnapshotTable(root + "/src")
        src.commit(base.filter(F.col("k") % 4 == 0))           # v0
        src.append(base.filter(F.col("k") % 4 == 1))           # v1
        src.delete_where(spark, "k % 8 = 0", mode="dv")        # v2: hits v0
        src.append(base.filter(F.col("k") % 4 == 2))           # v3
        sink = SnapshotTable(root + "/sink")
        landed = [
            sink.append_stream_batch(df, batch_id=v)
            for v, df in src.change_stream(spark)
        ]
        replay = [
            sink.append_stream_batch(df, batch_id=v)
            for v, df in src.change_stream(spark)
        ]
        replay_noop = landed == [0, 1, 2, 3] and replay == [None] * 4
        got = sink.read(spark).drop("_version")
        want = src.change_feed(spark, from_version=0).unionByName(
            src.read(spark, version=0).withColumn("_change", F.lit("insert"))
        )
        # one action, not two: multiset equality == empty symmetric
        # difference (identical boolean; halves the fixed per-action
        # latency of the equality check)
        stream_eq_batch = (
            got.exceptAll(want).unionByName(want.exceptAll(got)).isEmpty()
        )
        agg = (
            got.groupBy("_change")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(
                "_change",
                "n_rows",
                "sum_cents",
                F.lit(replay_noop).alias("replay_noop"),
                F.lit(stream_eq_batch).alias("stream_eq_batch"),
            )
            .orderBy("_change")
        )
        rows = agg.collect()
        return local_df(spark, rows, agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SQL_STREAM_CHANGE_FEED = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT * FROM (
  SELECT 'insert' AS _change,
         COUNT(*) AS n_rows,
         SUM(cents) AS sum_cents,
         TRUE AS replay_noop,
         TRUE AS stream_eq_batch
  FROM o WHERE k % 4 IN (0, 1, 2)
  UNION ALL
  SELECT 'delete' AS _change,
         COUNT(*) AS n_rows,
         SUM(cents) AS sum_cents,
         TRUE AS replay_noop,
         TRUE AS stream_eq_batch
  FROM o WHERE k % 8 = 0
) ORDER BY _change
"""


# ---------------------------------------------------------------------------
# Partial ANN retrain (VERDICT r9 #5)
# ---------------------------------------------------------------------------

_DRIFT_ID = 1_000_000  # corpus id offset for the drifted copy
_DRIFT_QID = 2_000_000  # query id offset for drifted-mode queries


def _drift(col):
    """SQL-expressible directional drift: first two dims pinned to 1,
    the rest folded positive and scaled — every drifted vector lands
    in the positive orthant, far (in cosine) from the centroids the
    near-random base trained (measured staleness 0.04-0.12 across SFs
    vs exactly 0 for the base directory).  Spark F.transform is
    0-indexed; the DuckDB mirror uses its 1-based lambda index."""
    return F.transform(
        col.cast("array<double>"),
        lambda x, i: F.when(i < F.lit(2), F.lit(1.0)).otherwise(
            F.abs(x) * 50.0
        ),
    )


def _q_ann_partial_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compact(retrain_ann=True, only_drifted=) rewrites ONLY the
    drifted directory — the base directory is carried by reference and
    stays clustered under its ORIGINAL codebook (per-generation
    codebooks: ann_codebooks + ann_gens; knn probes each generation
    with its own centroids).  Correctness: with nprobe=C every cluster
    of every generation is probed, the candidate set is the whole
    corpus, and knn == brute-force cosine top-10 — the exactness
    invariant that fails if a generation is dropped, a codebook is
    misbound, or the cross-generation re-rank is wrong.  Closed-form
    flags pin the O(drifted) structure (base dir carried by reference,
    drifted dir rewritten, exactly two generations)."""
    import shutil
    import tempfile

    from dbt_lab_spark.llm.similarity import ivf_centroids
    from dbt_lab_spark.plans.snapshots import SnapshotTable
    from dbt_lab_spark.workload_beyond import _SEEDED_C

    cat = Catalog(sf_dir)
    emb = scan(spark, cat, "embeddings", ["vec_id", "embedding"])
    corpus = emb.filter(F.col("vec_id") >= 5)
    cents = ivf_centroids(corpus, num_centroids=_SEEDED_C, iters=0, dim=64)
    drifted = corpus.select(
        (F.col("vec_id") + _DRIFT_ID).alias("vec_id"),
        _drift(F.col("embedding")).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    ).unionByName(
        emb.filter(F.col("vec_id").between(5, 7)).select(
            (F.col("vec_id") + _DRIFT_QID).alias("query_id"),
            _drift(F.col("embedding")).alias("embedding"),
        )
    )
    root = tempfile.mkdtemp(prefix="snap_partial_")
    try:
        t = SnapshotTable(
            root,
            ann_col="embedding",
            ann_lists=_SEEDED_C,
            ann_files=4,
            ann_centroids=cents,
        )
        t.commit(corpus)
        t.append(drifted)
        base_dir = t._log()[-1]["files"][0]
        drift_dir = t._log()[-1]["files"][1]
        # an empty corpus has no manifests to judge drift from (and
        # nothing for knn to return) — skip the rewrite, matching the
        # empty oracle (the q_ann_retrain convention)
        partial_ok = True
        if t.read(spark).limit(1).count():
            v = t.compact(
                spark, retrain_ann=True, only_drifted=0.02,
                retrain_iters=0, n_files=4,
            )
            head = t._log()[-1]
            partial_ok = (
                v is not None
                and base_dir in head["files"]      # carried by reference
                and drift_dir not in head["files"]  # drifted rewritten
                and len(t._ann_gen_map(head)) == 2  # two live codebooks
            )
        out = t.knn(spark, queries, k=10, nprobe=_SEEDED_C).withColumn(
            "partial_ok", F.lit(partial_ok)
        )
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SQL_ANN_PARTIAL_RETRAIN = f"""
WITH base AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id >= 5
), drift AS (
  SELECT id + {_DRIFT_ID} AS id,
         list_transform(e, (x, i) ->
           CASE WHEN i <= 2 THEN 1.0 ELSE abs(x) * 50.0 END) AS e
  FROM base
), c AS (
  SELECT id AS neighbor_id, e AS cv FROM base
  UNION ALL SELECT id, e FROM drift
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
  UNION ALL
  SELECT vec_id + {_DRIFT_QID},
         list_transform(CAST(embedding AS DOUBLE[]), (x, i) ->
           CASE WHEN i <= 2 THEN 1.0 ELSE abs(x) * 50.0 END)
  FROM embeddings WHERE vec_id BETWEEN 5 AND 7
), scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
  FROM c, q
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank,
       TRUE AS partial_ok
FROM ranked WHERE rank <= 10
"""


R10_QUERIES: list[QueryDef] = [
    QueryDef(
        "q_constraint_race", _q_constraint_race, _SQL_CONSTRAINT_RACE,
        "OCC rebase re-validates a concurrently-added CHECK constraint",
    ),
    QueryDef(
        "q_ts_prune", _q_ts_prune, _SQL_TS_PRUNE,
        "timestamp stat_cols zone maps prune 1 of 3 files (closed-form)",
    ),
    QueryDef(
        "q_stream_change_feed", _q_stream_change_feed, _SQL_STREAM_CHANGE_FEED,
        "change_stream tail == batch change_feed; replay is all no-ops",
    ),
    QueryDef(
        "q_ann_partial_retrain", _q_ann_partial_retrain,
        _SQL_ANN_PARTIAL_RETRAIN,
        "partial retrain: per-generation codebooks, knn(nprobe=C) == brute force",
    ),
]
