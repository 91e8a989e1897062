"""Round-8 workload additions.

Closes the r7 verdict list's storage and streaming gaps under the
DuckDB oracle: optimistic-concurrency commits (racing appends
serialize to the exact union), timestamp time travel (read(as_of=)),
the DV size policy (mass delete in dv mode auto-materializes via
scoped CoW, results equal to CoW), the stream-stream RIGHT OUTER
interval join, and the snapshot-maintained IVF ANN index (seeded
centroids, so the whole probe-pruned knn replays as relational
algebra).  Every query follows the repo conventions: DataFrame-first
plans, DuckDB oracle with identical aliases, determinism per
tests/oracle.py canonicalization.
"""

from __future__ import annotations

from dbt_lab_spark.localrel import local_df

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.operators.scan import scan
from dbt_lab_spark.workload import QueryDef


def _orders_kc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders as (k, cents) — the shared storage-query fixture shape
    (exact integer money, unique key)."""
    cat = Catalog(sf_dir)
    return scan(spark, cat, "orders", ["o_orderkey", "o_totalprice"]).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )


# ---------------------------------------------------------------------------
# Optimistic concurrency (VERDICT r7 #1)
# ---------------------------------------------------------------------------

_N_WRITERS = 4


def _q_concurrent_appends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N RACING appends serialize to the exact union: four threads,
    each with its OWN SnapshotTable handle on the same root
    (process-equivalent writers), concurrently append disjoint
    residue-class slices of orders.  The conflict-checked commit
    protocol (plans/snapshots.py _append_log: per-version O_EXCL
    marker + parent CAS + append rebase) must lose none of them and
    produce a gapless version chain.  Output: per-residue row count
    and exact cent sum of the FINAL table, plus the version count —
    all recomputed by the oracle straight from orders, so a dropped or
    doubled commit cannot hash-match."""
    import shutil
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    base = _orders_kc(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="snap_occ_")
    try:
        def writer(res: int) -> int:
            return SnapshotTable(root).append(
                base.filter(F.col("k") % _N_WRITERS == res)
            )

        with ThreadPoolExecutor(max_workers=_N_WRITERS) as ex:
            versions = sorted(ex.map(writer, range(_N_WRITERS)))
        t = SnapshotTable(root)
        n_versions = len(t.versions())
        ok_chain = versions == list(range(_N_WRITERS))
        agg = (
            t.read(spark)
            .groupBy((F.col("k") % _N_WRITERS).alias("residue"))
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(
                "residue",
                "n_rows",
                "sum_cents",
                F.lit(n_versions).cast("long").alias("n_versions"),
                F.lit(ok_chain).alias("gapless_chain"),
            )
            .orderBy("residue")
        )
        rows = agg.collect()
        return local_df(spark, rows, agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SQL_CONCURRENT_APPENDS = f"""
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT CAST(k % {_N_WRITERS} AS BIGINT) AS residue,
       COUNT(*) AS n_rows,
       SUM(cents) AS sum_cents,
       CAST({_N_WRITERS} AS BIGINT) AS n_versions,
       TRUE AS gapless_chain
FROM o GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Timestamp time travel (VERDICT r7 #3)
# ---------------------------------------------------------------------------


def _q_time_travel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read(as_of=) resolution against the commit timestamps already in
    every log record: commit documents as v0, delta-append a recrawl
    batch as v1, then audit the table AS OF three instants — between
    the two commits (resolves to v0), exactly v1's commit ts (<=
    convention reads v1), and far past the head (reads the head) —
    plus the pre-history error contract.  The oracle recomputes both
    versions' audits straight from `documents`."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id", "source", "n_chars"])
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.lit("recrawl").alias("source"),
        "n_chars",
    )
    d = tempfile.mkdtemp(prefix="snap_ttts_")
    try:
        t = SnapshotTable(d)
        t.commit(docs)
        t.append(batch)
        log = t._log()
        ts0, ts1 = log[0]["ts"], log[1]["ts"]
        try:
            t.read(spark, as_of=ts0 - 60.0)
            prehistory_errors = False
        except ValueError:
            prehistory_errors = True
        probes = [
            (0, (ts0 + ts1) / 2.0),  # between commits -> v0
            (1, ts1),                # exact commit ts -> v1 (<=)
            (2, ts1 + 3600.0),       # past the head -> head
        ]
        rows = []
        for probe, at in probes:
            r = (
                t.read(spark, as_of=at)
                .agg(
                    F.count("*").alias("n_docs"),
                    F.sum("n_chars").alias("sum_chars"),
                )
                .first()
            )
            rows.append((probe, r.n_docs, r.sum_chars, prehistory_errors))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return local_df(spark, 
        rows, "probe int, n_docs bigint, sum_chars bigint, prehistory_errors boolean"
    )


_SQL_TIME_TRAVEL_TS = r"""
WITH v0 AS (
  SELECT COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars FROM documents
), v1 AS (
  SELECT COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars FROM (
    SELECT doc_id, n_chars FROM documents
    UNION ALL
    SELECT doc_id + 5000000, n_chars FROM documents WHERE doc_id % 5 = 0
  )
)
SELECT CAST(0 AS INTEGER) AS probe, n_docs, sum_chars, TRUE AS prehistory_errors FROM v0
UNION ALL
SELECT 1, n_docs, sum_chars, TRUE FROM v1
UNION ALL
SELECT 2, n_docs, sum_chars, TRUE FROM v1
ORDER BY probe
"""


# ---------------------------------------------------------------------------
# DV size policy (VERDICT r7 #2)
# ---------------------------------------------------------------------------


def _q_dv_mass_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A MASS delete requested in dv mode must auto-materialize via
    scoped CoW instead of growing the sidecars (max_dv_rows policy):
    the head carries NO deletion vectors, at least one directory was
    rewritten, and the surviving rows equal the plain relational
    delete the oracle computes."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    base = _orders_kc(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="snap_dvmass_")
    try:
        t = SnapshotTable(root)
        t.commit(base.filter(F.col("k") % 2 == 0))
        t.append(base.filter(F.col("k") % 2 == 1))
        res = t.delete_where(spark, "k % 4 != 1", mode="dv", max_dv_rows=100)
        head = t._log()[-1]
        fell_back = "dv->cow" in head["operation"]
        no_sidecar = not head.get("dvs")
        agg = (
            t.read(spark)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(
                "n_rows",
                "sum_cents",
                F.lit(fell_back).alias("fell_back_to_cow"),
                F.lit(no_sidecar).alias("no_sidecar"),
                F.lit(res["n_dirs_rewritten"] >= 1).alias("rewrote_dirs"),
            )
        )
        rows = agg.collect()
        return local_df(spark, rows, agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SQL_DV_MASS_DELETE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT COUNT(*) AS n_rows,
       SUM(cents) AS sum_cents,
       TRUE AS fell_back_to_cow,
       TRUE AS no_sidecar,
       TRUE AS rewrote_dirs
FROM o WHERE k % 4 = 1
"""


# ---------------------------------------------------------------------------
# Stream-stream RIGHT OUTER interval join (VERDICT r7 #6)
# ---------------------------------------------------------------------------


def _q_stream_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream RIGHT OUTER interval join through two real
    readStreams: purchases x clicks within [purchase_ts,
    purchase_ts + 1h] on user_id — every CLICK in no purchase's window
    emits left-null-padded, finalized once the watermark passes the
    click's own ts (the latest purchase that could claim it has
    purchase_ts = click_ts).  Same single-sentinel +
    no-data-micro-batch staging as q_stream_outer_join
    (workload_r7.py).  Output: per-user matched-pair and
    unmatched-click counts == the DuckDB batch RIGHT JOIN
    (streaming/windows.py stream_stream_interval_join
    how='right_outer')."""
    import shutil
    import tempfile
    import uuid

    from dbt_lab_spark.streaming.windows import (
        land_replay_file,
        scoped_shuffle_partitions,
        stream_stream_interval_join,
    )

    cat = Catalog(sf_dir)
    ev = scan(
        spark, cat, "events", ["user_id", "ts", "event_type"],
        predicates=[F.col("event_type").isin("purchase", "click")],
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ts_r")
    )
    mx = ev.agg(F.max("ts")).first()[0]
    tmp = tempfile.mkdtemp(prefix="rightouter_")
    try:
        src_p = os.path.join(tmp, "purchases")
        src_c = os.path.join(tmp, "clicks")

        def staged(df: DataFrame, ts_col: str) -> DataFrame:
            if mx is None:
                return df
            return df.unionByName(
                spark.range(1).select(
                    F.lit(-1).cast("long").alias("user_id"),
                    (F.lit(mx) + F.expr("INTERVAL 3 HOURS")).alias(ts_col),
                )
            )

        land_replay_file(staged(purchases, "ts"), src_p, 0, "purchases")
        land_replay_file(staged(clicks, "ts_r"), src_c, 0, "clicks")
        with scoped_shuffle_partitions(spark, 4):
            left = spark.readStream.schema(
                "user_id long, ts timestamp"
            ).parquet(src_p)
            right = spark.readStream.schema(
                "user_id long, ts_r timestamp"
            ).parquet(src_c)
            joined = stream_stream_interval_join(
                left, right, key="user_id", within="1 hour",
                watermark="1 hour", how="right_outer",
            ).select(
                right["user_id"].alias("uid"), left["ts"].alias("pts")
            )
            name = "sro_" + uuid.uuid4().hex
            q = (
                joined.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        agg = (
            spark.table(name)
            .filter(F.col("uid") >= 0)
            .groupBy("uid")
            .agg(
                F.sum(F.when(F.col("pts").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_pairs"),
                F.sum(F.when(F.col("pts").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_unmatched_clicks"),
            )
            .select(F.col("uid").alias("user_id"), "n_pairs", "n_unmatched_clicks")
        )
        rows = agg.collect()
        spark.catalog.dropTempView(name)
        if not rows:
            return local_df(spark, 
                [], "user_id long, n_pairs bigint, n_unmatched_clicks bigint"
            )
        return local_df(spark, rows, agg.schema).orderBy("user_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SQL_STREAM_RIGHT_OUTER = """
WITH p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT c.user_id, p.ts AS pts
  FROM p RIGHT JOIN c ON c.user_id = p.user_id
                      AND c.ts >= p.ts
                      AND c.ts <= p.ts + INTERVAL 1 HOUR
)
SELECT user_id,
       CAST(SUM(CASE WHEN pts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN pts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched_clicks
FROM j GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Snapshot-maintained IVF ANN (VERDICT r7 #7)
# ---------------------------------------------------------------------------


def _q_snapshot_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot-maintained ANN index under a FULL oracle: seeded
    centroids (ivf_centroids iters=0 — the deterministic id%C init the
    q_knn_ivf_seeded oracle replays), corpus committed in TWO
    installments (commit + append, exercising incremental assignment
    and the per-file cluster manifest), then probe-pruned knn through
    SnapshotTable.knn — which reads only files whose recorded cluster
    sets intersect the probe union and scores through the audited
    ivf_knn jvm path.  Output and oracle are IDENTICAL to
    q_knn_ivf_seeded (workload_beyond.py): the index maintenance must
    change nothing about the answer."""
    import shutil
    import tempfile

    from dbt_lab_spark.llm.similarity import ivf_centroids
    from dbt_lab_spark.plans.snapshots import SnapshotTable
    from dbt_lab_spark.workload_beyond import _SEEDED_C

    cat = Catalog(sf_dir)
    emb = scan(spark, cat, "embeddings", ["vec_id", "embedding"])
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = ivf_centroids(corpus, num_centroids=_SEEDED_C, iters=0, dim=64)
    root = tempfile.mkdtemp(prefix="snap_ann_")
    try:
        t = SnapshotTable(
            root,
            ann_col="embedding",
            ann_lists=_SEEDED_C,
            ann_files=4,
            ann_centroids=cents,
        )
        t.commit(corpus.filter(F.col("vec_id") % 2 == 1))
        t.append(corpus.filter(F.col("vec_id") % 2 == 0))
        out = t.knn(spark, queries, k=10, nprobe=3)
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _sql_snapshot_ann() -> str:
    from dbt_lab_spark.workload_beyond import _sql_knn_ivf_seeded

    return _sql_knn_ivf_seeded()


R8_QUERIES: list[QueryDef] = [
    QueryDef(
        "q_concurrent_appends", _q_concurrent_appends, _SQL_CONCURRENT_APPENDS,
        "racing appends serialize to the exact union (OCC commit protocol)",
    ),
    QueryDef(
        "q_time_travel_ts", _q_time_travel_ts, _SQL_TIME_TRAVEL_TS,
        "timestamp time travel: read(as_of=) boundary resolution",
    ),
    QueryDef(
        "q_dv_mass_delete", _q_dv_mass_delete, _SQL_DV_MASS_DELETE,
        "DV size policy: mass delete auto-materializes via scoped CoW",
    ),
    QueryDef(
        "q_stream_right_outer", _q_stream_right_outer, _SQL_STREAM_RIGHT_OUTER,
        "stream-stream RIGHT OUTER interval join == batch RIGHT JOIN",
    ),
    QueryDef(
        "q_snapshot_ann", _q_snapshot_ann, _sql_snapshot_ann(),
        "snapshot-maintained IVF ANN: probe-pruned knn == full-corpus seeded IVF",
    ),
]
