"""Round-7 workload additions.

Closes the r6 verdict list's storage and streaming gaps: merge-on-read
deletion vectors (point DELETE without file rewrites), Z-order
compaction of the snapshot log (multi-column file skipping over
versioned data), per-file Bloom filters (point-lookup skipping on
high-cardinality keys), and the watermark-finalized stream-stream
LEFT OUTER join.  Every query follows the repo conventions:
DataFrame-first plans, DuckDB oracle with identical aliases,
determinism per tests/oracle.py canonicalization.
"""

from __future__ import annotations

from dbt_lab_spark.localrel import local_df

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.expr import money
from dbt_lab_spark.operators.scan import scan
from dbt_lab_spark.workload import QueryDef


def _orders_kc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders as (k, cents) — the shared fixture shape for the storage
    queries (exact integer money, unique key)."""
    cat = Catalog(sf_dir)
    return scan(spark, cat, "orders", ["o_orderkey", "o_totalprice"]).select(
        F.col("o_orderkey").cast("long").alias("k"),
        (money("o_totalprice") * 100).cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# Merge-on-read deletion vectors (VERDICT r6 #1)
# ---------------------------------------------------------------------------


def _q_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors, proven end-to-end on
    real data: orders rows k%4==0 land, k%8==1 append; then
    `delete_where(k % 16 == 0, mode="dv")` removes every 16th key by
    writing ONLY a (file, row_index) sidecar — the manifest's data-file
    list is unchanged and zero directories are rewritten (the returned
    n_dirs_rewritten is part of the output row).  Reads of the new head
    apply the DV as a broadcast anti-join (plans/snapshots.py
    _read_paths); time travel to the pre-delete version reads the rows
    back; `compact()` then MATERIALIZES the deletes into plain files
    and the re-read totals must not move.  At 100 TB this is the
    GDPR-point-delete shape: O(sidecar) per delete instead of
    rewriting every touched file (VERDICT r6 #1).  All output fields
    are closed-form from `orders`."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    orders = _orders_kc(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="deletedv_")
    try:
        t = SnapshotTable(os.path.join(tmp, "tbl"))
        t.commit(orders.filter(F.col("k") % 4 == 0))
        v_pre = t.append(orders.filter(F.col("k") % 8 == 1))
        files_before = sorted(t._log()[-1]["files"])
        res = t.delete_where(spark, "k % 16 = 0", mode="dv")
        files_after = sorted(t._log()[-1]["files"])
        head = t.read(spark).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).first()
        n_travel = t.read(spark, version=v_pre).count()
        t.compact(spark, target_mb=1024.0)
        after = t.read(spark).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).first()
        files_unchanged = files_before == files_after and res["n_dirs_rewritten"] == 0
        n_deleted = res["n_deleted"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_df(spark, 
        [
            (
                int(head["n"]), int(head["s"] or 0), int(n_deleted),
                int(n_travel), bool(files_unchanged),
                int(after["n"]), int(after["s"] or 0),
            )
        ],
        "n_head bigint, sum_cents_head bigint, n_deleted bigint, "
        "n_travel bigint, files_unchanged boolean, "
        "n_after_compact bigint, sum_after_compact bigint",
    )


_SQL_DELETE_DV = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
), base AS (
  SELECT k, cents FROM o WHERE k % 4 = 0 OR k % 8 = 1
), head AS (
  SELECT k, cents FROM base WHERE NOT (k % 16 = 0)
)
SELECT (SELECT COUNT(*) FROM head) AS n_head,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM head) AS sum_cents_head,
       (SELECT COUNT(*) FROM base WHERE k % 16 = 0) AS n_deleted,
       (SELECT COUNT(*) FROM base) AS n_travel,
       TRUE AS files_unchanged,
       (SELECT COUNT(*) FROM head) AS n_after_compact,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM head) AS sum_after_compact
"""


def _q_merge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read MERGE (upsert) via deletion vectors: orders rows
    k%4==0 land, k%8==1 append; a source of updates (k%16==0, cents
    +1,000,000) and inserts (k%8==2) then merges with `mode="dv"` —
    matched rows are tombstoned by position (NO data file rewritten)
    and the whole source lands as one delta directory, the Delta
    deletion-vector MERGE mechanics.  The manifest's pre-merge file
    list is carried byte-identical (flag in the output), time travel
    to the pre-merge version reads the original rows, and `compact()`
    folds the tombstones into plain files without moving the totals.
    All numeric fields are closed-form from `orders`
    (plans/snapshots.py merge mode="dv")."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    orders = _orders_kc(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="mergedv_")
    try:
        t = SnapshotTable(os.path.join(tmp, "tbl"))
        t.commit(orders.filter(F.col("k") % 4 == 0))
        v_pre = t.append(orders.filter(F.col("k") % 8 == 1))
        files_before = list(t._log()[-1]["files"])
        src = orders.filter(
            (F.col("k") % 16 == 0) | (F.col("k") % 8 == 2)
        ).select(
            "k",
            F.when(F.col("k") % 16 == 0, F.col("cents") + 1_000_000)
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        res = t.merge(spark, src, on=["k"], mode="dv")
        carried = t._log()[-1]["files"][: len(files_before)] == files_before
        head = t.read(spark).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).first()
        n_travel = t.read(spark, version=v_pre).count()
        t.compact(spark, target_mb=1024.0)
        after = t.read(spark).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).first()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_df(spark, 
        [
            (
                int(head["n"]), int(head["s"] or 0), int(res["n_updated"]),
                int(res["n_dirs_rewritten"]), bool(carried), int(n_travel),
                int(after["n"]), int(after["s"] or 0),
            )
        ],
        "n_head bigint, sum_cents_head bigint, n_updated bigint, "
        "n_dirs_rewritten bigint, files_carried boolean, n_travel bigint, "
        "n_after_compact bigint, sum_after_compact bigint",
    )


_SQL_MERGE_DV = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
), head AS (
  SELECT k, CASE WHEN k % 16 = 0 THEN cents + 1000000 ELSE cents END AS cents
  FROM o WHERE k % 4 = 0 OR k % 8 = 1 OR k % 8 = 2
)
SELECT (SELECT COUNT(*) FROM head) AS n_head,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM head) AS sum_cents_head,
       (SELECT COUNT(*) FROM o WHERE k % 16 = 0) AS n_updated,
       CAST(0 AS BIGINT) AS n_dirs_rewritten,
       TRUE AS files_carried,
       (SELECT COUNT(*) FROM o WHERE k % 4 = 0 OR k % 8 = 1) AS n_travel,
       (SELECT COUNT(*) FROM head) AS n_after_compact,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM head) AS sum_after_compact
"""


# ---------------------------------------------------------------------------
# Z-order compaction of the snapshot log (VERDICT r6 #3)
# ---------------------------------------------------------------------------


def _q_zorder_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER over versioned data: orders-derived rows with
    two pseudo-independent cluster keys a = k%97 and b = (k*7919)%101
    land as six appends (small-file tail), then
    `compact(zorder=["a","b"], n_files=16)` rewrites them bin-packed
    in Z-order — each output file owns a hyper-RECTANGLE of (a, b), so
    the recorded per-file min/max are tight on BOTH columns and
    `between=` skipping prunes on each (a linear sort can only serve
    the leading column).  The output pins: exact row count and cents
    sum after compaction (byte-equal contents), the count/sum of a
    mid-range slice read through the pruned path, pruning to at most
    half the files on BOTH single-column predicates, and intact time
    travel to the first append.  All numeric fields are closed-form
    from `orders` (plans/snapshots.py compact)."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    orders = _orders_kc(spark, sf_dir).select(
        "k",
        "cents",
        (F.col("k") % 97).alias("a"),
        ((F.col("k") * 7919) % 101).alias("b"),
    )
    tmp = tempfile.mkdtemp(prefix="zorder_")
    try:
        t = SnapshotTable(os.path.join(tmp, "tbl"), stat_cols=["a", "b"])
        for g in range(6):
            t.append(orders.filter(F.col("k") % 6 == g))
        n_v0 = t.read(spark, version=0).count()
        t.compact(spark, target_mb=1024.0, n_files=16, zorder=["a", "b"])
        head = t.read(spark).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).first()
        sl = t.read(spark, between=("a", 3, 9)).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).first()
        ka, ta = t.pruned_file_count(None, ("a", 3, 9))
        kb, tb = t.pruned_file_count(None, ("b", 3, 9))
        travel_ok = t.read(spark, version=0).count() == n_v0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_df(spark, 
        [
            (
                int(head["n"]), int(head["s"] or 0),
                int(sl["n"]), int(sl["s"] or 0),
                bool(ka * 2 <= ta), bool(kb * 2 <= tb), bool(travel_ok),
            )
        ],
        "n_rows bigint, sum_cents bigint, n_slice bigint, sum_slice bigint, "
        "a_prunes boolean, b_prunes boolean, travel_ok boolean",
    )


_SQL_ZORDER_COMPACT = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         o_orderkey % 97 AS a,
         (o_orderkey * 7919) % 101 AS b
  FROM orders
)
SELECT (SELECT COUNT(*) FROM o) AS n_rows,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM o) AS sum_cents,
       (SELECT COUNT(*) FROM o WHERE a BETWEEN 3 AND 9) AS n_slice,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM o
        WHERE a BETWEEN 3 AND 9) AS sum_slice,
       TRUE AS a_prunes,
       TRUE AS b_prunes,
       TRUE AS travel_ok
"""


# ---------------------------------------------------------------------------
# Per-file Bloom filters for point-lookup skipping (VERDICT r6 #4)
# ---------------------------------------------------------------------------


def _q_bloom_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-lookup file skipping via per-file Bloom filters: orders
    land as four appends split by k%4 (four files each — a key lives
    in exactly one directory, 1 of 16 files), with `bloom_cols=["k"]`
    recording one Bloom bitmap per data file at commit
    (executor-built, O(#files) on the driver).  `read(point=("k", v))`
    prunes every file whose filter proves v absent; min/max stats
    cannot help here because keys scatter across the whole range in
    every file.  The output pins the looked-up row's exact cents
    (false positives are caught by the residual equality filter),
    pruning to at most half the files, and zero rows for a key that
    was never written.  Probe key: the largest k with k%4==3 —
    closed-form from `orders` (plans/snapshots.py _blooms_for /
    read(point=))."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    orders = _orders_kc(spark, sf_dir)
    probe = orders.filter(F.col("k") % 4 == 3).agg(F.max("k")).first()[0]
    tmp = tempfile.mkdtemp(prefix="bloom_")
    try:
        t = SnapshotTable(os.path.join(tmp, "tbl"), bloom_cols=["k"])
        for g in range(4):
            t.append(orders.filter(F.col("k") % 4 == g).repartition(4))
        if probe is None:  # empty orders: vacuous flags, zero counts
            return local_df(spark, 
                [(None, None, 0, True, 0)],
                "probe_k bigint, probe_cents bigint, n_probe_rows bigint, "
                "pruned_lt_half boolean, n_missing_rows bigint",
            )
        hit = t.read(spark, point=("k", int(probe))).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).first()
        kept, total = t.pruned_point_file_count(None, ("k", int(probe)))
        missing_k = orders.agg(F.max("k")).first()[0] + 12345
        n_missing = t.read(spark, point=("k", int(missing_k))).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_df(spark, 
        [
            (
                int(probe), int(hit["s"] or 0), int(hit["n"]),
                bool(kept * 2 <= total), int(n_missing),
            )
        ],
        "probe_k bigint, probe_cents bigint, n_probe_rows bigint, "
        "pruned_lt_half boolean, n_missing_rows bigint",
    )


_SQL_BLOOM_SKIP = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
), probe AS (
  SELECT MAX(k) AS pk FROM o WHERE k % 4 = 3
)
SELECT (SELECT pk FROM probe) AS probe_k,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM o
        WHERE k = (SELECT pk FROM probe)) AS probe_cents,
       (SELECT COUNT(*) FROM o WHERE k = (SELECT pk FROM probe)) AS n_probe_rows,
       TRUE AS pruned_lt_half,
       CAST(0 AS BIGINT) AS n_missing_rows
"""


# ---------------------------------------------------------------------------
# Watermark-finalized stream-stream LEFT OUTER join (VERDICT r6 #2)
# ---------------------------------------------------------------------------


def _q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join through TWO real
    readStreams: each purchase joins the same user's clicks with ts in
    [purchase_ts, purchase_ts + 1h]; a purchase with NO click in the
    window must still emit, null-padded — but only after the watermark
    passes purchase_ts + 1h (before that the engine cannot know no
    match will arrive).  One far-future sentinel per stream advances
    the watermark past every real bound; the null-padded rows then
    emit in the NO-DATA micro-batch the engine runs when a watermark
    advance leaves evictable state
    (spark.sql.streaming.noDataMicroBatches, default on) — a strictly
    LATER batch than the on-time matches (pinned in
    tests/test_wave35.py).  Output: per-user matched-pair and
    unmatched-purchase counts, which must equal the batch LEFT JOIN
    the DuckDB oracle computes (streaming/windows.py
    stream_stream_interval_join how='left_outer')."""
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
    tmp = tempfile.mkdtemp(prefix="outerjoin_")
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
                watermark="1 hour", how="left_outer",
            ).select(
                left["user_id"].alias("uid"), right["ts_r"].alias("cts")
            )
            name = "soj_" + uuid.uuid4().hex
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
                F.sum(F.when(F.col("cts").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_pairs"),
                F.sum(F.when(F.col("cts").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_unmatched"),
            )
            .select(F.col("uid").alias("user_id"), "n_pairs", "n_unmatched")
        )
        rows = agg.collect()
        spark.catalog.dropTempView(name)
        if not rows:
            return local_df(spark, 
                [], "user_id long, n_pairs bigint, n_unmatched bigint"
            )
        return local_df(spark, rows, agg.schema).orderBy("user_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join through two real
    readStreams: purchases x clicks within [purchase_ts,
    purchase_ts + 1h] on user_id — every purchase with no click in its
    window emits left-null-padded AND every click in no purchase's
    window emits right-null-padded, each only after the watermark
    finalizes its side (an unmatched click's bound is its own ts: the
    latest purchase that could claim it has purchase_ts = click_ts).
    Same single-sentinel + no-data-micro-batch staging as
    q_stream_outer_join.  Output: per-user matched-pair, unmatched-
    purchase, and unmatched-click counts == the DuckDB batch FULL
    JOIN (streaming/windows.py stream_stream_interval_join
    how='full_outer')."""
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
    tmp = tempfile.mkdtemp(prefix="fullouter_")
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
                watermark="1 hour", how="full_outer",
            ).select(
                left["user_id"].alias("ul"),
                right["user_id"].alias("ur"),
                left["ts"].alias("pts"),
                right["ts_r"].alias("cts"),
            )
            name = "sfo_" + uuid.uuid4().hex
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
            .select(F.coalesce("ul", "ur").alias("user_id"), "pts", "cts")
            .filter(F.col("user_id") >= 0)
            .groupBy("user_id")
            .agg(
                F.sum(
                    F.when(F.col("pts").isNotNull() & F.col("cts").isNotNull(), 1)
                    .otherwise(0)
                ).cast("long").alias("n_pairs"),
                F.sum(F.when(F.col("cts").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_unmatched_purchases"),
                F.sum(F.when(F.col("pts").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_unmatched_clicks"),
            )
        )
        rows = agg.collect()
        spark.catalog.dropTempView(name)
        if not rows:
            return local_df(spark, 
                [],
                "user_id long, n_pairs bigint, n_unmatched_purchases bigint, "
                "n_unmatched_clicks bigint",
            )
        return local_df(spark, rows, agg.schema).orderBy("user_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SQL_STREAM_FULL_OUTER_JOIN = """
WITH p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT COALESCE(p.user_id, c.user_id) AS user_id,
         p.ts AS pts, c.ts AS cts
  FROM p FULL JOIN c ON c.user_id = p.user_id
                     AND c.ts >= p.ts
                     AND c.ts <= p.ts + INTERVAL 1 HOUR
)
SELECT user_id,
       CAST(SUM(CASE WHEN pts IS NOT NULL AND cts IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN cts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched_purchases,
       CAST(SUM(CASE WHEN pts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched_clicks
FROM j GROUP BY 1 ORDER BY 1
"""


_SQL_STREAM_OUTER_JOIN = """
WITH p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.user_id, c.ts AS cts
  FROM p LEFT JOIN c ON c.user_id = p.user_id
                     AND c.ts >= p.ts
                     AND c.ts <= p.ts + INTERVAL 1 HOUR
)
SELECT user_id,
       CAST(SUM(CASE WHEN cts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN cts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
FROM j GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Arithmetic-coded JPEG (VERDICT r6 #7 — the last stubbed codec path)
# ---------------------------------------------------------------------------

_JPEG_ARITH_N_ASSETS = 24


def _q_jpeg_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARITHMETIC-coded JPEG (SOF9, T.81 Annex D QM-coder) encode +
    decode as Arrow mapInPandas stages: plant a 48x48 brightness ramp
    whose direction is doc_id%4 (right/down/left/up), encode with the
    QM entropy coder (llm/codecs.py encode_jpeg_arith: Table D.3
    state machine, 0xFF00 byte stuffing, carry-resolved flush), decode
    back through the shared DCT/dequant path, and verify in-engine
    that (a) the decoded ramp's dominant direction is the planted one,
    (b) round-trip RMSE <= 9 (measured ~4-8 at q90), and (c) the
    arithmetic payload is SMALLER than the same image's Huffman
    baseline payload — the compression advantage that is the point of
    the QM coder.  Oracle: every output is a closed-form function of
    doc_id."""
    import numpy as np
    import pandas as pd

    cat = Catalog(sf_dir)
    docs = scan(spark, cat, "documents", ["doc_id"]).filter(
        F.col("doc_id") < _JPEG_ARITH_N_ASSETS
    )

    def _roundtrip(batches):
        from dbt_lab_spark.llm.codecs import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_arith,
        )

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                direction = d % 4
                yy, xx = np.mgrid[0:48, 0:48]
                ramp = [xx, yy, 47 - xx, 47 - yy][direction] * (220.0 / 47.0)
                img = np.stack(
                    [ramp, ramp * 0.8 + 20, ramp * 0.6 + 40], axis=2
                ).astype(np.uint8)
                pa = encode_jpeg_arith(img, quality=90)
                ph = encode_jpeg(img, quality=90)
                dec = decode_jpeg(pa).astype(np.float64)
                y = dec.mean(axis=2)
                dx = float(y[:, 24:].mean() - y[:, :24].mean())
                dy = float(y[24:, :].mean() - y[:24, :].mean())
                if abs(dx) >= abs(dy):
                    got = 0 if dx > 0 else 2
                else:
                    got = 1 if dy > 0 else 3
                rmse = float(np.sqrt(np.mean((dec - img.astype(np.float64)) ** 2)))
                rows.append(
                    (d, got, direction, bool(rmse <= 9.0), bool(len(pa) < len(ph)))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "dir_decoded", "dir_planted",
                    "rmse_le_9", "arith_smaller",
                ],
            )

    return docs.mapInPandas(
        _roundtrip,
        "doc_id long, dir_decoded int, dir_planted int, "
        "rmse_le_9 boolean, arith_smaller boolean",
    ).orderBy("doc_id")


_SQL_JPEG_ARITH = f"""
SELECT doc_id,
       CAST(doc_id % 4 AS INTEGER) AS dir_decoded,
       CAST(doc_id % 4 AS INTEGER) AS dir_planted,
       TRUE AS rmse_le_9,
       TRUE AS arith_smaller
FROM documents WHERE doc_id < {_JPEG_ARITH_N_ASSETS} ORDER BY doc_id
"""


def _q_stream_merge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert INTO the snapshot log through a real
    readStream + foreachBatch merge-on-read MERGE
    (plans/snapshots.py merge_stream_batch): three replayed
    micro-batches — base rows (k%4==0), then an upsert wave (updates
    k%16==0 at +1M cents, inserts k%8==2), then a second wave that
    composes on the first (updates k%16==8 at +2M, inserts k%8==6) —
    land as DV tombstones + one delta directory each, ZERO data-file
    rewrites across the whole run (flag from the log's operation
    records).  The final table contents equal the batch upsert the
    DuckDB oracle computes; batch-id stamping makes redelivery
    idempotent (pinned in tests).  This is the 100 TB streaming-CDC
    shape: per-batch cost is O(batch + sidecar), never O(table)."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable
    from dbt_lab_spark.streaming.windows import (
        land_replay_splits,
        scoped_shuffle_partitions,
    )

    orders = _orders_kc(spark, sf_dir)
    if orders.limit(1).count() == 0:
        # empty source: no micro-batch ever fires, so no version exists
        # to read — the zero row is the vacuous closed form
        return local_df(spark, 
            [(0, 0, True, 0)],
            "n_rows bigint, sum_cents bigint, zero_rewrites boolean, "
            "n_versions bigint",
        )
    tmp = tempfile.mkdtemp(prefix="streammerge_")
    try:
        staged = (
            orders.filter(F.col("k") % 4 == 0)
            .select("k", "cents", F.lit(0).alias("g"))
            .unionByName(
                orders.filter((F.col("k") % 16 == 0) | (F.col("k") % 8 == 2))
                .select(
                    "k",
                    F.when(F.col("k") % 16 == 0, F.col("cents") + 1_000_000)
                    .otherwise(F.col("cents"))
                    .alias("cents"),
                    F.lit(1).alias("g"),
                )
            )
            .unionByName(
                orders.filter((F.col("k") % 16 == 8) | (F.col("k") % 8 == 6))
                .select(
                    "k",
                    F.when(F.col("k") % 16 == 8, F.col("cents") + 2_000_000)
                    .otherwise(F.col("cents"))
                    .alias("cents"),
                    F.lit(2).alias("g"),
                )
            )
        )
        src = os.path.join(tmp, "src")
        land_replay_splits(staged, src, "g")
        t = SnapshotTable(os.path.join(tmp, "tbl"))

        def sink(batch_df, batch_id):
            t.merge_stream_batch(spark, batch_df, batch_id, on=["k"], mode="dv")

        with scoped_shuffle_partitions(spark, 4):
            stream = (
                spark.readStream.schema("k long, cents long")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                stream.writeStream.foreachBatch(sink)
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        ops = [r["operation"] for r in t._log()]
        zero_rewrites = all(
            ("mode=dv" in op) or op in ("commit", "stream-merge") for op in ops
        )
        head = t.read(spark).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).first()
        n_versions = len(t.versions())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_df(spark, 
        [(int(head["n"]), int(head["s"] or 0), bool(zero_rewrites), int(n_versions))],
        "n_rows bigint, sum_cents bigint, zero_rewrites boolean, "
        "n_versions bigint",
    )


_SQL_STREAM_MERGE_DV = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
), head AS (
  SELECT k,
         CASE WHEN k % 16 = 0 THEN cents + 1000000
              WHEN k % 16 = 8 THEN cents + 2000000
              ELSE cents END AS cents
  FROM o WHERE k % 4 = 0 OR k % 8 = 2 OR k % 8 = 6
)
SELECT (SELECT COUNT(*) FROM head) AS n_rows,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM head) AS sum_cents,
       TRUE AS zero_rewrites,
       CAST(3 AS BIGINT) AS n_versions
"""


R7_QUERIES: list[QueryDef] = [
    QueryDef(
        "q_delete_dv", _q_delete_dv, _SQL_DELETE_DV,
        "merge-on-read deletion vectors: point delete, zero rewrites, compact materializes",
    ),
    QueryDef(
        "q_zorder_compact", _q_zorder_compact, _SQL_ZORDER_COMPACT,
        "OPTIMIZE ZORDER on the snapshot log: both columns prune, contents byte-equal",
    ),
    QueryDef(
        "q_bloom_skip", _q_bloom_skip, _SQL_BLOOM_SKIP,
        "per-file Bloom point lookup: needle read prunes to O(matching files)",
    ),
    QueryDef(
        "q_stream_outer_join", _q_stream_outer_join, _SQL_STREAM_OUTER_JOIN,
        "watermark-finalized stream-stream LEFT OUTER join == batch LEFT JOIN",
    ),
    QueryDef(
        "q_jpeg_arith", _q_jpeg_arith, _SQL_JPEG_ARITH,
        "arithmetic JPEG (SOF9 QM-coder): decode exact, smaller than Huffman",
    ),
    QueryDef(
        "q_merge_dv", _q_merge_dv, _SQL_MERGE_DV,
        "merge-on-read MERGE: DV tombstones + one delta dir, zero rewrites",
    ),
    QueryDef(
        "q_stream_full_outer_join", _q_stream_full_outer_join,
        _SQL_STREAM_FULL_OUTER_JOIN,
        "stream-stream FULL OUTER interval join == batch FULL JOIN",
    ),
    QueryDef(
        "q_stream_merge_dv", _q_stream_merge_dv, _SQL_STREAM_MERGE_DV,
        "streaming CDC upsert via foreachBatch DV merge: zero rewrites",
    ),
]
