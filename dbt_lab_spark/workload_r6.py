"""Round-6 workload additions.

This round closes the r5 verdict list: watermark/late-data streaming
aggregation (SURVEY §2.9), schema evolution beyond additive (type
widening + column rename in the snapshot log), MP3 Layer III decode,
and the r4-advisor guard fixes.  Every query follows the repo
conventions: DataFrame-first plans, DuckDB oracle with identical
aliases, determinism per tests/oracle.py canonicalization.
"""

from __future__ import annotations

from dbt_lab_spark.localrel import local_df

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.expr import money
from dbt_lab_spark.operators.scan import fan_out_if_small, scan
from dbt_lab_spark.workload import QueryDef


# ---------------------------------------------------------------------------
# Watermark / late-data streaming aggregation (VERDICT r5 #5, SURVEY §2.9)
# ---------------------------------------------------------------------------


def _q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling rollup through a REAL Structured-Streaming
    query with `withWatermark`, proving the late-data drop end-to-end:

    purchase events are replayed in three controlled micro-batches —
    (1) everything except a LATE SET (first-day rows with even
    event_id); (2) one future SENTINEL row at max(ts)+3h, which pushes
    the watermark to max(ts)+2h — past every real window end; (3) the
    late set, which the engine must now DROP from state.  The sentinel
    precedes the late file because Spark filters late events against
    the watermark of the PREVIOUS micro-batch (the SPARK-40925
    lateEvents/eviction split — measured: a late row arriving in the
    very batch the watermark first advances is still accepted), and its
    own window is never finalized, so it never reaches append output.

    The returned per-hour (count, cents-sum) rows therefore equal the
    batch aggregation WITHOUT the late rows — which is exactly what the
    DuckDB oracle recomputes (late sets are 3/35/331 rows at
    sf0.001/0.01/0.1, so on-time != full everywhere: a non-drop is a
    hash mismatch, not a vacuous pass).  Bounded state at 100 TB/day:
    the watermark evicts windows, append emits each window once
    (streaming/windows.py hourly_rollup_with_watermark)."""
    import os
    import shutil
    import tempfile

    from dbt_lab_spark.streaming.windows import (
        hourly_rollup_with_watermark,
        land_replay_file,
        land_replay_splits,
    )

    cat = Catalog(sf_dir)
    ev = scan(
        spark, cat, "events", ["event_id", "ts", "event_type", "value"],
        predicates=[F.col("event_type") == "purchase"],
    )
    base = ev.select(
        "event_id",
        "ts",
        (money("value") * 100).cast("long").alias("cents"),
        F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0))
        .cast("long")
        .alias("d"),
    )
    bounds = base.agg(F.min("d").alias("d0"), F.max("ts").alias("mx")).first()
    tmp = tempfile.mkdtemp(prefix="wmstream_")
    try:
        src = os.path.join(tmp, "src")
        payload = ["ts", "cents"]
        if bounds["d0"] is None:  # empty events: stream two empty files
            land_replay_file(base.select(*payload), src, 0, "ontime")
            land_replay_file(base.select(*payload), src, 1, "late")
        else:
            is_late = (F.col("d") == F.lit(bounds["d0"])) & (
                F.col("event_id") % 2 == 0
            )
            sentinel = spark.range(1).select(
                (F.lit(bounds["mx"]) + F.expr("INTERVAL 3 HOURS")).alias("ts"),
                F.lit(0).cast("long").alias("cents"),
                F.lit(1).alias("g"),
            )
            staged = base.select(
                *payload, F.when(is_late, 2).otherwise(0).alias("g")
            ).unionByName(sentinel)
            # one write job stages all three micro-batches (0 = on-time,
            # 1 = sentinel, 2 = late — sentinel FIRST so the late filter
            # sees a settled watermark, see docstring)
            land_replay_splits(staged, src, "g")
        out = hourly_rollup_with_watermark(
            spark, src, "ts timestamp, cents long",
            checkpoint_dir=os.path.join(tmp, "ckpt"), watermark="1 hour",
        )
        return out.orderBy("h")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SQL_STREAM_WATERMARK = """
WITH p AS (
  SELECT event_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS d
  FROM events WHERE event_type = 'purchase'
), d0 AS (
  SELECT MIN(d) AS d0 FROM p
)
SELECT CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS h,
       COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM p, d0
WHERE NOT (d = d0 AND event_id % 2 = 0)
GROUP BY 1 ORDER BY 1
"""


def _q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows through a REAL Structured-Streaming query
    (append mode): purchase events replayed as one micro-batch, then a
    future sentinel advances the watermark past every session end so
    append emits each merged session exactly once — the streamed
    result must equal the classic batch sessionization (lag + cumsum,
    gap >= 30 min starts a session, end = last ts + gap), which is the
    DuckDB oracle.  Complements q_session_window (the batch plan) by
    pinning the STATE lifecycle: merge-on-overlap, watermark-driven
    eviction, one emission per session.  The sentinel's own session
    never finalizes, so it never reaches the output."""
    import os
    import shutil
    import tempfile
    import uuid

    from dbt_lab_spark.streaming.windows import land_replay_splits

    cat = Catalog(sf_dir)
    ev = scan(
        spark, cat, "events", ["user_id", "ts", "event_type", "value"],
        predicates=[F.col("event_type") == "purchase"],
    )
    base = ev.select(
        "user_id", "ts", (money("value") * 100).cast("long").alias("cents")
    )
    mx = base.agg(F.max("ts")).first()[0]
    tmp = tempfile.mkdtemp(prefix="sessstream_")
    try:
        src = os.path.join(tmp, "src")
        staged = base.withColumn("g", F.lit(0))
        if mx is not None:
            sentinel = spark.range(1).select(
                F.lit(-1).cast("long").alias("user_id"),
                (F.lit(mx) + F.expr("INTERVAL 3 HOURS")).alias("ts"),
                F.lit(0).cast("long").alias("cents"),
                F.lit(1).alias("g"),
            )
            staged = staged.unionByName(sentinel)
        land_replay_splits(staged, src, "g")
        from dbt_lab_spark.streaming.windows import scoped_shuffle_partitions

        with scoped_shuffle_partitions(spark, 4):
            stream = (
                spark.readStream.schema("user_id long, ts timestamp, cents long")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            agg = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(
                    F.session_window("ts", "30 minutes").alias("w"),
                    F.col("user_id"),
                )
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum("cents").alias("sum_cents"),
                )
            )
            name = "sess_" + uuid.uuid4().hex
            q = (
                agg.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        out = spark.table(name).select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_cents",
        )
        rows = out.collect()
        spark.catalog.dropTempView(name)
        if not rows:
            return local_df(spark, 
                [],
                "user_id long, session_start timestamp, "
                "session_end timestamp, n_events bigint, sum_cents bigint",
            )
        return local_df(spark, rows, out.schema).orderBy(
            "user_id", "session_start"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SQL_STREAM_SESSION = """
WITH p AS (
  SELECT user_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), flagged AS (
  SELECT user_id, ts, cents,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) >= 30*60*1000
              THEN 1 ELSE 0 END AS new_session
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, cents,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM numbered GROUP BY user_id, session_seq
ORDER BY user_id, session_start
"""


def _q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark through a REAL readStream — the
    BOUNDED-STATE dedup contract an unbounded 100 TB/day ingest relies
    on, pinned end-to-end: (1) purchase event_ids arrive (duplicates
    within the batch dedup to one); (2) a far-future sentinel advances
    the watermark past every day-0 key, EVICTING their dedup state;
    (3) day-0 even event_ids are re-delivered with fresh timestamps —
    the engine has provably forgotten them, so each re-emits exactly
    once.  Output: per-delivery-count histogram (n_keys emitted once
    vs twice), closed-form from events: evicted-and-redelivered keys
    count 2, every other purchase key counts 1.  The re-emission is
    the POINT: it is what makes state size O(watermark window), not
    O(stream lifetime) — unbounded-state dropDuplicates would hold
    every key forever (streaming/windows.py streaming_dedup covers
    both regimes)."""
    import os
    import shutil
    import tempfile
    import uuid

    from dbt_lab_spark.streaming.windows import land_replay_splits

    cat = Catalog(sf_dir)
    ev = scan(
        spark, cat, "events", ["event_id", "ts", "event_type"],
        predicates=[F.col("event_type") == "purchase"],
    )
    base = ev.select(
        "event_id",
        "ts",
        F.floor(F.unix_millis(F.col("ts")) / F.lit(86400000.0))
        .cast("long")
        .alias("d"),
    )
    bounds = base.agg(F.min("d").alias("d0"), F.max("ts").alias("mx")).first()
    tmp = tempfile.mkdtemp(prefix="dedupstream_")
    try:
        src = os.path.join(tmp, "src")
        staged = base.select("event_id", "ts", F.lit(0).alias("g"))
        if bounds["d0"] is not None:
            sentinel = spark.range(1).select(
                F.lit(-1).cast("long").alias("event_id"),
                (F.lit(bounds["mx"]) + F.expr("INTERVAL 3 HOURS")).alias("ts"),
                F.lit(1).alias("g"),
            )
            redelivered = base.filter(
                (F.col("d") == F.lit(bounds["d0"])) & (F.col("event_id") % 2 == 0)
            ).select(
                "event_id",
                (F.lit(bounds["mx"]) + F.expr("INTERVAL 4 HOURS")).alias("ts"),
                F.lit(2).alias("g"),
            )
            staged = staged.unionByName(sentinel).unionByName(redelivered)
        land_replay_splits(staged, src, "g")
        from dbt_lab_spark.streaming.windows import (
            scoped_no_data_batches,
            scoped_shuffle_partitions,
        )

        # dropDuplicatesWithinWatermark emits every surviving row ON
        # its data batch; the trailing no-data batch only evicts state
        # this replay immediately tears down — skip it (r11 opt).
        with scoped_shuffle_partitions(spark, 4), \
                scoped_no_data_batches(spark, False):
            stream = (
                spark.readStream.schema("event_id long, ts timestamp")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            deduped = stream.withWatermark(
                "ts", "1 hour"
            ).dropDuplicatesWithinWatermark(["event_id"])
            name = "dd_" + uuid.uuid4().hex
            q = (
                deduped.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        emitted = spark.table(name).filter(F.col("event_id") >= 0)
        hist = (
            emitted.groupBy("event_id")
            .agg(F.count(F.lit(1)).alias("n_emitted"))
            .groupBy("n_emitted")
            .agg(F.count(F.lit(1)).alias("n_keys"))
        )
        rows = hist.collect()
        spark.catalog.dropTempView(name)
        if not rows:
            return local_df(spark, [], "n_emitted bigint, n_keys bigint")
        return local_df(spark, rows, hist.schema).orderBy("n_emitted")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SQL_STREAM_DEDUP = """
WITH p AS (
  SELECT event_id,
         CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS d
  FROM events WHERE event_type = 'purchase'
), d0 AS (
  SELECT MIN(d) AS d0 FROM p
), per_key AS (
  SELECT event_id,
         CASE WHEN d = (SELECT d0 FROM d0) AND event_id % 2 = 0
              THEN 2 ELSE 1 END AS n_emitted
  FROM p
)
SELECT CAST(n_emitted AS BIGINT) AS n_emitted,
       COUNT(*) AS n_keys
FROM per_key GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Schema evolution beyond additive: widen + rename in the snapshot log
# (VERDICT r5 #6)
# ---------------------------------------------------------------------------


def _q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type widening + column rename as METADATA-ONLY snapshot commits,
    proven end-to-end on real data: orders rows with o_orderkey%8==0
    land as (k int, cents int); `evolve` widens both to long and
    renames k -> order_key without touching a data file; a post-evolve
    append (%8==1, written long) and a CoW merge (updates %16==0 at
    +1,000,000 cents, inserts %8==2) then compose on the evolved
    schema, reading the pre-evolve directory cast+aliased per
    generation.  One output row carries head and time-travel-to-v0
    row counts, exact cents sums, and both schema strings — all
    closed-form from `orders`, so DuckDB recomputes every field
    (plans/snapshots.py evolve/_read_paths)."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_orderkey", "o_totalprice"]).select(
        F.col("o_orderkey").cast("long").alias("k"),
        (money("o_totalprice") * 100).cast("long").alias("cents"),
    )
    tmp = tempfile.mkdtemp(prefix="schemaevo_")
    try:
        t = SnapshotTable(os.path.join(tmp, "tbl"))
        t.commit(
            orders.filter(F.col("k") % 8 == 0).select(
                F.col("k").cast("int").alias("k"),
                F.col("cents").cast("int").alias("cents"),
            )
        )
        t.evolve(widen={"k": "long", "cents": "long"}, rename={"k": "order_key"})
        t.append(
            orders.filter(F.col("k") % 8 == 1).select(
                F.col("k").alias("order_key"), "cents"
            )
        )
        src = orders.filter(
            ((F.col("k") % 16 == 0) | (F.col("k") % 8 == 2))
        ).select(
            F.col("k").alias("order_key"),
            F.when(F.col("k") % 16 == 0, F.col("cents") + 1_000_000)
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        t.merge(spark, src, on=["order_key"])
        head = t.read(spark)
        v0 = t.read(spark, version=0)
        h = head.agg(
            F.count(F.lit(1)).alias("n_head"),
            F.sum("cents").alias("sum_cents_head"),
        ).first()
        z = v0.agg(
            F.count(F.lit(1)).alias("n_v0"),
            F.sum("cents").alias("sum_cents_v0"),
        ).first()
        head_schema = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in head.schema.fields)
        v0_schema = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in v0.schema.fields)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_df(spark, 
        [
            (
                int(h["n_head"]), int(h["sum_cents_head"] or 0),
                int(z["n_v0"]), int(z["sum_cents_v0"] or 0),
                head_schema, v0_schema,
            )
        ],
        "n_head bigint, sum_cents_head bigint, n_v0 bigint, "
        "sum_cents_v0 bigint, head_schema string, v0_schema string",
    )


_SQL_SCHEMA_EVOLUTION = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
), head AS (
  SELECT k, CASE WHEN k % 16 = 0 THEN cents + 1000000 ELSE cents END AS cents
  FROM o WHERE k % 8 IN (0, 1, 2)
), v0 AS (
  SELECT k, cents FROM o WHERE k % 8 = 0
)
SELECT (SELECT COUNT(*) FROM head) AS n_head,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM head) AS sum_cents_head,
       (SELECT COUNT(*) FROM v0) AS n_v0,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM v0) AS sum_cents_v0,
       'order_key:bigint,cents:bigint' AS head_schema,
       'k:int,cents:int' AS v0_schema
"""


def _q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator through a real readStream:
    applyInPandasWithState sessionization (streaming/stateful.py — the
    brief's named extension point for operators Spark's built-ins
    can't express).  Purchase events flow as one micro-batch with
    value = exact cents; the operator emits CLOSED sessions and keeps
    each user's most recent session open in the state store, so the
    output is exactly the batch sessionization MINUS every user's last
    session — which is what the DuckDB oracle computes (gap >= 30 min
    starts a session; session_end = last event ts, the explicit-state
    convention)."""
    import os
    import shutil
    import tempfile
    import uuid

    from dbt_lab_spark.streaming.stateful import stateful_sessionize
    from dbt_lab_spark.streaming.windows import land_replay_file

    cat = Catalog(sf_dir)
    ev = scan(
        spark, cat, "events", ["user_id", "ts", "event_type", "value"],
        predicates=[F.col("event_type") == "purchase"],
    )
    base = ev.select(
        "user_id", "ts",
        (money("value") * 100).cast("long").cast("double").alias("value"),
    )
    tmp = tempfile.mkdtemp(prefix="statestream_")
    try:
        src = os.path.join(tmp, "src")
        land_replay_file(base, src, 0, "purchases")
        from dbt_lab_spark.streaming.windows import scoped_shuffle_partitions

        with scoped_shuffle_partitions(spark, 4):
            stream = spark.readStream.schema(
                "user_id long, ts timestamp, value double"
            ).parquet(src)
            sessions = stateful_sessionize(stream, gap="30 minutes")
            name = "st_" + uuid.uuid4().hex
            q = (
                sessions.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        out = spark.table(name).select(
            "user_id", "session_start", "session_end", "n_events",
            F.col("sum_value").cast("long").alias("sum_cents"),
        )
        rows = out.collect()
        spark.catalog.dropTempView(name)
        if not rows:
            return local_df(spark, 
                [],
                "user_id long, session_start timestamp, "
                "session_end timestamp, n_events bigint, sum_cents bigint",
            )
        return local_df(spark, rows, out.schema).orderBy(
            "user_id", "session_start"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SQL_STREAM_STATEFUL = """
WITH p AS (
  SELECT user_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), flagged AS (
  SELECT user_id, ts, cents,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) >= 30*60*1000
              THEN 1 ELSE 0 END AS new_session
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, cents,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
), sess AS (
  SELECT user_id, session_seq,
         MIN(ts) AS session_start, MAX(ts) AS session_end,
         COUNT(*) AS n_events, CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM numbered GROUP BY 1, 2
), last AS (
  SELECT user_id, MAX(session_seq) AS mx FROM sess GROUP BY 1
)
SELECT s.user_id, s.session_start, s.session_end, s.n_events, s.sum_cents
FROM sess s JOIN last l ON s.user_id = l.user_id AND s.session_seq < l.mx
ORDER BY 1, 2
"""


def _q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join through TWO real readStreams:
    purchases and clicks flow as separate streams; each purchase joins
    the same user's clicks with ts in [purchase_ts, purchase_ts + 1h].
    Both sides carry watermarks and the time bound is part of the join
    condition — the pair that lets Structured Streaming EVICT buffered
    rows once the watermark passes them, so state stays bounded on an
    unbounded stream (without the bound both sides buffer forever).
    Inner-join matches emit as they arrive (no finalization wait);
    the per-user pair counts must equal the batch interval join the
    DuckDB oracle computes (streaming/windows.py
    stream_stream_interval_join, batch parity also pinned in tests)."""
    import os
    import shutil
    import tempfile
    import uuid

    from dbt_lab_spark.streaming.windows import (
        land_replay_file,
        stream_stream_interval_join,
    )

    cat = Catalog(sf_dir)
    ev = scan(
        spark, cat, "events", ["user_id", "ts", "event_type"],
        predicates=[F.col("event_type").isin("purchase", "click")],
    )
    tmp = tempfile.mkdtemp(prefix="joinstream_")
    try:
        src_p = os.path.join(tmp, "purchases")
        src_c = os.path.join(tmp, "clicks")
        land_replay_file(
            ev.filter(F.col("event_type") == "purchase").select("user_id", "ts"),
            src_p, 0, "purchases",
        )
        land_replay_file(
            ev.filter(F.col("event_type") == "click").select(
                "user_id", F.col("ts").alias("ts_r")
            ),
            src_c, 0, "clicks",
        )
        from dbt_lab_spark.streaming.windows import (
            scoped_no_data_batches,
            scoped_shuffle_partitions,
        )

        # INNER interval join: a pair emits the moment both sides have
        # arrived (a data batch); the trailing no-data batch only
        # evicts state this replay immediately tears down (r11 opt).
        with scoped_shuffle_partitions(spark, 4), \
                scoped_no_data_batches(spark, False):
            left = spark.readStream.schema(
                "user_id long, ts timestamp"
            ).parquet(src_p)
            right = spark.readStream.schema(
                "user_id long, ts_r timestamp"
            ).parquet(src_c)
            joined = stream_stream_interval_join(
                left, right, key="user_id", within="1 hour", watermark="2 hours"
            ).select(left["user_id"].alias("uid"))
            name = "ssj_" + uuid.uuid4().hex
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
        hist = spark.table(name).groupBy("uid").agg(
            F.count(F.lit(1)).alias("n_pairs")
        ).select(F.col("uid").alias("user_id"), "n_pairs")
        rows = hist.collect()
        spark.catalog.dropTempView(name)
        if not rows:
            return local_df(spark, [], "user_id long, n_pairs bigint")
        return local_df(spark, rows, hist.schema).orderBy("user_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SQL_STREAM_JOIN = """
WITH p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.user_id, COUNT(*) AS n_pairs
FROM p JOIN c ON c.user_id = p.user_id
              AND c.ts >= p.ts
              AND c.ts <= p.ts + INTERVAL 1 HOUR
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# MPEG-1 Layer III audio decode (VERDICT r5 #3)
# ---------------------------------------------------------------------------

_MP3_N_ASSETS = 24
_MP3_RATES = [32000, 44100, 48000]


def _q_mp3_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MPEG-1 Layer III audio DECODE (VERDICT r5 #3; Layer II was r5,
    header metadata r4): plant sine tones at the centers of 8 equal
    bands over FULL Nyquist (Layer III codes all 32 polyphase subbands
    through the hybrid MDCT — no Layer II sblimit cut), sr rotating
    over 32/44.1/48 kHz; encode with the Layer III codec
    (llm/codecs.py encode_mp3_audio: polyphase + 18-point MDCT, alias
    butterflies, x^(4/3) requantization, canonical-Huffman spectral
    pairs + linbits escape, inner rate loop), decode back, and verify
    in-engine that (a) the dominant spectral band of the DECODED audio
    is exactly the planted band and (b) round-trip SNR >= 30 dB
    (measured 40-54).  Both hops are Arrow mapInPandas stages,
    map-only.  Oracle: every output is a closed-form function of
    doc_id."""
    import numpy as np
    import pandas as pd

    cat = Catalog(sf_dir)
    # Fan out the tiny asset-id relation so the per-row codec
    # encode/decode mapInPandas stages run in parallel Python workers
    # instead of one (size-gated, guide 2.4/4).
    docs = fan_out_if_small(
        scan(spark, cat, "documents", ["doc_id"]).filter(
            F.col("doc_id") < _MP3_N_ASSETS
        )
    )

    def _build(batches):
        from dbt_lab_spark.llm.codecs import encode_mp3_audio

        for pdf in batches:
            if not len(pdf):
                continue
            payloads, bands, rates = [], [], []
            for d in pdf["doc_id"]:
                d = int(d)
                sr = _MP3_RATES[d % 3]
                band = d % 8
                freq = (band + 0.5) / 8.0 * sr / 2.0
                t = np.arange(1152 * 3)
                sine = (12000 * np.sin(2 * np.pi * freq * t / sr)).astype(
                    np.int16
                )
                payloads.append(
                    encode_mp3_audio(sine, samplerate=sr, bitrate_kbps=192)
                )
                bands.append(band)
                rates.append(sr)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "planted_band": bands,
                    "samplerate": rates,
                }
            )

    assets = docs.mapInPandas(
        _build,
        "doc_id long, payload binary, planted_band int, samplerate int",
    )

    def _decode(batches):
        from dbt_lab_spark.llm.codecs import decode_mp3_audio

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for d, payload, band, sr in zip(
                pdf["doc_id"], pdf["payload"], pdf["planted_band"], pdf["samplerate"]
            ):
                dec, _sr2 = decode_mp3_audio(bytes(payload))
                freq = (int(band) + 0.5) / 8.0 * int(sr) / 2.0
                t = np.arange(1152 * 3)
                ref = 12000 * np.sin(2 * np.pi * freq * t / int(sr))
                n = min(len(dec), len(ref))
                a = ref[1024 : n - 1024]
                b2 = dec[1024 : n - 1024].astype(np.float64)
                spec = np.abs(np.fft.rfft(b2))
                edges = np.linspace(0, len(spec), 9).astype(int)
                energy = [
                    float((spec[edges[i] : edges[i + 1]] ** 2).sum())
                    for i in range(8)
                ]
                band_max = int(np.argmax(energy))
                err = a - b2
                snr = 10 * np.log10((a**2).sum() / max((err**2).sum(), 1e-12))
                rows.append((int(d), band_max, int(band), bool(snr >= 30.0)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "band_max", "planted_band", "snr_ge_30"],
            )

    return (
        assets.mapInPandas(
            _decode,
            "doc_id long, band_max int, planted_band int, snr_ge_30 boolean",
        )
        .orderBy("doc_id")
    )


_SQL_MP3_AUDIO = f"""
SELECT doc_id,
       CAST(doc_id % 8 AS INTEGER) AS band_max,
       CAST(doc_id % 8 AS INTEGER) AS planted_band,
       TRUE AS snr_ge_30
FROM documents WHERE doc_id < {_MP3_N_ASSETS} ORDER BY doc_id
"""


def _q_constraint_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style CHECK constraints on the snapshot log, proven
    end-to-end on real data: orders with o_orderkey%4==0 land, then
    ADD CONSTRAINT cents_pos (cents > 0) validates the existing rows;
    an appended batch carrying planted NEGATIVE rows (%8==2 keys,
    negated) is REFUSED whole (no partial write — version count
    unchanged), and the clean %8==6 batch commits.  One output row:
    head count/sum (base + clean batch only), the refusal flag, and
    the version count (base + add_constraint + one append) — all
    closed-form from `orders` (plans/snapshots.py add_constraint)."""
    import shutil
    import tempfile

    from dbt_lab_spark.plans.snapshots import SnapshotTable

    cat = Catalog(sf_dir)
    orders = scan(spark, cat, "orders", ["o_orderkey", "o_totalprice"]).select(
        F.col("o_orderkey").cast("long").alias("k"),
        (money("o_totalprice") * 100).cast("long").alias("cents"),
    )
    tmp = tempfile.mkdtemp(prefix="constraint_")
    try:
        t = SnapshotTable(os.path.join(tmp, "tbl"))
        t.commit(orders.filter(F.col("k") % 4 == 0))
        t.add_constraint(spark, "cents_pos", "cents > 0")
        bad = orders.filter(F.col("k") % 8 == 2).select(
            "k", (-F.col("cents")).alias("cents")
        )
        refused = False
        if bad.limit(1).count():
            try:
                t.append(bad)
            except ValueError:
                refused = True
        else:  # empty tables: nothing to refuse, vacuously enforced
            refused = True
        t.append(orders.filter(F.col("k") % 8 == 6))
        head = t.read(spark).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).first()
        n_versions = len(t.versions())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_df(spark, 
        [(int(head["n"]), int(head["s"] or 0), bool(refused), int(n_versions))],
        "n_rows bigint, sum_cents bigint, bad_batch_refused boolean, "
        "n_versions bigint",
    )


_SQL_CONSTRAINT_GATE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
), head AS (
  SELECT k, cents FROM o WHERE k % 4 = 0 OR k % 8 = 6
)
SELECT (SELECT COUNT(*) FROM head) AS n_rows,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM head) AS sum_cents,
       TRUE AS bad_batch_refused,
       CAST(3 AS BIGINT) AS n_versions
"""


R6_QUERIES: list[QueryDef] = [
    QueryDef(
        "q_stream_watermark", _q_stream_watermark, _SQL_STREAM_WATERMARK,
        "watermark late-data drop: streamed hourly rollup == batch minus late set",
    ),
    QueryDef(
        "q_schema_evolution", _q_schema_evolution, _SQL_SCHEMA_EVOLUTION,
        "widen+rename in the snapshot log: metadata-only evolve + merge + travel",
    ),
    QueryDef(
        "q_mp3_audio", _q_mp3_audio, _SQL_MP3_AUDIO,
        "MPEG-1 Layer III decode: hybrid MDCT + Huffman, band placement + SNR",
    ),
    QueryDef(
        "q_stream_session", _q_stream_session, _SQL_STREAM_SESSION,
        "session windows via real readStream == batch lag+cumsum sessionization",
    ),
    QueryDef(
        "q_stream_dedup", _q_stream_dedup, _SQL_STREAM_DEDUP,
        "dropDuplicatesWithinWatermark: evicted keys re-emit, state stays bounded",
    ),
    QueryDef(
        "q_stream_join", _q_stream_join, _SQL_STREAM_JOIN,
        "stream-stream interval join (two readStreams) == batch range join",
    ),
    QueryDef(
        "q_stream_stateful", _q_stream_stateful, _SQL_STREAM_STATEFUL,
        "applyInPandasWithState sessionize == batch sessions minus open tails",
    ),
    QueryDef(
        "q_constraint_gate", _q_constraint_gate, _SQL_CONSTRAINT_GATE,
        "CHECK constraint refuses a violating batch whole, clean batch commits",
    ),
]
