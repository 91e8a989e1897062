"""Structured-Streaming window operators over the events table.

Entirely beyond-reference (the reference is strictly batch, SURVEY.md
§2.9); this module fills the gap with the idiomatic Spark constructs:
watermark + window()/session_window() aggregations that run identically
over a batch DataFrame or a readStream source — the functions below
accept either and the tests drive both paths (memory sink +
processAllAvailable for the streaming side).

Scale posture: windowed aggregation state is keyed by (window, key);
the watermark bounds state size, which is what makes the operator safe
on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from dbt_lab_spark.localrel import local_df

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import SCHEMAS, Catalog


from contextlib import contextmanager


@contextmanager
def scoped_no_data_batches(spark: SparkSession, enabled: bool):
    """Scoped set/restore of
    `spark.sql.streaming.noDataMicroBatches.enabled` (r11 opt, guide
    §1.2 "don't compute things you throw away").

    The no-data micro-batch exists to EMIT watermark-finalized results
    (append-mode window/session aggregates, outer/anti join null rows)
    and to evict state.  For a replay-scoped stream whose every output
    row is emitted ON a data batch — inner/semi stream-stream joins
    (a match is definitive the moment it arrives), dropDuplicates[
    WithinWatermark] (first occurrence emits on arrival), NoTimeout
    applyInPandasWithState (output only from the data callback) — the
    finalization batch produces zero rows and the state it would evict
    is torn down with the stopped query, so skipping it cannot change
    the memory-sink contents.  NEVER use this on a stream whose
    semantics pin watermark-driven emission (the watermark/session/
    outer/anti queries keep the default)."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "true" if enabled else "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Set spark.sql.shuffle.partitions for the duration of a replay
    stream and RESTORE it on any exit — including an exception raised
    while the stream is still being constructed (ADVICE r6: a bare
    set-before-try leaked the narrow setting to every subsequent
    query when readStream/start() raised)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table as a file-source stream (one-file-per-trigger is the
    local smoke path; a production source would be Kafka with the same
    downstream plan).

    The ts unit is sniffed from the parquet footer (catalog.events_ts_unit):
    nanos data needs the legacy long read + truncation, micros data reads
    directly with the declared schema.
    """
    import os

    import pyspark.sql.types as T

    from dbt_lab_spark.catalog import events_ts_unit

    # File streaming sources need a directory; the driver data is one
    # file per table, so stream the directory with a glob filter.
    if events_ts_unit(os.path.join(sf_dir, "events.parquet")) != "ns":
        return (
            spark.readStream.schema(SCHEMAS["events"])
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType)
            for f in SCHEMAS["events"].fields
        ]
    )
    stream = (
        spark.readStream.schema(raw)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    by: str = "event_type",
) -> DataFrame:
    """Count + sum per tumbling window and key, late data bounded by the
    watermark.  Works on batch and streaming frames alike."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.window("ts", window).alias("w"), F.col(by)).agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    by: str = "event_type",
) -> DataFrame:
    """Sliding-window count/sum."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.window("ts", window, slide).alias("w"), F.col(by)).agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    by: str = "user_id",
) -> DataFrame:
    """Session windows with an inactivity gap — the streaming-native
    form of dbt_lab_spark.workload_beyond._q_sessionize (which computes
    the same sessions with lag+cumsum for the batch oracle)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.session_window("ts", gap).alias("w"), F.col(by)).agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def run_stream_to_memory(
    spark: SparkSession, agg: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming aggregate to completion over the available
    input (local smoke path) and return the result as a batch DF."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str | None = None,
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming exact deduplication — the training-pipeline dedup op
    in its incremental form (batch form: llm/dedup.py exact_dedup).

    Two state regimes:
      - `within_watermark=False`: dropDuplicates(keys) — first
        occurrence wins forever, state holds every key seen (only safe
        when the key space is bounded);
      - `within_watermark=True`: dropDuplicatesWithinWatermark — a key
        re-emits after the watermark passes it, so state is bounded by
        the watermark window.  THE scalable choice on an unbounded
        stream (exactly how a 100 TB/day ingest dedups document IDs).
    Works on batch frames too (falls back to dropDuplicates).
    """
    if events.isStreaming and watermark is not None:
        events = events.withWatermark("ts", watermark)
    if within_watermark and events.isStreaming:
        return events.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: pairs with equal `key` where
    `right_ts` ∈ [left_ts, left_ts + within].  Both sides carry
    watermarks and the time bound is part of the join condition — that
    pair is what lets Structured Streaming EVICT buffered rows once the
    watermark passes them, so state stays bounded on an unbounded
    stream (without the bound, both sides buffer forever).

    `how="left_outer"` adds WATERMARK-FINALIZED outer semantics
    (VERDICT r6 #2): an unmatched left row is emitted null-padded only
    once the watermark passes left_ts + within — before that the
    engine cannot know no match will arrive.  The time-bound condition
    is MANDATORY here: Structured Streaming rejects (or buffers
    unboundedly in older versions) an outer stream-stream join without
    one, the subtlety SPARK-26154 and the SS guide call out.  The
    null-padded rows therefore always land in a LATER micro-batch than
    their on-time matches (pinned in tests/test_wave35.py).
    `right_outer` and `full_outer` follow the same contract on the
    other/both side(s): an unmatched right row finalizes once the
    watermark passes the latest left_ts that could still match it
    (right_ts, since left_ts <= right_ts <= left_ts + within).

    `how="left_semi"` / `how="left_anti"` (VERDICT r8 #5) are the
    decontamination-in-flight shapes — keep/drop stream rows that
    have a match in a reference stream, emitting LEFT columns only:
      - left_semi maps to Spark's native stream-stream leftSemi — a
        left row emits the moment its first match arrives (a match is
        definitive evidence; no waiting), and never again;
      - left_anti has no native stream-stream form, so it composes
        from the audited left_outer: the null-padded rows ARE exactly
        the watermark-finalized no-match-ever rows, filtered on the
        right join key (null iff no match — an equi-key can't be null
        on a matched row) and projected back to the left schema.  An
        anti row therefore emits only once the watermark passes
        left_ts + within — before that, a match could still arrive —
        landing in a LATER micro-batch than its on-time siblings, the
        same eviction argument as the outer forms (pinned in
        tests/test_wave40.py).

    Batch analogue: operators/joins.py range_join (same semantics,
    bin-bucketed equi-join); the test drives both and compares."""
    if how not in (
        "inner", "left_outer", "right_outer", "full_outer",
        "left_semi", "left_anti",
    ):
        raise ValueError(f"stream_stream_interval_join: unsupported how={how!r}")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    if how == "left_anti":
        return (
            lw.join(rw, on=cond, how="left_outer")
            .filter(rw[key].isNull())
            .select(*[lw[c] for c in left.columns])
        )
    return lw.join(rw, on=cond, how=how)


def land_replay_file(df: DataFrame, src_dir: str, order: int, name: str) -> str:
    """Materialize `df` as the `order`-th file of a REPLAY DIRECTORY: a
    single parquet file whose mtime encodes its arrival position, so a
    file-source stream with maxFilesPerTrigger=1 delivers it as
    micro-batch `order` (FileStreamSource takes files oldest-mtime
    first).  This is how the tests and declared queries stage a
    CONTROLLED arrival order — on-time data, then late data, then a
    watermark-advancing sentinel — against engine semantics that only
    depend on arrival order, exactly as a Kafka replay would."""
    import glob
    import os

    outd = os.path.join(os.path.dirname(src_dir), f"_land_{order:02d}_{name}")
    df.coalesce(1).write.parquet(outd)
    part = glob.glob(os.path.join(outd, "part-*.parquet"))[0]
    os.makedirs(src_dir, exist_ok=True)
    dst = os.path.join(src_dir, f"{order:02d}_{name}.parquet")
    os.replace(part, dst)
    # fixed, widely-spaced mtimes: arrival order must survive coarse
    # filesystem timestamp granularity
    t = 1_000_000_000 + order * 3600
    os.utime(dst, (t, t))
    return dst


def land_replay_splits(df: DataFrame, src_dir: str, split_col: str) -> list[str]:
    """Stage a MULTI-BATCH replay in ONE write job: `df` is split by
    the integer `split_col` (0, 1, 2, ... = arrival order) via a
    partitionBy write, then each split's file is renamed into the
    replay directory with land_replay_file's mtime convention.  One
    Spark job instead of one per batch — the landing cost that
    dominated q_stream_watermark when each split wrote separately."""
    import glob
    import os

    # staging dir keyed by the replay dir's name: two streams staged
    # under the same parent (e.g. a stream-stream join's two sides)
    # must not collide
    outd = os.path.join(
        os.path.dirname(src_dir), f"_land_splits_{os.path.basename(src_dir)}"
    )
    df.coalesce(1).write.partitionBy(split_col).parquet(outd)
    os.makedirs(src_dir, exist_ok=True)
    dsts = []
    for d in sorted(glob.glob(os.path.join(outd, f"{split_col}=*"))):
        order = int(d.rsplit("=", 1)[1])
        part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"{order:02d}.parquet")
        os.replace(part, dst)
        t = 1_000_000_000 + order * 3600
        os.utime(dst, (t, t))
        dsts.append(dst)
    return dsts


def hourly_rollup_with_watermark(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time tumbling 1-hour rollup with LATE-DATA DROP semantics,
    driven to completion over a replay directory (see land_replay_file)
    and returned as a STABLE batch frame.

    Append output mode is the part that makes watermarking observable:
    a window is emitted exactly once, when the watermark passes its
    end, and a row arriving after that is dropped from state rather
    than re-opening the window — the bounded-state contract that lets
    this plan run forever on an unbounded stream (SURVEY §2.9).  The
    caller proves the drop by comparing against a batch recomputation
    that excludes the late rows (q_stream_watermark's oracle).
    """
    import uuid

    # The state-store partition count is frozen per checkpoint at the
    # first batch; an hourly-window key space (one row per hour) never
    # needs the session's scan-sized shuffle width, and every extra
    # partition is a per-micro-batch task.  Scoped set/restore covers
    # stream construction too — a failure before start() must not leak
    # the narrow setting to later queries.
    with scoped_shuffle_partitions(spark, 4):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        agg = (
            stream.withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("sum_cents"),
            )
        )
        name = "wm_" + uuid.uuid4().hex
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    out = spark.table(name).select(
        (F.unix_millis(F.col("w.start")) / F.lit(3600000)).cast("long").alias("h"),
        "n_events",
        "sum_cents",
    )
    # detach from the stopped query's memory sink before the temp view
    # is dropped; the emitted window set is small (one row per hour)
    rows = out.collect()
    spark.catalog.dropTempView(name)
    if not rows:
        return local_df(spark, 
            [], "h long, n_events bigint, sum_cents bigint"
        )
    return local_df(spark, rows, out.schema)
