"""Round-9 pins for the stream-stream LEFT SEMI / LEFT ANTI interval
joins (VERDICT r8 #5): semantics equal the batch EXISTS / NOT EXISTS,
a semi row emits ONCE on its first match, and an anti row emits only
after the watermark passes its join window — in a strictly LATER
micro-batch than on-time matches (the same eviction argument the
outer joins carry)."""

from __future__ import annotations

import datetime as dt

from dbt_lab_spark.streaming.windows import (
    land_replay_splits,
    scoped_shuffle_partitions,
    stream_stream_interval_join,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _drive(spark, tmp_path, how, left_rows, right_rows):
    """Replay the staged batches through a real stream pair and
    collect (batch_id, user_id) emissions."""
    src_l = str(tmp_path / "l")
    src_r = str(tmp_path / "r")
    land_replay_splits(
        spark.createDataFrame(left_rows, "user_id long, ts timestamp, g int"),
        src_l, "g",
    )
    land_replay_splits(
        spark.createDataFrame(right_rows, "user_id long, ts_r timestamp, g int"),
        src_r, "g",
    )
    seen: list[tuple[int, int]] = []

    def sink(df, bid):
        for r in df.collect():
            seen.append((bid, r["user_id"]))

    with scoped_shuffle_partitions(spark, 4):
        left = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_l)
        )
        right = (
            spark.readStream.schema("user_id long, ts_r timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_r)
        )
        joined = stream_stream_interval_join(
            left, right, key="user_id", within="1 hour",
            watermark="1 hour", how=how,
        ).select("user_id", "ts")
        q = (
            joined.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{how}"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return [s for s in seen if s[1] >= 0]


def _staged_rows():
    """user 1: purchase with a click in-window (semi keeps, anti
    drops); user 2: purchase with a click OUTSIDE the window; user 3:
    purchase with no click at all.  Two sentinel batches advance the
    watermark past every real event so anti rows finalize."""
    left = [(1, _ts(0), 0), (2, _ts(0), 0), (3, _ts(0), 0)]
    right = [(1, _ts(10), 0), (2, _ts(600), 0)]
    for g in (1, 2):
        left.append((-1, _ts(1200 + 60 * g), g))
        right.append((-1, _ts(1200 + 60 * g), g))
    return left, right


class TestStreamSemiAntiJoin:
    def test_semi_keeps_matched_once(self, spark, tmp_path):
        left, right = _staged_rows()
        got = _drive(spark, tmp_path, "left_semi", left, right)
        # exactly the batch EXISTS: user 1 only, emitted exactly once
        assert [u for _, u in got] == [1]

    def test_anti_equals_not_exists_and_finalizes_later(
        self, spark, tmp_path
    ):
        left, right = _staged_rows()
        semi = _drive(spark, tmp_path / "semi", "left_semi", left, right)
        anti = _drive(spark, tmp_path / "anti", "left_anti", left, right)
        # exactly the batch NOT EXISTS: users 2 (match out of window)
        # and 3 (no match), each once
        assert sorted(u for _, u in anti) == [2, 3]
        # EVICTION PROOF: every anti row finalizes only after the
        # watermark passes its window — a strictly later micro-batch
        # than the on-time semi match
        on_time_batch = semi[0][0]
        assert all(b > on_time_batch for b, _ in anti), (semi, anti)

    def test_anti_emits_left_columns_only(self, spark, tmp_path):
        left, right = _staged_rows()
        src_l = str(tmp_path / "l2")
        land_replay_splits(
            spark.createDataFrame(left, "user_id long, ts timestamp, g int"),
            src_l, "g",
        )
        l_stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
            src_l
        )
        src_r = str(tmp_path / "r2")
        land_replay_splits(
            spark.createDataFrame(right, "user_id long, ts_r timestamp, g int"),
            src_r, "g",
        )
        r_stream = spark.readStream.schema(
            "user_id long, ts_r timestamp"
        ).parquet(src_r)
        out = stream_stream_interval_join(
            l_stream, r_stream, key="user_id", how="left_anti"
        )
        assert out.columns == ["user_id", "ts"]

    def test_batch_frames_agree_with_sql(self, spark):
        """The same helper on BATCH frames (no streams) must equal the
        SQL semi/anti — the degenerate case the oracle queries lean
        on."""
        left, right = _staged_rows()
        l = spark.createDataFrame(
            [(u, t) for u, t, _ in left if u >= 0], "user_id long, ts timestamp"
        )
        r = spark.createDataFrame(
            [(u, t) for u, t, _ in right if u >= 0],
            "user_id long, ts_r timestamp",
        )
        semi = stream_stream_interval_join(l, r, key="user_id", how="left_semi")
        anti = stream_stream_interval_join(l, r, key="user_id", how="left_anti")
        assert sorted(x.user_id for x in semi.collect()) == [1]
        assert sorted(x.user_id for x in anti.collect()) == [2, 3]
