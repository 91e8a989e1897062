"""Round-7 pins: deletion vectors (merge-on-read DELETE), Z-order
compaction of the snapshot log, per-file Bloom point skipping, the
watermark-finalized stream-stream LEFT OUTER join, and the r6-advice
fixes (evolve × constraints, rollback constraint restore, change_feed
rename alignment, stat_cols rename tracking, scoped shuffle conf)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.plans.snapshots import SnapshotTable


def _kv(spark, lo, hi, tag=0):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10 + tag).alias("v"),
    )


# ---------------------------------------------------------------------------
# Deletion vectors
# ---------------------------------------------------------------------------


class TestDeletionVectors:
    def test_dv_delete_rewrites_nothing_and_reads_right(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 100))
        t.append(_kv(spark, 100, 200))
        head = t._log()[-1]
        files_before = {
            os.path.join(d, fn): os.path.getmtime(os.path.join(d, fn))
            for d in head["files"]
            for fn in os.listdir(d)
            if fn.endswith(".parquet")
        }
        res = t.delete_where(spark, "k % 10 = 0", mode="dv")
        assert res["n_dirs_rewritten"] == 0
        assert res["n_deleted"] == 20
        head2 = t._log()[-1]
        # the manifest's data-file list is IDENTICAL and no data file
        # was touched on disk — the merge-on-read contract
        assert head2["files"] == head["files"]
        files_after = {
            os.path.join(d, fn): os.path.getmtime(os.path.join(d, fn))
            for d in head2["files"]
            for fn in os.listdir(d)
            if fn.endswith(".parquet")
        }
        assert files_after == files_before
        got = sorted(r["k"] for r in t.read(spark).collect())
        assert got == [k for k in range(200) if k % 10 != 0]

    def test_dv_matches_cow_delete_results(self, spark, tmp_path):
        a = SnapshotTable(str(tmp_path / "a"))
        b = SnapshotTable(str(tmp_path / "b"))
        for t in (a, b):
            t.commit(_kv(spark, 0, 50))
            t.append(_kv(spark, 50, 120))
        a.delete_where(spark, "k % 7 = 0", mode="dv")
        b.delete_where(spark, "k % 7 = 0", mode="cow")
        ra = sorted(map(tuple, a.read(spark).collect()))
        rb = sorted(map(tuple, b.read(spark).collect()))
        assert ra == rb

    def test_dv_time_travel_reads_rows_back(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        v0 = t.commit(_kv(spark, 0, 60))
        t.delete_where(spark, "k < 30", mode="dv")
        assert t.read(spark).count() == 30
        assert t.read(spark, version=v0).count() == 60

    def test_dv_second_delete_composes(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 100))
        t.delete_where(spark, "k % 2 = 0", mode="dv")
        res2 = t.delete_where(spark, "k % 3 = 0", mode="dv")
        # evens already gone: only odd multiples of 3 newly deleted
        assert res2["n_deleted"] == len(
            [k for k in range(100) if k % 3 == 0 and k % 2 != 0]
        )
        got = sorted(r["k"] for r in t.read(spark).collect())
        assert got == [k for k in range(100) if k % 2 and k % 3]

    def test_dv_noop_predicate_commits_nothing(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 10))
        n = len(t.versions())
        res = t.delete_where(spark, "k > 999", mode="dv")
        assert res["version"] is None and res["n_deleted"] == 0
        assert len(t.versions()) == n

    def test_dv_applies_under_between_skipping(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"), stat_cols=["k"])
        t.append(_kv(spark, 0, 100).repartitionByRange(4, "k").sortWithinPartitions("k"))
        t.delete_where(spark, "k = 42", mode="dv")
        got = sorted(r["k"] for r in t.read(spark, between=("k", 40, 45)).collect())
        assert got == [40, 41, 43, 44, 45]

    def test_compact_materializes_dvs(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 40))
        t.append(_kv(spark, 40, 80))
        t.delete_where(spark, "k % 4 = 1", mode="dv")
        before = sorted(map(tuple, t.read(spark).collect()))
        v = t.compact(spark, target_mb=1024.0)
        assert v is not None
        head = t._log()[-1]
        # the compacted directory physically excludes the deleted rows:
        # a RAW read of the new files (no DV applied) equals the head
        raw = sorted(
            map(tuple, spark.read.parquet(*head["files"]).select("k", "v").collect())
        )
        assert raw == before
        assert sorted(map(tuple, t.read(spark).collect())) == before

    def test_merge_on_dv_table_sees_deletes(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 20))
        t.delete_where(spark, "k = 5", mode="dv")
        src = _kv(spark, 4, 7, tag=9)  # touches 4,5,6; 5 was DV-deleted
        t.merge(spark, src, on=["k"])
        got = {r["k"]: r["v"] for r in t.read(spark).collect()}
        # 5 comes back as an INSERT of the source row (it no longer
        # existed), 4 and 6 are updates — all carry the tag-9 values
        assert got[4] == 49 and got[5] == 59 and got[6] == 69
        assert len(got) == 20

    def test_change_feed_across_dv_version(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        v0 = t.commit(_kv(spark, 0, 30))
        t.delete_where(spark, "k < 3", mode="dv")
        feed = t.change_feed(spark, from_version=v0).collect()
        deletes = sorted(r["k"] for r in feed if r["_change"] == "delete")
        inserts = [r for r in feed if r["_change"] == "insert"]
        assert deletes == [0, 1, 2] and inserts == []

    def test_vacuum_keeps_referenced_dv_dirs(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 30))
        t.delete_where(spark, "k < 10", mode="dv")
        t.append(_kv(spark, 30, 40))
        t.vacuum(keep_last=1, grace_s=0.0)
        assert t.read(spark).count() == 30  # 20 survivors + 10 appended
        assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(10, 40))

    def test_rollback_restores_dv_state(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        v0 = t.commit(_kv(spark, 0, 20))
        t.delete_where(spark, "k < 5", mode="dv")
        t.rollback(v0)
        assert t.read(spark).count() == 20

    def test_merge_dv_matches_cow_merge(self, spark, tmp_path):
        a = SnapshotTable(str(tmp_path / "a"))
        b = SnapshotTable(str(tmp_path / "b"))
        src = _kv(spark, 40, 70, tag=9)  # updates 40-49, inserts 50-69
        for t in (a, b):
            t.commit(_kv(spark, 0, 50))
        files_before = list(a._log()[-1]["files"])
        ra = a.merge(spark, src, on=["k"], mode="dv")
        b.merge(spark, src, on=["k"], mode="cow")
        assert ra["n_dirs_rewritten"] == 0 and ra["n_updated"] == 10
        # pre-merge files carried by reference, delta appended after
        assert a._log()[-1]["files"][: len(files_before)] == files_before
        got_a = sorted(map(tuple, a.read(spark).collect()))
        got_b = sorted(map(tuple, b.read(spark).collect()))
        assert got_a == got_b

    def test_merge_dv_pure_insert_writes_no_sidecar(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 10))
        res = t.merge(spark, _kv(spark, 100, 110), on=["k"], mode="dv")
        assert res["n_updated"] == 0
        assert not (t._log()[-1].get("dvs") or [])
        assert t.read(spark).count() == 20

    def test_merge_dv_composes_with_dv_delete(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 30))
        t.delete_where(spark, "k = 7", mode="dv")
        t.merge(spark, _kv(spark, 5, 10, tag=9), on=["k"], mode="dv")
        got = {r["k"]: r["v"] for r in t.read(spark).collect()}
        # 7 was DV-deleted, then re-inserted by the merge source
        assert len(got) == 30
        assert all(got[k] == k * 10 + 9 for k in range(5, 10))


# ---------------------------------------------------------------------------
# evolve × constraints / rename bookkeeping (ADVICE r6)
# ---------------------------------------------------------------------------


class TestEvolveConstraintInteractions:
    def test_evolve_rejects_drop_of_constrained_column(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 1, 10))
        t.add_constraint(spark, "v_pos", "v > 0")
        with pytest.raises(ValueError, match="drop_constraint first"):
            t.evolve(drop=["v"])

    def test_evolve_rewrites_constraint_under_rename(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 1, 10))
        t.add_constraint(spark, "v_pos", "v > 0")
        t.evolve(rename={"v": "val"})
        # writes on the NEW name keep being validated...
        with pytest.raises(ValueError, match="v_pos"):
            t.append(
                spark.createDataFrame([(99, -1)], "k long, val long")
            )
        # ...and clean batches commit (the rewritten expression parses)
        t.append(spark.createDataFrame([(99, 7)], "k long, val long"))
        assert t.read(spark).filter("k = 99").first()["val"] == 7

    def test_evolve_swap_rename_binds_constraints_right(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(
            spark.createDataFrame([(1, 5, -5)], "k long, pos long, neg long")
        )
        t.add_constraint(spark, "pos_pos", "pos > 0")
        t.add_constraint(spark, "neg_neg", "neg < 0")
        t.evolve(rename={"pos": "neg", "neg": "pos"})
        # after the swap, the data in column `neg` (old pos) is positive
        # and `pos` (old neg) negative; the constraints must have
        # followed the swap so a consistent batch passes...
        t.append(spark.createDataFrame([(2, 8, -8)], "k long, neg long, pos long"))
        # ...and a batch violating the SWAPPED binding is refused
        with pytest.raises(ValueError):
            t.append(
                spark.createDataFrame([(3, -8, 8)], "k long, neg long, pos long")
            )

    def test_rollback_restores_target_constraint_set(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        v0 = t.commit(_kv(spark, 1, 10))
        t.add_constraint(spark, "v_pos", "v > 0")
        t.rollback(v0)
        # the restored version predates the constraint: writes that
        # would have violated it are accepted again
        t.append(spark.createDataFrame([(99, -1)], "k long, v long"))
        assert t.read(spark).filter("k = 99").count() == 1

    def test_change_feed_maps_renamed_column(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        v0 = t.commit(_kv(spark, 0, 10))
        t.evolve(rename={"v": "val"})
        t.delete_where(spark, "k = 3", mode="cow")
        feed = t.change_feed(spark, from_version=v0).collect()
        dels = [r for r in feed if r["_change"] == "delete"]
        # the deleted row surfaces under the NEW name with its REAL
        # value (pre-fix: null-filled)
        assert [(r["k"], r["val"]) for r in dels] == [(3, 30)]

    def test_stat_cols_follow_rename(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"), stat_cols=["v"])
        t.commit(_kv(spark, 0, 50))
        t.evolve(rename={"v": "val"})
        t.append(
            spark.range(1000, 1050).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("val")
            )
        )
        head = t._log()[-1]
        new_dir = head["files"][-1]
        stats = {
            p: s
            for p, s in t.file_stats().items()
            if p.startswith(new_dir + os.sep)
        }
        # post-rename files keep recording min/max under the NEW name
        # (r9: stats live in per-dir manifest sidecars; file_stats()
        # is the logical-name audit view)
        assert stats and all("val" in s for s in stats.values())
        kept, total = t.pruned_file_count(None, between=("val", 0, 100))
        assert kept < total  # skipping still prunes after the rename


# ---------------------------------------------------------------------------
# Bloom point skipping
# ---------------------------------------------------------------------------


class TestBloomSkipping:
    def test_point_lookup_prunes_and_is_exact(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"), bloom_cols=["k"])
        for g in range(4):
            t.append(_kv(spark, g * 100, (g + 1) * 100).repartition(2))
        got = t.read(spark, point=("k", 250)).collect()
        assert [(r["k"], r["v"]) for r in got] == [(250, 2500)]
        kept, total = t.pruned_point_file_count(None, ("k", 250))
        assert total == 8 and kept <= total // 2

    def test_missing_key_reads_empty(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"), bloom_cols=["k"])
        t.append(_kv(spark, 0, 200).repartition(4))
        assert t.read(spark, point=("k", 10_000)).count() == 0

    def test_bloom_false_positive_rate_sane(self, spark, tmp_path):
        from dbt_lab_spark.plans.snapshots import (
            _bloom_build,
            _bloom_maybe_contains,
        )

        m, k, b = _bloom_build(list(range(1000)))
        entry = {"m": m, "k": k, "b": b}
        assert all(_bloom_maybe_contains(entry, v) for v in range(1000))
        fp = sum(
            1 for v in range(1_000_000, 1_010_000) if _bloom_maybe_contains(entry, v)
        )
        assert fp < 300  # ~1% expected at 10 bits/key; 3% is the alarm line

    def test_string_keys_prune_too(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"), bloom_cols=["s"])
        for g in range(3):
            t.append(
                spark.range(g * 50, (g + 1) * 50).select(
                    F.concat(F.lit("doc-"), F.col("id")).alias("s"),
                    F.col("id").alias("v"),
                )
            )
        got = t.read(spark, point=("s", "doc-75")).collect()
        assert [(r["s"], r["v"]) for r in got] == [("doc-75", 75)]
        kept, total = t.pruned_point_file_count(None, ("s", "doc-75"))
        assert kept < total


# ---------------------------------------------------------------------------
# Z-order compaction
# ---------------------------------------------------------------------------


class TestZorderCompact:
    def test_both_columns_prune_and_contents_equal(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"), stat_cols=["a", "b"])
        df = spark.range(4096).select(
            F.col("id").alias("k"),
            (F.col("id") % 64).alias("a"),
            ((F.col("id") * 2654435761) % 64).alias("b"),
        )
        for g in range(4):
            t.append(df.filter(F.col("k") % 4 == g))
        before = sorted(map(tuple, t.read(spark).collect()))
        v = t.compact(spark, target_mb=1024.0, n_files=16, zorder=["a", "b"])
        assert v is not None
        assert sorted(map(tuple, t.read(spark).collect())) == before
        ka, ta = t.pruned_file_count(None, ("a", 10, 17))
        kb, tb = t.pruned_file_count(None, ("b", 10, 17))
        assert ta == 16 and tb == 16
        # an eighth-wide slab on EITHER dimension hits at most half the
        # hyper-rectangles — the multi-column skipping contract
        assert ka <= 8 and kb <= 8
        # pruned read is exact
        got = sorted(
            r["k"] for r in t.read(spark, between=("a", 10, 17)).collect()
        )
        want = sorted(r["k"] for r in df.filter("a between 10 and 17").collect())
        assert got == want

    def test_zorder_and_order_by_are_exclusive(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 10))
        with pytest.raises(ValueError, match="not both"):
            t.compact(spark, order_by=["k"], zorder=["k", "v"])


# ---------------------------------------------------------------------------
# Stream-stream LEFT OUTER join: watermark-finalized null emission
# ---------------------------------------------------------------------------


class TestStreamOuterJoin:
    def test_null_rows_emit_in_later_batch(self, spark, tmp_path):
        import datetime as dt

        from dbt_lab_spark.streaming.windows import (
            land_replay_splits,
            scoped_shuffle_partitions,
            stream_stream_interval_join,
        )

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

        def TS(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        left_rows = [(1, TS(0), 0), (2, TS(0), 0)]  # user 2: no click
        right_rows = [(1, TS(10), 0)]
        for g in (1, 2):  # two sentinels: advance, then finalize
            left_rows.append((-1, TS(600 + 60 * g), g))
            right_rows.append((-1, TS(600 + 60 * g), g))
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
        seen: list[tuple[int, int, bool]] = []  # (batch_id, uid, matched)

        def sink(df, bid):
            for r in df.collect():
                seen.append((bid, r["uid"], r["cts"] is not None))

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
                watermark="1 hour", how="left_outer",
            ).select(left["user_id"].alias("uid"), right["ts_r"].alias("cts"))
            q = (
                joined.writeStream.outputMode("append")
                .foreachBatch(sink)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        real = [s for s in seen if s[1] >= 0]
        matched = [s for s in real if s[2]]
        nulls = [s for s in real if not s[2]]
        assert [(u, m) for _, u, m in matched] == [(1, True)]
        assert [(u, m) for _, u, m in nulls] == [(2, False)]
        # the EVICTION PROOF: the null-padded row can only appear after
        # the watermark passed purchase_ts + 1h — a strictly later
        # micro-batch than the on-time match
        assert nulls[0][0] > matched[0][0]

    def test_unsupported_how_rejected(self, spark):
        from dbt_lab_spark.streaming.windows import stream_stream_interval_join

        df = spark.createDataFrame([], "user_id long, ts timestamp")
        # left_semi/left_anti became first-class in r9 (VERDICT r8 #5,
        # test_wave40) — "cross" remains genuinely unsupported
        with pytest.raises(ValueError, match="unsupported how"):
            stream_stream_interval_join(df, df, key="user_id", how="cross")

    def test_full_outer_emits_both_null_sides(self, spark, tmp_path):
        import datetime as dt

        from dbt_lab_spark.streaming.windows import (
            land_replay_file,
            scoped_shuffle_partitions,
            stream_stream_interval_join,
        )

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

        def TS(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        # user 1 matches; user 2's purchase has no click; user 3's
        # click has no purchase
        left_rows = [(1, TS(0)), (2, TS(0)), (-1, TS(600))]
        right_rows = [(1, TS(10)), (3, TS(10)), (-1, TS(600))]
        src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
        land_replay_file(
            spark.createDataFrame(left_rows, "user_id long, ts timestamp"),
            src_l, 0, "l",
        )
        land_replay_file(
            spark.createDataFrame(right_rows, "user_id long, ts_r timestamp"),
            src_r, 0, "r",
        )
        with scoped_shuffle_partitions(spark, 4):
            left = spark.readStream.schema(
                "user_id long, ts timestamp"
            ).parquet(src_l)
            right = spark.readStream.schema(
                "user_id long, ts_r timestamp"
            ).parquet(src_r)
            j = stream_stream_interval_join(
                left, right, key="user_id", within="1 hour",
                watermark="1 hour", how="full_outer",
            ).select(
                left["user_id"].alias("ul"),
                right["user_id"].alias("ur"),
            )
            q = (
                j.writeStream.outputMode("append")
                .format("memory")
                .queryName("sfo_pin")
                .option("checkpointLocation", str(tmp_path / "ck"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        rows = {
            (r["ul"], r["ur"])
            for r in spark.table("sfo_pin").collect()
            if (r["ul"] or 0) >= 0 and (r["ur"] or 0) >= 0
        }
        spark.catalog.dropTempView("sfo_pin")
        assert (1, 1) in rows  # matched
        assert (2, None) in rows  # unmatched purchase, left-null-padded
        assert (None, 3) in rows  # unmatched click, right-null-padded


# ---------------------------------------------------------------------------
# scoped conf restore (ADVICE r6)
# ---------------------------------------------------------------------------


class TestScopedConf:
    def test_restores_on_exception(self, spark):
        from dbt_lab_spark.streaming.windows import scoped_shuffle_partitions

        before = spark.conf.get("spark.sql.shuffle.partitions")
        with pytest.raises(RuntimeError, match="boom"):
            with scoped_shuffle_partitions(spark, 4):
                assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
                raise RuntimeError("boom")
        assert spark.conf.get("spark.sql.shuffle.partitions") == before


class TestSnapshotFeatureComposition:
    def test_kitchen_sink_lifecycle(self, spark, tmp_path):
        """Every r5-r7 snapshot feature in ONE lifecycle, checked
        against a plain Python model at each step: stat+bloom commit ->
        appends -> CHECK constraint -> evolve(rename+widen) -> DV
        delete -> DV merge -> Z-order compact -> point/between reads ->
        time travel -> rollback -> vacuum."""
        import pyspark.sql.functions as F

        t = SnapshotTable(
            str(tmp_path / "t"), stat_cols=["v"], bloom_cols=["k"]
        )

        def kv(lo, hi, tag=0):
            return spark.range(lo, hi).select(
                F.col("k").alias("k") if False else F.col("id").alias("k"),
                (F.col("id") % 100).cast("int").alias("v"),
                (F.col("id") * 10 + tag).alias("p"),
            )

        model = {}  # k -> (v, p)

        def sync_check():
            got = {r["k"]: (r[t._log()[-1]["columns"][1]], r["p"])
                   for r in t.read(spark).collect()}
            want = dict(model)
            assert got == want, (
                f"mismatch: extra={set(got) - set(want)}, "
                f"missing={set(want) - set(got)}, "
                f"diff={[k for k in got if k in want and got[k] != want[k]][:5]}"
            )

        t.commit(kv(0, 200))
        model.update({k: (k % 100, k * 10) for k in range(200)})
        v_initial = 0
        sync_check()

        t.append(kv(200, 400))
        model.update({k: (k % 100, k * 10) for k in range(200, 400)})
        sync_check()

        t.add_constraint(spark, "v_nonneg", "v >= 0")
        t.evolve(rename={"v": "val"}, widen={"v": "long"})
        sync_check()  # rename visible, data unchanged

        # constraint followed the rename: violating batch refused
        with pytest.raises(ValueError, match="v_nonneg"):
            t.append(
                spark.createDataFrame([(999, -1, 0)], "k long, val int, p long")
            )

        t.delete_where(spark, "k % 10 = 7", mode="dv")
        for k in [k for k in list(model) if k % 10 == 7]:
            del model[k]
        sync_check()

        src = spark.range(350, 450).select(
            F.col("id").alias("k"),
            F.lit(1).cast("int").alias("val"),
            (F.col("id") * 10 + 9).alias("p"),
        )
        t.merge(spark, src, on=["k"], mode="dv")
        model.update({k: (1, k * 10 + 9) for k in range(350, 450)})
        sync_check()

        v_pre_compact = len(t.versions()) - 1
        t.compact(spark, target_mb=1024.0, n_files=8, zorder=["k", "val"])
        sync_check()

        # bloom point lookup after rename/DV/merge/compact
        got = t.read(spark, point=("k", 355)).collect()
        assert [(r["k"], r["val"], r["p"]) for r in got] == [(355, 1, 3559)]
        # between= skipping on the renamed stat column stays exact
        got = sorted(
            r["k"] for r in t.read(spark, between=("val", 1, 1)).collect()
        )
        assert got == sorted(k for k, (v, _) in model.items() if v == 1)

        # time travel to the very first commit still reads original
        # schema and rows
        v0 = t.read(spark, version=v_initial)
        assert v0.columns == ["k", "v", "p"]
        assert v0.count() == 200

        # rollback to pre-compact: same contents (compact is layout-only)
        t.rollback(v_pre_compact)
        sync_check()

        # vacuum to the head only; contents survive
        t.vacuum(keep_last=1, grace_s=0.0)
        sync_check()


class TestStreamMergeSink:
    def test_idempotent_replay(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        b0 = _kv(spark, 0, 20)
        b1 = _kv(spark, 10, 30, tag=9)
        assert t.merge_stream_batch(spark, b0, 0, on=["k"]) == 0
        assert t.merge_stream_batch(spark, b1, 1, on=["k"]) is not None
        before = sorted(map(tuple, t.read(spark).collect()))
        # redelivery of both batches: no-ops, contents unchanged
        assert t.merge_stream_batch(spark, b0, 0, on=["k"]) is None
        assert t.merge_stream_batch(spark, b1, 1, on=["k"]) is None
        assert sorted(map(tuple, t.read(spark).collect())) == before
        got = {r["k"]: r["v"] for r in t.read(spark).collect()}
        assert len(got) == 30
        assert all(got[k] == k * 10 + 9 for k in range(10, 30))

    def test_seq_column_keeps_latest(self, spark, tmp_path):
        import pyspark.sql.functions as F

        t = SnapshotTable(str(tmp_path / "t"))
        t.merge_stream_batch(spark, _kv(spark, 0, 5), 0, on=["k"])
        # one batch carries two versions of key 2: _seq picks the later
        batch = spark.createDataFrame(
            [(2, 100, 1), (2, 200, 2), (7, 70, 1)],
            "k long, v long, _seq int",
        )
        t.merge_stream_batch(spark, batch, 1, on=["k"])
        got = {r["k"]: r["v"] for r in t.read(spark).collect()}
        assert got[2] == 200 and got[7] == 70 and len(got) == 6

    def test_dv_mode_never_rewrites(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.merge_stream_batch(spark, _kv(spark, 0, 50), 0, on=["k"])
        files_v0 = list(t._log()[-1]["files"])
        t.merge_stream_batch(spark, _kv(spark, 25, 75, tag=9), 1, on=["k"])
        # v0's files carried by reference; only a delta dir appended
        assert t._log()[-1]["files"][: len(files_v0)] == files_v0
