"""Round-10 wave: the streaming change-feed source over the segmented
snapshot log (VERDICT r9 #4) — per-commit micro-batches, exactly-once
consumption through the batch-id machinery, retention contract — and
the r10 vacuum-lock heartbeat (ADVICE r9)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.plans.snapshots import SnapshotTable


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _rows(df, cols=("_change", "k", "v")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestChangeStream:
    def _mk(self, spark, tmp_path):
        """v0 commit, v1 append, v2 DV delete (targets v0 rows),
        v3 append — intermediate changes never cancel, so the
        streamed union equals the net batch feed."""
        t = SnapshotTable(str(tmp_path / "src"))
        t.commit(_kv(spark, 0, 20))
        t.append(_kv(spark, 20, 30))
        t.delete_where(spark, "k % 5 = 0 AND k < 20", mode="dv")
        t.append(_kv(spark, 30, 40))
        return t

    def test_stream_equals_batch_feed(self, spark, tmp_path):
        t = self._mk(spark, tmp_path)
        batches = list(t.change_stream(spark, from_version=0))
        assert [v for v, _ in batches] == [1, 2, 3]
        streamed = None
        for _, df in batches:
            df = df.drop("_version")
            streamed = df if streamed is None else streamed.unionByName(df)
        assert _rows(streamed) == _rows(t.change_feed(spark, from_version=0))

    def test_v0_is_all_inserts(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 5))
        [(v, df)] = list(t.change_stream(spark))
        assert v == 0
        assert _rows(df) == [("insert", k, k * 10) for k in range(5)]
        assert df.schema["_version"].dataType.typeName() == "long"

    def test_exactly_once_replay_noop(self, spark, tmp_path):
        t = self._mk(spark, tmp_path)
        sink = SnapshotTable(str(tmp_path / "sink"))
        got = [
            sink.append_stream_batch(df, batch_id=v)
            for v, df in t.change_stream(spark)
        ]
        assert got == [0, 1, 2, 3]  # four landed versions
        n = sink.read(spark).count()
        # replay from the start: every batch a recorded no-op
        replay = [
            sink.append_stream_batch(df, batch_id=v)
            for v, df in t.change_stream(spark)
        ]
        assert replay == [None, None, None, None]
        assert sink.read(spark).count() == n
        # sink contents == the table's own net feed + v0 inserts
        want = _rows(
            t.change_feed(spark, from_version=0).unionByName(
                t.read(spark, version=0).withColumn(
                    "_change", F.lit("insert")
                )
            )
        )
        assert _rows(sink.read(spark)) == want

    def test_incremental_tail(self, spark, tmp_path):
        t = self._mk(spark, tmp_path)
        assert [v for v, _ in t.change_stream(spark, from_version=2)] == [3]
        t.append(_kv(spark, 40, 45))
        [(v, df)] = list(t.change_stream(spark, from_version=3))
        assert v == 4 and df.count() == 5

    def test_metadata_commit_yields_empty_contiguous(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 5))
        t.add_constraint(spark, "v_pos", "v >= 0")
        t.append(_kv(spark, 5, 8))
        got = {v: df.count() for v, df in t.change_stream(spark, from_version=0)}
        assert got == {1: 0, 2: 3}  # contiguous ids, empty metadata batch

    def test_out_of_retention_raises(self, spark, tmp_path):
        t = self._mk(spark, tmp_path)
        t.vacuum(keep_last=1, grace_s=0.0)
        with pytest.raises(ValueError, match="retention"):
            list(t.change_stream(spark, from_version=0))
        # re-seeding from the oldest retained version still works
        base = t.versions()[0]
        assert (
            list(t.change_stream(spark, from_version=base)) == []
            or all(v > base for v, _ in t.change_stream(spark, from_version=base))
        )


class TestVacuumHeartbeat:
    def test_long_sweep_keeps_lock_fresh(self, spark, tmp_path, monkeypatch):
        """A sweep slower than VACUUM_LOCK_STALE_S must keep the lock's
        mtime young via the per-directory heartbeat — a waiter polling
        mid-sweep sees a LIVE lock, never the stale error (ADVICE r9;
        the cross-process version lives in scripts/occ_scale_mp.py)."""
        import shutil
        import time as _time

        t = SnapshotTable(str(tmp_path / "t"))
        for g in range(3):
            t.commit(_kv(spark, g * 10, (g + 1) * 10))
        t.VACUUM_LOCK_STALE_S = 1.0
        ages: list[float] = []
        orig = shutil.rmtree

        def slow_rmtree(p, **kw):
            _time.sleep(0.7)
            ages.append(t._vacuum_lock_age() or 0.0)
            return orig(p, **kw)

        monkeypatch.setattr(shutil, "rmtree", slow_rmtree)
        t.vacuum(keep_last=1, grace_s=0.0)
        assert ages  # sweep saw >= 1 directory
        # each observation is taken ~0.7s after the pre-rmtree
        # heartbeat: well under the 1.0s staleness bound
        assert all(a < t.VACUUM_LOCK_STALE_S for a in ages)
