"""SnapshotTable: time travel, O(batch) append commits, rollback as a
forward commit, snapshot isolation of old readers."""

from __future__ import annotations

import os

from dbt_lab_spark.plans.snapshots import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_time_travel_reads(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    v0 = t.commit(_df(spark, [(1, "a")]))
    v1 = t.append(_df(spark, [(2, "b")]))
    v2 = t.append(_df(spark, [(3, "c")]))
    assert (v0, v1, v2) == (0, 1, 2)
    assert {r.k for r in t.read(spark, version=0).collect()} == {1}
    assert {r.k for r in t.read(spark, version=1).collect()} == {1, 2}
    assert {r.k for r in t.read(spark).collect()} == {1, 2, 3}


def test_append_writes_only_the_delta(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(i, "x") for i in range(100)]))
    t.append(_df(spark, [(1000, "y")]))
    dirs = sorted(d for d in os.listdir(t.root) if d.startswith("v"))
    assert len(dirs) == 2  # base + delta; base never rewritten
    assert t.read(spark).count() == 101


def test_rollback_moves_head_keeps_history(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    v = t.rollback(0)
    assert v == 2
    assert {r.k for r in t.read(spark).collect()} == {1}
    # the rolled-past version is still readable
    assert {r.k for r in t.read(spark, version=1).collect()} == {1, 2}


def test_empty_table_read_raises(spark, tmp_path):
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "t"))
    with _pytest.raises(ValueError, match="no commits"):
        t.read(spark)


def test_stream_batch_commits_are_idempotent(spark, tmp_path):
    """Replaying a micro-batch (Structured Streaming's post-failure
    redelivery) must not duplicate rows: the second delivery of
    batch_id=1 is a no-op."""
    t = SnapshotTable(str(tmp_path / "t"))
    assert t.append_stream_batch(_df(spark, [(1, "a")]), batch_id=0) == 0
    assert t.append_stream_batch(_df(spark, [(2, "b")]), batch_id=1) == 1
    assert t.append_stream_batch(_df(spark, [(2, "b")]), batch_id=1) is None  # replay
    assert t.append_stream_batch(_df(spark, [(3, "c")]), batch_id=2) == 2
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2, 3]


def test_stream_batches_via_real_foreachbatch(spark, tmp_path):
    """Drive the sink through an actual readStream->foreachBatch run:
    table contents equal the batch union regardless of micro-batch
    boundaries."""
    src = str(tmp_path / "src")
    _df(spark, [(i, f"r{i}") for i in range(20)]).coalesce(2).write.parquet(src)
    t = SnapshotTable(str(tmp_path / "t"))
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(
        lambda b, bid: t.append_stream_batch(b, bid)
    ).option("checkpointLocation", str(tmp_path / "ckpt")).start()
    q.processAllAvailable()
    q.stop()
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(20))
