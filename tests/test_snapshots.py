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


def test_manifest_data_skipping_prunes_files(spark, tmp_path):
    """Commit value-range-disjoint batches; a between= read must skip
    the non-overlapping files at the MANIFEST level and still return
    exactly the filtered rows."""
    t = SnapshotTable(str(tmp_path / "t"), stat_cols=["k"])
    t.commit(_df(spark, [(i, "lo") for i in range(0, 100)]).repartition(1))
    t.append(_df(spark, [(i, "mid") for i in range(1000, 1100)]).repartition(1))
    t.append(_df(spark, [(i, "hi") for i in range(2000, 2100)]).repartition(1))
    kept, total = t.pruned_file_count(None, ("k", 1000, 1099))
    assert total == 3 and kept == 1
    rows = t.read(spark, between=("k", 1000, 1099)).collect()
    assert sorted(r.k for r in rows) == list(range(1000, 1100))
    # correctness against the unpruned scan + filter
    full = t.read(spark).filter("k between 1000 and 1099").collect()
    assert sorted(r.k for r in rows) == sorted(r.k for r in full)


def test_data_skipping_without_stats_is_conservative(spark, tmp_path):
    """A table committed WITHOUT stat_cols must still answer between=
    reads correctly (every file conservatively read)."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(i, "x") for i in range(50)]))
    rows = t.read(spark, between=("k", 10, 19)).collect()
    assert sorted(r.k for r in rows) == list(range(10, 20))


def test_vacuum_reclaims_unreferenced_snapshots(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]))       # v0: dir A
    t.commit(_df(spark, [(2, "b")]))       # v1: dir B (full replace)
    t.append(_df(spark, [(3, "c")]))       # v2: dirs B+C
    removed = t.vacuum(keep_last=1)
    assert len(removed) == 1               # dir A only; B still referenced
    assert sorted(r.k for r in t.read(spark).collect()) == [2, 3]
    assert t.versions() == [2]


def test_vacuum_keeps_time_travel_window(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.append(_df(spark, [(3, "c")]))
    assert t.vacuum(keep_last=2) == []     # v1 still references v0's dir
    assert {r.k for r in t.read(spark, version=1).collect()} == {1, 2}


def _head_files(t: SnapshotTable) -> list[str]:
    return [
        os.path.join(d, fn)
        for d in t._log()[-1]["files"]
        for fn in sorted(os.listdir(d))
        if fn.endswith(".parquet")
    ]


def test_compact_binpacks_and_preserves_contents(spark, tmp_path):
    """r5 (VERDICT r4 #6): compact() folds the small-file tail into
    target-size files in a NEW version — multiset contents identical
    (checksum), file count reduced, history intact."""
    t = SnapshotTable(str(tmp_path / "t"))
    for b in range(6):
        t.append(_df(spark, [(b * 10 + i, f"v{b}_{i}") for i in range(5)]).repartition(2))
    pre = t.versions()[-1]
    before = sorted((r.k, r.v) for r in t.read(spark).collect())
    n_files_before = len(_head_files(t))
    assert n_files_before == 12  # 6 deltas x repartition(2)
    v = t.compact(spark, target_mb=64)
    assert v == pre + 1
    assert len(_head_files(t)) == 1  # tiny total -> one bin
    after = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert after == before
    # time travel across the compaction still resolves the OLD files
    travel = sorted((r.k, r.v) for r in t.read(spark, version=pre).collect())
    assert travel == before


def test_compact_keeps_large_dirs_and_stats(spark, tmp_path):
    """Directories at/over target are carried over untouched; manifest
    stats survive for the kept dir and are re-recorded for the
    compacted one, so between= skipping still prunes."""
    t = SnapshotTable(str(tmp_path / "t"), stat_cols=["k"])
    big = _df(spark, [(i, "big") for i in range(2000)]).coalesce(1)
    t.commit(big)
    t.append(_df(spark, [(100000, "s1")]))
    t.append(_df(spark, [(200000, "s2")]))
    big_dir = t._log()[0]["files"][0]
    big_bytes = sum(
        os.path.getsize(os.path.join(big_dir, f))
        for f in os.listdir(big_dir)
        if f.endswith(".parquet")
    )
    # target between the big dir and the small deltas
    v = t.compact(spark, target_mb=big_bytes / (1024 * 1024) * 0.9)
    assert v is not None
    head = t._log()[-1]
    assert big_dir in head["files"]  # untouched
    assert len(head["files"]) == 2  # big + one compacted dir
    # stats present for every head file -> skipping prunes to 1 file
    kept, total = t.pruned_file_count(None, ("k", 100000, 300000))
    assert total == 2 and kept == 1
    rows = {r.k for r in t.read(spark, between=("k", 100000, 300000)).collect()}
    assert rows == {100000, 200000}


def test_compact_noop_cases(spark, tmp_path):
    """Fewer than two small dirs -> None, no empty commit."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]).coalesce(1))
    n = len(t.versions())
    assert t.compact(spark, target_mb=64) is None
    assert len(t.versions()) == n
