"""Round-9 pins (VERDICT r8 #1-#4 + ADVICE r8): the segmented
snapshot log — one immutable record file per version, periodic folded
checkpoints, O(delta) commit bytes, O(checkpoint + tail) reads — the
per-directory manifest sidecars, the CommitProtocol seam (OCC matrix
against both the local hard-link backend and the in-memory
conditional-PUT fake), vacuum's in-flight-writer grace window, and
the ANN index lifecycle (drift metric + retrain)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.plans.snapshots import (
    ConcurrentWriteError,
    InMemoryCommitProtocol,
    LocalCommitProtocol,
    SnapshotTable,
)


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _seg_sizes(t: SnapshotTable) -> dict[int, int]:
    out = {}
    for key in t.protocol.list("_log"):
        name = key.rsplit("/", 1)[-1]
        if name.endswith(".json") and name[:-5].isdigit():
            out[int(name[:-5])] = t.protocol.stat(key)[1]
    return out


# ---------------------------------------------------------------------------
# Segmented log: commit bytes O(delta), reads O(checkpoint + tail)
# ---------------------------------------------------------------------------


class TestSegmentedLog:
    def test_commit_bytes_are_o_delta_not_o_history(self, spark, tmp_path):
        """25 appends: late record files must not grow with history —
        the r7 whole-log rewrite was O(versions) per commit; a delta
        record names one added directory regardless of how many came
        before."""
        t = SnapshotTable(str(tmp_path / "t"))
        for i in range(25):
            t.append(_kv(spark, i * 10, (i + 1) * 10).coalesce(1))
        sizes = _seg_sizes(t)
        early = sum(sizes[v] for v in range(2, 7)) / 5.0
        late = sum(sizes[v] for v in range(20, 25)) / 5.0
        assert late < 2.0 * early, (early, late, sizes)

    def test_head_read_folds_checkpoint_plus_tail_only(self, spark, tmp_path):
        """Resolving the head must read at most CHECKPOINT_EVERY
        record files past the nearest checkpoint — never the whole
        history.  Measured through a counting protocol with a fresh
        cache identity."""
        root = str(tmp_path / "t")
        t = SnapshotTable(root)
        for i in range(25):
            t.append(_kv(spark, i * 10, (i + 1) * 10).coalesce(1))

        class Counting(LocalCommitProtocol):
            def __init__(self, r):
                super().__init__(r)
                self.token = f"count:{r}"  # cold caches
                self.reads = []

            def read(self, key):
                self.reads.append(key)
                return super().read(key)

        proto = Counting(root)
        t2 = SnapshotTable(root, protocol=proto)
        assert t2.read(spark).count() == 250
        seg_reads = [
            k for k in proto.reads if not k.rsplit("/", 1)[-1].startswith("_")
        ]
        assert len(seg_reads) <= SnapshotTable.CHECKPOINT_EVERY, proto.reads
        ckpt_reads = [k for k in proto.reads if "_ckpt_" in k]
        assert ckpt_reads  # the fold actually started from a checkpoint

    def test_contents_identical_across_checkpoint_boundary(
        self, spark, tmp_path
    ):
        """Versions just below, at, and above a checkpoint read the
        exact same contents whether resolved from the checkpoint or by
        folding records — and time travel + rollback still work."""
        t = SnapshotTable(str(tmp_path / "t"))
        for i in range(13):
            t.append(_kv(spark, i * 10, (i + 1) * 10).coalesce(1))
        assert t.protocol.exists(t._ckpt_key(10))
        for v in (9, 10, 11, 12):
            got = {r.k for r in t.read(spark, version=v).collect()}
            assert got == set(range((v + 1) * 10)), v
        v_rb = t.rollback(9)
        assert t.read(spark).count() == 100
        assert t.read(spark, version=12).count() == 130  # history intact
        assert v_rb == 13

    def test_ckpt_survives_vacuum_and_versions_keep_counting(
        self, spark, tmp_path
    ):
        t = SnapshotTable(str(tmp_path / "t"))
        for i in range(12):
            t.append(_kv(spark, i * 10, (i + 1) * 10).coalesce(1))
        removed = t.vacuum(keep_last=2, grace_s=0.0)
        assert removed == []  # appends share dirs: nothing unreferenced
        assert t.versions() == [10, 11]
        # a checkpoint at the oldest kept version makes it resolvable
        assert t.read(spark, version=10).count() == 110
        assert t.append(_kv(spark, 120, 130)) == 12
        with pytest.raises(ValueError, match="vacuumed"):
            t.read(spark, version=5)

    def test_stream_batch_ids_survive_vacuum(self, spark, tmp_path):
        """Exactly-once across retention: the fold carries the
        CUMULATIVE batch-id set through checkpoints, so a replay of a
        batch whose record was vacuumed away is still a no-op (the r7
        log forgot truncated ids)."""
        t = SnapshotTable(str(tmp_path / "t"))
        for b in range(12):
            t.append_stream_batch(_kv(spark, b * 10, (b + 1) * 10), batch_id=b)
        t.vacuum(keep_last=1, grace_s=0.0)
        assert t.append_stream_batch(_kv(spark, 0, 10), batch_id=0) is None
        assert t.read(spark).count() == 120


# ---------------------------------------------------------------------------
# Manifest sidecars: the log record is independent of #files
# ---------------------------------------------------------------------------


class TestManifestSidecars:
    def test_record_size_independent_of_file_count(self, spark, tmp_path):
        """Two tables with identical history shapes but 1 vs 16 data
        files per commit: record sizes must match to within noise —
        per-file stats/blooms ride the sidecars, never the log."""
        roots = {}
        for name, nf in (("one", 1), ("many", 16)):
            t = SnapshotTable(
                str(tmp_path / name), stat_cols=["k"], bloom_cols=["k"]
            )
            t.commit(_kv(spark, 0, 3200).repartition(nf))
            t.append(_kv(spark, 3200, 6400).repartition(nf))
            roots[name] = _seg_sizes(t)
        for v in (0, 1):
            a, b = roots["one"][v], roots["many"][v]
            assert abs(a - b) < 200, (v, a, b)

    def test_pruning_unchanged_through_sidecars(self, spark, tmp_path):
        """between= / point= / knn-probe pruning behavior is the
        pinned r8 behavior, now read from sidecars."""
        t = SnapshotTable(
            str(tmp_path / "t"), stat_cols=["k"], bloom_cols=["k"]
        )
        for g in range(4):
            t.append(_kv(spark, g * 100, (g + 1) * 100).coalesce(1))
        kept, total = t.pruned_file_count(None, ("k", 150, 160))
        assert (kept, total) == (1, 4)
        kept, total = t.pruned_point_file_count(None, ("k", 250))
        assert total == 4 and kept == 1
        got = {r.k for r in t.read(spark, between=("k", 150, 160)).collect()}
        assert got == set(range(150, 161))

    def test_distributed_prune_equals_driver_prune(self, spark, tmp_path):
        """Above PRUNE_DISTRIBUTED_MIN_FILES the exclusion set is
        computed executor-side over the sidecar scan; forced low, both
        paths must keep the identical file set (and return identical
        rows)."""
        t = SnapshotTable(
            str(tmp_path / "t"), stat_cols=["k"], bloom_cols=["k"]
        )
        for g in range(5):
            t.append(_kv(spark, g * 100, (g + 1) * 100).repartition(2))
        rec = t._rec_at(t._head_version())
        driver = sorted(t._prune(None, rec, "minmax", "k", (120, 180)))
        t.PRUNE_DISTRIBUTED_MIN_FILES = 1
        dist = sorted(t._prune(spark, rec, "minmax", "k", (120, 180)))
        assert driver == dist and 0 < len(dist) < 10
        drv_pt = sorted(t._prune(None, rec, "bloom", "k", (333,)))
        dist_pt = sorted(t._prune(spark, rec, "bloom", "k", (333,)))
        assert drv_pt == dist_pt and 0 < len(dist_pt) < 10
        got = {r.k for r in t.read(spark, point=("k", 333)).collect()}
        assert got == {333}

    def test_rename_translates_at_prune_time(self, spark, tmp_path):
        """Sidecars are keyed by write-time physical names and never
        rewritten: after evolve(rename), a between= on the NEW name
        still prunes pre-rename directories via the per-dir logical
        mapping."""
        t = SnapshotTable(str(tmp_path / "t"), stat_cols=["v"])
        for g in range(3):
            t.append(_kv(spark, g * 100, (g + 1) * 100).coalesce(1))
        t.evolve(rename={"v": "val"})
        kept, total = t.pruned_file_count(None, ("val", 0, 500))
        assert (kept, total) == (1, 3)
        got = {r.val for r in t.read(spark, between=("val", 0, 500)).collect()}
        assert got == {v * 10 for v in range(51)}


# ---------------------------------------------------------------------------
# CommitProtocol seam: the OCC matrix on both backends
# ---------------------------------------------------------------------------


def _occ_matrix(spark, root, protocol_factory):
    """The racing-writer pins, parameterized by backend: N threads x K
    appends serialize losslessly; merge racing an append aborts loudly
    or lands correctly; vacuum lock excludes committers."""
    from concurrent.futures import ThreadPoolExecutor

    proto = protocol_factory()

    def table():
        # every writer its own handle, one shared protocol (an object
        # store IS shared state; the local backend shares via the FS)
        return SnapshotTable(root, protocol=proto)

    def worker(w):
        t = table()
        for i in range(3):
            t.append(_kv(spark, (w * 3 + i) * 50, (w * 3 + i + 1) * 50))

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(worker, range(4)))
    t = table()
    assert t.versions() == list(range(12))  # gapless: no lost commit
    assert t.read(spark).count() == 600
    # CAS conflict: a stale expected_parent is rejected loudly
    with pytest.raises(ConcurrentWriteError, match="head moved"):
        t._append_log({"operation": "x", "files": []}, expected_parent=3)


class TestCommitProtocolSeam:
    def test_occ_matrix_local_backend(self, spark, tmp_path):
        root = str(tmp_path / "local")
        _occ_matrix(spark, root, lambda: LocalCommitProtocol(root))

    def test_occ_matrix_object_store_fake(self, spark, tmp_path):
        """The same pins against the in-memory conditional-PUT fake:
        no O_EXCL, no hard links, no POSIX — put_if_absent is the only
        primitive, exactly what S3/GCS/Azure conditional PUTs give."""
        _occ_matrix(
            spark, str(tmp_path / "mem"), InMemoryCommitProtocol
        )

    def test_fake_store_is_actually_used(self, spark, tmp_path):
        """No _log/ files on disk when the protocol is the fake —
        proof the seam carries ALL log I/O."""
        root = str(tmp_path / "t")
        proto = InMemoryCommitProtocol()
        t = SnapshotTable(root, protocol=proto)
        t.commit(_kv(spark, 0, 10))
        t.append(_kv(spark, 10, 20))
        assert not os.path.isdir(os.path.join(root, "_log"))
        assert t.versions() == [0, 1]
        assert t.read(spark, version=0).count() == 10


# ---------------------------------------------------------------------------
# Vacuum: grace window + lock exclusion (ADVICE r8)
# ---------------------------------------------------------------------------


class TestVacuumSafety:
    def test_fresh_unreferenced_dir_survives_default_grace(
        self, spark, tmp_path
    ):
        """An in-flight writer's just-written directory is
        unreferenced until its commit publishes — vacuum must NOT
        reclaim it inside the grace window (ADVICE r8: it used to,
        leaving the about-to-publish head unreadable)."""
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 10))
        orphan = t._new_dir("delta")  # the in-flight writer's claim
        _kv(spark, 10, 20).write.parquet(orphan)
        t.commit(_kv(spark, 0, 30))  # head moves on
        removed = t.vacuum(keep_last=1)  # default grace
        assert orphan not in removed
        assert os.path.isdir(orphan)
        # past the grace window (simulated by aging the dir) it IS
        # reclaimed
        old = 10_000.0
        os.utime(orphan, (os.path.getmtime(orphan) - old,) * 2)
        removed = t.vacuum(keep_last=1)
        assert orphan in removed

    def test_commit_waits_for_vacuum_lock(self, spark, tmp_path):
        """A commit never publishes while vacuum holds the lock: the
        record a committer builds can then never reference a directory
        vacuum is concurrently deleting."""
        import threading
        import time as _time

        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 10))
        assert t.protocol.put_if_absent("_vacuum.lock", b"test")
        done = []

        def release():
            _time.sleep(0.4)
            t.protocol.delete("_vacuum.lock")
            done.append("released")

        th = threading.Thread(target=release)
        th.start()
        v = t.append(_kv(spark, 10, 20))  # blocks until release
        th.join()
        assert done == ["released"] and v == 1

    def test_rollback_holds_lock_against_vacuum(self, spark, tmp_path):
        """Rollback references non-head directories; it must be
        serialized with vacuum so the target's dirs cannot vanish
        between its read and its publish.  After a vacuum removed the
        target, rollback fails LOUDLY instead of publishing a record
        that points at deleted files."""
        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_kv(spark, 0, 10))
        t.commit(_kv(spark, 0, 20))
        t.commit(_kv(spark, 0, 30))
        t.vacuum(keep_last=1, grace_s=0.0)
        with pytest.raises(ValueError, match="vacuumed"):
            t.rollback(0)
        assert t.read(spark).count() == 30  # head unharmed


# ---------------------------------------------------------------------------
# ANN lifecycle: drift metric + retrain (VERDICT r8 #4)
# ---------------------------------------------------------------------------

DIM = 8


def _vecs(spark, lo, hi, spread=50.0):
    emb = F.array(
        *[
            ((F.col("id") * 31 + j * 17) % 101 - 50).cast("double") / spread
            for j in range(DIM)
        ]
    )
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    )


def _drifted(spark, lo, hi):
    """A second mode the first-commit quantizer never saw: axis-heavy
    vectors far from the spread-mode centroids."""
    emb = F.array(
        *[
            (F.lit(1.0) if j < 2 else ((F.col("id") * 13 + j) % 7).cast("double") * 100.0)
            for j in range(DIM)
        ]
    )
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    )


class TestAnnLifecycle:
    def _table(self, spark, tmp_path):
        t = SnapshotTable(
            str(tmp_path / "t"),
            ann_col="embedding",
            ann_lists=4,
            ann_files=2,
        )
        t.commit(_vecs(spark, 0, 200))
        return t

    def test_staleness_flags_drift(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        base = t.ann_staleness()
        assert base["staleness"] == pytest.approx(0.0, abs=1e-9)
        t.append(_drifted(spark, 200, 400))
        drifted = t.ann_staleness()
        assert drifted["latest_mean_sim"] < drifted["base_mean_sim"]
        assert drifted["staleness"] > 0.05, drifted

    def test_retrain_equals_fresh_centroids_and_fresh_knn(
        self, spark, tmp_path
    ):
        """compact(retrain_ann=True) must record exactly the centroids
        a fresh ivf_centroids on the union corpus produces, and knn
        must equal a fresh full-corpus ivf_knn under them."""
        from dbt_lab_spark.llm.similarity import ivf_centroids, ivf_knn

        t = self._table(spark, tmp_path)
        t.append(_drifted(spark, 200, 400))
        pre_cents = t._log()[-1]["ann"]["centroids"]
        want_cents = ivf_centroids(
            t.read(spark), num_centroids=4, iters=5, dim=DIM
        )
        v = t.compact(spark, retrain_ann=True, n_files=4)
        assert v is not None
        meta = t._log()[-1]["ann"]
        assert meta["centroids"] == [list(c) for c in want_cents]
        assert meta["centroids"] != pre_cents
        queries = _vecs(spark, 0, 3).withColumnRenamed("vec_id", "query_id")
        got = sorted(map(tuple, t.knn(spark, queries, k=5, nprobe=2).collect()))
        ref = sorted(
            map(
                tuple,
                ivf_knn(
                    t.read(spark), queries, want_cents, k=5, nprobe=2,
                    scorer="jvm",
                ).collect(),
            )
        )
        assert got == ref
        # retrain restored probe-effectiveness: pruning still skips
        kept, total = t.ann_pruned_file_count(
            _vecs(spark, 0, 1).withColumnRenamed("vec_id", "query_id"),
            nprobe=1,
        )
        assert 0 < kept < total, (kept, total)
        # and the retrain improved the drift metric
        assert t.ann_staleness()["staleness"] == pytest.approx(0.0, abs=1e-9)

    def test_rollback_restores_pre_retrain_quantizer(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        t.append(_drifted(spark, 200, 400))
        pre = t._log()[-1]["ann"]["centroids"]
        t.compact(spark, retrain_ann=True, n_files=2)
        assert t._log()[-1]["ann"]["centroids"] != pre
        t.rollback(1)
        assert t._log()[-1]["ann"]["centroids"] == pre
        queries = _vecs(spark, 0, 2).withColumnRenamed("vec_id", "query_id")
        assert t.knn(spark, queries, k=5).count() == 10

    def test_evolve_renames_ann_column_metadata(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        t.evolve(rename={"embedding": "emb2"})
        assert t._log()[-1]["ann"]["col"] == "emb2"
        queries = (
            _vecs(spark, 0, 2)
            .withColumnRenamed("vec_id", "query_id")
            .withColumnRenamed("embedding", "emb2")
        )
        assert t.knn(spark, queries, k=5).count() == 10


# ---------------------------------------------------------------------------
# Record-file hygiene
# ---------------------------------------------------------------------------


class TestRecordHygiene:
    def test_records_carry_no_per_file_maps(self, spark, tmp_path):
        """The 100 TB guardrail in one assertion: no record file ever
        contains a stats/bloom/ann-files map (they live in sidecars),
        and an append's record names only its own delta directory."""
        t = SnapshotTable(
            str(tmp_path / "t"), stat_cols=["k"], bloom_cols=["k"]
        )
        t.commit(_kv(spark, 0, 100).repartition(4))
        t.append(_kv(spark, 100, 200).repartition(4))
        for key in t.protocol.list("_log"):
            name = key.rsplit("/", 1)[-1]
            if not (name.endswith(".json") and name[:-5].isdigit()):
                continue
            seg = json.loads(t.protocol.read(key))
            flat = json.dumps(seg)
            assert '"stats"' not in flat and '"bloom"' not in flat, key
            assert ".parquet" not in flat, key  # no per-FILE paths at all
        seg1 = json.loads(t.protocol.read(t._seg_key(1)))
        assert len(seg1.get("f_add") or []) == 1 and "files" not in seg1
