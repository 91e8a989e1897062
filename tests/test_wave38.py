"""Round-8 pins: the snapshot-maintained IVF ANN index (VERDICT r7 #7)
— centroid metadata in the log, cluster-ordered writes, per-file
cluster manifests, probe-pruned knn — plus its conservative-read
behavior for unkeyed files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.plans.snapshots import SnapshotTable

DIM = 8
C = 8  # centroids


def _vecs(spark, lo, hi):
    """Deterministic synthetic embeddings: dim-8, values spread over
    [-1, 1] by a fixed integer formula (no RNG — reproducible)."""
    emb = F.array(
        *[
            ((F.col("id") * 31 + j * 17) % 101 - 50).cast("double") / 50.0
            for j in range(DIM)
        ]
    )
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    )


@pytest.fixture(scope="module")
def cents(spark):
    from dbt_lab_spark.llm.similarity import ivf_centroids

    return ivf_centroids(
        _vecs(spark, 10, 400), num_centroids=C, iters=2, dim=DIM
    )


def _build(spark, tmp_path, cents, **kw):
    t = SnapshotTable(
        str(tmp_path / "t"),
        ann_col="embedding",
        ann_lists=C,
        ann_files=4,
        ann_centroids=cents,
        **kw,
    )
    t.commit(_vecs(spark, 10, 200))  # first half
    t.append(_vecs(spark, 200, 400))  # incremental second half
    return t


class TestSnapshotAnn:
    def test_incremental_assignment_equals_full_reencode(
        self, spark, tmp_path, cents
    ):
        """The per-file cluster manifest maintained across commit +
        append must equal a full re-encode of every file on the same
        centroids — incremental maintenance loses nothing."""
        from dbt_lab_spark.plans.ann import file_clusters

        t = _build(spark, tmp_path, cents)
        rec = t._log()[-1]
        # r9: per-file cluster sets live in manifest SIDECARS, not the
        # log record — ann_file_clusters() is the assembled view
        manifest = t.ann_file_clusters()
        recomputed: dict[str, list[int]] = {}
        for d in rec["files"]:
            recomputed.update(
                file_clusters(spark, d, cents, "embedding", t._norm_file_col)
            )
        assert manifest == recomputed
        # every file is keyed, and the clustered write makes files own
        # NARROW cluster ranges (pruning depends on this)
        assert set(manifest) == set(recomputed)
        assert all(len(cs) <= C // 2 for cs in manifest.values()), manifest

    def test_knn_equals_full_corpus_ivf(self, spark, tmp_path, cents):
        """Probe-pruned knn over the snapshot == ivf_knn over the full
        corpus with the same centroids, row for row."""
        from dbt_lab_spark.llm.similarity import ivf_knn

        t = _build(spark, tmp_path, cents)
        queries = _vecs(spark, 0, 5).withColumnRenamed("vec_id", "query_id")
        got = sorted(
            map(
                tuple,
                t.knn(spark, queries, k=10, nprobe=3).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                ivf_knn(
                    t.read(spark), queries, cents, k=10, nprobe=3,
                    scorer="jvm",
                ).collect(),
            )
        )
        assert got == want and len(got) > 0

    def test_probe_prunes_files(self, spark, tmp_path, cents):
        t = _build(spark, tmp_path, cents)
        queries = _vecs(spark, 0, 1).withColumnRenamed("vec_id", "query_id")
        kept, total = t.ann_pruned_file_count(queries, nprobe=2)
        assert total >= 8  # 4 files per directory, two directories
        assert 0 < kept < total, (kept, total)

    def test_unkeyed_files_are_conservatively_read(
        self, spark, tmp_path, cents
    ):
        """A CoW delete rewrites directories without re-clustering —
        its files carry no manifest entry and must always be read, so
        knn stays correct (just less pruned)."""
        from dbt_lab_spark.llm.similarity import ivf_knn

        t = _build(spark, tmp_path, cents)
        t.delete_where(spark, "vec_id % 7 = 0", mode="cow")
        queries = _vecs(spark, 0, 5).withColumnRenamed("vec_id", "query_id")
        got = sorted(
            map(tuple, t.knn(spark, queries, k=10, nprobe=3).collect())
        )
        want = sorted(
            map(
                tuple,
                ivf_knn(
                    t.read(spark), queries, cents, k=10, nprobe=3,
                    scorer="jvm",
                ).collect(),
            )
        )
        assert got == want
        assert all(r[0] % 7 != 0 or True for r in got)  # sanity
        assert not any(r[1] % 7 == 0 for r in got)  # deleted rows gone

    def test_centroids_train_on_first_commit_when_not_supplied(
        self, spark, tmp_path
    ):
        t = SnapshotTable(
            str(tmp_path / "t"), ann_col="embedding", ann_lists=4, ann_files=2
        )
        t.commit(_vecs(spark, 10, 100))
        rec0 = t._log()[-1]["ann"]
        assert len(rec0["centroids"]) == 4
        t.append(_vecs(spark, 100, 150))
        # the quantizer is immutable after the first commit
        assert t._log()[-1]["ann"]["centroids"] == rec0["centroids"]

    def test_knn_respects_time_travel_and_dv(self, spark, tmp_path, cents):
        t = _build(spark, tmp_path, cents)
        v1 = len(t.versions()) - 1
        t.delete_where(spark, "vec_id = 11", mode="dv")
        queries = _vecs(spark, 0, 2).withColumnRenamed("vec_id", "query_id")
        head_ids = {r.neighbor_id for r in t.knn(spark, queries, k=10).collect()}
        assert 11 not in head_ids  # DV applies through the pruned scan
        old = t.knn(spark, queries, k=10, version=v1)
        assert old.count() == 20  # 2 queries x k


# ---------------------------------------------------------------------------
# Stream-stream RIGHT OUTER interval join (VERDICT r7 #6): the mirror of
# test_wave35's left_outer eviction pin — an unmatched CLICK emits
# null-padded only in a strictly later micro-batch than the on-time match,
# once the watermark passes the click's own ts.
# ---------------------------------------------------------------------------


class TestStreamRightOuterJoin:
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

        left_rows = [(1, TS(0), 0)]  # one purchase
        # click 1 matches it; click 2's user has no purchase at all
        right_rows = [(1, TS(10), 0), (2, TS(10), 0)]
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
                seen.append((bid, r["uid"], r["pts"] is not None))

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
                watermark="1 hour", how="right_outer",
            ).select(right["user_id"].alias("uid"), left["ts"].alias("pts"))
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
        # the EVICTION PROOF: the null-padded click can only appear
        # after the watermark passed its own ts — a strictly later
        # micro-batch than the on-time match
        assert nulls[0][0] > matched[0][0]


# ---------------------------------------------------------------------------
# QM-coder head-carry sentinel (ADVICE r7): a carry whose backward
# 0xFF->0x00 walk runs off the front of the byte buffer must create a new
# leading byte (the code value's integer part grew), not vanish.
# ---------------------------------------------------------------------------


class TestQMEncoderHeadCarry:
    def test_carry_with_empty_buffer_emits_leading_byte(self):
        from dbt_lab_spark.llm.codecs import _QMEncoder

        enc = _QMEncoder()
        enc.c = 0x1FF << 19  # t = 0x1FF > 0xFF, nothing buffered yet
        enc._byteout()
        # sentinel took the carry (0x00 -> 0x01) and the data byte is 0xFF
        assert list(enc.buf) == [0x01, 0xFF]

    def test_carry_through_all_ff_prefix_reaches_sentinel(self):
        from dbt_lab_spark.llm.codecs import _QMEncoder

        enc = _QMEncoder()
        enc.buf.extend([0xFF, 0xFF])  # data prefix entirely 0xFF
        enc.c = 0x100 << 19
        enc._byteout()
        # both FFs wrap to 0x00 and the +1 lands on the sentinel
        assert list(enc.buf) == [0x01, 0x00, 0x00, 0x00]

    def test_normal_stream_has_no_sentinel(self):
        from dbt_lab_spark.llm.codecs import _QMEncoder

        enc = _QMEncoder()
        enc.c = 0x42 << 19
        enc._byteout()
        assert list(enc.buf) == [0x00, 0x42]  # sentinel still zero
        # flush strips it: output starts with real data
        st = bytearray([0])
        enc2 = _QMEncoder()
        for bit in (0, 1, 0, 0, 1, 1, 0, 1) * 8:
            enc2.encode(st, 0, bit)
        out = enc2.flush()
        assert len(out) > 0

    def test_roundtrip_unchanged_by_sentinel(self):
        """The sentinel must be invisible on normal streams: encode a
        bit sequence, decode it back bit-exactly."""
        from dbt_lab_spark.llm.codecs import _QMDecoder, _QMEncoder

        bits = [(i * 7 + i // 5) % 3 == 0 for i in range(500)]
        st = bytearray([0])
        enc = _QMEncoder()
        for b in bits:
            enc.encode(st, 0, int(b))
        data = enc.flush()
        st2 = bytearray([0])
        dec = _QMDecoder(data + b"\xff\xd9", 0)
        got = [dec.decode(st2, 0) for _ in bits]
        assert got == [int(b) for b in bits]


# ---------------------------------------------------------------------------
# External SOF9 fixture (ADVICE r7): the arithmetic decoder was previously
# validated only against its own encoder — a symmetric deviation from T.81
# Annex D would round-trip cleanly yet mis-decode real-world files.  These
# fixtures were produced by an INDEPENDENT implementation (libjpeg 6.2's
# arithmetic coder, via scripts/gen_sof9_fixture.c in this container:
# 16x16 deterministic pattern, quality 90, h1v1), alongside Huffman (SOF0)
# encodes of the same source image.
# ---------------------------------------------------------------------------

import os as _os

_FIX = _os.path.join(_os.path.dirname(__file__), "fixtures")


class TestExternalSof9Fixture:
    def _decode(self, name):
        import numpy as np

        from dbt_lab_spark.llm.codecs import decode_jpeg

        with open(_os.path.join(_FIX, name), "rb") as fh:
            return np.asarray(decode_jpeg(fh.read()))

    def test_fixture_markers(self):
        for name, marker in [
            ("sof9_gray.jpg", 0xC9),
            ("sof9_rgb.jpg", 0xC9),
            ("sof0_gray.jpg", 0xC0),
            ("sof0_rgb.jpg", 0xC0),
        ]:
            with open(_os.path.join(_FIX, name), "rb") as fh:
                d = fh.read()
            sofs = {
                d[i + 1]
                for i in range(len(d) - 1)
                if d[i] == 0xFF and d[i + 1] in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA)
            }
            assert sofs == {marker}, (name, sofs)

    def test_libjpeg_sof9_decodes_exactly_like_huffman(self):
        """decode_jpeg on libjpeg's ARITHMETIC stream must produce the
        SAME pixels as on libjpeg's HUFFMAN stream of the same source —
        the entropy stage is lossless, so any mismatch is a QM-coder
        deviation from T.81 Annex D."""
        import numpy as np

        for pair in [
            ("sof9_gray.jpg", "sof0_gray.jpg"),
            ("sof9_rgb.jpg", "sof0_rgb.jpg"),
        ]:
            a, h = self._decode(pair[0]), self._decode(pair[1])
            assert a.shape == h.shape == (16, 16, 3)
            assert np.array_equal(a, h), pair

    def test_gray_fixture_pixels_pinned(self):
        """Absolute pin: the gray SOF9 decode's checksum, so a future
        change to BOTH decode paths cannot silently drift together."""
        a = self._decode("sof9_gray.jpg")
        assert int(a.sum()) == 103542
        assert a[0, 0, 0] == a[0, 0, 1] == a[0, 0, 2]  # grayscale


# ---------------------------------------------------------------------------
# Compaction keeps the ANN index alive (r8): the rewrite is re-clustered by
# the recorded centroids and the new files get manifest entries, so knn
# pruning survives instead of decaying to conservative full reads.
# ---------------------------------------------------------------------------


class TestCompactKeepsAnn:
    def test_compact_reclusters_and_knn_still_prunes(
        self, spark, tmp_path, cents
    ):
        from dbt_lab_spark.llm.similarity import ivf_knn

        t = _build(spark, tmp_path, cents)
        queries = _vecs(spark, 0, 5).withColumnRenamed("vec_id", "query_id")
        want = sorted(
            map(tuple, t.knn(spark, queries, k=10, nprobe=3).collect())
        )
        v = t.compact(spark, target_mb=128.0, n_files=4)
        assert v is not None
        rec = t._log()[-1]
        ann_files = t.ann_file_clusters()
        # every file of the compacted dir is keyed in the manifest
        new_dir = rec["files"][-1]
        import os as _o

        new_files = [
            _o.path.join(new_dir, fn)
            for fn in sorted(_o.listdir(new_dir))
            if fn.endswith(".parquet") and not fn.startswith("_")
        ]
        assert new_files and all(f in ann_files for f in new_files)
        # knn results unchanged and pruning still effective
        got = sorted(
            map(tuple, t.knn(spark, queries, k=10, nprobe=3).collect())
        )
        assert got == want
        kept, total = t.ann_pruned_file_count(
            _vecs(spark, 0, 1).withColumnRenamed("vec_id", "query_id"),
            nprobe=2,
        )
        assert 0 < kept < total, (kept, total)
        # and the full-corpus reference still agrees post-compaction
        ref = sorted(
            map(
                tuple,
                ivf_knn(
                    t.read(spark), queries, cents, k=10, nprobe=3,
                    scorer="jvm",
                ).collect(),
            )
        )
        assert got == ref

    def test_vacuum_tidies_claim_files(self, spark, tmp_path):
        import os as _o

        t = SnapshotTable(str(tmp_path / "t"))
        t.commit(_vecs(spark, 0, 50))
        t.commit(_vecs(spark, 0, 60))  # orphans v0's dir
        t.vacuum(keep_last=1, grace_s=0.0)
        stale = [
            e
            for e in _o.listdir(t.root)
            if e.startswith("_claim_")
            and not _o.path.isdir(_o.path.join(t.root, e[len("_claim_"):]))
        ]
        assert stale == []
