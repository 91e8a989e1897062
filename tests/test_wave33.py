"""r5 audio + video dedup pins: fingerprint determinism and gain
invariance, planted-corpus margins at the query thresholds, frame-
aligned banding completeness, and end-to-end cluster recovery — the
audio/video cells of the per-modality dedup matrix."""

from __future__ import annotations

import numpy as np


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------------------
# Audio plane
# ---------------------------------------------------------------------------


def _planted_fps():
    """Recompute every planted clip's fingerprint through the SAME
    WAV round-trip the engine path uses."""
    from dbt_lab_spark.llm import codecs
    from dbt_lab_spark.llm.audiodedup import audio_fingerprint64

    seed, samplerate, n_samples, variants = 7, 8000, 2048, 3
    t = np.arange(n_samples)
    fps = {}
    for g in range(20):
        rng = np.random.default_rng(seed + g)
        freqs = rng.choice(np.arange(8, 120), size=3, replace=False) * (
            samplerate / 256.0
        )
        amps = 0.25 + 0.15 * rng.random(3)
        base = sum(
            a * np.sin(2 * np.pi * f * t / samplerate)
            for a, f in zip(amps, freqs)
        )
        base = base + 0.05 * rng.standard_normal(n_samples)
        for v in range(variants):
            x = base
            if v == 1:
                x = 0.82 * base
            elif v >= 2:
                vrng = np.random.default_rng(seed * 1000 + g * variants + v)
                x = base + 0.004 * vrng.standard_normal(n_samples)
            pcm = np.clip(x * 20000, -32768, 32767).astype(np.int16)
            sr, dec = codecs.decode_wav(
                codecs.encode_wav(pcm[:, None], sample_rate=samplerate)
            )
            mono = dec.astype(np.float64).mean(axis=1)
            fps[g * variants + v] = audio_fingerprint64(mono, sr)
    return fps


def test_audio_fingerprint_properties():
    """Determinism, exact gain invariance (log-energy shift cancels in
    the gradient comparison), and ~half-bits distance between
    independent signals."""
    from dbt_lab_spark.llm.audiodedup import audio_fingerprint64

    rng = np.random.default_rng(5)
    x = rng.standard_normal(2048)
    assert audio_fingerprint64(x, 8000) == audio_fingerprint64(x.copy(), 8000)
    assert audio_fingerprint64(x, 8000) == audio_fingerprint64(0.5 * x, 8000)
    y = np.random.default_rng(6).standard_normal(2048)
    assert 15 <= _ham(
        audio_fingerprint64(x, 8000), audio_fingerprint64(y, 8000)
    ) <= 49


def test_audio_fingerprint_rejects_short_clip():
    from pytest import raises

    from dbt_lab_spark.llm.audiodedup import audio_fingerprint64

    with raises(ValueError):
        audio_fingerprint64(np.zeros(512), 8000)


def test_planted_audio_margins():
    """The planted corpus separates cleanly at the query threshold:
    within-group hamming <= 4 (measured; the noise variant flips at
    most 4 near-tie gradient bits) <= 6 < 10 <= cross-group.  A change
    in the WAV codec, STFT, or pooling that moves fingerprints breaks
    this pin before it breaks the oracle."""
    fps = _planted_fps()
    ids = sorted(fps)
    within, cross = [], []
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            (within if i // 3 == j // 3 else cross).append(_ham(fps[i], fps[j]))
    assert len(within) == 60
    assert max(within) <= 4
    assert min(cross) >= 10


def test_audio_dedup_end_to_end(spark):
    """Full pipeline: WAV decode -> STFT fingerprint -> banding -> CC
    recovers exactly the 20 planted groups."""
    from dbt_lab_spark.llm.audiodedup import audio_dup_clusters, make_near_dup_audio

    assets = make_near_dup_audio(spark, n_groups=20, variants=3, seed=7)
    got = {
        r["asset_id"]: r["component"]
        for r in audio_dup_clusters(assets, max_hamming=6).collect()
    }
    assert got == {i: (i // 3) * 3 for i in range(60)}


def test_audio_fingerprints_skip_undecodable(spark):
    """Corrupt payloads and non-audio rows drop, not fail."""
    from dbt_lab_spark.llm import codecs
    from dbt_lab_spark.llm.audiodedup import audio_fingerprints
    from dbt_lab_spark.llm.multimodal import ASSET_SCHEMA

    pcm = (
        10000 * np.sin(2 * np.pi * 440 * np.arange(2048) / 8000)
    ).astype(np.int16)
    rows = [
        (0, "audio", bytearray(codecs.encode_wav(pcm[:, None], sample_rate=8000)), 0, 0, 256),
        (1, "audio", bytearray(b"RIFFxxxxGARBAGE"), 0, 0, 100),
        (2, "image", bytearray(b"\x89PNG"), 4, 4, 0),
    ]
    out = audio_fingerprints(spark.createDataFrame(rows, ASSET_SCHEMA)).collect()
    assert [r["asset_id"] for r in out] == [0]
    assert out[0]["samplerate"] == 8000


# ---------------------------------------------------------------------------
# Video plane
# ---------------------------------------------------------------------------


def _planted_frame_hashes():
    """Per-frame dHashes of the planted MJPEG corpus through the same
    JPEG round-trip the engine path uses."""
    from dbt_lab_spark.llm import codecs
    from dbt_lab_spark.llm.imagededup import dhash64
    from dbt_lab_spark.llm.videodedup import make_near_dup_videos  # noqa: F401 (planting rule source)

    seed, n_frames, size, variants = 11, 6, 32, 3
    hashes = {}
    for g in range(12):
        rng = np.random.default_rng(seed + g)
        base = [
            rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
            for _ in range(n_frames)
        ]
        for v in range(variants):
            frames = base
            if v == 1:
                frames = [
                    np.clip(f.astype(np.int64) + 6, 0, 255).astype(np.uint8)
                    for f in base
                ]
            elif v >= 2:
                vrng = np.random.default_rng(seed * 1000 + g * variants + v)
                frames = []
                for f in base:
                    noisy = f.copy()
                    n_flip = max(1, (size * size) // 50)
                    ys = vrng.integers(0, size, n_flip)
                    xs = vrng.integers(0, size, n_flip)
                    noisy[ys, xs] = vrng.integers(0, 256, size=(n_flip, 3))
                    frames.append(noisy)
            payload = codecs.encode_mjpeg(frames, quality=90)
            hashes[g * variants + v] = [
                dhash64(codecs.decode_jpeg(p)) for p in codecs.split_mjpeg(payload)
            ]
    return hashes


def test_planted_video_margins():
    """Mean aligned-frame hamming separates at the query threshold:
    within-group <= 5 <= 6 < 16 <= cross-group mean."""
    hashes = _planted_frame_hashes()
    ids = sorted(hashes)
    within, cross = [], []
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            mean = float(
                np.mean([_ham(a, b) for a, b in zip(hashes[i], hashes[j])])
            )
            (within if i // 3 == j // 3 else cross).append(mean)
    assert len(within) == 36
    assert max(within) <= 5.0
    assert min(cross) >= 16.0


def test_video_dedup_end_to_end(spark):
    """Full pipeline: MJPEG split -> frame dHash -> frame-aligned
    banding -> mean-hamming verify -> CC recovers the 12 planted
    groups."""
    from dbt_lab_spark.llm.videodedup import make_near_dup_videos, video_dup_clusters

    assets = make_near_dup_videos(spark, n_groups=12, variants=3, seed=11)
    got = {
        r["asset_id"]: r["component"]
        for r in video_dup_clusters(assets, max_mean_hamming=6.0).collect()
    }
    assert got == {i: (i // 3) * 3 for i in range(36)}


def test_video_pairs_require_equal_frame_count(spark):
    """A truncated copy (one frame missing) is NOT a near-dup under the
    aligned-sequence criterion — the frame-count guard must hold even
    when every shared frame matches exactly."""
    from dbt_lab_spark.llm import codecs
    from dbt_lab_spark.llm.multimodal import ASSET_SCHEMA
    from dbt_lab_spark.llm.videodedup import video_dedup_pairs

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8) for _ in range(5)
    ]
    rows = [
        (0, "video", bytearray(codecs.encode_mjpeg(frames, quality=90)), 24, 24, 200),
        (1, "video", bytearray(codecs.encode_mjpeg(frames, quality=90)), 24, 24, 200),
        (2, "video", bytearray(codecs.encode_mjpeg(frames[:4], quality=90)), 24, 24, 160),
    ]
    got = {
        (r["id_a"], r["id_b"])
        for r in video_dedup_pairs(
            spark.createDataFrame(rows, ASSET_SCHEMA), max_mean_hamming=6.0
        ).collect()
    }
    assert got == {(0, 1)}


# ---------------------------------------------------------------------------
# hamming_topk retrieval
# ---------------------------------------------------------------------------


def test_hamming_topk_matches_bruteforce(spark):
    """Radius-bounded top-k equals python brute force on the planted
    image hash set: same neighbor sets, same (hamming, id) ranking,
    k-truncation respected."""
    from dbt_lab_spark.llm.dedup import hamming_topk
    from tests.test_wave32 import _planted_hashes

    hd, _ = _planted_hashes()
    rows = [(i, h) for i, h in hd.items()]
    df = spark.createDataFrame(rows, "asset_id long, dhash long")
    queries = df.filter("asset_id % 3 = 0")
    got = {}
    for r in hamming_topk(
        df, queries, hash_col="dhash", id_col="asset_id", k=3, radius=6
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["hamming"])
        )
    for q in range(0, 60, 3):
        exact = sorted(
            (_ham(hd[q], hd[j]), j) for j in hd if _ham(hd[q], hd[j]) <= 6
        )[:3]
        want = [(i + 1, j, h) for i, (h, j) in enumerate(exact)]
        assert sorted(got[q]) == want, f"query {q}"


def test_hamming_topk_empty_outside_radius(spark):
    from dbt_lab_spark.llm.dedup import hamming_topk

    corpus = spark.createDataFrame([(0, 0)], "asset_id long, dhash long")
    queries = spark.createDataFrame([(1, -1)], "asset_id long, dhash long")
    assert (
        hamming_topk(
            corpus, queries, hash_col="dhash", id_col="asset_id", k=5, radius=3
        ).count()
        == 0
    )


# ---------------------------------------------------------------------------
# streaming dedup sink
# ---------------------------------------------------------------------------


def test_streaming_dedup_sink_equals_one_shot(spark, tmp_path):
    """Continuous dedup through a REAL readStream: micro-batches of
    simhashes flow through streaming_dedup_sink (band vs standing
    index, append pairs + hashes as snapshot commits); the accumulated
    pair log must EQUAL the one-shot hamming_dedup_pairs over all rows,
    regardless of micro-batch boundaries — and a replayed batch must
    not double pairs."""
    from dbt_lab_spark.llm.dedup import hamming_dedup_pairs, streaming_dedup_sink
    from dbt_lab_spark.plans.snapshots import SnapshotTable

    # 30 hashes: ten triples of near-identical values (hamming <= 2
    # inside a triple, far apart across triples)
    rows = []
    for g in range(10):
        base = (0x9E3779B97F4A7C15 * (g + 1)) & ((1 << 63) - 1)
        rows += [(g * 3, base), (g * 3 + 1, base ^ 1), (g * 3 + 2, base ^ 4)]
    src = str(tmp_path / "src")
    df = spark.createDataFrame(rows, "doc_id long, h long")
    df.repartition(5).write.parquet(src)

    index = SnapshotTable(str(tmp_path / "index"))
    pairs = SnapshotTable(str(tmp_path / "pairs"))
    stream = (
        spark.readStream.schema("doc_id long, h long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = streaming_dedup_sink(index, pairs, hash_col="h", max_hamming=3)
    q = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.processAllAvailable()
    q.stop()

    got = {
        (r.id_a, r.id_b) for r in pairs.read(spark).select("id_a", "id_b").collect()
    }
    want = {
        (r.id_a, r.id_b)
        for r in hamming_dedup_pairs(df, hash_col="h", max_hamming=3)
        .select("id_a", "id_b")
        .collect()
    }
    assert got == want and len(want) == 30  # C(3,2) x 10 triples
    assert sorted(r.doc_id for r in index.read(spark).collect()) == list(range(30))
    # replay the last batch id: both commits must no-op
    n_pairs_versions = len(pairs.versions())
    last_bid = max(
        r.get("batch_id", -1) for r in pairs._log()
    )
    sink(df.limit(3), last_bid)
    assert len(pairs.versions()) == n_pairs_versions


def test_incremental_dedup_no_self_pairs_on_duplicate_delivery(spark):
    """r6 pin (ADVICE r5 low): an id present in BOTH the batch and the
    standing index (duplicate delivery that is not a batch_id replay)
    must not emit a degenerate (id, id, hamming=0) self-pair."""
    from dbt_lab_spark.llm.dedup import incremental_dedup_pairs

    batch = spark.createDataFrame([("d1", 7), ("d2", 7)], "doc_id string, h long")
    index = spark.createDataFrame([("d1", 7)], "doc_id string, h long")
    pairs = incremental_dedup_pairs(batch, index, hash_col="h").collect()
    assert all(r.id_a != r.id_b for r in pairs)
    assert {(r.id_a, r.id_b) for r in pairs} == {("d1", "d2")}
