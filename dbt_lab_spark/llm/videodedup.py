"""Content-based VIDEO near-duplicate detection: per-frame perceptual
hashes + frame-aligned hamming-band LSH + sequence-level verification +
connected components — the last cell of the per-modality dedup matrix
(text / embeddings / images / audio are in llm/dedup.py, imagededup.py,
audiodedup.py).

Design (the public frame-signature family, e.g. the per-frame-hash
pipelines used over web video corpora): a video's signature is the
SEQUENCE of its frames' 64-bit dHashes.  Two videos are near-dups when
they have the same frame count and the MEAN aligned-frame hamming
distance is <= a threshold.  Candidate generation stays banded:

  1. `video_frame_hashes` — split the container (MJPEG/AVI/GIF), decode
     every frame, dHash each: ONE Arrow map-only stage emitting
     (asset_id, frame_idx, dhash) — a few bigints per video.
  2. Candidates: pigeonhole-band each frame hash and equi-join on
     (frame_idx, band, key) — if the mean aligned hamming is <= h, some
     frame pair is within h, so some band of that frame matches exactly
     (recall 1.0 for mean-<=h pairs by two pigeonholes).  Never
     all-pairs; frame_idx in the join key keeps buckets per-position.
  3. Verify: for candidate video pairs only, join the two hash
     sequences on frame_idx and aggregate exact mean/max hamming.
  4. `connected_components` -> dedup clusters.

Scale shape: the shuffle key space is (frame_idx, band, key) — wide and
uniform; per-video state is O(frames) bigints, never pixels.

Reference parity: beyond-reference (rimarin/dbt-lab has no multimodal
surface); north-star brief capability.
"""

from __future__ import annotations

from dbt_lab_spark.localrel import local_df

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def video_frame_hashes(assets: DataFrame) -> DataFrame:
    """(asset_id, frame_idx, n_frames, dhash) per decodable video frame
    — one Arrow mapInPandas stage (MJPEG streams split at SOI/EOI, AVI
    demuxed, animated GIF composited); non-video rows drop JVM-side."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dbt_lab_spark.llm import codecs
        from dbt_lab_spark.llm.imagededup import dhash64

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                try:
                    fmt = codecs.detect_format(data)
                    if fmt == "gif":
                        frames = codecs.decode_gif_frames(data)
                    elif fmt == "avi":
                        frames = [
                            codecs.decode_jpeg(p)
                            for p in codecs.decode_avi_mjpeg(data)
                        ]
                    else:
                        frames = [
                            codecs.decode_jpeg(p) for p in codecs.split_mjpeg(data)
                        ]
                except Exception:
                    continue  # corrupt payload: skip, don't poison the batch
                for idx, img in enumerate(frames):
                    rows.append((int(aid), idx, len(frames), dhash64(img)))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["asset_id", "frame_idx", "n_frames", "dhash"]
                )

    video = assets.filter(F.col("media_type") == "video").select(
        "asset_id", "payload"
    )
    return video.mapInPandas(_hash, FRAME_HASH_SCHEMA)


def video_dedup_pairs(
    assets: DataFrame, max_mean_hamming: float = 6.0
) -> DataFrame:
    """Near-duplicate video pairs (id_a, id_b, n_frames, mean_hamming,
    max_hamming) — frame-aligned banding for candidates, exact
    aligned-sequence verification after.

    Completeness: if mean aligned hamming <= h then some aligned frame
    pair has hamming <= floor(h), and pigeonhole banding with
    floor(h)+1 bands finds that frame pair — so every qualifying video
    pair surfaces as a candidate (recall 1.0 for the mean-<=h
    criterion, frame counts equal)."""
    h = int(max_mean_hamming)
    n_bands = h + 1
    width = 64 // n_bands
    # localCheckpoint: `hashes` is referenced THREE times below (bands,
    # verify side a, verify side b) — without materializing the small
    # (asset_id, frame_idx, dhash) relation the container-split +
    # JPEG-decode Arrow stage runs once per reference (guide §7.2).
    hashes = video_frame_hashes(assets).localCheckpoint()
    bands = hashes.select(
        "asset_id",
        "frame_idx",
        "n_frames",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("dhash"), b * width).bitwiseAND(
                        F.lit((1 << width) - 1).cast("long")
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "key"),
    )
    left = bands.select(
        F.col("asset_id").alias("id_a"),
        F.col("n_frames").alias("nf_a"),
        "frame_idx",
        "band",
        "key",
    )
    right = bands.select(
        F.col("asset_id").alias("id_b"),
        F.col("n_frames").alias("nf_b"),
        "frame_idx",
        "band",
        "key",
    )
    candidates = (
        left.join(right, on=["frame_idx", "band", "key"])
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("nf_a") == F.col("nf_b")))
        .select("id_a", "id_b")
        .distinct()
    )
    a = hashes.select(
        F.col("asset_id").alias("id_a"),
        "frame_idx",
        F.col("dhash").alias("h_a"),
        F.col("n_frames").alias("n_frames"),
    )
    b = hashes.select(
        F.col("asset_id").alias("id_b"),
        "frame_idx",
        F.col("dhash").alias("h_b"),
    )
    return (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "frame_idx"])
        .groupBy("id_a", "id_b", "n_frames")
        .agg(
            F.avg(
                F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
            ).alias("mean_hamming"),
            F.max(
                F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
            ).alias("max_hamming"),
        )
        .filter(F.col("mean_hamming") <= F.lit(max_mean_hamming))
    )


def video_dup_clusters(
    assets: DataFrame, max_mean_hamming: float = 6.0
) -> DataFrame:
    """(asset_id, component) dedup clusters over video near-dup pairs
    via min-label connected components."""
    from dbt_lab_spark.llm.dedup import connected_components

    pairs = video_dedup_pairs(assets, max_mean_hamming=max_mean_hamming)
    cc = connected_components(pairs, id_a="id_a", id_b="id_b")
    return cc.select(F.col("id").alias("asset_id"), "component")


def make_near_dup_videos(
    spark: SparkSession,
    n_groups: int = 12,
    variants: int = 3,
    seed: int = 11,
    n_frames: int = 6,
    size: int = 32,
) -> DataFrame:
    """Planted near-dup MJPEG corpus: `n_groups` base frame sequences,
    each with `variants` variants — v0 the base, v1 +6 brightness on
    every frame, v2 2% salt noise per frame — JPEG q90 encoded (lossy
    but deterministic, so frame hashes are pure functions of (seed,
    asset_id)).  asset_id = group*variants + v; closed-form cluster
    structure, the imagededup planting contract extended to sequences."""
    import numpy as np

    from dbt_lab_spark.llm import codecs

    rows = []
    for g in range(n_groups):
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
            rows.append(
                (
                    g * variants + v,
                    "video",
                    payload,
                    size,
                    size,
                    n_frames * 40,
                )
            )
    from dbt_lab_spark.llm.multimodal import ASSET_SCHEMA

    return local_df(spark, rows, ASSET_SCHEMA, fanout=True)
